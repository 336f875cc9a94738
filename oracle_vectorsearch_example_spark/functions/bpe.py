"""Byte-pair encoding tokenizer — train + encode, Spark-shaped (the
token-counting surface of the training-data pipeline, upgrading the
"BPE-ish regex" placeholder to the real algorithm).

Published basis: Sennrich, Haddow & Birch, "Neural Machine Translation
of Rare Words with Subword Units" (ACL 2016) — the merge-frequency
algorithm every modern tokenizer trainer descends from.

Scale shape (how sentencepiece/HF actually train, re-expressed here):
the corpus collapses to a WORD HISTOGRAM first — one distributed
`groupBy(word).count()` shuffle over the only full-corpus pass — and the
iterative merge loop runs driver-side over that small frequency dict
(vocabulary-sized, not corpus-sized: merge counting is O(distinct words ·
avg word length) per round regardless of corpus rows). Encoding is an
Arrow-batched ``mapInPandas`` applying the learned merge ranks greedily
(lowest rank first — the standard BPE inference rule), so token counts
and token streams are a pure function of (corpus, num_merges).

Determinism: pair-count ties break lexicographically, so the merge list
— and therefore every tokenization — is reproducible across runs,
partitionings, and engines. Not SQL-expressible (iterative merges), so
the golden is rows-only by design; correctness is pinned in
tests/test_bpe.py against an independently written reference
implementation and the worked example from the paper's corpus family.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word marker (the paper's `</w>`): lets merges distinguish
# word-final subwords, and makes detokenization unambiguous
EOW = "</w>"


def word_histogram(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, count) over whitespace-split tokens — the ONE full-corpus
    pass of BPE training; everything after runs on this small table."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    words = F.explode(F.split(F.trim(c), r"\s+")).alias("word")
    return (
        df.select(words)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def train_bpe_from_histogram(
    hist: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, freq) list: each round
    counts adjacent symbol pairs weighted by word frequency and merges
    the most frequent (ties broken lexicographically — determinism).
    Returns the ordered merge list."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in hist:
        if not word:
            continue
        vocab[tuple(word) + (EOW,)] = vocab.get(tuple(word) + (EOW,), 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # max count; lexicographically smallest pair on ties (determinism)
        pair, n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:  # nothing left worth merging
            break
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + freq
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Distributed word histogram → driver-side merge learning."""
    hist = [
        (r["word"], int(r["count"]))
        for r in word_histogram(df, text_col, lowercase).collect()
    ]
    hist.sort()  # layout-independent iteration order
    return train_bpe_from_histogram(hist, num_merges)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (standard inference)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_df(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_tokens, tokens array) per document — Arrow-batched; the
    merge-rank dict ships in the task closure (small: one entry per
    learned merge)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    rank_items = [(a, b, i) for (a, b), i in ranks.items()]
    lc = lowercase

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        rk = {(a, b): i for a, b, i in rank_items}
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, counts, toks = [], [], []
            for did, text in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                words = ((text or "").lower() if lc else (text or "")).split()
                out: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = bpe_encode_word(w, rk)
                        if len(cache) < 200_000:  # bound executor memory
                            cache[w] = enc
                    out.extend(enc)
                ids.append(did)
                counts.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": counts, "tokens": toks}
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_tokens long, tokens array<string>"
    )
