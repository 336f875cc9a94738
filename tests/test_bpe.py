"""BPE tokenizer (r7, functions/bpe.py): merge learning vs an
independently written reference, the paper-family worked example,
encode/roundtrip properties, and the distributed histogram path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.bpe import (
    EOW,
    bpe_encode_df,
    bpe_encode_word,
    train_bpe,
    train_bpe_from_histogram,
    word_histogram,
)


def _reference_train(hist, num_merges):
    """Independently written BPE trainer (mirrors the PAPER's pseudocode,
    not the implementation under test): words as symbol lists, re-count
    every round, merge the (count-max, lexicographically-least) pair."""
    words = []
    for w, f in hist:
        if w:
            words.append(([*w, EOW], f))
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        for syms, _f in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def test_trainer_matches_independent_reference():
    hist = [
        ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
        ("lowest", 1), ("new", 2),
    ]
    for n in (1, 3, 8, 20):
        assert train_bpe_from_histogram(hist, n) == _reference_train(hist, n), n


def test_paper_family_worked_example():
    """The Sennrich corpus family: with {low:5, lowest:2, newer:6,
    wider:3}, the most frequent first pairs are within 'newer' (freq 6):
    first merge must come from its letters; and after enough merges each
    whole word becomes one token."""
    hist = [("low", 5), ("lowest", 2), ("newer", 6), ("wider", 3)]
    merges = train_bpe_from_histogram(hist, 50)
    # 'e','r' occurs in newer (6) + wider (3) = 9 — the clear first merge
    assert merges[0] == ("e", "r")
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("low", "newer", "wider"):
        assert bpe_encode_word(w, ranks) == [w + EOW], w


def test_encode_unknown_word_falls_back_to_chars():
    hist = [("aaa", 10)]
    merges = train_bpe_from_histogram(hist, 10)
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe_encode_word("zzz", ranks) == ["z", "z", "z", EOW]


def test_detokenization_roundtrip_property():
    hist = [("spark", 4), ("sparse", 3), ("parquet", 5), ("part", 2)]
    merges = train_bpe_from_histogram(hist, 30)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("spark", "sparse", "parquet", "part", "sparkle", "quetzal"):
        toks = bpe_encode_word(w, ranks)
        assert "".join(toks) == w + EOW  # tokens always reassemble exactly


def test_distributed_train_and_encode(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * (1 + i % 3)) for i in range(40)]
        + [(100 + i, "pack my box with five dozen jugs") for i in range(10)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, num_merges=30)
    # layout-independence: repartitioned input learns identical merges
    assert merges == train_bpe(docs.repartition(7), num_merges=30)
    enc = bpe_encode_df(docs, merges).collect()
    by_id = {r.doc_id: r for r in enc}
    assert len(by_id) == 50
    # token streams reassemble the lowercased text exactly
    r = by_id[0]
    assert "".join(r.tokens).replace(EOW, " ").strip() == "the quick brown fox"
    assert r.n_tokens == len(r.tokens)
    # high-frequency words compress to few tokens
    assert by_id[100].n_tokens < len("pack my box with five dozen jugs")


def test_histogram_is_one_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = (
        word_histogram(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1, plan
