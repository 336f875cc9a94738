"""Text chunkers — the UTL_TO_CHUNKS analog (01_pdf_to_vector.sql:188-240).

The reference exercises ``by=words, max=100, overlap=10, split=sentence``
(:239) and documents ``by=characters`` (50–4000, :217-220) and custom
splits. Oracle's exact sentence/normalize behavior is unobservable from the
repo, so we freeze OUR specs (SURVEY.md §7 hard parts):

- ``chunk_by_words`` (the correctness-gated spec, DQ-20/36): tokenize on
  whitespace, emit fixed word windows with overlap. stride = max - overlap;
  chunk k covers words [k·stride, k·stride + max); number of chunks =
  max(1, ceil((n_words - overlap) / stride)), 0 for empty text. 1-based
  contiguous chunk ids; chunk_offset/chunk_length are char positions in the
  whitespace-normalized text (words joined by single spaces). Pure column
  expressions — the whole chunker is JVM-side codegen, no Python in the
  hot path, and it's a row-local generator: NO shuffle at any scale.
- ``chunk_by_chars``: fixed char windows with overlap, same id scheme.
- ``chunk_by_sentences_udf``: sentence-aware greedy packing (the
  split=sentence flavor) — needs a sequential fold per document, so it's an
  Arrow-batched scalar UDF (slow path by design, unit-tested not
  oracle-gated).

All return one row per chunk: input id columns + (chunk_id, chunk_offset,
chunk_length, chunk_text).

Reference knobs frozen to OUR specs (01_pdf_to_vector.sql:236-239):

- ``normalize=all`` → :func:`normalize_text`: typographic punctuation
  mapped to ASCII (curly quotes → ``'``/``"``, en/em dash and minus →
  ``-``, ellipsis → ``...``, NBSP → space) then whitespace runs collapsed
  to single spaces; ``whitespace`` / ``punctuation`` apply one half.
- ``language=korean`` (the reference README's corpus) → CJK-safe
  tokenization: each CJK codepoint (Hangul jamo+syllables, kana, CJK
  unified+ext-A) is one token, non-CJK runs split on whitespace — matching
  how subword tokenizers budget CJK text, where whitespace segmentation
  quietly degrades. ``chunk_text`` stays the token-joined normalized form,
  so CJK chunk text carries single spaces between codepoints (documented
  spec, not a bug).
- ``extended=true`` (32,767-byte chunk cap, :237) is intentionally NOT
  implemented: the cap exists because Oracle's non-extended VARCHAR2 is
  limited to 4,000 bytes; Spark strings have no such storage cap, and
  chunk size is already bounded by ``max_words``/``max_chars``. A byte cap
  would only re-introduce mid-word truncation.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def words_of(text: Column) -> Column:
    """Whitespace tokens with empties dropped (split-regex artifacts)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))


_VOCAB_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def vocab_tokens_of(text: Column) -> Column:
    """BPE-ish pre-tokenizer units (letters / digits / single punctuation)
    — the ``by=vocabulary`` proxy (01_pdf_to_vector.sql:222-225): chunk
    budgets count model-tokenizer units, not whitespace words."""
    return F.regexp_extract_all(text, F.lit(_VOCAB_TOKEN_RE), F.lit(0))


_PUNCT_FROM = "\u2018\u2019\u201c\u201d\u2013\u2014\u2212\u00a0"
_PUNCT_TO = "''\"\"--- "
_NORMALIZE_MODES = ("none", "whitespace", "punctuation", "all")


def normalize_text(text: Column, mode: str = "all") -> Column:
    """The ``normalize`` parameter analog (01_pdf_to_vector.sql:236).
    Frozen spec in the module docstring; pure column expressions."""
    if mode not in _NORMALIZE_MODES:
        raise ValueError(f"normalize must be one of {_NORMALIZE_MODES}; got {mode!r}")
    out = text
    if mode in ("punctuation", "all"):
        out = F.regexp_replace(
            F.translate(out, _PUNCT_FROM, _PUNCT_TO), "\u2026", "..."
        )
    if mode in ("whitespace", "all"):
        out = F.regexp_replace(F.trim(out), r"\s+", " ")
    return out


# Hangul jamo, kana, CJK ext-A, CJK unified, Hangul syllables
_CJK_RANGES = "\u1100-\u11ff\u3040-\u30ff\u3400-\u4dbf\u4e00-\u9fff\uac00-\ud7af"
_CJK_TOKEN_RE = f"[{_CJK_RANGES}]|[^\\s{_CJK_RANGES}]+"
_CJK_LANGS = frozenset({"korean", "chinese", "japanese", "cjk"})


def cjk_tokens_of(text: Column) -> Column:
    """CJK-safe tokens: one token per CJK codepoint, whitespace-delimited
    runs otherwise (``language`` spec in the module docstring)."""
    return F.regexp_extract_all(text, F.lit(_CJK_TOKEN_RE), F.lit(0))


def chunk_by_words(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    max_words: int = 100,
    overlap: int = 10,
    tokenizer: str = "whitespace",
    normalize: str = "none",
    language: str = "english",
) -> DataFrame:
    """Word-window chunker (D2 exercised config: max=100/overlap=10,
    01_pdf_to_vector.sql:239). See module docstring for the frozen spec.

    ``tokenizer="whitespace"`` is ``by=words``; ``tokenizer="vocabulary"``
    counts BPE-ish units instead (``by=vocabulary``, :222-225) — same
    window/overlap/id scheme, token joins normalize to single spaces.
    ``normalize`` applies :func:`normalize_text` before tokenizing;
    ``language`` in {korean, chinese, japanese, cjk} switches the
    whitespace tokenizer to :func:`cjk_tokens_of` (the vocabulary
    tokenizer already emits single non-alnum codepoints, CJK included)."""
    if overlap >= max_words:
        raise ValueError("overlap must be < max_words")
    if language != "english" and language not in _CJK_LANGS:
        raise ValueError(
            f"language must be 'english' or one of {sorted(_CJK_LANGS)}; got {language!r}"
        )
    id_cols = id_cols or ["doc_id"]
    stride = max_words - overlap

    txt = normalize_text(F.col(text_col), normalize)
    if tokenizer == "whitespace":
        w = cjk_tokens_of(txt) if language in _CJK_LANGS else words_of(txt)
    elif tokenizer == "vocabulary":
        w = vocab_tokens_of(txt)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}; whitespace or vocabulary")
    base = df.select(*id_cols, w.alias("__words"))
    n = F.size(F.col("__words"))
    # integer ceil((n-overlap)/stride); 0 chunks for empty or NULL text
    # (size(NULL) is NULL: `<= 0` alone would fall through to the
    # otherwise-branch, where greatest(1, NULL) fabricates one chunk)
    n_chunks = F.when(n.isNull() | (n <= 0), F.lit(0)).otherwise(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(size(__words) - {overlap} + {stride} - 1) div {stride}"),
        )
    )
    base = base.withColumn("__n_chunks", n_chunks)
    k = F.col("k")
    start = k * stride  # 0-based word index of chunk start
    chunk_words = F.slice(F.col("__words"), start + 1, max_words)
    # char offset in the normalized text: lengths of preceding words + spaces
    offset = (
        F.aggregate(
            F.slice(F.col("__words"), 1, start),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x),
        )
        + start.cast("long")
    )
    chunk_text = F.array_join(chunk_words, " ")

    return (
        base.filter(F.col("__n_chunks") > 0)
        .select(
            *id_cols,
            "__words",
            F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias("k"),
        )
        .select(
            *id_cols,
            (k + 1).cast("int").alias("chunk_id"),
            offset.alias("chunk_offset"),
            F.length(chunk_text).cast("int").alias("chunk_length"),
            chunk_text.alias("chunk_text"),
        )
    )


def chunk_by_chars(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    max_chars: int = 1000,
    overlap_chars: int = 100,
) -> DataFrame:
    """Character-window chunker (documented alternative ``by=characters``,
    bounds 50–4000, 01_pdf_to_vector.sql:217-220). Offsets into the raw
    (untrimmed) text; same id scheme as chunk_by_words."""
    if not (1 <= max_chars):
        raise ValueError("max_chars must be >= 1")
    if overlap_chars >= max_chars:
        raise ValueError("overlap_chars must be < max_chars")
    id_cols = id_cols or ["doc_id"]
    stride = max_chars - overlap_chars

    n = F.length(F.col(text_col))  # NULL for NULL text, see word chunker
    n_chunks = F.when(n.isNull() | (n <= 0), F.lit(0)).otherwise(
        F.greatest(
            F.lit(1),
            F.expr(f"(length({text_col}) - {overlap_chars} + {stride} - 1) div {stride}"),
        )
    )
    k = F.col("k")
    start = k * stride
    chunk_text = F.substring(F.col(text_col), start + 1, max_chars)
    return (
        df.withColumn("__n_chunks", n_chunks)
        .filter(F.col("__n_chunks") > 0)
        .select(
            *id_cols,
            text_col,
            F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias("k"),
        )
        .select(
            *id_cols,
            (k + 1).cast("int").alias("chunk_id"),
            start.cast("long").alias("chunk_offset"),
            F.length(chunk_text).cast("int").alias("chunk_length"),
            chunk_text.alias("chunk_text"),
        )
    )


_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


def _pack_sentences(
    text: str,
    max_words: int,
    overlap: int,
    split_re: "re.Pattern[str]" = _SENTENCE_RE,
) -> list[tuple[int, int, int, str]]:
    """Greedy segment packing: accumulate whole segments (sentences by
    default, or any ``split_re`` delimitation) up to max_words; a segment
    longer than max_words is split at word boundaries; each new chunk
    carries the previous chunk's last ``overlap`` words. Offsets are
    word indices into the whitespace token stream."""
    words: list[str] = []
    sent_bounds: list[int] = []  # word index where each segment starts
    for sent in split_re.split(text.strip()):
        toks = sent.split()
        if toks:
            sent_bounds.append(len(words))
            words.extend(toks)
    if not words:
        return []
    chunks: list[tuple[int, int, int, str]] = []
    cur: list[str] = []
    cid = 1

    def flush() -> None:
        nonlocal cur, cid
        if cur:
            txt = " ".join(cur)
            chunks.append((cid, 0, len(txt), txt))
            cid += 1
            cur = cur[-overlap:] if overlap else []

    bounds = set(sent_bounds)
    i = 0
    while i < len(words):
        # flush when adding the next whole sentence would overflow
        j = i + 1
        while j < len(words) and j not in bounds:
            j += 1
        sent_len = j - i
        if cur and len(cur) + sent_len > max_words:
            flush()
        if sent_len > max_words:  # giant sentence: hard word split
            while i < j:
                take = min(max_words - len(cur), j - i)
                cur.extend(words[i : i + take])
                i += take
                if len(cur) >= max_words:
                    flush()
        else:
            cur.extend(words[i:j])
            i = j
            if len(cur) >= max_words:
                flush()
    if cur and (not chunks or len(cur) > (overlap if overlap else 0)):
        txt = " ".join(cur)
        chunks.append((cid, 0, len(txt), txt))
    # recompute offsets over the normalized text
    out: list[tuple[int, int, int, str]] = []
    pos = 0
    norm = " ".join(words)
    for cid_, _, ln, txt in chunks:
        off = norm.find(txt.split(" ", 1)[0], pos) if txt else 0
        out.append((cid_, off, ln, txt))
        pos = off
    return out


def chunk_by_sentences_udf(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    max_words: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """Sentence-aware greedy chunker (split=sentence flavor,
    01_pdf_to_vector.sql:227-239) as an Arrow-batched scalar UDF returning
    array<struct> + ``inline`` — the lateral-table-function shape (J1)."""
    id_cols = id_cols or ["doc_id"]
    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("chunk_id", T.IntegerType()),
                T.StructField("chunk_offset", T.LongType()),
                T.StructField("chunk_length", T.IntegerType()),
                T.StructField("chunk_text", T.StringType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                {
                    "chunk_id": cid,
                    "chunk_offset": off,
                    "chunk_length": ln,
                    "chunk_text": txt,
                }
                for cid, off, ln, txt in _pack_sentences(t or "", max_words, overlap)
            ]
        )

    return df.select(*id_cols, F.inline(_chunk(F.col(text_col))))


def chunk_by_custom_udf(
    df: DataFrame,
    separators: list[str],
    text_col: str = "text",
    id_cols: list[str] | None = None,
    max_words: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """``split=custom`` with a custom separator list
    (01_pdf_to_vector.sql:231-233): segments are delimited by any literal
    separator (e.g. ``["\\n\\n", "<p>"]``), then greedy-packed to
    ``max_words`` with the same overlap/id scheme as the sentence chunker."""
    if not separators:
        raise ValueError("separators must be non-empty")
    if any(s == "" for s in separators):
        # re.escape('') contributes an empty alternation branch, degrading
        # the split to per-character segmentation
        raise ValueError("separators must not contain empty strings")
    id_cols = id_cols or ["doc_id"]
    split_re = re.compile("|".join(re.escape(s) for s in separators))
    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("chunk_id", T.IntegerType()),
                T.StructField("chunk_offset", T.LongType()),
                T.StructField("chunk_length", T.IntegerType()),
                T.StructField("chunk_text", T.StringType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                {
                    "chunk_id": cid,
                    "chunk_offset": off,
                    "chunk_length": ln,
                    "chunk_text": txt,
                }
                for cid, off, ln, txt in _pack_sentences(
                    t or "", max_words, overlap, split_re
                )
            ]
        )

    return df.select(*id_cols, F.inline(_chunk(F.col(text_col))))


def semantic_chunks(
    docs: DataFrame,
    dim: int = 64,
    threshold: float = 0.15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Semantic chunking — split where adjacent-sentence embedding
    similarity DROPS, instead of at fixed word counts (the modern RAG
    splitter; UTL_TO_CHUNKS' BY WORDS/CHARS modes above are the
    reference's spec, this is its embedding-aware sibling).

    Frozen spec (engine-replayable end to end):

    - sentence units: ``regexp_extract_all(text, '[^.!?]+[.!?]*')``
      (RE2-safe — no lookbehind), trimmed, empties dropped; unit order
      is the extraction order;
    - each sentence embeds with the deterministic hashing embedder
      (:func:`~.embedding.hashing_embedding` — lowercase whitespace
      tokens, md5-byte bucket mod ``dim``, L2 norm; the same spec the
      ``embed_double`` oracle replays);
    - boundary BEFORE sentence i iff round(cos(e_{i-1}, e_i), 6) <
      ``threshold`` (zero-norm sentences give cos 0 → boundary);
      the first sentence never opens a boundary;
    - chunk_id = running count of boundaries; chunk text = its
      sentences joined by single spaces.

    Plan: one posexplode, the embed pandas-UDF (the engine's designated
    Python boundary), two windows partitioned by doc (lag + running
    sum), one groupBy (doc, chunk) with the order-canonicalized
    reassembly — every shuffle keys on doc_id. Swap the embedder for
    OnnxEmbedder output upstream when real semantics (not a
    deterministic double) are wanted; the boundary/chunk logic is
    embedder-agnostic.
    """
    from oracle_vectorsearch_example_spark.functions.embedding import (
        hashing_embedding,
    )

    sents = (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.expr(f"regexp_extract_all({text_col}, '[^.!?]+[.!?]*', 0)")
            ).alias("sidx", "__raw"),
        )
        .select(id_col, "sidx", F.trim("__raw").alias("sent"))
        .filter(F.col("sent") != "")
    )
    emb = sents.withColumn("__e", hashing_embedding(F.col("sent"), dim))
    w = Window.partitionBy(id_col).orderBy("sidx")
    lagged = emb.withColumn("__p", F.lag("__e").over(w))
    # both vectors are L2-normalized, so the index-ordered zip_with fold
    # IS the cosine (canonical operand order — layout-independent)
    dot = F.aggregate(
        F.zip_with(F.col("__p"), F.col("__e"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    flagged = lagged.withColumn(
        "__b",
        F.when(F.col("__p").isNull(), F.lit(0))
        .when(F.round(dot, 6) < F.lit(threshold), F.lit(1))
        .otherwise(F.lit(0)),
    )
    wsum = (
        Window.partitionBy(id_col)
        .orderBy("sidx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = flagged.withColumn(
        "chunk_id", F.sum("__b").over(wsum).cast("long")
    )
    return (
        assigned.groupBy(id_col, "chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(sidx, sent))), "
                    "p -> p.sent)"
                ),
            ).alias("chunk_text"),
            F.count("*").cast("long").alias("n_sentences"),
        )
    )
