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
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def words_of(text: Column) -> Column:
    """Whitespace tokens with empties dropped (split-regex artifacts)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != F.lit(""))


def chunk_by_words(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    max_words: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """Word-window chunker (D2 exercised config: max=100/overlap=10,
    01_pdf_to_vector.sql:239). See module docstring for the frozen spec."""
    if overlap >= max_words:
        raise ValueError("overlap must be < max_words")
    id_cols = id_cols or ["doc_id"]
    stride = max_words - overlap

    w = words_of(F.col(text_col))
    base = df.select(*id_cols, w.alias("__words"))
    n = F.size(F.col("__words"))
    # integer ceil((n-overlap)/stride); 0 chunks for empty text
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
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

    n = F.length(F.col(text_col))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
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


def _pack_sentences(text: str, max_words: int, overlap: int) -> list[tuple[int, int, int, str]]:
    """Greedy sentence packing: accumulate whole sentences up to max_words;
    a sentence longer than max_words is split at word boundaries; each new
    chunk carries the previous chunk's last ``overlap`` words. Offsets are
    word indices into the whitespace token stream."""
    words: list[str] = []
    sent_bounds: list[int] = []  # word index where each sentence starts
    for sent in _SENTENCE_RE.split(text.strip()):
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
