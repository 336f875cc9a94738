"""UTL_TO_SUMMARY (X26) — extractive document summarization, Spark-first.

The reference drives DBMS_VECTOR_CHAIN's UTL_TO_TEXT → UTL_TO_CHUNKS →
UTL_TO_EMBEDDINGS pipeline (01_pdf_to_vector.sql:186-205); the same
package ships UTL_TO_SUMMARY for the sibling "summarize the document"
step. This is that step re-expressed as a distributed Luhn-style
extractive summarizer (Luhn 1958, "The Automatic Creation of Literature
Abstracts"): pick the sentences whose significant-word frequency mass is
highest, emit them in document order.

Frozen scoring spec (everything integer — no FP discipline needed, the
scores are exactly reproducible by any engine):

1. Split the document into units (sentences) — two modes:
   - ``mode="sentence"``: split on ``(?<=[.!?])\\s+`` (Java-regex
     lookbehind; the real-world path for punctuated text).
   - ``mode="fixed"``: consecutive n-word groups via
     ``regexp_extract_all(text, '(?:\\S+\\s+){n-1}\\S+')`` — RE2-safe
     (no lookbehind), which is what makes the golden's DuckDB oracle
     able to replicate the split bit-for-bit; the natural mode for
     unpunctuated corpora. A trailing group shorter than n words is
     dropped (a deliberate part of the frozen spec).
2. Tokens of a unit: ``regexp_extract_all(lower(unit), '[a-z0-9]+')``,
   keep length >= 3 and not in the repo-wide marker stoplist
   (textstats.EN_MARKERS + ES_MARKERS — the same tiny list the quality
   gate uses).
3. Per-document term frequency over ALL kept tokens of the document.
4. Unit score = sum of freq(token) over the unit's kept tokens (token
   multiplicity counts — a word repeated in the unit contributes its
   document frequency each time). Pure BIGINT.
5. Top ``max_units`` units per document by (score DESC, unit_idx ASC);
   a unit with zero kept tokens never competes.

Distribution: posexplode → explode → two groupBys and one join, every
shuffle key containing doc_id — per-document work, arbitrary corpus
parallelism, no global state, no UDFs (the whole thing is JVM regex +
hash aggregation inside whole-stage codegen). At 100 TB this is the
same plan family as BM25 indexing (operators/bm25.py) with doc_id
prepended to every key, so no skew beyond document size itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import EN_MARKERS, ES_MARKERS

STOPWORDS = tuple(EN_MARKERS + ES_MARKERS)
_TOKEN_RE = "[a-z0-9]+"
_SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+"


def _unit_expr(text_col: str, mode: str, n_words: int):
    if mode == "sentence":
        return F.split(F.col(text_col), _SENTENCE_SPLIT_RE)
    if mode == "fixed":
        if n_words < 1:
            raise ValueError(f"n_words must be >= 1, got {n_words}")
        pat = rf"(?:\S+\s+){{{n_words - 1}}}\S+"
        return F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
    raise ValueError(f"mode must be 'sentence' or 'fixed', got {mode!r}")


def split_units(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "fixed",
    n_words: int = 12,
) -> DataFrame:
    """(id, unit_idx, unit): the document split into scoring units.
    unit_idx is 0-based document order."""
    return df.select(
        F.col(id_col),
        F.posexplode(_unit_expr(text_col, mode, n_words)).alias(
            "unit_idx", "unit"
        ),
    ).withColumn("unit_idx", F.col("unit_idx").cast("long"))


def score_units(
    units: DataFrame,
    id_col: str = "doc_id",
    min_token_len: int = 3,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """(id, unit_idx, unit, score): the frozen integer Luhn score per
    unit. Units with zero kept tokens are absent (they never compete)."""
    stop = F.array(*[F.lit(s) for s in stopwords])
    toks = F.filter(
        F.regexp_extract_all(F.lower(F.col("unit")), F.lit(_TOKEN_RE), F.lit(0)),
        lambda t: (F.length(t) >= min_token_len) & ~F.array_contains(stop, t),
    )
    words = units.select(
        id_col, "unit_idx", F.explode(toks).alias("w")
    )
    freq = words.groupBy(id_col, "w").agg(F.count("*").alias("f"))
    scored = (
        words.join(freq, [id_col, "w"])
        .groupBy(id_col, "unit_idx")
        .agg(F.sum("f").alias("score"))
    )
    return scored.join(units, [id_col, "unit_idx"]).select(
        id_col, "unit_idx", "unit", "score"
    )


def utl_to_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_units: int = 3,
    mode: str = "fixed",
    n_words: int = 12,
    min_token_len: int = 3,
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """(id, unit_idx, unit, score, rank): the top ``max_units``
    highest-scoring units per document, rank 1 = best. Deterministic:
    integer scores, ties broken by document order."""
    scored = score_units(
        split_units(df, id_col, text_col, mode, n_words),
        id_col,
        min_token_len,
        stopwords,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("unit_idx")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= max_units)
        .select(id_col, "unit_idx", "unit", "score", "rank")
    )


def summarize_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_units: int = 3,
    **kwargs,
) -> DataFrame:
    """(id, summary): the selected units re-joined in document order —
    the UTL_TO_SUMMARY scalar shape (one summary string per document)."""
    top = utl_to_summary(df, id_col, text_col, max_units, **kwargs)
    return (
        top.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("unit_idx", "unit"))),
                    lambda s: s["unit"],
                ),
                " ",
            ).alias("summary")
        )
    )
