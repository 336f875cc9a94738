"""Corpus scrubbing: PII redaction + global boilerplate-line removal —
the two cleanup passes every public LLM-corpus recipe runs between dedup
and quality gating (C4 strips boilerplate lines; published pipelines
redact emails/phones/IPs before release).

Scale shapes:

- :func:`redact_pii` is a chain of ``regexp_replace`` COLUMN expressions
  — JVM-side, whole-stage-codegen, zero shuffle, linear scan. Patterns
  avoid lookaround/backrefs so Java regex (Spark) and RE2 (DuckDB
  oracle) agree byte-for-byte.
- :func:`remove_boilerplate_lines` is the C4-style global rule: a line
  appearing in ≥ ``min_docs`` DISTINCT documents is boilerplate
  ("Subscribe to our newsletter", copyright footers) and is dropped from
  every document. Plan: ``posexplode`` lines (map-side) → one shuffle to
  count distinct docs per line → anti-join lines against the frequent
  set (second shuffle, or broadcast when the frequent set is small — it
  is bounded by total_lines / min_docs) → re-assemble per doc via
  sort-by-position aggregation (third shuffle, keyed by doc id). Line
  ORDER and blank lines are preserved; only frequent non-empty lines
  vanish. Document payloads cross the wire once (the reassembly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex/RE2-compatible patterns (no lookaround, no backreferences).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace each PII match with its ``<KIND>`` token. Application
    order is the declaration order of ``PII_PATTERNS`` (email before
    phone/IP so an address never half-matches as digits)."""
    out = text
    for kind in kinds or tuple(PII_PATTERNS):
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_pii_df(
    df: DataFrame, text_col: str = "text", kinds: tuple[str, ...] | None = None
) -> DataFrame:
    return df.withColumn(text_col, redact_pii(F.col(text_col), kinds))


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 10,
) -> DataFrame:
    """The frequent-line set: ``(line, n_docs)`` for every non-empty line
    occurring in ≥ ``min_docs`` distinct documents."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    return (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.countDistinct(id_col).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 10,
) -> DataFrame:
    """Drop every line of the :func:`boilerplate_lines` set from every
    document, preserving remaining line order (and blank lines). Columns
    other than ``text_col`` pass through unchanged."""
    freq = boilerplate_lines(df, text_col, id_col, min_docs)
    exploded = df.select(
        F.col(id_col).alias("__bid"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    kept = exploded.join(
        freq.select(F.col("line").alias("__line")), "__line", "left_anti"
    )
    rebuilt = kept.groupBy("__bid").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
        ).alias("__text")
    )
    # docs whose every line was boilerplate re-enter as empty text via the
    # left join + coalesce (groupBy of zero kept rows yields no row)
    return (
        df.join(rebuilt, df[id_col] == rebuilt["__bid"], "left")
        .withColumn(text_col, F.coalesce(F.col("__text"), F.lit("")))
        .drop("__bid", "__text")
    )
