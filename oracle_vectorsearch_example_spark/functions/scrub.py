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


def c4_clean_df(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: list[str] | None = None,
    out_col: str = "text",
):
    """The C4 cleaning rules (Raffel et al. 2020 §2.2 — the NAMED
    line+page rule set behind the Colossal Clean Crawled Corpus;
    distinct from :func:`remove_boilerplate_lines`, which is
    frequency-based across documents — C4's rules are local):

    line level (a line survives iff ALL hold):
    - ends with a terminal punctuation mark ('.', '!', '?', '\"')
      after right-trim;
    - contains at least ``min_words_per_line`` words;
    - does not contain the word 'javascript' (case-insensitive).

    page level (``c4_keep`` is true iff ALL hold on the KEPT text):
    - at least ``min_sentences`` sentences (frozen proxy: occurrences
      of [.!?] in the kept text);
    - no 'lorem ipsum' (case-insensitive);
    - no curly brace '{' (the code-page tell);
    - no token from ``bad_words`` (lowercased whitespace-token match;
      C4 uses a public blocklist — pass your own, default none).

    Returns df with ``out_col`` rewritten to the kept lines joined by
    newline, plus ``n_lines_kept``, ``n_sentences``, ``c4_keep``.
    Dropping non-keep pages is the caller's one extra filter (kept
    explicit so audits can count what WOULD drop). Pure column
    expressions, map-side, no shuffle, no UDF.

    Filtering on ``c4_keep`` must go through
    :func:`~.textstats.barrier_filter` — a plain ``.filter`` lets
    predicate pushdown re-inline the staged line transforms into
    every HOF lambda (r11).
    """
    t = F.col(text_col)
    term = ("." , "!", "?", '"')
    kept_lines = F.filter(
        F.split(t, "\n"),
        lambda l: (
            F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))
            >= min_words_per_line
        )
        & ~F.lower(l).contains("javascript")
        & (
            F.rtrim(l).endswith(term[0])
            | F.rtrim(l).endswith(term[1])
            | F.rtrim(l).endswith(term[2])
            | F.rtrim(l).endswith(term[3])
        ),
    )
    staged = df.withColumn("__c4_kept", kept_lines)
    return (
        staged.withColumn("n_lines_kept", F.size("__c4_kept").cast("long"))
        .withColumn(out_col, F.array_join(F.col("__c4_kept"), "\n"))
        .withColumn(
            "n_sentences",
            F.size(
                F.regexp_extract_all(
                    F.col(out_col), F.lit(r"[.!?]"), F.lit(0)
                )
            ).cast("long"),
        )
        .withColumn(
            "c4_keep",
            (F.col("n_sentences") >= min_sentences)
            & ~F.lower(F.col(out_col)).contains("lorem ipsum")
            & ~F.col(out_col).contains("{")
            & (
                F.lit(True)
                if not bad_words
                else F.size(
                    F.array_intersect(
                        F.array_distinct(
                            F.filter(
                                F.split(F.lower(F.col(out_col)), r"\s+"),
                                lambda w: w != F.lit(""),
                            )
                        ),
                        F.array(*[F.lit(w.lower()) for w in bad_words]),
                    )
                )
                == 0
            ),
        )
        .drop("__c4_kept")
    )
