"""Fuzzy string matching — blocked edit-distance joins for entity
resolution / record linkage (the field-level sibling of the document
near-dup family in operators/dedup.py: names, titles, product codes).

All-pairs Levenshtein is O(n²) and unshippable at scale; the blocker
here is the SYMMETRIC DELETE scheme (SymSpell, Garbe 2012 — public
algorithm): every string expands to its deletion neighborhood (all
strings obtainable by deleting up to ``max_dist`` characters, itself
included). Two strings within Levenshtein distance d ≤ 2 always share
at least one common deletion variant (substitution = one deletion on
each side; insertion/deletion = deletions on the longer side), so an
equi-join on variants proposes a complete candidate set — candidates
then VERIFY with the exact JVM ``levenshtein`` and false positives
drop. Completeness is not taken on faith: the golden's DuckDB oracle
computes the exhaustive all-pairs answer and the hash must match, and
tests compare against a brute-force reference.

Plan shape: variant explode (map-side, ≤ Σ C(len,≤d) rows per string —
a FIELD-level operator: lengths are capped loudly in-plan, long text
belongs in minhash), one shuffle on the variant key, distinct candidate
pairs, one verify filter. Everything is JVM expressions — variant
generation is a nested ``transform``/``flatten`` over character
positions, the verify is the built-in ``levenshtein``; no UDFs, no
driver-side actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FIELD_LEN = 64


def _del_one(c: str) -> str:
    """SQL for all single-character deletions of string expression c."""
    return (
        f"transform(sequence(1, length({c})), i -> "
        f"concat(substring({c}, 1, i - 1), "
        f"substring({c}, i + 1, length({c}) - i)))"
    )


def _variant_frame(
    df: DataFrame, id_col: str, str_col: str, max_dist: int
) -> DataFrame:
    """(id, __s, __variant) rows — the blocked index side. The length
    guard is IN-PLAN (``raise_error``): the first over-long value fails
    the job loudly instead of silently exploding O(len²) variants."""
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    checked = df.select(
        F.col(id_col),
        F.when(
            F.length(F.col(str_col)) <= MAX_FIELD_LEN,
            F.col(str_col).cast("string"),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fuzzy_*: value in {str_col!r} exceeds "
                        f"{MAX_FIELD_LEN} chars — field-level operator; "
                        "use minhash_lsh_pairs for long text: "
                    ),
                    F.col(str_col),
                )
            )
        )
        .alias("__s"),
    )
    pieces = ["array(__s)", _del_one("__s")]
    if max_dist == 2:
        pieces.append(
            f"flatten(transform({_del_one('__s')}, v -> {_del_one('v')}))"
        )
    arr = f"array_distinct(concat({', '.join(pieces)}))"
    return checked.select(
        F.col(id_col), F.col("__s"), F.explode(F.expr(arr)).alias("__variant")
    )


def fuzzy_self_candidates(
    df: DataFrame,
    str_col: str,
    id_col: str = "doc_id",
    max_dist: int = 1,
) -> DataFrame:
    """The blocker's output before verification: distinct (id_a, id_b,
    __sa, __sb) candidate pairs (id_a < id_b) sharing a deletion
    variant. Public so scale witnesses can measure the blocked
    candidate fraction (|candidates| / C(n,2)) — the selectivity claim
    the whole scheme rests on — separately from verify cost."""
    v = _variant_frame(df, id_col, str_col, max_dist)
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("__s").alias("__sa"), "__variant"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("__s").alias("__sb"), "__variant"
    )
    return (
        a.join(b, "__variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
    )


def fuzzy_self_pairs(
    df: DataFrame,
    str_col: str,
    id_col: str = "doc_id",
    max_dist: int = 1,
) -> DataFrame:
    """(id_a, id_b, dist) for all pairs with Levenshtein distance ≤
    ``max_dist`` (id_a < id_b). Deletion-neighborhood blocking proposes,
    exact ``levenshtein`` verifies."""
    cand = fuzzy_self_candidates(df, str_col, id_col, max_dist)
    return (
        cand.withColumn("dist", F.levenshtein("__sa", "__sb").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
) -> DataFrame:
    """(<left_id>_l, <right_id>_r, dist) linking rows whose string fields
    are within ``max_dist`` edits — the record-linkage join. Same
    propose/verify shape as :func:`fuzzy_self_pairs`."""
    lv = _variant_frame(left, left_id, left_col, max_dist).select(
        F.col(left_id).alias("__lid"), F.col("__s").alias("__ls"), "__variant"
    )
    rv = _variant_frame(right, right_id, right_col, max_dist).select(
        F.col(right_id).alias("__rid"), F.col("__s").alias("__rs"), "__variant"
    )
    cand = (
        lv.join(rv, "__variant")
        .select("__lid", "__rid", "__ls", "__rs")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("__ls", "__rs").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("__lid").alias(f"{left_id}_l"),
            F.col("__rid").alias(f"{right_id}_r"),
            "dist",
        )
    )
