"""Skew mitigation for heavy-hitter keys (SURVEY.md §4 scale posture).

AQE's skew-join handles most cases at runtime; these operators are the
explicit fallback for pipelines where a handful of keys dominate (the
classic 100 TB web-corpus shape: one host = 10% of rows) and for
deterministic plans where runtime re-splitting is unavailable (e.g.
streaming micro-batches).

Both are *semantics-preserving*: results equal the unsalted join/agg —
the golden harness hash-checks the salted plan against plain SQL.

- ``salted_join``: fact side gets a deterministic salt in [0, n_salt)
  from xxhash64 of its whole row-key; the dim side is replicated n_salt
  times; the join key becomes (key, salt), splitting each hot key's rows
  across n_salt reducers. Deterministic (no rand()) so retried tasks and
  oracle checks see identical rows.
- ``salted_agg``: two-phase aggregation — partial agg on (key, salt),
  final agg on key. Works for any algebraic aggregate (sum/count/min/
  max); pass the merge expressions explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salt: int, salt_from: list[str] | None) -> Column:
    cols = [F.col(c) for c in (salt_from or df.columns)]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salt)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join fact⋈dim on ``on`` with the hot-key rows of ``fact``
    spread over ``n_salt`` sub-keys. ``dim`` is replicated ``n_salt``×
    (keep it the small side). ``salt_from`` defaults to all fact columns —
    any stable per-row spread works; pass fewer columns to cut hash cost.

    Only fact-side-preserving joins are supported: with the dim side
    replicated, ``right``/``full`` would emit each unmatched dim row once
    per salt — silently wrong — so those reject."""
    allowed = {"inner", "left", "left_outer", "left_semi", "semi", "left_anti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; got {how!r} — "
            "the replicated dim side would duplicate unmatched dim rows "
            "n_salt times under right/full outer joins"
        )
    salted_fact = fact.withColumn("__salt", _salt_col(fact, n_salt, salt_from))
    # sequence of int literals yields array<int>: explode emits int directly
    # (a generator can't be nested inside cast)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salt: int = 8,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over skewed ``keys``: partial aggregate on
    (keys, salt), then merge on keys.

    ``partial_aggs`` run per (keys, salt) group and must alias their
    outputs; ``final_aggs`` merge those aliases (e.g. partial
    ``F.count('*').alias('c')`` merges with ``F.sum('c').alias('c')``).
    Spark's hash aggregation already does map-side partials — this helps
    when a single key overflows one reducer's final-merge partition."""
    salted = df.withColumn("__salt", _salt_col(df, n_salt, salt_from))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_agg_auto(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    threshold: int,
    n_salt: int = 8,
    salt_from: list[str] | None = None,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """MEASURED skew mitigation (the X41 composition): detect the hot
    keys with the count-min two-pass (`sketch.heavy_hitters` — exact,
    bounded state, no full-cardinality shuffle), then route ONLY their
    rows through the two-phase salted aggregate; the cold long tail
    aggregates single-phase, skipping the extra exchange
    ``salted_agg`` charges every key. Result == the plain
    ``groupBy(keys).agg(...)`` for any threshold/n_salt — threshold
    tunes cost, never answers (the golden hash-checks this against
    plain SQL).

    Single-key detection only (the CMS probes one column); pass a
    prebuilt ``hot_keys`` frame (one column = keys[0]) to skip
    detection — the sketch-once / aggregate-many shape, or multi-key
    detection the caller owns. The hot-key frame broadcasts (heavy
    hitters are few by definition: ≤ |df| / threshold)."""
    from oracle_vectorsearch_example_spark.operators.sketch import heavy_hitters

    if hot_keys is None:
        if len(keys) != 1:
            raise ValueError(
                "auto detection probes a single key column; pass hot_keys= "
                "for composite keys"
            )
        hot_keys = heavy_hitters(df, keys[0], threshold).select(keys[0])
    hot_keys = hot_keys.select(F.col(hot_keys.columns[0]).alias(keys[0]))
    hot = df.join(F.broadcast(hot_keys), on=keys[0], how="left_semi")
    cold = df.join(F.broadcast(hot_keys), on=keys[0], how="left_anti")
    hot_out = salted_agg(hot, keys, partial_aggs, final_aggs, n_salt, salt_from)
    # single-phase equivalent of a (partial, final) pair is the partial
    # aggregates alone: their aliases are the output columns and the
    # final merge of a one-member group is the identity for algebraic
    # aggregates (sum of one sum, min of one min). final_aggs must alias
    # to the SAME names (the salted_agg convention) — unionByName errors
    # loudly if not.
    cold_out = cold.groupBy(*keys).agg(*partial_aggs)
    return hot_out.unionByName(cold_out)
