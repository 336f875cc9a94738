"""X41 count-min sketch + exact heavy hitters: frozen-spec parity vs an
independent Python reference, the overestimate guarantee, exact equality
of heavy_hitters vs the naive group-by under both hash functions and
adversarially tiny sketches, weighted counts, layout determinism, and
the map-side / no-UDF plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.sketch import (
    cms_estimate,
    cms_table,
    heavy_hitters,
    py_cms_table,
)

D, W = 4, 64  # tiny sketch so tests exercise real collisions


@pytest.fixture(scope="module")
def skewed(spark):
    # key k appears k times for k in 1..40 -> heavy tail is known exactly
    return (
        spark.range(1, 41)
        .select(F.explode(F.sequence(F.lit(1), F.col("id"))).alias("i"),
                F.col("id").alias("key"))
        .drop("i")
    )


def test_table_matches_python_reference(spark):
    keys = [1, 1, 1, 2, 7, 7, 999]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {
        (r["row_idx"], r["pos"]): r["count"]
        for r in cms_table(df, "key", d=D, w=W, hash="md5").collect()
    }
    assert got == py_cms_table(keys, d=D, w=W)


def test_weighted_table_matches_python_reference(spark):
    rows = [(1, 10), (1, 5), (2, 3), (9, None)]
    df = spark.createDataFrame(rows, "key long, wt int")
    got = {
        (r["row_idx"], r["pos"]): r["count"]
        for r in cms_table(df, "key", weight_col="wt", d=D, w=W, hash="md5").collect()
    }
    assert got == py_cms_table([(1, 10), (1, 5), (2, 3), (9, 0)], d=D, w=W)


@pytest.mark.parametrize("hash", ["md5", "xx"])
def test_estimate_never_underestimates(spark, skewed, hash):
    cms = cms_table(skewed, "key", d=D, w=W, hash=hash)
    est = cms_estimate(skewed.select("key").distinct(), cms, "key", d=D, w=W, hash=hash)
    rows = est.collect()
    assert len(rows) == 40
    for r in rows:
        assert r["cms_est"] >= r["key"]  # true count of key k is k


def test_estimate_exact_when_no_collisions(spark):
    # 5 keys in a 4096-wide sketch: collisions vanish, estimate == truth
    df = spark.createDataFrame([(k,) for k in [3, 3, 3, 8, 8] ], "key long")
    cms = cms_table(df, "key", d=D, w=4096)
    est = {r["key"]: r["cms_est"]
           for r in cms_estimate(df.distinct(), cms, "key", d=D, w=4096).collect()}
    assert est == {3: 3, 8: 2}


@pytest.mark.parametrize("hash", ["md5", "xx"])
@pytest.mark.parametrize("threshold", [1, 10, 25, 41])
def test_heavy_hitters_equals_naive(spark, skewed, hash, threshold):
    got = heavy_hitters(skewed, "key", threshold, d=D, w=W, hash=hash)
    ref = (
        skewed.groupBy("key").count().filter(F.col("count") >= threshold)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_heavy_hitters_weighted(spark):
    rows = [("a", 10), ("a", 10), ("b", 5), ("c", 30), ("c", None)]
    df = spark.createDataFrame(rows, "key string, wt int")
    got = heavy_hitters(df, "key", 20, weight_col="wt", d=D, w=W)
    assert sorted(map(tuple, got.collect())) == [("a", 20), ("c", 30)]


def test_prebuilt_cms_reuse(spark, skewed):
    cms = cms_table(skewed, "key", d=D, w=W).localCheckpoint()
    got = heavy_hitters(skewed, "key", 30, d=D, w=W, cms=cms)
    ref = heavy_hitters(skewed, "key", 30, d=D, w=W)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_repartition_determinism(spark, skewed):
    a = sorted(map(tuple, cms_table(skewed, "key", d=D, w=W).collect()))
    b = sorted(map(tuple, cms_table(skewed.repartition(7), "key", d=D, w=W).collect()))
    assert a == b


def test_empty_frame(spark, skewed):
    empty = skewed.filter(F.lit(False))
    assert cms_table(empty, "key", d=D, w=W).count() == 0
    assert heavy_hitters(empty, "key", 1, d=D, w=W).count() == 0


def test_estimate_plan_map_side_no_udf(spark, skewed):
    """The probe-side estimate must not shuffle the probe frame and must
    stay JVM-side: broadcast hash joins only."""
    cms = cms_table(skewed, "key", d=D, w=W).localCheckpoint()
    est = cms_estimate(skewed, cms, "key", d=D, w=W)
    plan = est._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_unknown_hash_rejected(spark, skewed):
    with pytest.raises(ValueError, match="unknown hash"):
        cms_table(skewed, "key", hash="sha9000").collect()
