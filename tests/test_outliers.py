"""X46 embedding outliers: planted corrupt rows flagged exactly, clean
clusters flag nothing, assignment tie-break, singleton clusters are
silent, numpy parity of the z-scores, layout determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.outliers import (
    assign_centers,
    embedding_outliers,
)

DIM = 6


@pytest.fixture(scope="module")
def planted(spark):
    """Two tight clusters of 40 rows each + 2 planted corrupt rows
    (ids 900, 901) far from everything."""
    rng = np.random.RandomState(5)
    rows = []
    c0 = np.zeros(DIM)
    c1 = np.ones(DIM) * 4.0
    for i in range(40):
        rows.append((i, (c0 + rng.randn(DIM) * 0.05).tolist()))
        rows.append((100 + i, (c1 + rng.randn(DIM) * 0.05).tolist()))
    rows.append((900, (c0 + 3.0).tolist()))   # corrupt near cluster 0
    rows.append((901, (c1 - 2.5).tolist()))   # corrupt near cluster 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers = spark.createDataFrame(
        [(0, c0.tolist()), (1, c1.tolist())],
        "center_id int, center array<double>",
    )
    return df, centers


def test_planted_outliers_flagged_exactly(spark, planted):
    df, centers = planted
    got = embedding_outliers(df, centers, z=3.0)
    assert sorted(r["vec_id"] for r in got.collect()) == [900, 901]
    for r in got.collect():
        assert r["zscore"] > 3.0


def test_noncanonical_path_matches(spark, planted):
    """canonical=False (distributive avg/sum-sq, no per-cluster
    collect_list buffer — the unbounded-cluster production path) flags
    the same rows with the same 6dp z-scores on a well-conditioned
    fixture."""
    df, centers = planted
    a = sorted(map(tuple, embedding_outliers(df, centers, z=3.0).collect()))
    b = sorted(
        map(tuple, embedding_outliers(df, centers, z=3.0, canonical=False).collect())
    )
    assert a == b


def test_clean_corpus_flags_nothing(spark, planted):
    df, centers = planted
    clean = df.filter(F.col("vec_id") < 900)
    assert embedding_outliers(clean, centers, z=4.0).count() == 0


def test_assignment_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    centers = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "center_id int, center array<double>"
    )
    a = {r["vec_id"]: r["cluster"] for r in assign_centers(df, centers).collect()}
    assert a[1] == 0 and a[2] == 1
    assert a[3] == 0  # exact distance tie -> smaller center id


def test_singleton_cluster_silent(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [9.0, 9.0])], "vec_id long, embedding array<double>"
    )
    centers = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [9.0, 9.0])], "center_id int, center array<double>"
    )
    assert embedding_outliers(df, centers, z=0.0).count() == 0


def test_zscore_matches_numpy(spark, planted):
    df, centers = planted
    a = assign_centers(df, centers)
    rows = a.filter(F.col("cluster") == 0).collect()
    d = np.array([r["dist"] for r in rows])
    mu = round(float(d.sum() / len(d)), 9)
    m2 = round(float((d * d).sum() / len(d)), 9)
    sigma = round(float(np.sqrt(max(m2 - mu * mu, 0.0))), 9)
    want = {
        r["vec_id"]: round((r["dist"] - mu) / sigma, 6) for r in rows
    }
    got = {
        r["vec_id"]: r["zscore"]
        for r in embedding_outliers(df, centers, z=-10.0).collect()
        if r["cluster"] == 0
    }
    for i, zv in got.items():
        assert abs(zv - want[i]) <= 1e-6, i


def test_layout_determinism(spark, planted):
    df, centers = planted
    a = sorted(map(tuple, embedding_outliers(df, centers, z=2.0).collect()))
    b = sorted(
        map(tuple, embedding_outliers(df.repartition(7), centers, z=2.0).collect())
    )
    assert a == b


# --------------------------------------------- D4 prototype pruning (X52)
def test_prototype_prune_exact_counts_and_shell(spark, planted):
    """floor(0.25 * 41) = 10 rows dropped per 41-row cluster, and the
    dropped rows are exactly the closest-to-center ones (the corrupt
    far rows always survive — pruning removes prototypes, not tails)."""
    from oracle_vectorsearch_example_spark.operators.outliers import (
        assign_centers,
        prototype_prune,
    )

    df, centers = planted
    kept = prototype_prune(df, centers, drop_frac=0.25)
    a = assign_centers(df, centers)
    sizes = {r["cluster"]: r["n"] for r in a.groupBy("cluster").count()
             .withColumnRenamed("count", "n").collect()}
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert len(kept_ids) == sum(n - int(0.25 * n) for n in sizes.values())
    # per cluster, the dropped set is the rank-prefix by (dist, id)
    rows = sorted(
        ((r["cluster"], r["dist"], r["vec_id"]) for r in a.collect())
    )
    by_c: dict[int, list] = {}
    for c, d, i in rows:
        by_c.setdefault(c, []).append(i)
    for c, ids in by_c.items():
        cut = int(0.25 * len(ids))
        assert all(i not in kept_ids for i in ids[:cut])
        assert all(i in kept_ids for i in ids[cut:])
    assert 900 in kept_ids and 901 in kept_ids  # far tail survives


def test_prototype_prune_zero_is_noop_and_bounds(spark, planted):
    from oracle_vectorsearch_example_spark.operators.outliers import (
        prototype_prune,
    )

    df, centers = planted
    assert prototype_prune(df, centers, drop_frac=0.0).count() == df.count()
    with pytest.raises(ValueError, match="drop_frac"):
        prototype_prune(df, centers, drop_frac=1.0)


def test_prototype_prune_layout_determinism(spark, planted):
    from oracle_vectorsearch_example_spark.operators.outliers import (
        prototype_prune,
    )

    df, centers = planted
    a = sorted(r["vec_id"] for r in prototype_prune(df, centers, 0.3).collect())
    b = sorted(
        r["vec_id"]
        for r in prototype_prune(df.repartition(9), centers, 0.3).collect()
    )
    assert a == b
