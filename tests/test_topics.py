"""X56 c-TF-IDF cluster topics — hand-computed scores, determinism,
composition with the center-assignment machinery."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.topics import ctfidf_terms


def test_hand_computed_scores(spark):
    """Two clusters with one shared and one exclusive term each: the
    exclusive term outranks the shared one (shared f_t halves the IDF
    boost), scores match the formula exactly."""
    docs = spark.createDataFrame(
        [
            (1, "apple apple shared"),
            (2, "apple shared"),
            (3, "banana banana shared"),
            (4, "banana shared"),
        ],
        "doc_id long, text string",
    )
    assign = docs.select(
        "doc_id", (F.col("doc_id") <= 2).cast("int").alias("cluster")
    )
    out = {
        (r.cluster, r.term): (r.rank, r.tf, r.score)
        for r in ctfidf_terms(docs, assign, top_k=5).collect()
    }
    # events: apple 3 (cluster 1), banana 3 (cluster 0), shared 2+2
    # A = 10 / 2 = 5
    a_apple = round(3 * math.log(1 + 5 / 3), 6)
    a_shared = round(2 * math.log(1 + 5 / 4), 6)
    assert out[(1, "apple")] == (1, 3, pytest.approx(a_apple))
    assert out[(1, "shared")] == (2, 2, pytest.approx(a_shared))
    assert out[(0, "banana")] == (1, 3, pytest.approx(a_apple))
    assert out[(0, "shared")] == (2, 2, pytest.approx(a_shared))


def test_top_k_bound_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    assign = docs.select("doc_id", F.lit(0).alias("cluster"))
    assert ctfidf_terms(docs, assign, top_k=3).count() == 3
    with pytest.raises(ValueError, match="top_k"):
        ctfidf_terms(docs, assign, top_k=0)


def test_layout_determinism(spark):
    rows = [(i, f"w{i % 7} w{i % 5} common word{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assign = docs.select("doc_id", (F.col("doc_id") % 3).alias("cluster"))
    a = sorted(map(tuple, ctfidf_terms(docs, assign).collect()))
    b = sorted(
        map(tuple, ctfidf_terms(docs.repartition(7), assign).collect())
    )
    assert a == b


def test_composes_with_assign_centers(spark):
    """The intended pipeline: cluster embeddings (assign_centers), then
    label each cluster with its c-TF-IDF terms."""
    from oracle_vectorsearch_example_spark.operators.outliers import (
        assign_centers,
    )

    rows = []
    for i in range(12):
        if i % 2 == 0:
            rows.append((i, [1.0, 0.0], f"sports game team score{i}"))
        else:
            rows.append((i, [0.0, 1.0], f"market stock price trade{i}"))
    docs = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>, text string"
    )
    centers = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "center_id long, center array<double>"
    )
    assign = assign_centers(
        docs, centers, id_col="doc_id", vec_col="embedding"
    ).select("doc_id", "cluster")
    top = ctfidf_terms(docs, assign, top_k=3)
    terms = {
        r.cluster: set()
        for r in top.select("cluster").distinct().collect()
    }
    for r in top.collect():
        terms[r.cluster].add(r.term)
    by_sports = [c for c, t in terms.items() if "sports" in t]
    by_market = [c for c, t in terms.items() if "market" in t]
    assert len(by_sports) == 1 and len(by_market) == 1
    assert by_sports != by_market


def test_no_python_udf_no_cartesian(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assign = docs.select("doc_id", F.lit(0).alias("cluster"))
    plan = (
        ctfidf_terms(docs, assign)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_topic_stats_hand_computed(spark):
    """The curator report (r10): counts/tokens exact, label in rank
    order, mean metric = scaled-integer mean matching a python
    reference computed doc-by-doc."""
    from oracle_vectorsearch_example_spark.operators.topics import topic_stats

    docs = spark.createDataFrame(
        [
            (1, "apple apple shared", 0.25),
            (2, "apple shared", 0.75),
            (3, "banana banana shared", 0.5),
            (4, "banana shared", 0.1),
        ],
        "doc_id long, text string, q double",
    )
    assign = docs.select(
        "doc_id", (F.col("doc_id") <= 2).cast("int").alias("cluster")
    )
    got = {
        r.cluster: r
        for r in topic_stats(
            docs, assign, top_k=2, metric_cols=("q",)
        ).collect()
    }
    assert got[1].n_docs == 2 and got[1].n_tokens == 5
    assert got[0].n_docs == 2 and got[0].n_tokens == 5
    assert got[1].top_terms == "apple shared"
    assert got[0].top_terms == "banana shared"

    def mean_q(vals):
        s = sum(math.floor(v * 1e6 + 0.5) for v in vals)
        return round(s / (len(vals) * 1e6), 6)

    assert got[1].mean_q == pytest.approx(mean_q([0.25, 0.75]))
    assert got[0].mean_q == pytest.approx(mean_q([0.5, 0.1]))


def test_topic_stats_layout_determinism(spark):
    from oracle_vectorsearch_example_spark.operators.topics import topic_stats

    docs = spark.createDataFrame(
        [(i, f"word{i % 5} common text", float(i % 7) / 7.0) for i in range(40)],
        "doc_id long, text string, q double",
    )
    assign = docs.select("doc_id", (F.col("doc_id") % 3).alias("cluster"))
    a = sorted(map(tuple, topic_stats(docs, assign, metric_cols=("q",)).collect()))
    b = sorted(
        map(
            tuple,
            topic_stats(
                docs.repartition(7), assign.coalesce(1), metric_cols=("q",)
            ).collect(),
        )
    )
    assert a == b


def test_topic_stats_negative_metric_raises(spark):
    # the scaled-integer HALF_UP identity only holds for m >= 0; a
    # negative metric must raise in-plan, not drift at the 6th dp
    from oracle_vectorsearch_example_spark.operators.topics import topic_stats

    docs = spark.createDataFrame(
        [(1, "a b", 0.5), (2, "c", -0.3)],
        "doc_id long, text string, q double",
    )
    assign = docs.select("doc_id", F.lit(0).alias("cluster"))
    with pytest.raises(Exception, match="non-negative"):
        topic_stats(docs, assign, metric_cols=("q",)).collect()
