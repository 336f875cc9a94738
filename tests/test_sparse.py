"""Sparse vector format + inverted-index search (operators/sparse.py,
X25) — round-trip vs dense, numpy score parity, JVM-plan assert, and
the layout-independence of the canonicalized fold."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.sparse import (
    sparse_topk_search,
    to_dense,
    to_sparse,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(6)
    n, d = 300, 48
    vecs = rng.normal(size=(n, d)) * (rng.random(size=(n, d)) > 0.5)
    vecs[7] = 0.0  # an all-zero vector must not divide by zero
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    return df, vecs


def test_sparse_roundtrip_and_jvm_plan(spark, corpus):
    df, vecs = corpus
    d = vecs.shape[1]
    sp = to_sparse(df, threshold=0.0)
    dense = to_dense(sp, dim=d)
    for r in dense.filter("vec_id in (0, 7, 12)").collect():
        np.testing.assert_allclose(r["dense"], vecs[r["vec_id"]], atol=0)
        idx = list(r["indices"])
        assert idx == sorted(idx)  # ascending by construction
        assert all(vecs[r["vec_id"]][i] != 0 for i in idx)
    plan = sp._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_threshold_drops_small_components(spark, corpus):
    df, vecs = corpus
    sp = to_sparse(df, threshold=0.8)
    row = sp.filter("vec_id = 3").collect()[0]
    expect = [i for i, x in enumerate(vecs[3]) if abs(x) > 0.8]
    assert list(row["indices"]) == expect


def test_cosine_topk_matches_numpy(spark, corpus):
    df, vecs = corpus
    thr = 0.3
    sp = to_sparse(df, threshold=thr)
    q = sp.filter("vec_id < 5").select(
        F.col("vec_id").alias("qid"), "indices", "values"
    )
    hits = sparse_topk_search(sp, q, k=6, metric="cosine",
                              exclude_self=True).collect()
    kept = np.where(np.abs(vecs) > thr, vecs, 0.0)
    norms = np.linalg.norm(kept, axis=1)
    ids = np.arange(len(vecs))
    for qid in range(5):
        dots = kept @ kept[qid]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(
                (norms > 0) & (norms[qid] > 0),
                dots / (norms * norms[qid]), 0.0,
            )
        scores = np.round(cos, 6)
        # the join only produces docs sharing a non-zero index
        cand = [
            i for i in ids
            if i != qid and np.any((kept[i] != 0) & (kept[qid] != 0))
        ]
        cand.sort(key=lambda i: (-scores[i], i))
        expect = [(i, scores[i]) for i in cand[:6]]
        mine = [
            (r["vec_id"], r["score"])
            for r in sorted(hits, key=lambda r: r["rank"])
            if r["qid"] == qid
        ]
        assert mine == [(i, pytest.approx(s)) for i, s in expect]


def test_dot_metric_and_validation(spark, corpus):
    df, _ = corpus
    sp = to_sparse(df, threshold=0.3)
    q = sp.filter("vec_id = 0").select(
        F.col("vec_id").alias("qid"), "indices", "values"
    )
    dot = sparse_topk_search(sp, q, k=3, metric="dot").collect()
    assert dot[0]["vec_id"] == 0  # self has the max inner product
    with pytest.raises(ValueError, match="metric"):
        sparse_topk_search(sp, q, metric="l2")


def test_scores_partition_layout_independent(spark, corpus):
    df, _ = corpus
    sp = to_sparse(df, threshold=0.3)
    q = sp.filter("vec_id < 3").select(
        F.col("vec_id").alias("qid"), "indices", "values"
    )
    a = sparse_topk_search(sp, q, k=5).collect()
    b = sparse_topk_search(to_sparse(df.repartition(7), threshold=0.3),
                           q, k=5).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
