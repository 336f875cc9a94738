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


# --------------------------------------------------------------- TF-IDF


def _bucket(term: str, dim: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % dim


def test_tfidf_hand_computed(spark):
    import math

    from oracle_vectorsearch_example_spark.operators.sparse import tfidf_vectors

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    dim = 1024
    out = {r.doc_id: r for r in tfidf_vectors(docs, dim=dim).collect()}

    def expected(counts, n_docs, dfs):
        vals = {}
        for t, tf in counts.items():
            idx = _bucket(t, dim)
            idf = math.log((n_docs + 1) / (dfs[t] + 1)) + 1.0
            vals[idx] = (1.0 + math.log(tf)) * idf
        items = sorted(vals.items())
        # index-ordered fold, as the operator computes it
        s = 0.0
        for _, v in items:
            s += v * v
        nrm = math.sqrt(s)
        return [i for i, _ in items], [v / nrm for _, v in items]

    dfs = {"a": 2, "b": 1, "c": 1}
    for did, counts in ((0, {"a": 2, "b": 1}), (1, {"a": 1, "c": 1})):
        want_idx, want_val = expected(counts, 2, dfs)
        got = out[did]
        assert list(got.indices) == want_idx
        for g, w in zip(got.values, want_val):
            assert g == pytest.approx(w, abs=1e-12)


def test_tfidf_feeds_sparse_search(spark):
    from oracle_vectorsearch_example_spark.operators.sparse import (
        sparse_topk_search,
        tfidf_vectors,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark join hash table"),
            (1, "spark join merge"),
            (2, "lazy dog sleeps"),
            (3, "hash table scan"),
        ],
        "doc_id long, text string",
    )
    vecs = tfidf_vectors(docs, dim=4096)
    q = vecs.filter(F.col("doc_id") == 0).withColumnRenamed("doc_id", "qid")
    hits = sparse_topk_search(
        vecs, q, k=3, id_col="doc_id", exclude_self=True
    ).collect()
    ranked = [r.doc_id for r in sorted(hits, key=lambda r: r.rank)]
    # doc 1 shares 'spark join', doc 3 shares 'hash table'; doc 2 nothing
    assert set(ranked[:2]) == {1, 3}
    assert 2 not in ranked


def test_tfidf_deterministic_and_jvm_only(spark):
    from oracle_vectorsearch_example_spark.operators.sparse import tfidf_vectors

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} common") for i in range(60)],
        "doc_id long, text string",
    )

    def run(d):
        return sorted(
            (r.doc_id, tuple(r.indices), tuple(r.values))
            for r in tfidf_vectors(d, dim=512).collect()
        )

    assert run(docs.repartition(7)) == run(docs.coalesce(1))
    plan = (
        tfidf_vectors(docs, dim=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_fit_transform_queries(spark):
    """A query frame transforms with CORPUS statistics: a term common in
    the corpus gets low idf in the query vector even if it is rare in
    the query frame itself, and unseen terms take max smooth idf."""
    import math

    from oracle_vectorsearch_example_spark.operators.sparse import (
        tfidf_fit,
        tfidf_transform,
    )

    corpus = spark.createDataFrame(
        [(i, "common word " + ("rare" if i == 0 else "filler")) for i in range(10)],
        "doc_id long, text string",
    )
    model = tfidf_fit(corpus, dim=4096)
    q = spark.createDataFrame([(0, "common rare novel")], "doc_id long, text string")
    row = tfidf_transform(q, model, normalize=False).collect()[0]
    vals = dict(zip(row.indices, row.values))
    idf = lambda df: math.log(11 / (df + 1)) + 1.0
    assert vals[_bucket("common", 4096)] == pytest.approx(idf(10), abs=1e-12)
    assert vals[_bucket("rare", 4096)] == pytest.approx(idf(1), abs=1e-12)
    assert vals[_bucket("novel", 4096)] == pytest.approx(idf(0), abs=1e-12)
