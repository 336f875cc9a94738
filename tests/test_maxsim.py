"""Multi-vector MaxSim (operators/maxsim.py, X27) — numpy parity,
candidates-rerank equivalence, centroid proxy, determinism, JVM plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.maxsim import (
    doc_centroids,
    maxsim_topk,
)


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(9)
    n_docs, max_tok, d = 40, 5, 16
    rows, vecs = [], {}
    for doc in range(n_docs):
        nt = 1 + (doc % max_tok)
        vecs[doc] = rng.normal(size=(nt, d))
        for t in range(nt):
            rows.append((doc, t, [float(x) for x in vecs[doc][t]]))
    df = spark.createDataFrame(
        rows, "doc_id long, tidx long, embedding array<double>"
    ).cache()
    return df, vecs


def _np_maxsim(qmat, dmat):
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    dn = dmat / np.linalg.norm(dmat, axis=1, keepdims=True)
    return float(np.round((qn @ dn.T).max(axis=1).sum(), 6))


def test_matches_numpy(spark, fixture):
    df, vecs = fixture
    q = df.filter("doc_id < 3").select(
        F.col("doc_id").alias("qid"), F.col("tidx").alias("qtidx"), "embedding"
    )
    hits = maxsim_topk(df, q, k=4, qtok_col="qtidx").collect()
    for qid in range(3):
        expect = sorted(
            ((d, _np_maxsim(vecs[qid], vecs[d])) for d in vecs),
            key=lambda p: (-p[1], p[0]),
        )[:4]
        mine = [
            (r["doc_id"], r["score"])
            for r in sorted(hits, key=lambda r: r["rank"])
            if r["qid"] == qid
        ]
        assert [(d, pytest.approx(s, abs=2e-6)) for d, s in expect] == mine
        assert mine[0][0] == qid  # self is its own best match


def test_candidates_rerank_restricts_and_agrees(spark, fixture):
    df, _ = fixture
    q = df.filter("doc_id < 2").select(
        F.col("doc_id").alias("qid"), F.col("tidx").alias("qtidx"), "embedding"
    )
    cand = spark.createDataFrame(
        [(qid, d) for qid in range(2) for d in range(0, 40, 2)],
        "qid long, doc_id long",
    )
    rer = maxsim_topk(df, q, k=5, qtok_col="qtidx", candidates=cand).collect()
    full = maxsim_topk(df, q, k=40, qtok_col="qtidx").collect()
    fmap = {(r["qid"], r["doc_id"]): r["score"] for r in full}
    for qid in range(2):
        mine = [
            (r["doc_id"], r["score"])
            for r in sorted(rer, key=lambda r: r["rank"])
            if r["qid"] == qid
        ]
        assert all(d % 2 == 0 for d, _ in mine)  # only candidates scored
        expect = sorted(
            ((d, fmap[(qid, d)]) for d in range(0, 40, 2)),
            key=lambda p: (-p[1], p[0]),
        )[:5]
        assert mine == expect  # same scores as the brute-force path


def test_exclude_self_and_dot_metric(spark, fixture):
    df, vecs = fixture
    q = df.filter("doc_id = 0").select(
        F.col("doc_id").alias("qid"), F.col("tidx").alias("qtidx"), "embedding"
    )
    hits = maxsim_topk(df, q, k=3, qtok_col="qtidx", exclude_self=True).collect()
    assert all(r["doc_id"] != 0 for r in hits)
    dot = maxsim_topk(df, q, k=1, metric="dot", qtok_col="qtidx").collect()
    qm = vecs[0]
    expect = max(
        (float(np.round((qm @ vecs[d].T).max(axis=1).sum(), 6)), -d)
        for d in vecs
    )
    assert dot[0]["doc_id"] == -expect[1]
    assert dot[0]["score"] == pytest.approx(expect[0], abs=2e-6)
    with pytest.raises(ValueError, match="metric"):
        maxsim_topk(df, q, metric="l2")


def test_doc_centroids(spark, fixture):
    df, vecs = fixture
    rows = doc_centroids(df).filter("doc_id in (0, 4)").collect()
    for r in rows:
        np.testing.assert_allclose(
            r["embedding"], vecs[r["doc_id"]].mean(axis=0), rtol=1e-12
        )


def test_layout_independence_and_jvm_plan(spark, fixture):
    df, _ = fixture
    q = df.filter("doc_id < 2").select(
        F.col("doc_id").alias("qid"), F.col("tidx").alias("qtidx"), "embedding"
    )
    a = maxsim_topk(df, q, k=5, qtok_col="qtidx").collect()
    b = maxsim_topk(df.repartition(7), q, k=5, qtok_col="qtidx").collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    plan = (
        maxsim_topk(df, q, qtok_col="qtidx")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.fixture(scope="module")
def random_fixture(spark):
    """The bench's negative-control geometry: 100 docs x 20 fully
    random token vectors — no cluster structure for a centroid to
    summarize (the r11 0/15 finding)."""
    rng = np.random.default_rng(21)
    rows = []
    for doc in range(100):
        for t in range(20):
            v = rng.normal(size=16)
            rows.append((doc, t, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "doc_id long, tidx long, embedding array<double>"
    ).cache()


def test_token_candidates_recover_on_unclustered(spark, random_fixture):
    """Judge r11 #3 done-criterion: on the RANDOM fixture, token-probe
    stage 1 reaches top-5 agreement >= 13/15 at candidate fraction
    <= 0.3 (the centroid proxy's floor here is ~0/15)."""
    from oracle_vectorsearch_example_spark.operators.maxsim import (
        token_candidates,
    )

    tok = random_fixture
    q = tok.filter("doc_id < 3").select(
        F.col("doc_id").alias("qid"),
        F.col("tidx").alias("qtidx"),
        "embedding",
    )
    brute = {
        (r.qid, r.rank): r.doc_id
        for r in maxsim_topk(
            tok, q, k=5, qtok_col="qtidx", exclude_self=True
        ).collect()
    }
    cand = token_candidates(
        tok, q, n_per_token=32, max_candidates=25,
        qtok_col="qtidx", exclude_self=True,
    )
    per_q = {}
    for r in cand.collect():
        per_q.setdefault(r.qid, set()).add(r.doc_id)
    assert max(len(v) for v in per_q.values()) <= 25  # frac <= 0.25
    assert all(r not in per_q.get(r, set()) for r in per_q)  # no self
    two = {
        (r.qid, r.rank): r.doc_id
        for r in maxsim_topk(
            tok, q, k=5, qtok_col="qtidx",
            candidates=cand, exclude_self=True,
        ).collect()
    }
    agree = sum(1 for kk in brute if two.get(kk) == brute[kk])
    assert agree >= 13, f"top5 agreement {agree}/15 below the 13/15 bar"


def test_token_candidates_ivf_engine(spark, random_fixture):
    """The 100 TB stage-1 shape: an IvfIndex over pack_token_ids rows
    serves the probes via cluster-pruned search_df; at full probe
    depth (nprobe = n_clusters) the candidate set equals the exact
    engine's."""
    from oracle_vectorsearch_example_spark.operators.ivf import IvfIndex
    from oracle_vectorsearch_example_spark.operators.maxsim import (
        pack_token_ids,
        token_candidates,
    )

    tok = random_fixture
    q = tok.filter("doc_id < 2").select(
        F.col("doc_id").alias("qid"),
        F.col("tidx").alias("qtidx"),
        "embedding",
    )
    packed = pack_token_ids(tok)
    idx = IvfIndex.build(packed, n_clusters=8, seed=42)
    exact = {
        (r.qid, r.doc_id)
        for r in token_candidates(
            tok, q, n_per_token=8, max_candidates=15,
            qtok_col="qtidx", exclude_self=True,
        ).collect()
    }
    via_ivf = {
        (r.qid, r.doc_id)
        for r in token_candidates(
            tok, q, n_per_token=8, max_candidates=15,
            qtok_col="qtidx", exclude_self=True,
            index=idx, nprobe=8,
        ).collect()
    }
    assert via_ivf == exact


def test_token_candidates_packing_guard(spark, random_fixture):
    from oracle_vectorsearch_example_spark.operators.maxsim import (
        token_candidates,
    )

    q_bad = random_fixture.filter("doc_id < 1").select(
        F.col("doc_id").alias("qid"),
        (F.col("tidx") - 5).alias("qtidx"),  # negative token index
        "embedding",
    )
    with pytest.raises(Exception, match="packing contract"):
        token_candidates(
            random_fixture, q_bad, n_per_token=2, qtok_col="qtidx"
        ).collect()


def test_integer_ids_pack_64bit(spark):
    """IntegerType ids >= 2048 used to wrap 32-bit in the packed key
    (qid * 2^20 stayed IntegerType under non-ANSI Spark), producing
    aliased/negative __qkey values that passed the 2^43 guard yet
    unpacked to wrong ids (ADVICE r12). Pin the cast-before-multiply
    fix on both pack_token_ids and token_candidates."""
    from oracle_vectorsearch_example_spark.operators.maxsim import (
        pack_token_ids,
        token_candidates,
    )

    rng = np.random.default_rng(4)
    rows = []
    for doc in (2047, 2048, 5000):  # straddle the 2^11 wrap threshold
        for t in range(3):
            rows.append((doc, t, [float(x) for x in rng.normal(size=8)]))
    tok = spark.createDataFrame(
        rows, "doc_id int, tidx int, embedding array<double>"
    )

    packed = pack_token_ids(tok)
    assert dict(packed.dtypes)["vec_id"] == "bigint"
    got = sorted(r.vec_id for r in packed.collect())
    want = sorted((d << 20) + t for d, t, _ in rows)
    assert got == want, "packed keys wrapped 32-bit"

    q = tok.filter("doc_id = 5000 and tidx = 0").select(
        F.col("doc_id").alias("qid"),
        F.col("tidx").alias("qtidx"),
        "embedding",
    )
    cand = token_candidates(tok, q, n_per_token=4, qtok_col="qtidx")
    out = cand.collect()
    assert out and all(r.qid == 5000 for r in out)
    assert all(0 <= r.doc_id <= 5000 for r in out)
