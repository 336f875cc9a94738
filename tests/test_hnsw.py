"""Sharded HNSW (operators/hnsw.py) — Oracle's `ORGANIZATION INMEMORY
NEIGHBOR GRAPH` analog (the other organization the reference's CREATE
VECTOR INDEX accepts, 01_pdf_to_vector.sql:93-97).

Gates: exact-degenerate equivalence vs the brute-force scan (ef >= shard
size), recall at practical ef on a planted-cluster corpus, build
determinism under an adversarial repartition (the r6 IVF lesson), and
save/load parity.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.hnsw import (
    HnswGraph,
    ShardedHnswIndex,
    _level_of,
)
from oracle_vectorsearch_example_spark.operators.search import topk_search


def _clustered_df(spark, n=6000, dim=32, n_centers=24, seed=7, parts=8):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim))
    assign = rng.integers(0, n_centers, n)
    vecs = centers[assign] + 0.35 * rng.normal(size=(n, dim))
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


@pytest.fixture(scope="module")
def corpus(spark):
    return _clustered_df(spark).cache()


@pytest.fixture(scope="module")
def index(spark, corpus):
    return ShardedHnswIndex.build(
        corpus, n_shards=4, m=12, ef_construction=80, seed=42
    )


def _queries(corpus, n=12):
    return corpus.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_exact_degenerate_matches_brute_force(spark, corpus, index):
    """ef >= shard size → every shard scans exhaustively → the merged
    top-k must EQUAL the brute-force scan, ranks and ids."""
    q = _queries(corpus)
    exact = topk_search(
        corpus, q, k=8, metric="cosine", base_id="vec_id",
        base_vec="embedding", exclude_self=True,
    ).select("qid", "rank", "vec_id")
    approx = index.search(q, k=8, ef=10**9, exclude_self=True).select(
        "qid", "rank", "vec_id"
    )
    a = {tuple(r) for r in exact.collect()}
    b = {tuple(r) for r in approx.collect()}
    assert a == b


def test_recall_gate_at_practical_ef(spark, corpus, index):
    """Beam search at ef=64 over 4 shards: recall@10 >= 0.95 on the
    planted-cluster corpus."""
    q = _queries(corpus, n=20)
    exact = topk_search(
        corpus, q, k=10, metric="cosine", base_id="vec_id",
        base_vec="embedding", exclude_self=True,
    )
    approx = index.search(q, k=10, ef=64, exclude_self=True)
    e = {}
    for r in exact.collect():
        e.setdefault(r["qid"], set()).add(r["vec_id"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["qid"], set()).add(r["vec_id"])
    got = sum(len(e[q_] & a.get(q_, set())) for q_ in e)
    total = sum(len(v) for v in e.values())
    assert got / total >= 0.95, got / total


def test_build_is_partition_layout_independent(spark, corpus):
    """Shard membership, insertion order, and level draws are pure
    functions of (id, seed) — an adversarial repartition must yield the
    IDENTICAL graph per shard (the discipline ivf.py:210 adopted after
    the r6 flaky-recall incident)."""
    a = ShardedHnswIndex.build(corpus, n_shards=3, m=8,
                               ef_construction=40, seed=9)
    b = ShardedHnswIndex.build(
        corpus.repartition(7), n_shards=3, m=8, ef_construction=40, seed=9
    )
    ga = {r["shard"]: bytes(r["blob"]) for r in a.graphs.collect()}
    gb = {r["shard"]: bytes(r["blob"]) for r in b.graphs.collect()}
    assert set(ga) == set(gb) == {0, 1, 2}
    for s in ga:
        x, y = HnswGraph.from_blob(ga[s]), HnswGraph.from_blob(gb[s])
        assert (x.ids == y.ids).all()
        assert (x.levels == y.levels).all()
        assert (x.adj0 == y.adj0).all() and (x.deg0 == y.deg0).all()
        assert x.up == y.up and x.entry == y.entry


def test_save_load_roundtrip(spark, corpus, index, tmp_path):
    path = str(tmp_path / "hnsw_idx")
    built = ShardedHnswIndex.build(
        corpus, n_shards=4, m=12, ef_construction=80, seed=42,
        path=path,
    )
    loaded = ShardedHnswIndex.load(spark, path)
    assert (loaded.n_shards, loaded.m) == (4, 12)
    q = _queries(corpus)
    r1 = {tuple(r) for r in
          built.search(q, k=5, ef=64).select("qid", "rank", "vec_id").collect()}
    r2 = {tuple(r) for r in
          loaded.search(q, k=5, ef=64).select("qid", "rank", "vec_id").collect()}
    r3 = {tuple(r) for r in
          index.search(q, k=5, ef=64).select("qid", "rank", "vec_id").collect()}
    assert r1 == r2 == r3


def test_level_draw_distribution_and_determinism():
    """The hash level draw is geometric-ish with mean ~mL and does not
    depend on anything but (seed, id)."""
    m_l = 1.0 / math.log(16)
    draws = [_level_of(42, i, m_l) for i in range(20000)]
    assert draws == [_level_of(42, i, m_l) for i in range(20000)]
    frac0 = sum(1 for d in draws if d == 0) / len(draws)
    # P(level=0) = 1 - exp(-1/mL) = 1 - 1/16^(1) ... = 1 - e^{-ln16} = 15/16
    assert abs(frac0 - 15 / 16) < 0.01
    assert max(draws) <= 8  # tail is short at 20k draws


def test_null_vectors_excluded_and_empty_queries(spark, corpus):
    withnull = corpus.unionByName(
        spark.createDataFrame(
            [(10**6, None)], "vec_id long, embedding array<double>"
        )
    )
    idx = ShardedHnswIndex.build(withnull, n_shards=2, m=8,
                                 ef_construction=40, seed=1)
    total = idx.graphs.agg(F.sum("n")).collect()[0][0]
    assert total == corpus.count()  # null row dropped, not crashed
    empty = idx.search(
        _queries(corpus).filter(F.lit(False)), k=3, ef=32
    )
    assert empty.count() == 0


def test_search_df_distributed_matches_search(spark, corpus, index):
    """The cogroup query-frame path (nothing collected) must return the
    same merged top-k as the closure-shipped `search`."""
    q = _queries(corpus, n=15)
    a = {tuple(r) for r in
         index.search(q, k=6, ef=64).select("qid", "rank", "vec_id").collect()}
    b = {tuple(r) for r in
         index.search_df(q, k=6, ef=64).select("qid", "rank", "vec_id").collect()}
    assert a == b


def test_incremental_add_exact_over_union(spark):
    """add() wires new vectors into the existing shard graphs; the
    exhaustive (ef >= n) search over the updated index must equal the
    brute-force scan of the UNION — insert order can change the graph,
    never the exact-degenerate answer. Untouched shards must keep their
    blob byte-identical (pass-through, not rebuild)."""
    base = _clustered_df(spark, n=2500, seed=11)
    extra = _clustered_df(spark, n=600, seed=12).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    idx = ShardedHnswIndex.build(base, n_shards=3, m=8,
                                 ef_construction=60, seed=5)
    idx2 = idx.add(extra, ef_construction=60)
    union = base.unionByName(extra)
    assert idx2.graphs.agg(F.sum("n")).collect()[0][0] == union.count()
    q = _queries(base, n=8)
    exact = topk_search(
        union, q, k=7, metric="cosine", base_id="vec_id",
        base_vec="embedding", exclude_self=True,
    ).select("qid", "rank", "vec_id")
    got = idx2.search(q, k=7, ef=10**9, exclude_self=True).select(
        "qid", "rank", "vec_id"
    )
    assert {tuple(r) for r in exact.collect()} == {tuple(r) for r in got.collect()}
    # add into an index that has an EMPTY shard for some new rows:
    # build from a corpus that leaves shard(s) empty is hard to force
    # deterministically, so instead verify add() on a fresh small index
    # where one batch routes rows to all shards including ones whose
    # graphs grow from a handful of nodes
    tiny = ShardedHnswIndex.build(
        base.limit(10), n_shards=3, m=8, ef_construction=60, seed=5
    )
    grown = tiny.add(extra, ef_construction=60)
    total = grown.graphs.agg(F.sum("n")).collect()[0][0]
    assert total == 10 + extra.count()


def test_extend_recall_after_many_batches(spark):
    """Graph quality survives incremental growth: recall gate still
    holds after the corpus arrives in 4 batches instead of one build."""
    full = _clustered_df(spark, n=4000, seed=21).cache()
    first = full.filter(F.col("vec_id") % 4 == 0)
    idx = ShardedHnswIndex.build(first, n_shards=2, m=12,
                                 ef_construction=80, seed=3)
    for r in (1, 2, 3):
        idx = idx.add(full.filter(F.col("vec_id") % 4 == r),
                      ef_construction=80)
    q = _queries(full, n=15)
    exact = topk_search(
        full, q, k=10, metric="cosine", base_id="vec_id",
        base_vec="embedding", exclude_self=True,
    )
    approx = idx.search(q, k=10, ef=64, exclude_self=True)
    e, a = {}, {}
    for r in exact.collect():
        e.setdefault(r["qid"], set()).add(r["vec_id"])
    for r in approx.collect():
        a.setdefault(r["qid"], set()).add(r["vec_id"])
    got = sum(len(e[x] & a.get(x, set())) for x in e)
    assert got / sum(len(v) for v in e.values()) >= 0.95


def test_filtered_search_matches_brute_force(spark):
    """Post-filter + oversample equals the exact filtered top-k when the
    candidate budget covers the corpus; with a tight budget output may
    under-fill but never violates the predicate or the ordering."""
    import numpy as np
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.operators.hnsw import ShardedHnswIndex
    from oracle_vectorsearch_example_spark.operators.search import topk_search

    rng = np.random.RandomState(5)
    vecs = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    base = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    idx = ShardedHnswIndex.build(base, n_shards=2, m=8, seed=42)
    q = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = idx.filtered_search(
        q, attrs=base, predicate="vec_id % 2 = 0", k=5, ef=10**9,
        oversample=40, exclude_self=True,
    )
    got_set = {(r.qid, r.rank, r.vec_id) for r in got.collect()}
    exact = topk_search(
        base.filter("vec_id % 2 = 0"), q, k=5, exclude_self=True
    )
    want = {(r.qid, r.rank, r.vec_id) for r in exact.collect()}
    assert got_set == want

    # tight budget: all results satisfy the predicate, ranks contiguous
    tight = idx.filtered_search(
        q, attrs=base, predicate="vec_id % 10 = 0", k=5, ef=64,
        oversample=2, exclude_self=True,
    ).collect()
    for r in tight:
        assert r.vec_id % 10 == 0
    by_q = {}
    for r in tight:
        by_q.setdefault(r.qid, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_accuracy_report_ef_sweep(spark):
    """The curve's entries equal independently measured recall at each
    ef, and an ef covering the shards reads exactly 1.0."""
    import numpy as np
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.operators.hnsw import ShardedHnswIndex
    from oracle_vectorsearch_example_spark.operators.ivf import recall_at_k

    rng = np.random.RandomState(21)
    base = spark.createDataFrame(
        [(i, [float(x) for x in rng.randn(16)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    idx = ShardedHnswIndex.build(base, n_shards=2, m=8, seed=42)
    q = base.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    rep = {r.ef: r for r in idx.accuracy_report(
        q, k=5, efs=(8, 32, 500), exclude_self=True
    ).collect()}
    assert set(rep) == {8, 32, 500}
    assert rep[500].recall == 1.0  # ef >= shard size → exhaustive
    assert all(0.0 <= r.recall <= 1.0 for r in rep.values())
    exact = idx.search(q, k=5, ef=10**9, exclude_self=True)
    got32 = idx.search(q, k=5, ef=32, exclude_self=True)
    assert rep[32].recall == pytest.approx(recall_at_k(exact, got32), abs=1e-9)
