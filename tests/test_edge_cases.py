"""Degenerate-input robustness: empty tables, single rows, zero vectors.
Operators must return empty/correct results, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_words
from oracle_vectorsearch_example_spark.operators.dedup import (
    exact_dedup,
    jaccard_neardup_pairs,
    minhash_signatures,
)
from oracle_vectorsearch_example_spark.operators.ivf import IvfIndex
from oracle_vectorsearch_example_spark.operators.search import topk_search
from oracle_vectorsearch_example_spark.operators.sessionize import session_stats


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_chunker_empty_and_null(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "   ")], "doc_id long, text string")
    assert chunk_by_words(df, max_words=5, overlap=1).count() == 0
    assert chunk_by_words(_empty_docs(spark), max_words=5, overlap=1).count() == 0
    from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_chars

    # char mode chunks RAW text (no trim, by=characters spec): NULL and ""
    # give nothing, whitespace-only is one literal chunk
    out = chunk_by_chars(df, max_chars=5, overlap_chars=1).collect()
    assert [(r.doc_id, r.chunk_text) for r in out] == [(3, "   ")]


def test_dedup_family_empty(spark):
    e = _empty_docs(spark)
    assert exact_dedup(e).count() == 0
    assert minhash_signatures(e).count() == 0
    assert jaccard_neardup_pairs(e).count() == 0


def test_topk_empty_base_and_zero_vector(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    assert topk_search(empty, q, k=3).count() == 0
    # zero base vector: cosine defined as similarity 0 -> distance 1, no NaN
    base = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = topk_search(base, q, k=2).collect()
    assert [r.vec_id for r in rows] == [2, 1]
    assert all(not (r.distance != r.distance) for r in rows)  # no NaN


def test_ivf_tiny_table(spark):
    """n < default k: sample fallback still builds a valid index."""
    tiny = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    idx = IvfIndex.build(tiny, seed=42)
    q = tiny.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    hits = idx.search(q, k=2, nprobe=len(idx.centroids))
    assert hits.groupBy("qid").count().collect()[0]["count"] == 2


def test_sessionize_single_event_per_user(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    rows = session_stats(df).collect()
    assert len(rows) == 2
    assert all(r.n_events == 1 and r.duration_sec == 0.0 for r in rows)


def test_simhash_null_text_is_zero(spark):
    from oracle_vectorsearch_example_spark.operators.dedup import simhash

    df = spark.createDataFrame([(1, None), (2, ""), (3, "hello")], "id long, text string")
    rows = {r.id: r.sh for r in df.select("id", simhash(F.col("text")).alias("sh")).collect()}
    assert rows[1] == 0 and rows[2] == 0 and rows[3] != 0


def test_topk_skips_null_vectors(spark):
    base = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    rows = topk_search(base, q, k=3).collect()
    assert [r.vec_id for r in rows] == [1, 3]  # NULL row excluded, no crash


def test_components_empty_and_singletons(spark):
    from oracle_vectorsearch_example_spark.operators.dedup import (
        dedup_by_components,
        neardup_components,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert neardup_components(empty).count() == 0
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    # no pairs -> corpus passes through untouched
    out = dedup_by_components(docs, empty)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]


def test_packing_empty_and_empty_text(spark):
    from oracle_vectorsearch_example_spark.operators.packing import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty).count() == 0
    blank = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one token stream here")],
        "doc_id long, text string",
    )
    out = pack_sequences(blank, max_tokens=8)
    assert {r.doc_id for r in out.collect()} == {3}  # zero-token docs dropped


def test_sampling_empty(spark):
    from oracle_vectorsearch_example_spark.operators.sampling import (
        hash_sample,
        hash_split,
        stratified_sample,
    )

    empty = spark.createDataFrame([], "doc_id long, lang string")
    assert hash_split(empty).count() == 0
    assert hash_sample(empty, 0.5).count() == 0
    assert stratified_sample(empty, {"en": 0.5}).count() == 0


def test_search_df_empty_and_zero_vector_queries(spark):
    """The distributed ANN path degrades gracefully: an empty query frame
    yields an empty result (no crash in either mapInPandas stage), and an
    all-zero query vector — unit-norm undefined — returns k rows at
    cosine distance 1.0 with deterministic id tie-breaks."""
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.operators.ivf import IvfIndex
    from oracle_vectorsearch_example_spark.sources.io import read_table

    e = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IvfIndex.build(e, n_clusters=8, seed=42)
    empty = e.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert idx.search_df(empty, k=3, nprobe=4).count() == 0
    zero = spark.createDataFrame([(999, [0.0] * 64)], "qid long, qvec array<double>")
    rows = idx.search_df(zero, k=3, nprobe=8).collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert all(abs(r.distance - 1.0) < 1e-9 for r in rows)


def test_mine_hard_negatives_semantics(spark):
    """Negatives are the nearest non-positive, non-self items; positives
    beyond the overfetch window can't leak in (the cap is computed from
    the label frame)."""
    import numpy as np
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.operators.search import (
        mine_hard_negatives,
        topk_search,
    )

    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    base = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    positives = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 5)], "qid long, pos_id long"
    )
    negs = mine_hard_negatives(base, positives, k=4)
    rows = sorted(negs.collect(), key=lambda r: (r.qid, r.rank))
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r.neg_id)
    assert set(by_q) == {0, 1}
    assert all(len(v) == 4 for v in by_q.values())
    # no positives, no self
    assert not {1, 2, 3, 0} & set(by_q[0])
    assert not {5, 1} & set(by_q[1])
    # equals the plain top-k with labels removed
    q = base.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    full = topk_search(base, q, k=10, exclude_self=True).collect()
    labels = {(0, 1), (0, 2), (0, 3), (1, 5)}
    want = {}
    for r in sorted(full, key=lambda r: (r.qid, r.rank)):
        if (r.qid, r.vec_id) not in labels:
            want.setdefault(r.qid, []).append(r.vec_id)
    assert by_q == {k: v[:4] for k, v in want.items()}


def test_mrl_topk_search(spark):
    """MRL two-stage: exact on the candidate set (ef >= n degenerates to
    exhaustive), and recall stays high when the prefix carries signal."""
    import numpy as np
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.operators.search import (
        mrl_topk_search,
        topk_search,
    )

    rng = np.random.RandomState(11)
    # prefix-heavy vectors: most energy in the first 8 dims (the MRL
    # training property), noise in the tail
    front = rng.randn(300, 8) * 2.0
    tail = rng.randn(300, 24) * 0.3
    vecs = np.hstack([front, tail])
    base = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    q = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = topk_search(base, q, k=10, exclude_self=True)
    want = {(r.qid, r.rank, r.vec_id) for r in exact.collect()}

    # oversample = corpus size → candidate set is everything → identical
    full = mrl_topk_search(
        base, q, k=10, coarse_dim=8, oversample=30, exclude_self=True
    )
    assert {(r.qid, r.rank, r.vec_id) for r in full.collect()} == want

    # realistic oversample: high recall on prefix-heavy vectors
    mrl = mrl_topk_search(
        base, q, k=10, coarse_dim=8, oversample=4, exclude_self=True
    )
    got_ids = {(r.qid, r.vec_id) for r in mrl.collect()}
    want_ids = {(q_, v) for q_, _, v in want}
    recall = len(got_ids & want_ids) / len(want_ids)
    assert recall >= 0.9, recall
