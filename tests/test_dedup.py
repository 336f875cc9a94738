"""Dedup family (X1/X2): exact, Jaccard, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.dedup import (
    exact_dedup,
    hamming_distance,
    jaccard_neardup_pairs,
    minhash_lsh_pairs,
    mllib_minhash_pairs,
    shingle_df,
    simhash,
    simhash_neardup_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = BASE.replace("today", "tonight")
OTHER = "completely different words about spark partitions and shuffles at scale"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),                       # exact dup of 1
        (3, "  The   QUICK brown fox jumps over the lazy dog near the river bank today "),
        (4, NEAR),                       # near dup of 1
        (5, OTHER),
        (6, "tiny"),                     # too short for 3-shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(docs):
    kept = sorted(r.doc_id for r in exact_dedup(docs).collect())
    # 2 and 3 normalize to doc 1's text (case+whitespace) -> only 1 survives
    assert kept == [1, 4, 5, 6]


def test_shingles(docs):
    sh = shingle_df(docs, "text", "doc_id", n=3, hashed=False)
    counts = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_words = len(BASE.split())
    assert counts[1] == n_words - 2  # m - n + 1 distinct shingles
    assert 6 not in counts           # no shingles for short docs


def test_jaccard_pairs(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_neardup_pairs(docs, threshold=0.5, hashed=False).collect()
    }
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 3)] == 1.0 and pairs[(2, 3)] == 1.0
    assert (1, 4) in pairs and 0.5 < pairs[(1, 4)] < 1.0
    assert not any(5 in p or 6 in p for p in pairs)


def test_minhash_lsh_finds_neardups(docs):
    got = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got     # exact dups always collide
    assert not any(5 in p for p in got)


def test_mllib_minhash_pairs(docs):
    got = {(r.id_a, r.id_b) for r in mllib_minhash_pairs(docs, threshold=0.5).collect()}
    assert {(1, 2), (1, 3)} <= got
    assert not any(5 in p for p in got)


def test_simhash_hamming(docs):
    sh = {r.doc_id: r.s for r in docs.select("doc_id", simhash(F.col("text")).alias("s")).collect()}
    assert sh[1] == sh[2] == sh[3]
    df = docs.sparkSession.createDataFrame(
        [(sh[1], sh[4]), (sh[1], sh[5])], "a long, b long"
    )
    ham = [r.h for r in df.select(hamming_distance(F.col("a"), F.col("b")).alias("h")).collect()]
    assert ham[0] < ham[1]  # near-dup closer than unrelated


def test_simhash_neardup_pairs_matches_bruteforce(docs):
    """Banded candidate join finds exactly the pairs brute-force hamming
    finds (pigeonhole guarantees no candidate is missed)."""
    sh = {r.doc_id: r.s for r in docs.select("doc_id", simhash(F.col("text")).alias("s")).collect()}
    ids = sorted(sh)
    for r in (0, 2, 6, 20):
        want = {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(sh[a] ^ sh[b]).count("1") <= r
        }
        got = {
            (x.id_a, x.id_b, x.hamming)
            for x in simhash_neardup_pairs(docs, max_hamming=r).collect()
        }
        assert got == want, f"r={r}"


def test_simhash_neardup_exact_dups_at_zero(docs):
    got = {(r.id_a, r.id_b) for r in simhash_neardup_pairs(docs, max_hamming=0).collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got  # identical fingerprints
    assert not any(5 in p for p in got)


def test_simhash_neardup_block_validation(docs):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_neardup_pairs(docs, max_hamming=3, n_blocks=3)
    with pytest.raises(ValueError, match="n_blocks must be <= bits"):
        simhash_neardup_pairs(docs, max_hamming=61, bits=60)
    # wider-than-minimum block count is legal and still exact
    a = {(r.id_a, r.id_b) for r in simhash_neardup_pairs(docs, max_hamming=2, n_blocks=6).collect()}
    b = {(r.id_a, r.id_b) for r in simhash_neardup_pairs(docs, max_hamming=2).collect()}
    assert a == b


# ------------------------------------------------- component closure (X2)
def _components(spark, edges):
    from oracle_vectorsearch_example_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r.id: r.component_id for r in neardup_components(pairs).collect()
    }


def test_components_basic_clusters(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_long_path_converges(spark):
    """A 40-node path is the adversarial diameter case: pointer jumping must
    collapse it well inside max_iter (O(log n) rounds)."""
    got = _components(spark, [(i, i + 1) for i in range(40)])
    assert got == {i: 0 for i in range(41)}


def test_components_direction_and_self_loops_ignored(spark):
    got = _components(spark, [(5, 4), (4, 4), (3, 4)])
    assert got == {3: 3, 4: 3, 5: 3}


def test_components_durable_checkpoint_matches_local(spark, tmp_path):
    """checkpoint_dir= switches lineage truncation to durable
    DataFrame.checkpoint (the 1000-executor posture — localCheckpoint
    state dies with an executor); results must be identical, and the
    checkpoint dir must actually be used."""
    import os

    from oracle_vectorsearch_example_spark.operators.dedup import neardup_components

    edges = [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {r.id: r.component_id for r in neardup_components(pairs).collect()}
    ckdir = str(tmp_path / "ck")
    durable = {
        r.id: r.component_id
        for r in neardup_components(pairs, checkpoint_dir=ckdir).collect()
    }
    assert durable == local
    assert local == {**{i: 0 for i in range(31)}, 100: 100, 101: 100, 102: 100}
    # durable checkpoints were actually written under the given dir
    assert any(os.scandir(ckdir)), "checkpoint_dir unused"


def test_dedup_by_components_keeps_canonical(spark, docs):
    from oracle_vectorsearch_example_spark.operators.dedup import dedup_by_components

    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3)
    out = dedup_by_components(docs, pairs)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    # 1,2,3,4 form one near-dup cluster (min id 1 survives); 5 and 6 are
    # in no pair and must pass through untouched
    assert kept == {1, 5, 6}


# --------------------------------------- benchmark decontamination (r4)
def test_ngram_contamination_flags_overlap(spark):
    from oracle_vectorsearch_example_spark.operators.dedup import (
        decontaminate,
        ngram_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark plans"),
            (3, "we sampled the quick brown fox for evaluation"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox benchmarks")], "doc_id long, text string"
    )
    hits = {r.doc_id: r.n_matches for r in ngram_contamination(corpus, bench, n=3).collect()}
    # docs 1 and 3 share the 3-gram "quick brown fox"; doc 2 is clean
    assert set(hits) == {1, 3} and all(v >= 1 for v in hits.values())
    clean = {r.doc_id for r in decontaminate(corpus, bench, n=3).collect()}
    assert clean == {2}
    # n larger than any shared span -> nothing flagged, corpus untouched
    assert decontaminate(corpus, bench, n=13).count() == 3


def test_contamination_report_per_example(spark):
    """X58 (r10): the audit reports per BENCHMARK example — counts,
    dirtiness fraction, and how many corpus docs leak into it; clean
    examples and sub-n examples appear with zeros."""
    from oracle_vectorsearch_example_spark.operators.dedup import (
        contamination_report,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark plans"),
            (3, "we sampled the quick brown fox for evaluation"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "quick brown fox benchmarks"),   # leaked by docs 1, 3
            (101, "pristine evaluation example text"),  # clean
            (102, "too short"),                     # < 3 tokens: no grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in contamination_report(corpus, bench, n=3).collect()}
    assert set(got) == {100, 101, 102}
    # 100: grams {"quick brown fox", "brown fox benchmarks"}; only the
    # first appears in the corpus, in two distinct docs
    assert got[100].n_grams == 2 and got[100].n_matched == 1
    assert got[100].overlap_frac == 0.5 and got[100].n_corpus_docs == 2
    assert got[100].dirty is True
    assert got[101].n_matched == 0 and got[101].dirty is False
    assert got[101].overlap_frac == 0.0
    assert got[102].n_grams == 0 and got[102].overlap_frac == 0.0
    assert got[102].dirty is False


def test_ngram_contamination_broadcasts_benchmark(spark):
    """The benchmark side must BROADCAST (it is small by definition): the
    corpus-side shingles never shuffle for the join."""
    from oracle_vectorsearch_example_spark.operators.dedup import ngram_contamination
    from oracle_vectorsearch_example_spark.plans.inspect import has_broadcast_join
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    q = ngram_contamination(
        docs.filter("doc_id % 17 <> 0"), docs.filter("doc_id % 17 = 0"), n=3
    )
    assert has_broadcast_join(q)


def test_neardup_components_restores_checkpoint_dir(spark, tmp_path):
    """ADVICE r4 #4 regression: the durable-checkpoint path must restore
    the SparkContext-global checkpoint dir it temporarily overrides."""
    from oracle_vectorsearch_example_spark.operators.dedup import neardup_components

    sc = spark.sparkContext
    prev = str(tmp_path / "prev-ckpt")
    sc.setCheckpointDir(prev)
    before = sc.getCheckpointDir()
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    out = neardup_components(pairs, checkpoint_dir=str(tmp_path / "run-ckpt"))
    got = {(r["id"], r["component_id"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert sc.getCheckpointDir() == before


def test_components_small_graph_shortcut_matches_distributed(spark):
    """The adaptive driver-side union-find (r5) must label exactly like
    the distributed fixed-point, including multi-hop chains and
    singleton-free vertex sets."""
    from oracle_vectorsearch_example_spark.operators.dedup import neardup_components

    pairs = spark.createDataFrame(
        [(5, 9), (9, 2), (10, 11), (3, 3), (7, 2), (20, 10)],
        "id_a long, id_b long",
    )
    fast = neardup_components(pairs)  # small path (default threshold)
    slow = neardup_components(pairs, small_graph_edges=0)  # forced distributed
    key = lambda df: sorted((r["id"], r["component_id"]) for r in df.collect())
    assert key(fast) == key(slow)
    assert key(fast) == [
        (2, 2), (5, 2), (7, 2), (9, 2), (10, 10), (11, 10), (20, 10)
    ]


def test_lsh_plan_tuning_rule():
    """lsh_plan: the S-curve step (1/b)^(1/r) lands near the requested
    threshold, error decreases with budget, and the fn_weight knob
    shifts the curve left (fewer misses, more candidates)."""
    import pytest
    from oracle_vectorsearch_example_spark.operators.dedup import lsh_plan

    for t in (0.3, 0.5, 0.8):
        b, r = lsh_plan(t, num_hashes=64)
        assert b * r <= 64
        step = (1.0 / b) ** (1.0 / r)
        assert abs(step - t) < 0.15, (t, b, r, step)
    # more hashes -> step at least as close
    b1, r1 = lsh_plan(0.5, num_hashes=16)
    b2, r2 = lsh_plan(0.5, num_hashes=256)
    assert abs((1 / b2) ** (1 / r2) - 0.5) <= abs((1 / b1) ** (1 / r1) - 0.5) + 1e-9
    # weighting false negatives pushes the step BELOW the threshold
    bw, rw = lsh_plan(0.5, num_hashes=64, fn_weight=10.0)
    assert (1.0 / bw) ** (1.0 / rw) <= (1.0 / b) ** (1.0 / r)
    assert (1.0 / bw) ** (1.0 / rw) < 0.5
    with pytest.raises(ValueError, match="threshold"):
        lsh_plan(1.5)


def test_lsh_plan_feeds_minhash_pairs(spark):
    """The planned (b, r) drops into minhash_lsh_pairs and recovers a
    planted near-dup pair."""
    from oracle_vectorsearch_example_spark.operators.dedup import (
        lsh_plan,
        minhash_lsh_pairs,
    )

    b, r = lsh_plan(0.5, num_hashes=32)
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [(1, base), (2, base + " extra"), (3, "entirely different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, num_hashes=b * r, bands=b)
    got = {
        (min(x, y), max(x, y)) for x, y in pairs.select("id_a", "id_b").collect()
    }
    assert (1, 2) in got


def test_source_overlap_matrix(spark):
    """source_overlap: planted cross-source duplication reads high
    Jaccard for the contaminated pair, near-zero elsewhere; pair order
    canonical; layout-independent."""
    from oracle_vectorsearch_example_spark.operators.dedup import source_overlap

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, shared, "a"),
        (2, shared + " tail one", "b"),          # heavy a<->b overlap
        (3, "completely different words in every position here", "c"),
        (4, "another unrelated document about ships and harbors", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["src_a"], r["src_b"]): r["jaccard"] for r in source_overlap(df).collect()}
    assert got[("a", "b")] > 0.5
    assert got.get(("a", "c"), 0.0) == 0.0 or got[("a", "c")] < 0.05
    assert all(a < b for a, b in got)
    a1 = sorted(source_overlap(df).collect())
    a2 = sorted(source_overlap(df.repartition(5)).collect())
    assert a1 == a2
