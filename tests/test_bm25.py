"""BM25 + RRF hybrid retrieval (operators/bm25.py, X23) — hand-computed
score checks, the order-canonicalized-fold determinism gate, and fusion
semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.bm25 import (
    bm25_index,
    bm25_search,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry date"),
        (4, "date elderberry"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_hand_computed_score(spark, tiny):
    """One-term query against the 4-doc corpus: score must equal the
    formula evaluated by hand (k1=1.2, b=0.75, Lucene idf)."""
    idx = bm25_index(tiny)
    assert idx.n_docs == 4.0
    # doc lengths: 3, 2, 4, 2 → avgdl = 11/4
    assert idx.avgdl == pytest.approx(11 / 4)
    q = spark.createDataFrame([(0, "apple")], "qid long, qtext string")
    got = {r["doc_id"]: r["score"] for r in bm25_search(idx, q, k=10).collect()}
    idf = math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))  # df(apple)=1
    tf, dl, avgdl = 2.0, 3.0, 11 / 4
    expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert got == {1: pytest.approx(round(expect, 6))}


def test_ranking_and_missing_terms(spark, tiny):
    idx = bm25_index(tiny)
    q = spark.createDataFrame(
        [(0, "cherry date"), (1, "zzz_not_in_corpus")],
        "qid long, qtext string",
    )
    hits = bm25_search(idx, q, k=10).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r["qid"], []).append(r)
    assert 1 not in by_q  # no matching term → no rows, not a crash
    ranks = {r["doc_id"]: r["rank"] for r in by_q[0]}
    # doc 3 has cherry×3 + date; doc 2 and 4 have one term each
    assert ranks[3] == 1
    assert set(ranks) == {2, 3, 4}


def test_scores_partition_layout_independent(spark, tiny):
    """The fold is order-canonicalized: an adversarial repartition must
    reproduce bit-identical scores (a plain sum() would drift in the
    last ulp and flip near-tie ranks)."""
    q = spark.createDataFrame(
        [(0, "apple banana cherry date elderberry")], "qid long, qtext string"
    )
    a = bm25_search(bm25_index(tiny), q, k=10).collect()
    b = bm25_search(bm25_index(tiny.repartition(7)), q, k=10).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_rrf_fusion_hand_computed(spark):
    lex = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 20)], "qid long, rank long, doc_id long"
    ).select("qid", "rank", "doc_id")
    vec = spark.createDataFrame(
        [(0, 1, 20), (0, 2, 30)], "qid long, rank long, doc_id long"
    ).select("qid", "rank", "doc_id")
    out = {r["doc_id"]: (r["rank"], r["rrf_score"])
           for r in rrf_fuse([lex, vec], k=10).collect()}
    # doc 20: 1/(60+2) + 1/(60+1); doc 10: 1/61; doc 30: 1/62
    assert out[20][1] == pytest.approx(1 / 62 + 1 / 61)
    assert out[10][1] == pytest.approx(1 / 61)
    assert out[30][1] == pytest.approx(1 / 62)
    assert [out[d][0] for d in (20, 10, 30)] == [1, 2, 3]


def test_rrf_three_retrievers_and_validation(spark):
    one = spark.createDataFrame(
        [(0, 1, 5)], "qid long, rank long, doc_id long"
    )
    out = rrf_fuse([one, one, one], k=5).collect()
    assert out[0]["rrf_score"] == pytest.approx(3 / 61)
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_idf_positive_for_ubiquitous_terms(spark):
    """A term present in every doc keeps a positive idf (Lucene form) —
    classic Okapi idf would go negative and invert rankings."""
    docs = spark.createDataFrame(
        [(i, "common filler" + (" rare" if i == 0 else "")) for i in range(5)],
        "doc_id long, text string",
    )
    idx = bm25_index(docs)
    q = spark.createDataFrame([(0, "common")], "qid long, qtext string")
    hits = bm25_search(idx, q, k=10).collect()
    assert len(hits) == 5 and all(r["score"] > 0 for r in hits)


# --------------------------------------------------------------------- PRF


def test_weighted_terms_generalize_plain_search(spark):
    """bm25_search_terms with w=1 on the query's distinct tokens must
    equal bm25_search exactly."""
    from oracle_vectorsearch_example_spark.operators.bm25 import (
        _tokens,
        bm25_index,
        bm25_search,
        bm25_search_terms,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma delta common") for i in range(40)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "alpha w3 common")], "qid long, qtext string")
    idx = bm25_index(docs)
    plain = sorted(map(tuple, bm25_search(idx, q, k=10).collect()))
    qt = _tokens(q, "qid", "qtext").distinct().withColumn("w", F.lit(1.0))
    weighted = sorted(map(tuple, bm25_search_terms(idx, qt, k=10).collect()))
    assert plain == weighted


def test_prf_expands_with_cooccurring_terms(spark):
    """Docs about 'spark' consistently mention 'shuffle'; PRF must pull
    'shuffle' into the expanded term set and let it lift a doc that
    never says 'spark'."""
    from oracle_vectorsearch_example_spark.operators.bm25 import (
        bm25_index,
        bm25_search,
        bm25_search_prf,
        prf_terms,
    )

    rows = [(i, "spark engine shuffle stage executor plan") for i in range(6)]
    rows += [(10, "shuffle shuffle shuffle stage stage executor")]  # no 'spark'
    rows += [(20 + i, "cooking pasta sauce recipe kitchen herbs") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = bm25_index(docs)
    q = spark.createDataFrame([(0, "spark")], "qid long, qtext string")

    terms = prf_terms(idx, q, fb_docs=3, fb_terms=4)
    tset = {(r.term, r.w) for r in terms.collect()}
    assert ("spark", 1.0) in tset
    assert any(t == "shuffle" and w == 0.5 for t, w in tset)
    assert not any(t == "pasta" for t, _ in tset)

    base = {r.doc_id for r in bm25_search(idx, q, k=10).collect()}
    assert 10 not in base  # doc 10 never says 'spark'
    prf = {r.doc_id for r in bm25_search_prf(idx, q, k=10, fb_docs=3,
                                             fb_terms=4).collect()}
    assert 10 in prf  # expansion recalls it


def test_prf_deterministic(spark):
    from oracle_vectorsearch_example_spark.operators.bm25 import (
        bm25_index,
        bm25_search_prf,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 7} filler text") for i in range(60)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "w1 w2")], "qid long, qtext string")

    def run(d):
        idx = bm25_index(d)
        return sorted(map(tuple, bm25_search_prf(idx, q, k=10).collect()))

    assert run(docs.repartition(7)) == run(docs.coalesce(1))


def test_incremental_bm25_equals_full_rebuild(spark, tmp_path):
    """N ingested batches must search EXACTLY like bm25_index over their
    union — idf/avgdl derive corpus-wide at read, never frozen at ingest
    — and compact() folds tables without changing a single score."""
    from oracle_vectorsearch_example_spark.operators.bm25 import (
        IncrementalBm25,
        bm25_index,
        bm25_search,
    )

    rows = [(i, f"w{i % 5} w{(i * 3) % 11} common text body") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "w1 common"), (1, "w7 text")], "qid long, qtext string"
    )

    inc = IncrementalBm25(spark, str(tmp_path / "bm"))
    with pytest.raises(ValueError, match="ingested"):
        inc.index()
    v1 = inc.ingest(docs.filter(F.col("doc_id") < 20))
    v2 = inc.ingest(docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 45)))
    v3 = inc.ingest(docs.filter(F.col("doc_id") >= 45))
    assert v1 < v2 < v3

    want = sorted(map(tuple, bm25_search(bm25_index(docs), q, k=10).collect()))
    got = sorted(map(tuple, bm25_search(inc.index(), q, k=10).collect()))
    assert got == want

    assert len(inc._tables("postings")) == 3
    assert inc.compact() is not None
    assert len(inc._tables("postings")) == 1
    after = sorted(map(tuple, bm25_search(inc.index(), q, k=10).collect()))
    assert after == want
    assert inc.compact() is None  # nothing left to fold
