"""Snippet extraction (X38 — CTX_DOC.SNIPPET analog): best query-term
window per (query, doc), hand-checkable fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.snippet import snippet_df


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "noise noise spark joins are fast and spark shuffles are costly "
            "noise noise noise"),
        (1, "spark appears early then nothing relevant for a long while "
            "until spark and joins meet again at the end"),
        (2, "nothing relevant here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [(0, "spark joins")], "qid long, qtext string"
    )


def test_best_window_and_counts(spark, docs, queries):
    out = {r.doc_id: r for r in snippet_df(docs, queries, window=6).collect()}
    # doc 0: window starting at 'spark' (pos 2) covers spark, joins,
    # and the second spark at pos 7? no — window 6 = pos 2..7 → spark(2),
    # joins(3), spark(7) = 3 matches
    assert out[0].n_matches == 3 and out[0].start_pos == 2
    assert out[0].snippet.split()[0] == "spark"
    assert len(out[0].snippet.split()) == 6
    # doc 1: the tail cluster (spark ... joins) beats the lone early spark
    assert out[1].n_matches == 2
    assert "spark and joins" in out[1].snippet
    # doc 2 shares no term → absent
    assert 2 not in out


def test_window_clips_at_doc_end(spark, queries):
    docs = spark.createDataFrame(
        [(0, "tail words then spark joins")], "doc_id long, text string"
    )
    r = snippet_df(docs, queries, window=10).collect()[0]
    # slice clips at the end: snippet is shorter than the window
    assert r.snippet == "spark joins" or r.snippet.endswith("spark joins")
    assert r.n_matches == 2


def test_hits_restriction(spark, docs, queries):
    hits = spark.createDataFrame([(0, 1)], "qid long, doc_id long")
    out = snippet_df(docs, queries, window=6, hits=hits).collect()
    assert {r.doc_id for r in out} == {1}


def test_tie_breaks_earliest(spark):
    docs = spark.createDataFrame(
        [(0, "spark here and later spark again")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(0, "spark")], "qid long, qtext string")
    r = snippet_df(docs, q, window=3).collect()[0]
    assert r.start_pos == 0 and r.n_matches == 1


def test_bad_window(docs, queries):
    with pytest.raises(ValueError, match="window"):
        snippet_df(docs, queries, window=0)


def test_deterministic_and_jvm_only(spark, docs, queries):
    def run(d):
        return sorted(map(tuple, snippet_df(d, queries, window=6).collect()))

    assert run(docs.repartition(7)) == run(docs.coalesce(1))
    plan = (
        snippet_df(docs, queries, window=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
