"""Exact substring dedup (X35 — Lee et al. 2022 ExactSubstr semantics):
duplicated ≥ L-token spans are cut keep-first; originals keep their
surrounding text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.substring import (
    duplicated_gram_marks,
    exact_substring_dedup,
)

SHARED = "one two three four five six seven eight"  # 8 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, f"alpha beta {SHARED} gamma"),
        (1, f"delta {SHARED} epsilon zeta"),
        (2, f"{SHARED}"),
        (3, "totally original text with no shared passage at all here"),
        (4, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_and_cut_rest(spark, docs):
    out = {r.doc_id: r for r in exact_substring_dedup(docs, min_tokens=8).collect()}
    # doc 0 holds the corpus-first occurrence: untouched
    assert out[0].text == f"alpha beta {SHARED} gamma"
    assert out[0].n_removed_tokens == 0
    # docs 1 and 2 lose exactly the shared span, keep their own text
    assert out[1].text == "delta epsilon zeta"
    assert out[1].n_removed_tokens == 8
    assert out[2].text == "" and out[2].n_removed_tokens == 8
    # untouched docs pass through verbatim (single-space normalized)
    assert out[3].n_removed_tokens == 0
    assert out[4].text == "short doc" and out[4].n_removed_tokens == 0


def test_overlapping_spans_merge(spark):
    # a 10-token duplicated run with L=8 → three overlapping dup grams in
    # the copy; marked positions must merge to exactly the 10-token span
    run = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(0, f"{run} tail0"), (1, f"head1 {run} tail1")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in exact_substring_dedup(docs, min_tokens=8).collect()}
    assert out[0].n_removed_tokens == 0
    assert out[1].text == "head1 tail1"
    assert out[1].n_removed_tokens == 10


def test_within_doc_repeat_cut(spark):
    run = "p q r s t u v w"
    docs = spark.createDataFrame(
        [(0, f"{run} mid {run}")], "doc_id long, text string"
    )
    out = exact_substring_dedup(docs, min_tokens=8).collect()[0]
    # first occurrence survives, the later in-doc copy is cut
    assert out.text == f"{run} mid"
    assert out.n_removed_tokens == 8


def test_marks_frame_positions(spark, docs):
    marks = {
        (r.doc_id, r.pos)
        for r in duplicated_gram_marks(docs, min_tokens=8).collect()
    }
    assert marks == {(1, p) for p in range(1, 9)} | {(2, p) for p in range(8)}


def test_min_tokens_guard(docs):
    with pytest.raises(ValueError, match="min_tokens"):
        exact_substring_dedup(docs, min_tokens=1)


def test_deterministic_under_repartition(spark, docs):
    def run(d):
        return sorted(map(tuple, exact_substring_dedup(d, 8).collect()))

    assert run(docs.repartition(7)) == run(docs.coalesce(1))


def test_no_python_udf(docs):
    plan = (
        exact_substring_dedup(docs, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
