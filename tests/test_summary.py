"""UTL_TO_SUMMARY (functions/summary.py, X26) — hand-computed Luhn
scores, both split modes, determinism, and the JVM-only plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.summary import (
    STOPWORDS,
    score_units,
    split_units,
    summarize_df,
    utl_to_summary,
)

DOC = (
    "spark shuffles data between stages. "
    "the optimizer prunes columns early! "
    "spark broadcasts small tables, and spark prunes partitions? "
    "tiny words go by."
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, DOC), (1, "alpha beta gamma alpha. beta alpha.")],
        "doc_id long, text string",
    )


def _py_reference(text, units):
    """Independent scorer: per-doc freq over kept tokens, unit = sum."""
    kept = [
        [
            w
            for w in re.findall(r"[a-z0-9]+", u.lower())
            if len(w) >= 3 and w not in STOPWORDS
        ]
        for u in units
    ]
    freq: dict[str, int] = {}
    for ws in kept:
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
    return [sum(freq[w] for w in ws) for ws in kept]


def test_sentence_mode_scores_match_reference(spark, docs):
    units = re.split(r"(?<=[.!?])\s+", DOC)
    expect = _py_reference(DOC, units)
    got = {
        r["unit_idx"]: (r["unit"], r["score"])
        for r in score_units(
            split_units(docs.filter("doc_id = 0"), mode="sentence")
        ).collect()
    }
    for i, u in enumerate(units):
        if expect[i] == 0:
            assert i not in got  # zero-token units never compete
        else:
            assert got[i] == (u, expect[i])


def test_topk_selection_and_rank_order(spark, docs):
    top = utl_to_summary(docs, max_units=2, mode="sentence").collect()
    mine = sorted(
        [(r["unit_idx"], r["rank"]) for r in top if r["doc_id"] == 0]
    )
    units = re.split(r"(?<=[.!?])\s+", DOC)
    scores = _py_reference(DOC, units)
    order = sorted(range(len(units)), key=lambda i: (-scores[i], i))[:2]
    assert [i for i, _ in mine] == sorted(order)
    # rank 1 is the max-score unit
    best = [r for r in top if r["doc_id"] == 0 and r["rank"] == 1][0]
    assert best["score"] == max(scores)


def test_fixed_mode_groups_and_drops_tail(spark):
    df = spark.createDataFrame(
        [(0, "one two three four five six seven")], "doc_id long, text string"
    )
    rows = split_units(df, mode="fixed", n_words=3).collect()
    assert [(r["unit_idx"], r["unit"]) for r in rows] == [
        (0, "one two three"),
        (1, "four five six"),
    ]  # the 1-word tail is dropped per the frozen spec


def test_summarize_df_joins_in_document_order(spark, docs):
    row = summarize_df(docs, max_units=2, mode="sentence").filter(
        "doc_id = 1"
    ).collect()[0]
    # selected units re-emitted in unit_idx order regardless of rank
    units = re.split(r"(?<=[.!?])\s+", "alpha beta gamma alpha. beta alpha.")
    scores = _py_reference("", units)
    pick = sorted(sorted(range(len(units)), key=lambda i: (-scores[i], i))[:2])
    assert row["summary"] == " ".join(units[i] for i in pick)


def test_layout_independence_and_jvm_plan(spark, docs):
    a = utl_to_summary(docs, mode="sentence").collect()
    b = utl_to_summary(docs.repartition(5), mode="sentence").collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    plan = (
        utl_to_summary(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mode_validation(spark, docs):
    with pytest.raises(ValueError, match="mode"):
        split_units(docs, mode="chars").collect()
    with pytest.raises(ValueError, match="n_words"):
        split_units(docs, mode="fixed", n_words=0).collect()
