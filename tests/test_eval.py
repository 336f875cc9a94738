"""X45 retrieval evaluation: hand-computed MRR/nDCG/P/R on a tiny
fixture, perfect-ranking == 1.0, graded relevance, missing-judgment
queries, summary means, layout determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.eval import (
    eval_rankings,
    eval_summary,
)


@pytest.fixture()
def fixture(spark):
    # q1: relevant docs {10 (rel 2), 20 (rel 1)}; ranking hits 20@1, 10@3
    # q2: relevant {30}; ranking misses entirely
    # q3: no judgments at all
    results = spark.createDataFrame(
        [
            (1, 20, 1), (1, 99, 2), (1, 10, 3),
            (2, 98, 1), (2, 97, 2),
            (3, 96, 1),
        ],
        "qid long, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 1), (2, 30, 1)],
        "qid long, doc_id long, rel int",
    )
    return results, qrels


def test_hand_computed_metrics(spark, fixture):
    results, qrels = fixture
    out = {r["qid"]: r for r in eval_rankings(results, qrels, k=3).collect()}
    # q1: DCG = 1/log2(2) + 2/log2(4) = 1 + 1 = 2
    assert out[1]["dcg"] == 2.0
    # IDCG: ideal order rel desc -> (2@1, 1@2): 2/1 + 1/log2(3)
    idcg = round(2.0 + 1.0 / math.log2(3), 6)
    assert out[1]["idcg"] == idcg
    assert out[1]["ndcg"] == round(2.0 / idcg, 6)
    assert out[1]["mrr"] == 1.0  # first relevant at rank 1
    assert out[1]["precision"] == round(2 / 3, 6)
    assert out[1]["recall"] == 1.0
    # q2: no hits
    assert out[2]["ndcg"] == 0.0 and out[2]["mrr"] == 0.0
    assert out[2]["recall"] == 0.0 and out[2]["n_rel"] == 1
    # q3: no judgments
    assert out[3]["ndcg"] == 0.0 and out[3]["n_rel"] == 0


def test_perfect_ranking_scores_one(spark):
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "qid long, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 1)], "qid long, doc_id long, rel int"
    )
    [r] = eval_rankings(results, qrels, k=2).collect()
    assert r["ndcg"] == 1.0 and r["mrr"] == 1.0 and r["recall"] == 1.0


def test_summary_means(spark, fixture):
    results, qrels = fixture
    [s] = eval_summary(results, qrels, k=3).collect()
    per_q = {r["qid"]: r for r in eval_rankings(results, qrels, k=3).collect()}
    assert s["n_queries"] == 3
    assert s["mean_mrr"] == round(sum(per_q[q]["mrr"] for q in (1, 2, 3)) / 3, 6)
    assert s["mean_ndcg"] == round(sum(per_q[q]["ndcg"] for q in (1, 2, 3)) / 3, 6)


def test_k_cutoff_applies(spark, fixture):
    results, qrels = fixture
    out = {r["qid"]: r for r in eval_rankings(results, qrels, k=1).collect()}
    # at k=1 only doc 20 (rel 1) counts for q1; ideal@1 = rel 2 at rank 1
    assert out[1]["dcg"] == 1.0
    assert out[1]["idcg"] == 2.0
    assert out[1]["ndcg"] == 0.5
    assert out[1]["precision"] == 1.0 and out[1]["recall"] == 0.5


def test_judged_but_unreturned_query_scores_zero(spark, fixture):
    """trec_eval convention: a judged query the engine returned no rows
    for must appear with all-zero mrr/ndcg/precision/recall (not vanish
    from the frame), deflating the corpus means accordingly."""
    results, qrels = fixture
    qrels4 = qrels.union(
        spark.createDataFrame([(4, 50, 1)], "qid long, doc_id long, rel int")
    )
    out = {r["qid"]: r for r in eval_rankings(results, qrels4, k=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    q4 = out[4]
    assert q4["mrr"] == 0.0 and q4["ndcg"] == 0.0
    assert q4["precision"] == 0.0 and q4["recall"] == 0.0
    assert q4["n_rel"] == 1 and q4["idcg"] > 0
    [s] = eval_summary(results, qrels4, k=3).collect()
    assert s["n_queries"] == 4
    per_q = {r["qid"]: r for r in eval_rankings(results, qrels4, k=3).collect()}
    assert s["mean_mrr"] == round(sum(per_q[q]["mrr"] for q in (1, 2, 3, 4)) / 4, 6)


def test_layout_determinism(spark, fixture):
    results, qrels = fixture
    a = sorted(map(tuple, eval_rankings(results, qrels, k=3).collect()))
    b = sorted(
        map(
            tuple,
            eval_rankings(results.repartition(7), qrels.repartition(5), k=3).collect(),
        )
    )
    assert a == b


# --------------------------------------------- answer grounding (X51)
def test_grounding_hand_fixture(spark):
    from oracle_vectorsearch_example_spark.operators.eval import (
        grounding_score,
    )

    answers = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # fully inside ctx
            (2, "purple monkey dishwasher quantum"),  # nothing in ctx
            (3, "the quick brown zebra runs"),  # partial
            (4, "hi"),  # < n tokens: drops out
        ],
        "qid long, answer string",
    )
    contexts = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox"),
            (3, "a b the quick brown c d"),
            (4, "anything at all here"),
        ],
        "qid long, context string",
    )
    out = {r["qid"]: r for r in grounding_score(answers, contexts, n=3).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["grounding"] == 1.0 and out[1]["n_grams"] == 3
    assert out[2]["grounding"] == 0.0
    # answer 3 trigrams: "the quick brown"(hit), "quick brown zebra",
    # "brown zebra runs" -> 1/3
    assert out[3]["n_supported"] == 1
    assert out[3]["grounding"] == 0.333333


def test_grounding_unions_context_rows(spark):
    """Support comes from ANY of the query's context rows (the
    multi-passage RAG shape)."""
    from oracle_vectorsearch_example_spark.operators.eval import (
        grounding_score,
    )

    answers = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "qid long, answer string"
    )
    contexts = spark.createDataFrame(
        [(1, "alpha beta gamma x"), (1, "y delta epsilon zeta")],
        "qid long, context string",
    )
    [r] = grounding_score(answers, contexts, n=3).collect()
    # trigrams: abg(hit ctx1), bgd(no), gde(no), dez(hit ctx2) -> 2/4
    assert r["n_grams"] == 4 and r["n_supported"] == 2
    assert r["grounding"] == 0.5


def test_grounding_layout_determinism(spark):
    from oracle_vectorsearch_example_spark.operators.eval import (
        grounding_score,
    )

    answers = spark.createDataFrame(
        [(i, f"w{i} common words here and w{i+1} more") for i in range(20)],
        "qid long, answer string",
    )
    contexts = spark.createDataFrame(
        [(i, f"common words here and maybe w{i}") for i in range(20)],
        "qid long, context string",
    )
    a = sorted(map(tuple, grounding_score(answers, contexts).collect()))
    b = sorted(
        map(
            tuple,
            grounding_score(
                answers.repartition(7), contexts.repartition(3)
            ).collect(),
        )
    )
    assert a == b
