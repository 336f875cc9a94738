"""Blocked fuzzy matching (operators/fuzzy.py): SymSpell deletion
neighborhoods must propose a COMPLETE candidate set (checked against a
brute-force Levenshtein reference), and the verify step must kill every
false positive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.fuzzy import (
    fuzzy_join,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = [
    "spark", "spork", "sparks", "park", "sparkle", "shark", "stark",
    "spar", "scala", "scale", "whale", "hale", "table", "cable", "able",
    "abble", "", "a", "b", "ab",
]


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame(
        list(enumerate(WORDS)), "doc_id long, name string"
    )


@pytest.mark.parametrize("d", [1, 2])
def test_matches_brute_force(spark, words_df, d):
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_self_pairs(words_df, "name", max_dist=d).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in enumerate(WORDS)
        for j, b in enumerate(WORDS)
        if i < j and _lev(a, b) <= d
    }
    assert got == want


def test_fuzzy_join_two_frames(spark):
    left = spark.createDataFrame(
        [(0, "customer"), (1, "suplier"), (2, "order")],
        "doc_id long, name string",
    )
    right = spark.createDataFrame(
        [(10, "customar"), (11, "supplier"), (12, "nation")],
        "doc_id long, name string",
    )
    got = {
        (r.doc_id_l, r.doc_id_r, r.dist)
        for r in fuzzy_join(left, right, "name", "name", max_dist=1).collect()
    }
    assert got == {(0, 10, 1), (1, 11, 1)}


def test_long_field_fails_loudly(spark):
    df = spark.createDataFrame(
        [(0, "x" * 100)], "doc_id long, name string"
    )
    with pytest.raises(Exception, match="field-level"):
        fuzzy_self_pairs(df, "name").collect()


def test_bad_max_dist(words_df):
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_self_pairs(words_df, "name", max_dist=3)


def test_deterministic_under_repartition(spark, words_df):
    def run(d):
        return sorted(
            map(tuple, fuzzy_self_pairs(d, "name", max_dist=2).collect())
        )

    assert run(words_df.repartition(7)) == run(words_df.coalesce(1))


def test_no_python_udf(words_df):
    plan = (
        fuzzy_self_pairs(words_df, "name", max_dist=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
