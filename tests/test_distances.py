"""Distance-expression identities (F7, 01_pdf_to_vector.sql:86-92)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.distances import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    l1_distance,
    l2_distance,
    vector_distance,
)
from oracle_vectorsearch_example_spark.functions.vectors import normalize_l2, parse_vector


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        (2, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (3, [1.0, 1.0, 0.0], [2.0, 2.0, 0.0]),
        (4, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),
    ]
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>")


def _one(df, col):
    return {r.id: r.v for r in df.select("id", col.alias("v")).collect()}


def test_dot(vecs):
    d = _one(vecs, dot_product(F.col("a"), F.col("b")))
    assert d[1] == 0.0 and d[2] == 14.0 and d[3] == 4.0


def test_l2_l1(vecs):
    l2 = _one(vecs, l2_distance(F.col("a"), F.col("b")))
    l1 = _one(vecs, l1_distance(F.col("a"), F.col("b")))
    assert l2[2] == 0.0 and l1[2] == 0.0
    assert math.isclose(l2[1], math.sqrt(2))
    assert l1[1] == 2.0


def test_cosine(vecs):
    sim = _one(vecs, cosine_similarity(F.col("a"), F.col("b")))
    dist = _one(vecs, cosine_distance(F.col("a"), F.col("b")))
    assert sim[1] == 0.0 and dist[1] == 1.0
    assert math.isclose(sim[2], 1.0) and math.isclose(dist[2], 0.0, abs_tol=1e-12)
    assert math.isclose(sim[3], 1.0)
    assert sim[4] == 0.0  # zero vector convention


def test_symmetry(vecs):
    ab = _one(vecs, vector_distance(F.col("a"), F.col("b"), "cosine"))
    ba = _one(vecs, vector_distance(F.col("b"), F.col("a"), "cosine"))
    assert ab == ba


def test_metric_aliases(vecs):
    for m in ("cosine", "euclidean", "l2", "dot", "dot_product", "manhattan", "l1"):
        assert _one(vecs, vector_distance(F.col("a"), F.col("b"), m))
    with pytest.raises(ValueError):
        vector_distance(F.col("a"), F.col("b"), "hamming")


def test_l2_dot_identity(vecs):
    # ||a-b||^2 == <a,a> + <b,b> - 2<a,b>
    got = vecs.select(
        (l2_distance(F.col("a"), F.col("b")) ** 2).alias("lhs"),
        (
            dot_product(F.col("a"), F.col("a"))
            + dot_product(F.col("b"), F.col("b"))
            - 2 * dot_product(F.col("a"), F.col("b"))
        ).alias("rhs"),
    ).collect()
    for r in got:
        assert math.isclose(r.lhs, r.rhs, abs_tol=1e-9)


def test_normalize_and_parse(spark):
    df = spark.createDataFrame([(1, "[3.0, 4.0]")], "id long, s string")
    out = df.select(normalize_l2(parse_vector(F.col("s"))).alias("v")).collect()[0].v
    assert out == [0.6, 0.8]
