"""SQL-surface parity: the reference's function calls work in spark.sql
and agree with the column-expression library."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.distances import vector_distance
from oracle_vectorsearch_example_spark.functions.embedding import hashing_embedding
from oracle_vectorsearch_example_spark.functions.sql import register_sql_functions
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register_sql_functions(spark)
    read_table(spark, SF, "embeddings").createOrReplaceTempView("emb_sql")
    read_table(spark, SF, "documents").createOrReplaceTempView("docs_sql")


def test_sql_distances_match_column_exprs(spark):
    for metric in ("cosine", "l2", "dot", "manhattan"):
        got = spark.sql(
            f"""SELECT a.vec_id,
                       round(vector_distance(a.embedding, b.embedding, '{metric}'), 9) AS d
                FROM emb_sql a JOIN emb_sql b ON b.vec_id = a.vec_id + 1
                WHERE a.vec_id < 20 ORDER BY a.vec_id"""
        ).collect()
        e = read_table(spark, SF, "embeddings")
        a = e.filter(F.col("vec_id") < 20).select("vec_id", F.col("embedding").alias("va"))
        b = e.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("vb"))
        want = (
            a.join(b, "vec_id")
            .select(
                "vec_id",
                F.round(vector_distance(F.col("va"), F.col("vb"), metric), 9).alias("d"),
            )
            .orderBy("vec_id")
            .collect()
        )
        assert [(r.vec_id, r.d) for r in got] == [(r.vec_id, r.d) for r in want], metric


def test_sql_to_vector_and_norm(spark):
    r = spark.sql(
        "SELECT to_vector('[3.0, 4.0]') AS v, vector_norm(to_vector('[3.0, 4.0]')) AS n"
    ).collect()[0]
    assert list(r.v) == [3.0, 4.0] and r.n == 5.0


def test_sql_vector_distance_bad_metric_errors(spark):
    with pytest.raises(Exception, match="unknown metric"):
        spark.sql(
            "SELECT vector_distance(array(1.0d), array(1.0d), 'chebyshev')"
        ).collect()


def test_sql_embedding_matches_library(spark):
    got = spark.sql(
        """SELECT doc_id, round(element_at(vector_embedding(text), 1), 9) AS c0
           FROM docs_sql WHERE doc_id < 5 ORDER BY doc_id"""
    ).collect()
    want = (
        read_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 5)
        .select("doc_id", F.round(F.element_at(hashing_embedding(F.col("text"), 64), 1), 9).alias("c0"))
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_full_sql_similarity_query(spark):
    """The reference's end-to-end SQL shape (models/README.md:40 + ORDER BY
    VECTOR_DISTANCE ... FETCH FIRST k): pure SQL, no DataFrame API."""
    rows = spark.sql(
        """
        WITH q AS (SELECT vector_embedding('fast key order sort') AS qv)
        SELECT e.vec_id,
               vector_distance(e.embedding, q.qv, 'cosine') AS dist
        FROM emb_sql e CROSS JOIN q
        ORDER BY dist ASC, e.vec_id ASC LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    assert all(rows[i].dist <= rows[i + 1].dist for i in range(4))
