"""SQL-surface registration — the reference's user API is SQL
(VECTOR_DISTANCE / TO_VECTOR / VECTOR_EMBEDDING in queries,
01_pdf_to_vector.sql:86-92, :141-144; models/README.md:40). This module
makes the same calls work in ``spark.sql``.

Distance functions register as **SQL UDFs** (``CREATE FUNCTION ... RETURN
<expression>``, Spark 4): the body is the same zip_with/aggregate
expression as functions/distances.py, so SQL callers stay JVM-side — no
Python round-trip. ``vector_embedding`` registers the hashing pandas UDF
(embedding is the engine's designated Python boundary either way).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0d, (acc, x) -> acc + x)"


def _sql_udfs() -> list[str]:
    dot_ab, dot_aa, dot_bb = _dot("a", "b"), _dot("a", "a"), _dot("b", "b")
    den = f"(sqrt({dot_aa}) * sqrt({dot_bb}))"
    cos_sim = f"CASE WHEN {den} > 0 THEN {dot_ab} / {den} ELSE 0.0d END"
    return [
        f"""CREATE OR REPLACE TEMPORARY FUNCTION dot_product(
              a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
            RETURN {dot_ab}""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION cosine_distance(
              a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
            RETURN 1.0d - ({cos_sim})""",
        """CREATE OR REPLACE TEMPORARY FUNCTION l2_distance(
              a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
            RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                                  0.0d, (acc, x) -> acc + x))""",
        """CREATE OR REPLACE TEMPORARY FUNCTION l1_distance(
              a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
            RETURN aggregate(zip_with(a, b, (x, y) -> abs(x - y)),
                             0.0d, (acc, x) -> acc + x)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION vector_distance(
              a ARRAY<DOUBLE>, b ARRAY<DOUBLE>, metric STRING) RETURNS DOUBLE
            RETURN CASE lower(metric)
              WHEN 'cosine' THEN 1.0d - ({cos_sim})
              WHEN 'euclidean' THEN sqrt(aggregate(zip_with(a, b,
                   (x, y) -> (x - y) * (x - y)), 0.0d, (acc, x) -> acc + x))
              WHEN 'l2' THEN sqrt(aggregate(zip_with(a, b,
                   (x, y) -> (x - y) * (x - y)), 0.0d, (acc, x) -> acc + x))
              WHEN 'dot' THEN -({dot_ab})
              WHEN 'dot_product' THEN -({dot_ab})
              WHEN 'manhattan' THEN aggregate(zip_with(a, b,
                   (x, y) -> abs(x - y)), 0.0d, (acc, x) -> acc + x)
              WHEN 'l1' THEN aggregate(zip_with(a, b,
                   (x, y) -> abs(x - y)), 0.0d, (acc, x) -> acc + x)
              ELSE CAST(raise_error(concat('unknown metric: ', metric)) AS DOUBLE)
            END""",
        """CREATE OR REPLACE TEMPORARY FUNCTION to_vector(s STRING)
            RETURNS ARRAY<DOUBLE>
            RETURN from_json(s, 'array<double>')""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION vector_norm(a ARRAY<DOUBLE>)
            RETURNS DOUBLE
            RETURN sqrt({dot_aa})""",
    ]


def register_sql_functions(spark: SparkSession, embed_dim: int = 64) -> None:
    """Register the engine's SQL surface on this session. After this,
    e.g. ``SELECT vector_embedding(text), vector_distance(a, b, 'cosine')
    FROM ...`` works in plain ``spark.sql`` — the Spark analog of the
    reference's in-DB function calls."""
    for ddl in _sql_udfs():
        spark.sql(ddl)

    from oracle_vectorsearch_example_spark.functions.embedding import _embed_batch

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return _embed_batch(texts, embed_dim)

    spark.udf.register("vector_embedding", _embed)
