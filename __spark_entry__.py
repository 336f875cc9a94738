"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship EP1+EP3 pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the golden query surface defined in
``oracle_vectorsearch_example_spark.golden`` — one entry per implemented
operator from SURVEY.md §2, each paired (where SQL-expressible) with a
DuckDB oracle over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oracle_vectorsearch_example_spark import golden


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: documents → chunk →
    embed → top-5 cosine search for three query strings."""
    from oracle_vectorsearch_example_spark.session import tune_session

    tune_session(spark)
    return golden.QUERIES["flagship_search"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(golden.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Approx/ANN/iterative
    operators carry COUNT-shaped oracles (r12 verdict #2; names in
    ``golden.COUNT_ORACLE``): row cardinality + column names pinned
    relationally, value columns sentinels — their hash is intentionally
    not comparable (SURVEY.md §5 never hash-checks approx operators;
    numeric contracts live in tests/). Only ``semdedup`` remains
    oracle-less: its survivor count depends on KMeans blocking, which
    SQL cannot re-derive."""
    return dict(golden.ORACLE)
