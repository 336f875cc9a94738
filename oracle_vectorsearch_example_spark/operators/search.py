"""Batch vector similarity search (J10 / X5) — the query side of the
reference's vector index (ORDER BY VECTOR_DISTANCE ... FETCH FIRST k,
01_pdf_to_vector.sql:84-97).

Scale design: queries are broadcast (small side); the base table is scanned
once, partition-local. A naive window-over-everything would shuffle
N_base × N_query rows on query id; instead we do **two-phase top-k**:
per-partition top-k first (cheap, local sort bounded by k), then a final
top-k over P·k·Q survivor rows. At 1000 executors the shuffle is
Q·k·P rows, not N·Q.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.distances import vector_distance


def topk_search(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qvec",
    exclude_self: bool = False,
    two_phase: bool = True,
) -> DataFrame:
    """For each query vector, the k nearest base rows.

    Returns (query_id, rank, base_id, distance); rank is 1-based, ties
    broken by base id so results are deterministic.
    """
    q = queries.select(
        F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qvec")
    )
    joined = base.select(base_id, base_vec).join(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col(base_id) != F.col("__qid"))
    dist = vector_distance(F.col(base_vec), F.col("__qvec"), metric)
    scored = joined.select(
        F.col("__qid"), F.col(base_id).alias("__bid"), dist.alias("__dist")
    )

    order = [F.col("__dist").asc(), F.col("__bid").asc()]
    if two_phase:
        # phase 1: top-k within each input partition (no shuffle)
        part_w = Window.partitionBy("__qid", F.spark_partition_id()).orderBy(*order)
        scored = (
            scored.withColumn("__pr", F.row_number().over(part_w))
            .filter(F.col("__pr") <= k)
            .drop("__pr")
        )
    # phase 2: global top-k per query (shuffle bounded by P·k rows/query)
    final_w = Window.partitionBy("__qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("rank").cast("long").alias("rank"),
            F.col("__bid").alias(base_id),
            F.col("__dist").alias("distance"),
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, similarity ≥
    threshold). Exact all-pairs — the brute-force baseline; use IvfIndex
    bucketing for the 100 TB path."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    sim = F.lit(1.0) - vector_distance(F.col("__va"), F.col("__vb"), "cosine")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
