"""Embedding outlier detection (X46, data-quality extension surface):
per-cluster distance z-scores against a REFERENCE center frame — the
vector-side sibling of X43's PSI monitor. PSI says "the distribution
moved"; this says "THESE rows are wrong" (corrupt decodes, mojibake
text embedded anyway, wrong-modality rows, all-zero vectors) so the
pipeline can quarantine them before they poison dedup thresholds and
index training.

Frozen, engine-replayable spec (centers are an INPUT frame — pass IVF
centroids, class means, or hand-picked anchors; keeping the trained
artifact out of the formula is what makes the whole computation
SQL-replayable, unlike KMeans itself):

- assignment: nearest center by L2 over the broadcast center frame,
  ties broken by center id (argmin via one bounded cross join + a
  (row, center-distance) min — centers are metadata-sized by contract);
- per-cluster mean μ and population std σ of the distances, computed
  with order-canonicalized folds (id-sorted, round(9) partials,
  round(6) finals — the bm25 discipline, so DuckDB's plain aggregates
  reproduce them at 6dp);
- outlier ⇔ σ > 0 and round((d − μ)/σ, 6) > z. Clusters with one
  member (σ = 0) flag nothing — a lone row is its own distribution.

Plan shape: one broadcast nested-loop against ≤ |centers| rows per
input row (JVM, no UDF), two cluster-keyed aggregates over skinny
(cluster, distance) rows, one re-join on the row id. Payloads never
shuffle; nothing scales with corpus width but the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_centers", "embedding_outliers", "prototype_prune"]


def _l2(a, b):
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def assign_centers(
    df: DataFrame,
    centers: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id: str = "center_id",
    center_vec: str = "center",
) -> DataFrame:
    """(id_col, cluster, dist): nearest center by L2, ties by center id.
    The centers frame broadcasts (metadata-sized by contract)."""
    joined = df.select(id_col, vec_col).crossJoin(
        F.broadcast(centers.select(center_id, center_vec))
    )
    scored = joined.select(
        id_col,
        F.col(center_id).alias("cluster"),
        F.round(_l2(F.col(vec_col), F.col(center_vec)), 9).alias("dist"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("dist").asc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def embedding_outliers(
    df: DataFrame,
    centers: DataFrame,
    z: float = 3.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id: str = "center_id",
    center_vec: str = "center",
    canonical: bool = True,
) -> DataFrame:
    """Rows whose distance to their nearest center is more than ``z``
    population standard deviations above that cluster's mean distance.
    Returns (id_col, cluster, dist, zscore) for flagged rows only.

    ``canonical=True`` (default) computes μ/σ with the order-canonicalized
    fold — collect_list of the WHOLE cluster's (id, dist) structs into one
    aggregation buffer. That buys bit-exact engine replay (the golden) at
    the cost of a per-cluster memory bound: a cluster must fit one task's
    buffer (~tens of millions of skinny structs). At production scale —
    IVF-centroid clusters of unbounded size — pass ``canonical=False``:
    plain distributive avg/sum-of-squares aggregates (map-side partials,
    constant memory per task, no cardinality bound), identical math but
    partition-order FP summation, so results may differ in the last
    ulps — fine for quarantining, not for hash goldens."""
    a = assign_centers(df, centers, vec_col, id_col, center_id, center_vec)
    if canonical:
        stats = (
            a.groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("dist").alias("d")))
                ).alias("ds"),
                F.count("*").alias("n"),
            )
            .select(
                "cluster",
                "n",
                F.round(
                    F.aggregate("ds", F.lit(0.0), lambda acc, s: acc + s["d"])
                    / F.col("n"),
                    9,
                ).alias("mu"),
                F.round(
                    F.aggregate(
                        "ds", F.lit(0.0), lambda acc, s: acc + s["d"] * s["d"]
                    )
                    / F.col("n"),
                    9,
                ).alias("m2"),
            )
        )
    else:
        stats = a.groupBy("cluster").agg(
            F.count("*").alias("n"),
            F.round(F.sum("dist") / F.count("*"), 9).alias("mu"),
            F.round(F.sum(F.col("dist") * F.col("dist")) / F.count("*"), 9).alias("m2"),
        )
    stats = stats.select(
        "cluster",
        "n",
        "mu",
        F.round(
            F.sqrt(F.greatest(F.col("m2") - F.col("mu") * F.col("mu"), F.lit(0.0))),
            9,
        ).alias("sigma"),
    )
    return (
        a.join(F.broadcast(stats), "cluster")
        .withColumn(
            "zscore",
            F.when(
                F.col("sigma") > 0,
                F.round((F.col("dist") - F.col("mu")) / F.col("sigma"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .filter(F.col("zscore") > z)
        .select(id_col, "cluster", "dist", "zscore")
    )


def prototype_prune(
    df: DataFrame,
    centers: DataFrame,
    drop_frac: float = 0.1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    center_id: str = "center_id",
    center_vec: str = "center",
) -> DataFrame:
    """D4's diversification stage (Tirumala et al. 2023, "D4: Improving
    LLM Pretraining via Document De-Duplication and Diversification",
    arXiv:2308.12284 — the step AFTER SemDeDup): within each cluster,
    drop the ``drop_frac`` fraction of rows CLOSEST to the centroid —
    the most prototypical documents, which near-duplicate the cluster's
    central mass semantically and add the least marginal information —
    keeping the cluster's diverse shell. The mirror image of
    :func:`embedding_outliers` (which flags the far tail as corrupt).

    Frozen spec: assignment via :func:`assign_centers` (L2, id
    tie-break); per cluster, rank by (dist asc, id asc) and drop ranks
    ≤ floor(drop_frac · cluster_size) — exact integer cutoffs, so the
    survivor set is engine-replayable. Returns the SURVIVING rows of
    ``df``, ids semi-joined back (payloads never shuffle).

    Compose D4 as: ``semdedup(...)`` → ``prototype_prune(...)`` with
    the same KMeans centers for both stages."""
    if not 0.0 <= drop_frac < 1.0:
        raise ValueError(f"drop_frac must be in [0, 1), got {drop_frac}")
    a = assign_centers(df, centers, vec_col, id_col, center_id, center_vec)
    w = Window.partitionBy("cluster").orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    n = Window.partitionBy("cluster")
    keep = (
        a.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(n))
        .filter(
            F.col("__rn")
            > F.floor(F.lit(float(drop_frac)) * F.col("__n")).cast("long")
        )
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
