"""Embedding / feature drift monitoring via PSI (X43, training-pipeline
extension surface, SURVEY.md §2.12 family).

The 100 TB problem this serves: a standing corpus pipeline re-embeds
batches for months — a silent embedder upgrade, a tokenizer change, or
a source-mix shift moves the embedding distribution, and every
downstream index/threshold (IVF centroids, SemDeDup taus, BQ planes)
quietly degrades. The standard production monitor is the Population
Stability Index per feature:

    PSI_d = Σ_bucket (p_cur − p_ref) · ln(p_cur / p_ref)

with the usual reading (Karakoulas/credit-scoring folklore, public):
< 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action. Everything here
is frozen for engine replay (the histogram-golden discipline):

- buckets are EQUI-WIDTH over the reference's per-dimension [min, max]
  (min/max are exact, order-independent aggregates — no quantile
  sketch whose result depends on partition layout), computed with the
  same explicit IEEE formula as the `histogram` golden; current-batch
  outliers clamp into the edge buckets;
- probabilities are add-alpha smoothed, p = (count + α) / (n + α·B),
  so an empty bucket cannot produce ±inf;
- the per-dimension sum folds ≤ B terms — order-canonicalized
  (bucket-sorted array fold) + round(6), the bm25.py hash-stability
  discipline, so the report is layout-independent and DuckDB can
  replay it with a plain round(sum(), 6).

Plan shape: one posexplode per frame (skinny (dim, x) rows — payloads
never move), per-dim min/max broadcast back, two (dim, bucket) count
aggregates, one ≤ dims×B-row join. Nothing scales with corpus width
but the two scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10
ALPHA = 0.5

__all__ = ["psi_report", "psi_drifted_dims"]


def _events(df: DataFrame, vec_col: str) -> DataFrame:
    return df.select(F.posexplode(F.col(vec_col)).alias("dim", "x")).filter(
        F.col("x").isNotNull()
    )


def _bucket_counts(
    events: DataFrame, stats: DataFrame, n_buckets: int
) -> DataFrame:
    j = events.join(F.broadcast(stats), "dim")
    raw = (
        F.floor(
            (F.col("x") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * F.lit(float(n_buckets))
        )
        + 1
    )
    b = F.least(F.greatest(raw, F.lit(1)), F.lit(n_buckets))
    b = F.when(F.col("hi") == F.col("lo"), F.lit(1)).otherwise(b)
    return (
        j.groupBy("dim", b.cast("int").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    n_buckets: int = N_BUCKETS,
    alpha: float = ALPHA,
) -> DataFrame:
    """Per-dimension PSI of ``cur`` against ``ref`` (see module
    docstring). Returns (dim, psi, n_ref, n_cur) — psi rounded to 6dp,
    layout-independent, DuckDB-replayable."""
    re_ = _events(ref, vec_col)
    ce = _events(cur, vec_col)
    stats = re_.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    rc = _bucket_counts(re_, stats, n_buckets).withColumnRenamed("cnt", "r")
    cc = _bucket_counts(ce, stats, n_buckets).withColumnRenamed("cnt", "c")
    # fixed-B PSI sums over the FULL dim × bucket grid, not just the
    # observed cells: when n_ref != n_cur, add-alpha smoothing gives a
    # bucket empty in BOTH frames a nonzero term — observed-cells-only
    # would silently drop it (ADVICE r7). The grid is ≤ dims×B rows.
    grid = stats.select(
        "dim",
        F.explode(F.sequence(F.lit(1), F.lit(n_buckets))).alias("bucket"),
    )
    cells = (
        grid.join(rc, ["dim", "bucket"], "left")
        .join(cc, ["dim", "bucket"], "left")
        .select(
            "dim",
            "bucket",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    totals = cells.groupBy("dim").agg(
        F.sum("r").alias("rn"), F.sum("c").alias("cn")
    )
    a, bname = float(alpha), float(alpha * n_buckets)
    term = cells.join(totals, "dim").select(
        "dim",
        "bucket",
        "rn",
        "cn",
        (
            (
                (F.col("c") + F.lit(a)) / (F.col("cn") + F.lit(bname))
                - (F.col("r") + F.lit(a)) / (F.col("rn") + F.lit(bname))
            )
            * F.log(
                ((F.col("c") + F.lit(a)) / (F.col("cn") + F.lit(bname)))
                / ((F.col("r") + F.lit(a)) / (F.col("rn") + F.lit(bname)))
            )
        ).alias("t"),
    )
    # order-canonicalized ≤ n_buckets-term fold (bm25 discipline)
    folded = (
        term.groupBy("dim", "rn", "cn")
        .agg(F.array_sort(F.collect_list(F.struct("bucket", "t"))).alias("ts"))
        .select(
            "dim",
            F.round(
                F.aggregate(
                    "ts", F.lit(0.0), lambda acc, s: acc + s["t"]
                ),
                6,
            ).alias("psi"),
            F.col("rn").alias("n_ref"),
            F.col("cn").alias("n_cur"),
        )
    )
    return folded


def psi_drifted_dims(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    threshold: float = 0.25,
    n_buckets: int = N_BUCKETS,
    alpha: float = ALPHA,
) -> DataFrame:
    """Dimensions whose PSI exceeds ``threshold`` (the standard 0.25
    "action" level) — the alert surface a pipeline gates on."""
    return psi_report(ref, cur, vec_col, n_buckets, alpha).filter(
        F.col("psi") > threshold
    )
