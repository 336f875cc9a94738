"""Time-series resampling: bucketed aggregation with gap fill (extension
surface, the `time_bucket_gapfill` shape from time-series databases).

Events rarely cover every interval; training-feature and monitoring
pipelines need a REGULAR grid: one row per (key, bucket) over the key's
active span, with empty buckets filled by a policy — ``null`` (explicit
gap), ``locf`` (last observation carried forward), or ``linear``
(interpolation between the neighboring observed buckets).

Plan shape: one groupBy(key, bucket) aggregates the observed values; the
missing buckets are generated ROW-LOCALLY per key (`sequence` + explode
of that key's own [min, max] span — never a cross join against a global
calendar); the fill is a window over (key, bucket) — co-partitioned with
the aggregation, so the whole operator costs two shuffles on the same
key. Skewed keys fall to AQE like any other keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FILLS = ("null", "locf", "linear")


def time_bucket_gapfill(
    df: DataFrame,
    bucket_width: str = "5 minutes",
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    agg: str = "sum",
    fill: str = "locf",
) -> DataFrame:
    """Regular per-key time grid: ``(key, bucket_start, n_events, value)``
    for EVERY bucket in the key's [first, last] event span.

    ``agg`` (sum/avg/min/max/count) folds observed rows per bucket;
    ``fill`` decides what empty buckets carry. ``n_events`` is 0 for
    generated buckets, so callers can always tell observed from filled.
    """
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}, got {fill!r}")
    agg_fn = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
    }.get(agg)
    if agg_fn is None:
        raise ValueError(f"unsupported agg {agg!r}")

    # cast: tz-less inputs (TIMESTAMP_NTZ) normalize like everywhere else
    ts = F.col(ts_col).cast("timestamp")
    bucket = F.window(ts, bucket_width).getField("start")
    observed = (
        df.select(F.col(key), bucket.alias("bucket_start"), F.col(value_col))
        .groupBy(key, "bucket_start")
        .agg(
            F.count("*").alias("n_events"),
            agg_fn(value_col).alias("__v"),
        )
    )

    # per-key bucket span, generated row-locally (no global calendar join)
    spans = observed.groupBy(key).agg(
        F.min("bucket_start").alias("__lo"), F.max("bucket_start").alias("__hi")
    )
    grid = spans.select(
        F.col(key),
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {bucket_width}"))
        ).alias("bucket_start"),
    )
    full = grid.join(observed, [key, "bucket_start"], "left").select(
        key,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.col("__v"),
    )

    w_past = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if fill == "null":
        out = full.withColumn("value", F.col("__v"))
    elif fill == "locf":
        out = full.withColumn("value", F.last("__v", ignorenulls=True).over(w_past))
    else:  # linear
        w_next = (
            Window.partitionBy(key)
            .orderBy("bucket_start")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pos = F.row_number().over(Window.partitionBy(key).orderBy("bucket_start"))
        staged = (
            full.withColumn("__pos", pos)
            .withColumn("__pv", F.last("__v", ignorenulls=True).over(w_past))
            .withColumn(
                "__ppos",
                F.last(F.when(F.col("__v").isNotNull(), pos), ignorenulls=True).over(w_past),
            )
            .withColumn("__nv", F.first("__v", ignorenulls=True).over(w_next))
            .withColumn(
                "__npos",
                F.first(F.when(F.col("__v").isNotNull(), pos), ignorenulls=True).over(w_next),
            )
        )
        frac = (F.col("__pos") - F.col("__ppos")) / (F.col("__npos") - F.col("__ppos"))
        interp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac
        out = staged.withColumn(
            "value",
            F.when(F.col("__v").isNotNull(), F.col("__v"))
            .when(F.col("__pv").isNull(), F.col("__nv"))  # before first obs
            .when(F.col("__nv").isNull(), F.col("__pv"))  # after last obs
            .otherwise(interp),
        )
    return out.select(key, "bucket_start", "n_events", "value")
