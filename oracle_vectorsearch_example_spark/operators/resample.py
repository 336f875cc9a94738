"""Time-series resampling: bucketed aggregation with gap fill (extension
surface, the `time_bucket_gapfill` shape from time-series databases).

Events rarely cover every interval; training-feature and monitoring
pipelines need a REGULAR grid: one row per (key, bucket) over the key's
active span, with empty buckets filled by a policy — ``null`` (explicit
gap), ``locf`` (last observation carried forward), or ``linear``
(interpolation between the neighboring observed buckets).

Plan shape: one groupBy(key, bucket) aggregates the observed values; ONE
window (`lead` over key) finds each observation's successor; every gap
bucket between the two is then generated ROW-LOCALLY (`sequence` +
explode) and every fill policy (locf carry, linear interpolation) is a
row-local expression over (this obs, next obs) — no per-key span
aggregate, no grid join, no global calendar. Total cost: two shuffles
(bucket agg + key window), verified by a plan test. Skewed keys fall to
AQE like any other keyed aggregation.
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
        df.select(F.col(key), bucket.alias("__ob"), F.col(value_col))
        .groupBy(key, "__ob")
        .agg(
            F.count("*").alias("__n"),
            agg_fn(value_col).alias("__v"),
        )
    )

    # each observation owns the half-open range up to its successor: the
    # gap buckets are generated row-locally from (this obs, next obs)
    w = Window.partitionBy(key).orderBy("__ob")
    width = F.expr(f"INTERVAL {bucket_width}")
    staged = observed.withColumn("__nb", F.lead("__ob").over(w)).withColumn(
        "__nv", F.lead("__v").over(w)
    )
    seq_end = F.coalesce(F.col("__nb") - width, F.col("__ob"))
    spans = staged.withColumn(
        "bucket_start", F.explode(F.sequence(F.col("__ob"), seq_end, width))
    )
    is_obs = F.col("bucket_start") == F.col("__ob")

    if fill == "null":
        value = F.when(is_obs, F.col("__v"))
    elif fill == "locf":
        value = F.col("__v")  # the owning observation carries forward
    else:  # linear: position within [this obs, next obs], in bucket steps
        step = (
            F.unix_micros("bucket_start") - F.unix_micros("__ob")
        ) / (F.unix_micros("__nb") - F.unix_micros("__ob"))
        value = F.when(is_obs, F.col("__v")).otherwise(
            F.col("__v") + (F.col("__nv") - F.col("__v")) * step
        )
    return spans.select(
        F.col(key),
        "bucket_start",
        F.when(is_obs, F.col("__n")).otherwise(F.lit(0)).cast("long").alias("n_events"),
        value.alias("value"),
    )
