"""Batch sessionization (DQ-40; streaming twin in streaming/ingest.py).

Sessions = runs of events per key where consecutive gaps are <= the gap
threshold. Single window shuffle on (key): lag → new-session flag →
cumulative sum = session id. The canonical gaps-and-islands plan; at scale
the only shuffle is the partitionBy(key) — no join, no materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Tag each row with a 1-based ``session_id`` per key."""
    # cast: no-op on TIMESTAMP, keeps NTZ inputs working (unix_micros
    # requires TIMESTAMP; session tz is UTC so the cast is deterministic)
    ts = F.col(ts_col).cast("timestamp")
    w = Window.partitionBy(key).orderBy(ts.asc())
    gap_s = gap_minutes * 60.0
    prev = F.lag(ts).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev) > int(gap_s * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    ).drop("__new")


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session event count and duration (seconds)."""
    s = sessionize(df, key, ts_col, gap_minutes)
    ts = F.col(ts_col).cast("timestamp")
    return s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        (
            (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))) / 1_000_000.0
        ).alias("duration_sec"),
    )
