"""Range and as-of joins (J5–J9 extension surface).

- ``range_join``: equi-key + time-interval condition. Catalyst executes the
  equi part as a hash/sort-merge join and the interval as a post-filter, so
  the shuffle is on the key only. For skewed keys at scale, AQE skew-join
  handles splitting (enabled in the session factory).
- ``asof_join``: "latest right row at or before each left row" per key.
  Implemented with the union + window last-value trick: ONE shuffle on
  (key, ts) total, instead of a per-key O(n·m) non-equi join — the
  sort-merge-friendly formulation that survives 100× scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INTERVAL_UNIT_S = {
    "microsecond": 1e-6,
    "millisecond": 1e-3,
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _interval_seconds(interval: str) -> float:
    """Parse ``INTERVAL n UNIT [n UNIT ...]`` to seconds, driver-side.

    The bucket width is a plan-time constant; computing it must not launch a
    Spark job. Sub-second units are accepted (the caller clamps the bucket
    width up to 1 whole second — a wider bucket only adds candidates the
    interval filter re-checks, never wrong results). Calendar (month/year)
    units have no fixed width — pass ``bucket_seconds`` explicitly.
    """
    body = re.sub(r"^\s*INTERVAL\s+", "", interval.strip(), flags=re.I)
    pairs = re.findall(r"([+-]?\d+)\s+([A-Za-z]+)", body)
    if not pairs or re.sub(r"[+-]?\d+\s+[A-Za-z]+\s*", "", body).strip():
        raise ValueError(
            f"cannot parse {interval!r} as INTERVAL n UNIT [...]; "
            "pass bucket_seconds explicitly"
        )
    total = 0.0
    for n, unit in pairs:
        u = unit.lower().rstrip("s")
        if u not in _INTERVAL_UNIT_S:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {interval!r}; "
                "pass bucket_seconds explicitly"
            )
        total += int(n) * _INTERVAL_UNIT_S[u]
    return total


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 5 MINUTES",
    strategy: str = "filter",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Rows (l, r) with matching keys and r.ts in [l.ts + lower, l.ts + upper].

    - ``strategy="filter"``: equi-join on the keys, interval as a post
      filter. Right plan when keys are selective (few rows per key): one
      shuffle on the key, filter is free.
    - ``strategy="bucket"``: adds a time-bucket column to the join key —
      right rows land in bucket floor(ts/w); each left row probes only the
      buckets its interval overlaps. On hot keys (one user = millions of
      events) this bounds the per-task pair count to rows-per-bucket
      instead of rows-per-key²; the standard interval-bin plan for
      100 TB event joins. ``bucket_seconds`` defaults to the interval
      width (every interval then spans ≤ 2 buckets).
    """
    # cast(... as timestamp) everywhere a ts operand is consumed: no-op on
    # TIMESTAMP inputs (Catalyst folds it), and keeps the operator working
    # for external callers handing in TIMESTAMP_NTZ frames.
    l = left.select(*[F.col(c) for c in left.columns])
    r = right.select(*[F.col(c).alias(f"r_{c}") for c in right.columns])
    lo_expr = f"CAST({left_ts} AS TIMESTAMP) + {lower}"
    hi_expr = f"CAST({left_ts} AS TIMESTAMP) + {upper}"
    r_ts_expr = f"CAST(r_{right_ts} AS TIMESTAMP)"
    interval_cond = [
        F.expr(r_ts_expr) >= F.expr(lo_expr),
        F.expr(r_ts_expr) <= F.expr(hi_expr),
    ]
    if strategy == "filter":
        cond = [l[c] == r[f"r_{c}"] for c in on]
        return l.join(r, cond + interval_cond)
    if strategy != "bucket":
        raise ValueError(f"unknown strategy {strategy!r}; filter or bucket")

    # plan-time constant, computed driver-side (no Spark job); sub-second
    # widths round up to 1s (unix_seconds bucketing is whole-second — the
    # interval filter re-checks candidates, so a wider bucket is safe)
    import math as _math

    width_s = bucket_seconds or (_interval_seconds(upper) - _interval_seconds(lower))
    width_s = max(1, _math.ceil(width_s))
    rb = r.withColumn("__bucket", F.expr(f"unix_seconds({r_ts_expr}) div {width_s}"))
    lb = l.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_seconds({lo_expr}) div {width_s}"),
                F.expr(f"unix_seconds({hi_expr}) div {width_s}"),
            )
        ),
    )
    cond = [lb[c] == rb[f"r_{c}"] for c in on] + [lb["__bucket"] == rb["__bucket"]]
    return lb.join(rb, cond + interval_cond).drop("__bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    right.ts <= left.ts (direction='backward'; 'forward' mirrors it), per
    key. Left rows with no prior right row keep nulls.

    Union-based plan: tag sides, sort by (key, ts, side) and carry the last
    right value forward with a window — one shuffle, no non-equi join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]

    # cast: unify TIMESTAMP/TIMESTAMP_NTZ sides so the union resolves
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    if direction == "backward":
        # right rows sort before left rows at the same ts (<= semantics)
        w = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__is_left").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    else:
        w = Window.partitionBy("__k").orderBy(F.col("__ts").desc(), F.col("__is_left").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    filled = u.select(
        "__k",
        "__is_left",
        "__lrow",
        *[F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}") for c in value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv_{c}").alias(f"asof_{c}") for c in value_cols],
    )
