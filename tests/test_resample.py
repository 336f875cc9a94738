"""Time-series gap fill (operators/resample.py): regular per-key grids
with null/locf/linear fill. The locf path is oracle-checked by the
``gapfill_locf`` golden query; semantics are pinned here."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.resample import time_bucket_gapfill


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    # key 1: observations in buckets 10:00 and 10:20 — 10:05..10:15 are gaps
    # key 2: a single observation (span is one bucket, no gaps)
    rows = [
        (1, ts("2024-01-01 10:01:00"), 10.0),
        (1, ts("2024-01-01 10:03:00"), 2.0),
        (1, ts("2024-01-01 10:21:00"), 30.0),
        (2, ts("2024-01-01 11:02:00"), 7.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def grid(out):
    return {
        (r.user_id, r.bucket_start.isoformat()): (r.n_events, r.value)
        for r in out.collect()
    }


def test_grid_covers_span_null_fill(events):
    g = grid(time_bucket_gapfill(events, "5 minutes", fill="null"))
    assert g[(1, "2024-01-01T10:00:00")] == (2, 12.0)
    assert g[(1, "2024-01-01T10:05:00")] == (0, None)
    assert g[(1, "2024-01-01T10:10:00")] == (0, None)
    assert g[(1, "2024-01-01T10:15:00")] == (0, None)
    assert g[(1, "2024-01-01T10:20:00")] == (1, 30.0)
    assert g[(2, "2024-01-01T11:00:00")] == (1, 7.0)
    assert len(g) == 6  # no buckets outside either key's span


def test_locf_carries_forward(events):
    g = grid(time_bucket_gapfill(events, "5 minutes", fill="locf"))
    assert g[(1, "2024-01-01T10:05:00")] == (0, 12.0)
    assert g[(1, "2024-01-01T10:15:00")] == (0, 12.0)
    assert g[(1, "2024-01-01T10:20:00")] == (1, 30.0)


def test_linear_interpolates(events):
    g = grid(time_bucket_gapfill(events, "5 minutes", fill="linear"))
    # 12.0 at bucket 0, 30.0 at bucket 4 -> 16.5 / 21.0 / 25.5 between
    assert g[(1, "2024-01-01T10:05:00")] == (0, 16.5)
    assert g[(1, "2024-01-01T10:10:00")] == (0, 21.0)
    assert g[(1, "2024-01-01T10:15:00")] == (0, 25.5)
    assert g[(1, "2024-01-01T10:00:00")] == (2, 12.0)  # observed untouched


def test_agg_variants_and_validation(events):
    g = grid(time_bucket_gapfill(events, "5 minutes", agg="max", fill="null"))
    assert g[(1, "2024-01-01T10:00:00")] == (2, 10.0)
    with pytest.raises(ValueError, match="fill"):
        time_bucket_gapfill(events, "5 minutes", fill="bogus")
    with pytest.raises(ValueError, match="agg"):
        time_bucket_gapfill(events, "5 minutes", agg="median")


def test_ntz_input_accepted(events):
    ntz = events.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    a = grid(time_bucket_gapfill(events, "5 minutes", fill="locf"))
    b = grid(time_bucket_gapfill(ntz, "5 minutes", fill="locf"))
    assert a == b


def test_plan_is_two_shuffles(events):
    """Bucket aggregation + the key window — nothing else shuffles (no
    span aggregate, no grid join)."""
    for fill in ("null", "locf", "linear"):
        plan = (
            time_bucket_gapfill(events, "5 minutes", fill=fill)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 2, (fill, plan)
