"""Range and as-of joins (J5-J9 extension surface)."""

from __future__ import annotations

from datetime import datetime

import pytest

from oracle_vectorsearch_example_spark.operators.joins import asof_join, range_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, ts("2024-01-01 10:00:00"), 100.0),
        (1, ts("2024-01-01 10:05:00"), 101.0),
        (2, ts("2024-01-01 10:00:00"), 50.0),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, px double")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, ts("2024-01-01 09:59:00"), 99.5),
        (1, ts("2024-01-01 10:03:00"), 100.5),
        (2, ts("2024-01-01 10:01:00"), 49.5),  # after the only trade
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, bid double")


def test_asof_backward(trades, quotes):
    out = {(r.k, r.ts): r.asof_bid for r in
           asof_join(trades, quotes, on="k", value_cols=["bid"]).collect()}
    assert out[(1, ts("2024-01-01 10:00:00"))] == 99.5
    assert out[(1, ts("2024-01-01 10:05:00"))] == 100.5
    assert out[(2, ts("2024-01-01 10:00:00"))] is None  # no prior quote


def test_asof_forward(trades, quotes):
    out = {(r.k, r.ts): r.asof_bid for r in
           asof_join(trades, quotes, on="k", value_cols=["bid"],
                     direction="forward").collect()}
    assert out[(1, ts("2024-01-01 10:00:00"))] == 100.5
    assert out[(2, ts("2024-01-01 10:00:00"))] == 49.5


def test_asof_tie_takes_exact_ts(spark, trades):
    q = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1.0)], "k long, ts timestamp, bid double"
    )
    out = asof_join(trades, q, on="k", value_cols=["bid"]).collect()
    vals = {(r.k, r.ts): r.asof_bid for r in out}
    assert vals[(1, ts("2024-01-01 10:00:00"))] == 1.0  # <= semantics


def test_asof_rejects_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="k", direction="sideways")


def test_range_join(trades, quotes):
    got = range_join(
        trades, quotes, on=["k"], left_ts="ts", right_ts="ts",
        lower="INTERVAL 0 SECONDS", upper="INTERVAL 5 MINUTES",
    ).collect()
    pairs = {(r.k, r.ts, r.r_ts) for r in got}
    assert (1, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:03:00")) in pairs
    assert (2, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00")) in pairs
    # nothing outside the window
    assert all(r.r_ts >= r.ts for r in got)


def test_range_join_bucket_strategy_matches_filter(spark):
    """The time-bucketed plan is semantics-preserving: identical pairs to
    the equi-join + filter plan."""
    from oracle_vectorsearch_example_spark.operators.joins import range_join
    from oracle_vectorsearch_example_spark.sources.io import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts"
    )
    kw = dict(on=["user_id"], left_ts="ts", right_ts="ts",
              lower="INTERVAL 1 SECONDS", upper="INTERVAL 5 MINUTES")
    a = range_join(ev, ev, **kw, strategy="filter").select("event_id", "r_event_id")
    b = range_join(ev, ev, **kw, strategy="bucket").select("event_id", "r_event_id")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0
    # custom bucket width also preserves semantics
    c = range_join(ev, ev, **kw, strategy="bucket", bucket_seconds=37).select(
        "event_id", "r_event_id"
    )
    assert sorted(map(tuple, c.collect())) == ra
