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


def test_interval_seconds_parses_driver_side():
    """Bucket width is a plan-time constant — parsed driver-side, no Spark
    job (round-2 verdict item 6)."""
    from oracle_vectorsearch_example_spark.operators.joins import _interval_seconds

    assert _interval_seconds("INTERVAL 0 SECONDS") == 0
    assert _interval_seconds("INTERVAL 5 MINUTES") == 300
    assert _interval_seconds("interval 2 hours") == 7200
    assert _interval_seconds("INTERVAL 1 DAY") == 86400
    assert _interval_seconds("INTERVAL 1 HOUR 30 MINUTES") == 5400
    assert _interval_seconds("INTERVAL -1 MINUTE") == -60
    # sub-second units parse (r4, ADVICE r3 #4 — the SQL evaluator this
    # parser replaced accepted them); range_join clamps width up to 1s
    assert _interval_seconds("INTERVAL 500 MILLISECONDS") == 0.5
    assert _interval_seconds("INTERVAL 250000 MICROSECONDS") == 0.25
    with pytest.raises(ValueError):
        _interval_seconds("INTERVAL 3 MONTHS")
    with pytest.raises(ValueError):
        _interval_seconds("not an interval")


def test_range_and_asof_accept_ntz_inputs(trades, quotes):
    """Operators survive TIMESTAMP_NTZ frames from external callers (the
    round-2 regression class), matching the TIMESTAMP-input results."""
    from pyspark.sql import functions as F

    t_ntz = trades.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    q_ntz = quotes.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    for strat in ("filter", "bucket"):
        got = range_join(
            t_ntz, q_ntz, on=["k"], left_ts="ts", right_ts="ts",
            lower="INTERVAL 0 SECONDS", upper="INTERVAL 5 MINUTES",
            strategy=strat,
        ).count()
        assert got == 2, strat
    out = {(r.k, r.asof_bid) for r in
           asof_join(t_ntz, q_ntz, on="k", value_cols=["bid"]).collect()}
    assert (1, 100.5) in out


def test_sessionize_accepts_ntz_inputs(spark):
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.operators.sessionize import sessionize
    from oracle_vectorsearch_example_spark.sources.io import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").limit(500)
    ntz = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    a = sorted((r.event_id, r.session_id) for r in sessionize(ev).collect())
    b = sorted((r.event_id, r.session_id) for r in sessionize(ntz).collect())
    assert a == b and len(a) == 500


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


def test_range_join_subsecond_interval_bucket(spark):
    """A sub-second interval no longer raises in the bucket strategy
    (ADVICE r3 #4): the width clamps up to 1s — wider buckets only add
    candidates the interval filter re-checks — and both strategies agree."""
    from oracle_vectorsearch_example_spark.operators.joins import range_join
    from oracle_vectorsearch_example_spark.sources.io import read_table

    ev = read_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts"
    )
    kw = dict(on=["user_id"], left_ts="ts", right_ts="ts",
              lower="INTERVAL 0 SECONDS", upper="INTERVAL 1500 MILLISECONDS")
    a = range_join(ev, ev, **kw, strategy="filter").select("event_id", "r_event_id")
    b = range_join(ev, ev, **kw, strategy="bucket").select("event_id", "r_event_id")
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0
