"""S13 SCD Type-2 history merge: insert/close/untouched paths across
batches, null-safe change detection, null business keys, close_missing
full-snapshot mode, duplicate-source rejection, layout determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.scd import (
    IS_CURRENT,
    scd2_apply,
    scd2_init,
)

SCHEMA = "id long, name string, bal double"


def _rows(df):
    return sorted(
        map(tuple, df.select("id", "name", "bal", "valid_from", "valid_to", "is_current").collect()),
        key=lambda t: (t[0] or -1, t[3]),
    )


@pytest.fixture()
def hist(spark):
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], SCHEMA
    )
    return scd2_init(b1, batch_id=1)


def test_init(spark, hist):
    assert _rows(hist) == [
        (1, "a", 10.0, 1, None, True),
        (2, "b", 20.0, 1, None, True),
        (3, "c", 30.0, 1, None, True),
    ]


def test_change_insert_untouched(spark, hist):
    src = spark.createDataFrame(
        [(2, "b2", 22.0), (3, "c", 30.0), (4, "d", 40.0)], SCHEMA
    )
    got = scd2_apply(hist, src, ["id"], batch_id=2)
    assert _rows(got) == [
        (1, "a", 10.0, 1, None, True),   # absent from source: untouched
        (2, "b", 20.0, 1, 2, False),     # changed: closed...
        (2, "b2", 22.0, 2, None, True),  # ...and re-versioned
        (3, "c", 30.0, 1, None, True),   # identical: untouched
        (4, "d", 40.0, 2, None, True),   # new key: inserted
    ]


def test_three_batches_stack_history(spark, hist):
    s2 = spark.createDataFrame([(1, "a2", 11.0)], SCHEMA)
    s3 = spark.createDataFrame([(1, "a3", 12.0)], SCHEMA)
    h = scd2_apply(scd2_apply(hist, s2, ["id"], 2), s3, ["id"], 3)
    one = [r for r in _rows(h) if r[0] == 1]
    assert one == [
        (1, "a", 10.0, 1, 2, False),
        (1, "a2", 11.0, 2, 3, False),
        (1, "a3", 12.0, 3, None, True),
    ]
    # exactly one current row per key
    cur = h.filter(F.col(IS_CURRENT)).groupBy("id").count()
    assert cur.filter(F.col("count") != 1).count() == 0


def test_nulls(spark):
    """NULL -> NULL is "same"; NULL -> value is a change; NULL business
    keys classify correctly under the null-safe join."""
    h = scd2_init(
        spark.createDataFrame([(1, None, 10.0), (None, "k", 5.0)], SCHEMA), 1
    )
    src = spark.createDataFrame([(1, None, 10.0), (None, "k2", 5.0)], SCHEMA)
    got = scd2_apply(h, src, ["id"], batch_id=2)
    rows = _rows(got)
    # (1, NULL) identical -> untouched; NULL-key row changed -> versioned
    assert (1, None, 10.0, 1, None, True) in rows
    assert (None, "k", 5.0, 1, 2, False) in rows
    assert (None, "k2", 5.0, 2, None, True) in rows


def test_close_missing_snapshot_mode(spark, hist):
    src = spark.createDataFrame([(1, "a", 10.0)], SCHEMA)
    got = scd2_apply(hist, src, ["id"], batch_id=2, close_missing=True)
    assert _rows(got) == [
        (1, "a", 10.0, 1, None, True),
        (2, "b", 20.0, 1, 2, False),
        (3, "c", 30.0, 1, 2, False),
    ]


def test_change_cols_subset(spark, hist):
    # track only bal: a name-only change is "same"
    src = spark.createDataFrame([(1, "RENAMED", 10.0)], SCHEMA)
    got = scd2_apply(hist, src, ["id"], batch_id=2, change_cols=["bal"])
    assert (1, "a", 10.0, 1, None, True) in _rows(got)
    assert len([r for r in _rows(got) if r[0] == 1]) == 1


def test_guards(spark, hist):
    dup = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate"):
        scd2_apply(hist, dup, ["id"], 2)
    with pytest.raises(ValueError, match="clash"):
        scd2_init(hist, 9)
    short = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="lacks business columns"):
        scd2_apply(hist, short, ["id"], 2)
    with pytest.raises(ValueError, match="non-key"):
        scd2_apply(
            hist,
            spark.createDataFrame([(1, "x", 1.0)], SCHEMA),
            ["id"],
            2,
            change_cols=["id"],
        )


def test_repartition_determinism(spark, hist):
    src = spark.createDataFrame(
        [(2, "b2", 22.0), (4, "d", 40.0)], SCHEMA
    )
    a = _rows(scd2_apply(hist, src, ["id"], 2))
    b = _rows(scd2_apply(hist.repartition(7), src.repartition(3), ["id"], 2))
    assert a == b
