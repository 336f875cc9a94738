"""Skew operators are semantics-preserving: salted plans return exactly
the rows/aggregates of their unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.skew import salted_agg, salted_join
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_salted_join_matches_plain(spark):
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = read_table(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey").select(
        "l_orderkey", "l_linenumber", "o_orderpriority"
    )
    salted = salted_join(li, o, on="l_orderkey", n_salt=4).select(
        "l_orderkey", "l_linenumber", "o_orderpriority"
    )
    assert _sorted(salted.collect()) == _sorted(plain.collect())


def test_salted_left_join_keeps_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], "k long, v string")
    d = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    out = salted_join(a, d, on="k", n_salt=3, how="left").select("k", "v", "name")
    plain = a.join(d, "k", "left").select("k", "v", "name")
    assert _sorted(out.collect()) == _sorted(plain.collect())


def test_salted_agg_matches_plain(spark):
    ev = read_table(spark, SF, "events")
    plain = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    )
    salted = salted_agg(
        ev,
        ["event_type"],
        [F.count("*").alias("n"), F.max("value").alias("mx")],
        [F.sum("n").alias("n"), F.max("mx").alias("mx")],
        n_salt=4,
        salt_from=["event_id"],
    ).collect()
    assert _sorted(salted) == _sorted(plain)


def test_salt_actually_splits_keys(spark):
    """Every salt bucket of a hot key gets rows (deterministic spread)."""
    ev = read_table(spark, SF, "events").limit(2000)
    from oracle_vectorsearch_example_spark.operators.skew import _salt_col

    n = (
        ev.withColumn("__salt", _salt_col(ev, 4, ["event_id"]))
        .select("__salt")
        .distinct()
        .count()
    )
    assert n == 4


def test_salted_join_rejects_dim_preserving_how(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    for how in ("right", "full", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, df, on="k", how=how)


def test_salted_agg_auto_matches_plain(spark):
    """The X41 composition: detected hot keys go two-phase, the cold
    tail single-phase — result == plain groupBy at any threshold."""
    from oracle_vectorsearch_example_spark.operators.skew import salted_agg_auto

    li = read_table(spark, SF, "lineitem")
    plain = li.groupBy("l_orderkey").agg(
        F.count("*").alias("c"), F.sum("l_quantity").alias("q")
    )
    for threshold in (2, 5, 10_000):  # all-hot-ish, mixed, none-hot
        got = salted_agg_auto(
            li,
            ["l_orderkey"],
            partial_aggs=[F.count("*").alias("c"), F.sum("l_quantity").alias("q")],
            final_aggs=[F.sum("c").alias("c"), F.sum("q").alias("q")],
            threshold=threshold,
            n_salt=4,
        )
        assert _sorted(got.collect()) == _sorted(plain.collect()), threshold


def test_salted_agg_auto_prebuilt_hot_keys_and_guards(spark):
    from oracle_vectorsearch_example_spark.operators.skew import salted_agg_auto
    import pytest

    li = read_table(spark, SF, "lineitem")
    hot = spark.createDataFrame([(1,), (2,)], "l_orderkey long")
    got = salted_agg_auto(
        li,
        ["l_orderkey"],
        partial_aggs=[F.count("*").alias("c")],
        final_aggs=[F.sum("c").alias("c")],
        threshold=3,
        hot_keys=hot,
    )
    plain = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    assert _sorted(got.collect()) == _sorted(plain.collect())
    with pytest.raises(ValueError, match="single key column"):
        salted_agg_auto(
            li,
            ["l_orderkey", "l_linenumber"],
            partial_aggs=[F.count("*").alias("c")],
            final_aggs=[F.sum("c").alias("c")],
            threshold=3,
        )
