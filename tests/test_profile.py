"""X16 one-pass table profiler (r5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.profile import profile_table
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


def test_profile_values_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5, [1.0]), (2, None, None, None), (2, "b", 7.5, [2.0])],
        "k long, s string, x double, v array<double>",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert rows["k"].n_rows == 3 and rows["k"].n_nulls == 0
    assert rows["k"].n_distinct == 2 and rows["k"].min_value == "1"
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].avg_value is None
    assert rows["x"].avg_value == 5.0 and rows["x"].min_value == "2.5000"
    # complex column: counts only — orderings are engine-specific
    assert rows["v"].n_nulls == 1 and rows["v"].n_distinct is None
    assert rows["v"].min_value is None


def test_profile_single_scan(spark):
    """Whole-table profiling must be ONE pass: exactly one scan of the
    source in the physical plan (multi-distinct -> Expand, not N jobs)."""
    o = read_table(spark, SF, "orders")
    plan = profile_table(o)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_profile_column_subset(spark):
    o = read_table(spark, SF, "orders")
    got = [r["column"] for r in profile_table(o, ["o_orderkey", "o_orderstatus"]).collect()]
    assert got == ["o_orderkey", "o_orderstatus"]


def test_profile_approx_mode(spark):
    """exact=False: HLL++ distinct within ~5% of truth, no Expand in the
    plan (the very-wide-table path)."""
    o = read_table(spark, SF, "orders")
    exact = {r["column"]: r.n_distinct for r in profile_table(o).collect()}
    approx = {r["column"]: r.n_distinct for r in profile_table(o, exact=False).collect()}
    for c, truth in exact.items():
        assert abs(approx[c] - truth) <= max(2, 0.06 * truth), (c, truth, approx[c])
    plan = profile_table(o, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    exact_plan = profile_table(o)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan


def test_profile_exotic_column_names(spark):
    """Names with dots, spaces, hyphens, and quotes must profile (internal
    aliases are positional; references are backtick-quoted)."""
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, None)],
        ["a.b c-d", "it's"],
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"a.b c-d", "it's"}
    assert out["a.b c-d"]["n_distinct"] == 2
    assert out["it's"]["n_nulls"] == 1
    assert out["a.b c-d"]["avg_value"] == 1.6667
