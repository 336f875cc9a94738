"""Z-order layout (r7, operators/layout.py): Morton codes vs an
independent implementation, quantization edges, and the actual locality
claim — per-file min/max spans shrink on EVERY key column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.layout import (
    file_stats,
    quantize_col,
    z_value,
    zorder_write,
)


def _morton(vals: list[int], bits: int) -> int:
    z = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * k + j)
    return z


@pytest.mark.parametrize("k,bits", [(2, 4), (2, 16), (3, 8), (4, 8)])
def test_z_value_matches_independent_morton(spark, k, bits):
    n = 64
    df = spark.range(0, n)
    cols = [((F.col("id") * (j * 7 + 3)) % (1 << bits)) for j in range(k)]
    rows = df.select(
        "id", *[c.alias(f"c{j}") for j, c in enumerate(cols)],
        z_value(cols, bits=bits).alias("z"),
    ).collect()
    for r in rows:
        assert r.z == _morton([r[f"c{j}"] for j in range(k)], bits), r


def test_z_value_validation():
    with pytest.raises(ValueError, match="2-4"):
        z_value([F.col("a")])
    with pytest.raises(ValueError, match="signed long"):
        z_value([F.col("a")] * 4, bits=16)


def test_quantize_clamps_and_maps(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double"
    )
    got = [r[0] for r in df.select(quantize_col(F.col("v"), 0, 100, bits=4)).collect()]
    assert got[0] == 0 and got[1] == 0       # clamped low / lo endpoint
    assert got[3] == 15 and got[4] == 15     # hi endpoint / clamped high
    assert 7 <= got[2] <= 8                  # mid-range lands mid-bucket


def test_zorder_write_locality_beats_single_column_sort(spark, tmp_path):
    """The operational claim: after zorder_write on (x, y), EVERY file
    covers a narrow range of BOTH columns, so a selective predicate on
    either key prunes most files by min/max stats. A plain sort by x
    gives perfect x-locality but NO y-locality — the layout z-order
    exists to fix."""
    n, files = 50_000, 16
    df = spark.range(0, n).select(
        ((F.col("id") * 48271) % 65536).alias("x"),
        ((F.col("id") * 16807) % 65536).alias("y"),
    )
    zpath = str(tmp_path / "z")
    zorder_write(df, zpath, [("x", 0, 65535), ("y", 0, 65535)], n_files=files)
    spath = str(tmp_path / "s")
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(spath)

    def spans(path):
        st = {r["__file"]: r for r in file_stats(spark, path, ["x", "y"]).collect()}
        sx = [r["max_x"] - r["min_x"] for r in st.values()]
        sy = [r["max_y"] - r["min_y"] for r in st.values()]
        return sum(sx) / len(sx), sum(sy) / len(sy)

    zx, zy = spans(zpath)
    px, py = spans(spath)
    full = 65535
    # z-order: both dimensions localized (each file ~a quadrant-tree cell)
    assert zx <= 0.5 * full and zy <= 0.5 * full, (zx, zy)
    # plain sort: x tight but y spans ~everything
    assert px < 0.2 * full and py > 0.9 * full, (px, py)
    # pruning view: a 1/16-wide y-slice intersects few z-files, all plain files
    lo, hi = 30000, 30000 + full // 16
    zhit = sum(
        1 for r in file_stats(spark, zpath, ["y"]).collect()
        if not (r["max_y"] < lo or r["min_y"] > hi)
    )
    phit = sum(
        1 for r in file_stats(spark, spath, ["y"]).collect()
        if not (r["max_y"] < lo or r["min_y"] > hi)
    )
    # repartitionByRange samples its boundaries, so the exact file count
    # jitters by ±1-2 between runs; the claim is the ORDER-OF-MAGNITUDE
    # gap: a sliver of y touches a minority of z-files and ALL plain files
    assert zhit <= 10 and phit == files and zhit < phit, (zhit, phit)
    # layout is a reshuffle, never a rewrite of values
    assert spark.read.parquet(zpath).count() == n
