"""Z-order data layout — the multi-column pruning lever at 100 TB
(the ``OPTIMIZE ZORDER BY`` of Delta/Iceberg, re-expressed as plain
Spark column expressions + a range-partitioned write).

Partitioning prunes on ONE column hierarchy; real query mixes filter on
several (``user_id`` today, ``event_time`` tomorrow). Sorting the table
by the interleaved-bit Morton code of k quantized key columns makes rows
that are close in ANY of those dimensions land in the same parquet
files, so file/row-group min-max stats prune for EVERY keyed predicate
— not just the leading sort column. Published basis: Morton, "A computer
oriented geodetic data base" (1966).

Everything here is JVM column arithmetic (`shiftleft`/`&`/`|`): no UDF,
no shuffle beyond the one `repartitionByRange` the layout IS.

- :func:`quantize_col` — numeric column → bucket id in ``[0, 2^bits)``
  over a fixed [lo, hi] range (a pure, engine-portable affine map).
- :func:`z_value` — Morton interleave of up to 4 such bucket columns
  (bits·k ≤ 60, result fits a LongType).
- :func:`zorder_write` — repartitionByRange + sortWithinPartitions on
  the z-value, then write; returns the reader.
- :func:`file_stats` — per-output-file min/max of chosen columns (the
  stats a scan's pruning sees), for asserting locality in tests.

The per-bit interleave is expressible in ANSI SQL (DuckDB replicates it
verbatim), so the ``zorder_keys`` golden hash-checks the exact z-codes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def quantize_col(
    c: Column, lo: float, hi: float, bits: int = 16
) -> Column:
    """Bucket id in ``[0, 2^bits)`` for a numeric column over [lo, hi]
    (values clamped). A fixed affine map — NOT data-dependent ranks — so
    the same row always gets the same bucket across runs and engines."""
    n = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * n
    return F.least(
        F.lit(n), F.greatest(F.lit(0), F.floor(scaled))
    ).cast("long")


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton code of 2–4 bucket columns (each already in
    ``[0, 2^bits)``, e.g. from :func:`quantize_col`): bit i of column j
    lands at position ``i·k + j``.

    Built per-bit (``((c >> i) & 1) << (i·k + j)`` OR-folded) rather than
    with the magic-mask spread gadget: ~bits·k JVM expression nodes that
    whole-stage codegen folds into straight-line long arithmetic, and —
    the point for the golden — the SAME formula is plain ANSI SQL, so
    DuckDB replicates the codes bit-for-bit."""
    k = len(cols)
    if not 2 <= k <= 4:
        raise ValueError("z_value interleaves 2-4 columns")
    if k * bits > 60:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    out = None
    for j, c in enumerate(cols):
        cl = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * k + j
            )
            out = term if out is None else out.bitwiseOR(term)
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, float, float]],
    n_files: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Write ``df`` z-ordered by ``cols`` (each ``(name, lo, hi)``):
    one `repartitionByRange` on the Morton code (range partitioning =
    contiguous z-ranges per file) + an in-partition sort, so every file
    covers a compact hyper-rectangle of the key space and min-max
    pruning works for predicates on ANY of the key columns."""
    z = z_value([quantize_col(F.col(n), lo, hi, bits) for n, lo, hi in cols], bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return df.sparkSession.read.parquet(path)


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-output-file min/max of ``cols`` — the statistics a pruning
    scan consults, surfaced as a DataFrame for locality assertions:
    (file, col, min, max)."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name()
    )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__file").agg(*aggs)
