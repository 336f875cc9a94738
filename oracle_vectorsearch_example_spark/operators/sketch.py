"""Count-min sketch + exact heavy hitters (X41, training-pipeline
extension surface, SURVEY.md §2.12 family).

The 100 TB problem: "which keys are hot?" — the question behind skew
salting (operators/skew.py takes n_salt on faith; this module measures
which keys need it), hot-host/hot-domain corpus diagnostics, and
frequent-n-gram mining. A naive ``groupBy(key).count()`` shuffles one
row per (distinct key × partition); at web-corpus cardinalities (10^9
distinct URLs/hosts) that shuffle IS the job. A count-min sketch
(Cormode & Muthukrishnan 2005, "An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 55(1)) bounds the
state at d×w counters regardless of key cardinality, and its one-sided
error is the structural win here — the dual of operators/bloom.py:

- a CMS only ever OVER-estimates (collisions add, never subtract), so
  every key whose estimate falls below a threshold is DEFINITELY not a
  heavy hitter: `heavy_hitters` prunes the exact recount to the
  candidate sliver map-side, and the exact second pass kills the
  false positives — the result is EXACTLY `groupBy.count().filter(>=t)`
  for any d/w/seed/hash sizing (tested; and the golden hash-checks it
  against plain SQL).

Execution shape (all JVM, no UDF):

- ``cms_table`` — the distributed build aggregate: explode each key
  into d (row_idx, pos) cells, one SUM shuffle of at most d×w rows per
  input partition (map-side partial combine bounds it regardless of
  input cardinality). Weighted counts via ``weight_col``.
- ``cms_estimate`` — min over the d counters, computed with d
  BROADCAST equi-joins (the sparse table is ≤ d×w rows — metadata-
  sized) + ``least``: map-side, zero shuffle of the probed frame,
  missing cells coalesce to 0.
- ``heavy_hitters`` — two-pass exact: estimate map-side, keep rows
  whose estimate ≥ threshold (no false negatives), distinct the
  candidate keys (a shuffle of only the candidate sliver), exact
  recount restricted to candidates via broadcast semi join.

Frozen, engine-portable hash spec (``hash="md5"``, the golden's pin —
same discipline as bloom.py / sampling.py):

    pos_j(key) = ('0x' || substr(md5(j || ':' || seed || ':' || key),
                                 1, 15))::BIGINT % w     for j in 0..d-1

``hash="xx"`` (default) swaps in JVM ``xxhash64(j, seed, key)``.
Heavy-hitter RESULTS are identical under either hash (the exact second
pass guarantees it); only the sketch counters differ, so the md5 spec
is reserved for the ``cms_words`` golden that hash-checks the counters
themselves against DuckDB.

Reference analog: Oracle's in-engine frequency histograms / TOP-FREQ
statistics drive its skew-aware plans; here the sketch is surfaced as
an operator feeding `salted_join`/`salted_agg`.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 1 << 12  # 4096 counters/row × 4 rows × 8 B = 128 KiB of state
SEED = 42

__all__ = [
    "cms_positions",
    "cms_table",
    "cms_estimate",
    "heavy_hitters",
    "py_cms_table",
]


def _position(key: Column, j: int, w: int, seed: int, hash: str) -> Column:
    """Frozen row-j counter position for a key (JVM, no UDF)."""
    if hash == "md5":
        h = F.md5(
            F.concat_ws(":", F.lit(str(j)), F.lit(str(seed)), key.cast("string"))
        )
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % w
    if hash == "xx":
        return F.pmod(F.xxhash64(F.lit(j), F.lit(seed), key), F.lit(w))
    raise ValueError(f"unknown hash {hash!r} (expected 'md5' or 'xx')")


def cms_positions(
    key: Column, d: int = CMS_D, w: int = CMS_W, seed: int = SEED, hash: str = "xx"
) -> list[Column]:
    """The d counter positions for a key, as JVM column expressions."""
    return [_position(key, j, w, seed, hash) for j in range(d)]


def cms_table(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: int = SEED,
    hash: str = "xx",
) -> DataFrame:
    """Sparse sketch counters ``(row_idx int, pos long, count bigint)``
    — the distributed build aggregate. SUM partials combine map-side,
    so the shuffle is at most d×w rows per input partition regardless
    of key cardinality; only non-zero cells appear. ``weight_col``
    counts each row by that column instead of 1 (nulls weigh 0, like
    SQL SUM)."""
    wt = (
        F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0))
        if weight_col
        else F.lit(1).cast("bigint")
    )
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row_idx"),
                    p.alias("pos"),
                )
                for j, p in enumerate(cms_positions(F.col(key_col), d, w, seed, hash))
            ]
        )
    )
    return (
        df.select(cells.alias("c"), wt.alias("w"))
        .groupBy(F.col("c.row_idx").alias("row_idx"), F.col("c.pos").alias("pos"))
        .agg(F.sum("w").alias("count"))
    )


def cms_estimate(
    probe: DataFrame,
    cms: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: int = SEED,
    hash: str = "xx",
    est_col: str = "cms_est",
) -> DataFrame:
    """Probe frame plus a bigint ``est_col`` — min over the d counters,
    an upper bound on the key's true (weighted) count. d broadcast
    equi-joins against the ≤ d×w-row sparse table, then ``least``:
    map-side, no shuffle of the probe frame, absent cells read 0. The
    cms frame must have been built with the SAME d/w/seed/hash."""
    out = probe
    ests = []
    for j, p in enumerate(cms_positions(F.col(key_col), d, w, seed, hash)):
        cnt = f"__cms_c{j}"
        row_j = (
            cms.filter(F.col("row_idx") == j)
            .select(F.col("pos").alias(f"__cms_p{j}"), F.col("count").alias(cnt))
        )
        out = out.withColumn(f"__cms_p{j}", p).join(
            F.broadcast(row_j), on=f"__cms_p{j}", how="left"
        )
        ests.append(F.coalesce(F.col(cnt), F.lit(0).cast("bigint")))
    return out.withColumn(est_col, F.least(*ests)).drop(
        *[f"__cms_p{j}" for j in range(d)], *[f"__cms_c{j}" for j in range(d)]
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    weight_col: str | None = None,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: int = SEED,
    hash: str = "xx",
    cms: DataFrame | None = None,
) -> DataFrame:
    """EXACT keys with (weighted) count ≥ threshold, computed without a
    full-cardinality shuffle: CMS estimates prune map-side (an estimate
    < threshold is a definite miss — the sketch only over-counts), the
    candidate sliver's keys distinct (the only shuffle whose width
    depends on data), and an exact recount over candidate rows only
    (broadcast semi join) removes the false positives. Result columns:
    ``(key_col, count)`` — identical to
    ``df.groupBy(key_col).count().filter(count >= threshold)`` (or the
    weighted sum twin) for ANY d/w/seed/hash. Pass a prebuilt
    ``cms=`` table (e.g. ``.localCheckpoint()``-ed) to skip the build
    aggregate — the build-once / probe-many shape.

    Sizing contract: the candidate set is ≤ N·(1/threshold + fpp) keys
    and BROADCASTS for the exact recount — the whole point is that
    heavy hitters are FEW. A threshold near 1 (or w sized so the noise
    floor N·d/w approaches the threshold) makes everything a candidate
    and the broadcast the bottleneck; size w ≥ ~10·N/threshold and use
    the plain groupBy when you genuinely want all counts."""
    if cms is None:
        # lazy checkpoint: estimate + recount both reference the sketch
        cms = cms_table(df, key_col, weight_col, d, w, seed, hash).localCheckpoint(
            eager=False
        )
    est = cms_estimate(
        df.select(key_col), cms, key_col, d, w, seed, hash, "__cms_est"
    )
    cand = (
        est.filter(F.col("__cms_est") >= threshold).select(key_col).distinct()
    )
    wt = (
        F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0))
        if weight_col
        else F.lit(1).cast("bigint")
    )
    return (
        df.join(F.broadcast(cand), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.sum(wt).alias("count"))
        .filter(F.col("count") >= threshold)
    )


def py_cms_table(
    items, d: int = CMS_D, w: int = CMS_W, seed: int = SEED
) -> dict[tuple[int, int], int]:
    """Independent pure-Python reference of the frozen md5 spec (tests).
    ``items`` is an iterable of keys, or (key, weight) pairs."""
    cells: dict[tuple[int, int], int] = {}
    for it in items:
        key, wt = it if isinstance(it, tuple) else (it, 1)
        for j in range(d):
            h = hashlib.md5(f"{j}:{seed}:{key}".encode()).hexdigest()
            p = int(h[:15], 16) % w
            cells[(j, p)] = cells.get((j, p), 0) + wt
    return cells
