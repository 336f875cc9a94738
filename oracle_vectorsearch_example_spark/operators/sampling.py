"""Deterministic corpus splitting & sampling (training-data pipeline
extension surface, SURVEY.md §2.12 family).

A 100 TB training pipeline needs splits and samples that are (a) exactly
reproducible across runs, engines, and re-partitions, (b) pure map-side —
no shuffle, no driver state, no RNG sequence coupling to partition layout
(`df.sample`/`sampleBy` draw per-partition RNG streams, so adding one input
file reshuffles every assignment). The standard fix is content-hash
bucketing: bucket = hash(seed, id) mod B; assignment is a pure function of
the row's id.

Hash spec (frozen, engine-portable — same convention as the dedup shingle
spec): bucket = int(first 8 hex chars of md5("<seed>:<id>")) mod B, with
B = 10_000 (basis-point granularity). DuckDB side:
``('0x' || substr(md5(seed || ':' || id), 1, 8))::BIGINT % 10000``.

- ``hash_bucket``: the bucket column itself.
- ``hash_split``: named splits from cumulative weight ranges
  (train/val/test and friends).
- ``hash_sample``: Bernoulli-by-hash sampling at a fixed rate.
- ``stratified_sample``: per-stratum rates (e.g. downsample dominant
  languages/sources to a target mixture) — the mixture-weighting primitive.

All are single projections/filters: no Exchange in any plan (asserted in
tests/test_sampling.py).
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(
    id_col: Column, seed: int | str = 42, buckets: int = BUCKETS
) -> Column:
    """Deterministic bucket in [0, buckets) from md5("<seed>:<id>").

    ``seed`` may be a string salt such as ``"pareto:42"`` — operators
    that draw their OWN randomness per row (Pareto gate, Gumbel noise)
    must salt a sub-stream instead of reusing the bare split seed:
    sharing the raw (seed, id) stream with :func:`hash_split` makes
    survival and split assignment the SAME draw, so stochastic-gate
    survivors are systematically sorted into high buckets (val/test)."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets).cast("int")


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a named split by cumulative bucket ranges.

    ``weights`` maps split name → fraction (must sum to ~1; the last split
    absorbs rounding). Insertion order defines the ranges, so the same
    weights dict always yields the same assignment.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col), seed)
    expr: Column | None = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name]
        cond = b < int(round(hi * BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows (exact bucket cutoff —
    repeated runs return the identical row set; smaller fractions are
    strict subsets of larger ones at the same seed)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(hash_bucket(F.col(id_col), seed) < int(round(fraction * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus mixture-weighting
    primitive (downsample dominant sources, keep rare ones whole).

    ``fractions`` maps stratum value → keep rate; strata not listed keep
    ``default_fraction``. Same map-side hash-cutoff as :func:`hash_sample`,
    so the output is reproducible and plan-shape shuffle-free (the
    per-stratum cutoff is a literal CASE, not a join).
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0,1], got {v}")
    cutoff: Column | None = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        lit = F.lit(int(round(v * BUCKETS)))
        cutoff = F.when(cond, lit) if cutoff is None else cutoff.when(cond, lit)
    cutoff = (
        F.lit(int(round(default_fraction * BUCKETS)))
        if cutoff is None
        else cutoff.otherwise(F.lit(int(round(default_fraction * BUCKETS))))
    )
    return df.filter(hash_bucket(F.col(id_col), seed) < cutoff)


def repeat_epochs(
    df: DataFrame,
    epochs: float,
    id_col: str = "doc_id",
    seed: int = 42,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministic epoch UPSAMPLING — the other half of mixture
    weighting (stratified_sample downsamples; training mixtures also
    repeat high-quality sources, e.g. the LLaMA recipe's "Wikipedia ×
    2.4 epochs"). Each row appears once per full epoch (``epoch`` = 0..)
    plus, for a fractional tail, once more iff its hash bucket falls
    under the fractional cutoff — the SAME bucket as :func:`hash_sample`
    at the same seed, so the partial epoch is exactly
    ``hash_sample(df, epochs - floor(epochs))``'s row set (nesting
    property, tested). Pure map-side: one array explode + one filter,
    no shuffle, no RNG stream; membership is a pure function of
    (id, seed, epochs).
    """
    if epochs < 0:
        raise ValueError(f"epochs must be >= 0, got {epochs}")
    n_full = int(epochs)
    frac = epochs - n_full
    cutoff = int(round(frac * BUCKETS))
    n_total = n_full + (1 if cutoff > 0 else 0)
    if n_total == 0:
        return df.withColumn(epoch_col, F.lit(0)).limit(0)
    out = df.withColumn(
        epoch_col, F.explode(F.expr(f"sequence(0, {n_total - 1})"))
    )
    if cutoff > 0:
        out = out.filter(
            (F.col(epoch_col) < n_full)
            | (hash_bucket(F.col(id_col), seed) < cutoff)
        )
    return out


def source_seed(seed: int, name: str) -> int:
    """Per-source seed derivation for :func:`mix_sources` — decorrelates
    the fractional-epoch draw across sources that share an id space.
    Frozen spec: first 8 hex chars of md5("<seed>:<name>") as an int
    (replayable anywhere, including an oracle SQL literal)."""
    return int(hashlib.md5(f"{seed}:{name}".encode()).hexdigest()[:8], 16)


def mix_sources(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str = "doc_id",
    seed: int = 42,
    source_col: str = "source",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Compose a training mixture from weighted sources: ``sources``
    maps name → (DataFrame, epoch multiplier); each source is
    epoch-repeated (:func:`repeat_epochs` with a per-source derived
    seed) and tagged, then all are unioned by column name. Union is
    plan-level only (no shuffle); downstream consumers (pack_sequences,
    hash_split) shuffle on their own keys. All source frames must share
    a schema — a mixture with heterogeneous payloads should be
    projected to the common (id, text, ...) shape first."""
    if not sources:
        raise ValueError("mix_sources needs at least one source")
    parts = [
        repeat_epochs(
            df, epochs, id_col=id_col, seed=source_seed(seed, name),
            epoch_col=epoch_col,
        ).withColumn(source_col, F.lit(name))
        for name, (df, epochs) in sources.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def temperature_multipliers(
    sizes: dict[str, int],
    alpha: float = 0.3,
    total: int | None = None,
) -> dict[str, float]:
    """Epoch multipliers for :func:`mix_sources` from temperature
    sampling (the multilingual/multi-source recipe of XLM-R, Conneau et
    al. 2020 §3.1, α ≈ 0.3; mT5 and the LLaMA data mixtures follow the
    same shape): sample share q_s ∝ (n_s/N)^α — α < 1 upsamples small
    sources relative to their natural share — then multiplier_s =
    q_s·T / n_s so the mixture totals ``total`` documents (default: the
    natural corpus size N). Driver-side arithmetic over the bounded
    source-size dict; compose as
    ``mix_sources({s: (df_s, m[s]) for ...})``."""
    if not sizes:
        raise ValueError("temperature_multipliers needs at least one source")
    if any(n <= 0 for n in sizes.values()):
        raise ValueError(f"source sizes must be positive, got {sizes}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    n_total = float(sum(sizes.values()))
    t = float(total) if total is not None else n_total
    shares = {s: (n / n_total) ** alpha for s, n in sizes.items()}
    z = sum(shares.values())
    return {s: (shares[s] / z) * t / sizes[s] for s in sizes}


def group_sample(
    df: DataFrame,
    n: int,
    group_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-COUNT sample: exactly min(n, group size) rows
    per group — the eval-set builder (`hash_sample`/`stratified_sample`
    draw FRACTIONS; "200 examples per language" needs a count). The
    kept rows are the n smallest md5("<seed>:<id>") within each group —
    a pure function of (seed, ids), so the sample is stable across
    runs, engines, and partition layouts, and growing a group only ever
    ADDS candidates (a kept row is evicted only when a new row hashes
    below it — the bounded-churn property of hash-ordered reservoirs).
    One group-keyed window; no RNG streams."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Reproducible global shuffle — the training-example ordering step
    (pipelines need the SAME pseudo-random order on every rebuild; a
    Fisher-Yates or df.orderBy(rand()) depends on RNG streams and
    partition layout). Order key = full md5 hex of "<seed>:<id>" — a
    pure function of (seed, id), collision-free in practice — and the
    sort is a Catalyst range-partition + per-partition sort (scale-safe;
    no single-partition window, no driver state). The key column stays
    in the output so downstream writers can re-sort shards after
    repartitioning; different seeds give independent orders."""
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    return df.withColumn(key_col, key).orderBy(key_col)
