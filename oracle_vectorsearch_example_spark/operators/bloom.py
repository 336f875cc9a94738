"""Bloom-filter runtime join pruning (X40, training-pipeline extension
surface, SURVEY.md §2.12 family).

The 100 TB problem: decontamination / blocklist / membership joins where
the probe side is the whole corpus (wide payload rows) and the build
side (benchmark n-grams, a URL blocklist) is too large for Spark's
broadcast-join threshold but whose *bloom filter* is a few hundred KB.
Spark's own runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) are injected
opportunistically into equi-joins by the optimizer; this module makes
the same lever an explicit operator that also covers the case the
optimizer never touches: **anti-joins**, where the one-sided error of a
bloom is a structural win —

- a bloom has NO false negatives, so every probe row the filter rejects
  is *definitely absent* from the build side: for an anti-join it passes
  straight through MAP-SIDE, payload and all, zero shuffle;
- only the bloom-POSITIVE sliver (true members + the fpp tail) pays the
  exact join shuffle, and the exact recheck kills the false positives —
  the final result is exactly the naive anti/semi join, independent of
  fpp, hash choice, partition layout, or m/k tuning.

Where the bytes go: a sort-merge anti join shuffles every probe row's
payload; a broadcast anti join needs the build side under the broadcast
threshold (~10 MB — a few hundred thousand string keys blow through it).
The bloom path shuffles (a) the build side ONCE into at most m/32
filter words (bit_or partials combine map-side, so the shuffle is tiny
regardless of build cardinality) and (b) only matched+fpp probe rows.

Execution shape (all JVM, no UDF, driver never touches the filter):
the dense word array rides in a ONE-ROW DataFrame that broadcast-joins
onto the probe side — a single shared ArrayData per executor, not a
plan literal (a literal of 2^19 longs costs minutes of expression
construction and a 12 MB task binary — measured, hence this design) and
not a driver collect.  ``might_contain`` is element_at + bitwiseAND
over k hash probes inside whole-stage codegen.

Frozen, engine-portable hash spec (``hash="md5"``; the sampling.py md5
discipline — what the `bloom_words` golden pins against DuckDB):

    position_i(key) = ('0x' || substr(md5(i || ':' || seed || ':' || key),
                                      1, 15))::BIGINT  %  m_bits
                      for i in 0..k-1   (key rendered as its string form)
    word_idx = position // 32        (32 bits per word, stored in BIGINT:
    word     = bit_or(1 << (position % 32))   shifts stay in [0, 31], so
                                              both engines agree with no
                                              sign-bit edge cases)

``hash="xx"`` (the default for joins) swaps the position function for
JVM ``xxhash64(i, seed, key)`` — an order of magnitude cheaper per probe
row.  Join RESULTS are identical under either hash (the exact recheck
guarantees it — tested); only the filter bits differ, so the md5 spec is
reserved for the golden that hash-checks the bits themselves.

Reference analog: the reference's Oracle engine applies bloom pruning
inside the database for partition-wise joins; here it is surfaced as the
corpus-scrubbing primitive (decontaminate's exact anti-join accelerated
to a map-side pass for the ~100% of rows that are clean).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 17  # 16 KiB of filter; ~13 bits/key at n=10k -> fpp ~0.2%
K_HASH = 5
SEED = 42

__all__ = [
    "BloomFilter",
    "bloom_positions",
    "bloom_words_df",
    "bloom_words_row",
    "bloom_build",
    "bloom_tag",
    "bloom_semi_join",
    "bloom_anti_join",
    "py_bloom_words",
]

# 1 << (p % 32) as an array-literal lookup: pyspark's shiftleft() only
# takes a Python-int shift, and a 32-long literal keeps the expression in
# whole-stage codegen
_MASKS = [1 << i for i in range(32)]


def _mask(p: Column) -> Column:
    return F.element_at(F.lit(_MASKS), (p % 32).cast("int") + F.lit(1)).cast("long")


def _position(key: Column, i: int, m_bits: int, seed: int, hash: str) -> Column:
    """Frozen probe position i for a key (JVM, no UDF)."""
    if hash == "md5":
        h = F.md5(
            F.concat_ws(":", F.lit(str(i)), F.lit(str(seed)), key.cast("string"))
        )
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits
    if hash == "xx":
        return F.pmod(F.xxhash64(F.lit(i), F.lit(seed), key), F.lit(m_bits))
    raise ValueError(f"unknown hash {hash!r} (expected 'md5' or 'xx')")


def bloom_positions(
    key: Column,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
) -> list[Column]:
    """The k probe positions for a key, as JVM column expressions."""
    return [_position(key, i, m_bits, seed, hash) for i in range(k)]


def bloom_words_df(
    df: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
) -> DataFrame:
    """Sparse bloom words ``(word_idx int, word long)`` — the distributed
    build aggregate.  bit_or partials combine map-side, so the shuffle is
    at most m/32 rows per input partition regardless of build-side size;
    only non-zero words appear, duplicates cost nothing (idempotent)."""
    if m_bits % 32 != 0:
        raise ValueError("m_bits must be a multiple of 32")
    pos = F.explode(F.array(*bloom_positions(F.col(key_col), m_bits, k, seed, hash)))
    return (
        df.select(pos.alias("p"))
        .select(
            (F.col("p") / 32).cast("int").alias("word_idx"),
            _mask(F.col("p")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )


_WORDS_COL = "__bloom_words"


def bloom_words_row(
    df: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
) -> DataFrame:
    """The DENSE word array as a one-row DataFrame (column
    ``__bloom_words: array<bigint>``) — the broadcast vehicle for
    ``might_contain`` at any m without a plan literal or driver collect.
    An empty build side yields the all-zeros array (nothing matches).

    Assembly is one Arrow task (``coalesce(1).mapInPandas`` scattering
    the ≤ m/32 sparse words into a numpy array): O(n_words).  The
    obvious pure-expression alternative — ``transform(sequence(...))``
    with ``element_at`` over ``map_from_entries`` — is QUADRATIC,
    because ``element_at`` on a Spark map is a linear scan, not a hash
    lookup: fine at the 16 KiB default (4k words), a multi-minute hang
    at the 4 MiB filter a 2M-key build side needs (measured)."""
    sparse = bloom_words_df(df, key_col, m_bits, k, seed, hash)
    n_words = m_bits // 32
    # sentinel row: an empty build side optimizes to ZERO partitions and
    # mapInPandas would never run; word_idx -1 is ignored in the scatter
    sentinel = df.sparkSession.range(1).select(
        F.lit(-1).cast("int").alias("word_idx"), F.lit(0).cast("bigint").alias("word")
    )

    def _to_dense(batches):
        import numpy as np
        import pandas as pd

        dense = np.zeros(n_words, dtype=np.int64)
        for pdf in batches:
            idx = pdf["word_idx"].to_numpy()
            ok = idx >= 0
            dense[idx[ok]] = pdf["word"].to_numpy()[ok]
        yield pd.DataFrame({_WORDS_COL: [dense.tolist()]})

    # repartition(1), not coalesce(1): coalesce would collapse the final
    # bit_or aggregate itself onto one task; a real exchange keeps the
    # aggregate at full parallelism and ships only the skinny sparse
    # words (≤ m/32 rows) to the single assembly task
    return (
        sparse.unionByName(sentinel)
        .repartition(1)
        .mapInPandas(_to_dense, schema=f"{_WORDS_COL} array<bigint>")
    )


def _contains(
    words: Column, key: Column, m_bits: int, k: int, seed: int, hash: str
) -> Column:
    """All k probe bits set in the word array — no false negatives."""
    out = F.lit(True)
    for p in bloom_positions(key, m_bits, k, seed, hash):
        word = F.element_at(words, (p / 32).cast("int") + F.lit(1))
        out = out & ((word.bitwiseAND(_mask(p))) != 0)
    return out


class BloomFilter:
    """Driver-side dense words + the frozen probe spec, for the
    metadata-sized regime (the IVF-centroids contract: fine to collect at
    the default 16 KiB, wasteful at multi-MB — the join operators below
    use the broadcast-row path instead and never build this)."""

    def __init__(
        self, words: list[int], m_bits: int, k: int, seed: int, hash: str = "xx"
    ):
        if len(words) != m_bits // 32:
            raise ValueError(f"expected {m_bits // 32} words, got {len(words)}")
        self.words = words
        self.m_bits = m_bits
        self.k = k
        self.seed = seed
        self.hash = hash

    @property
    def size_bytes(self) -> int:
        return self.m_bits // 8

    @property
    def bits_set(self) -> int:
        return sum(bin(w & 0xFFFFFFFF).count("1") for w in self.words)

    def fpp_estimate(self) -> float:
        """Observed-load false-positive estimate: (bits_set / m)^k."""
        return (self.bits_set / self.m_bits) ** self.k

    def might_contain(self, key: Column) -> Column:
        return _contains(
            F.lit(self.words), key, self.m_bits, self.k, self.seed, self.hash
        )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
) -> BloomFilter:
    """Collect the dense filter to the driver (bounded: m_bits/32 rows)."""
    dense = [0] * (m_bits // 32)
    for r in bloom_words_df(df, key_col, m_bits, k, seed, hash).collect():
        dense[r["word_idx"]] = r["word"]
    return BloomFilter(dense, m_bits, k, seed, hash)


def _tag(
    probe: DataFrame,
    wrow: DataFrame,
    probe_key: str,
    m_bits: int,
    k: int,
    seed: int,
    hash: str,
    tag_col: str,
) -> DataFrame:
    return (
        probe.join(F.broadcast(wrow))
        .withColumn(
            tag_col,
            _contains(F.col(_WORDS_COL), F.col(probe_key), m_bits, k, seed, hash),
        )
        .drop(_WORDS_COL)
    )


def bloom_tag(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
    tag_col: str = "bloom_hit",
    words_row: DataFrame | None = None,
) -> DataFrame:
    """Probe frame plus a boolean ``tag_col`` — the map-side membership
    predicate itself, for composition and instrumentation (e.g. measuring
    the shuffled fraction a bloom join would pay).  The word array rides
    in via a broadcast one-row join; no shuffle of the probe side.

    ``words_row`` (a prebuilt ``bloom_words_row`` frame, typically
    ``.localCheckpoint()``-ed) skips the build aggregate — the
    build-once / probe-many shape a standing blocklist wants; it must
    have been built with the SAME m/k/seed/hash passed here."""
    if words_row is None:
        words_row = bloom_words_row(build, build_key or probe_key, m_bits, k, seed, hash)
    return _tag(probe, words_row, probe_key, m_bits, k, seed, hash, tag_col)


def _split_probe(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None,
    m_bits: int,
    k: int,
    seed: int,
    hash: str,
    words_row: DataFrame | None,
):
    """(bloom-negative rows, bloom-positive rows, build key frame)."""
    bkey = build_key or probe_key
    if words_row is None:
        # lazy checkpoint: the neg/pos union references this subtree
        # TWICE — without it the build aggregate would run twice per
        # action
        words_row = bloom_words_row(build, bkey, m_bits, k, seed, hash).localCheckpoint(
            eager=False
        )
    tagged = _tag(probe, words_row, probe_key, m_bits, k, seed, hash, "__bloom_hit")
    neg = tagged.filter(~F.col("__bloom_hit")).drop("__bloom_hit")
    pos = tagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    keys = build.select(F.col(bkey).alias(probe_key))
    return neg, pos, keys


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
    words_row: DataFrame | None = None,
) -> DataFrame:
    """Exact left-semi join with bloom pre-pruning: definite non-members
    drop map-side; only the bloom-positive sliver shuffles for the exact
    semi join (which removes the false positives).  Result == plain
    ``probe.join(build, key, "left_semi")`` for any m/k/seed/hash."""
    _, pos, keys = _split_probe(
        probe, build, probe_key, build_key, m_bits, k, seed, hash, words_row
    )
    return pos.join(keys, on=probe_key, how="left_semi")


def bloom_anti_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    m_bits: int = M_BITS,
    k: int = K_HASH,
    seed: int = SEED,
    hash: str = "xx",
    words_row: DataFrame | None = None,
    strategy: str = "split",
) -> DataFrame:
    """Exact left-anti join with the map-side fast path: bloom-negative
    rows (definitely absent — no false negatives) pass through WITHOUT
    shuffling; only bloom-positive rows pay the exact recheck, which
    removes the false positives.  Result == plain left_anti for any
    m/k/seed/hash and either strategy.

    ``strategy="split"`` — neg ∪ (pos left_anti build): robust at ANY
    member fraction; shuffles the positive sliver's full payload rows.

    ``strategy="broadcast"`` — the decontamination shape: distinct the
    bloom-positive KEYS (one skinny shuffle of |members| + fpp·|probe|
    rows — payloads never move), resolve true members against the build
    side with a broadcast semi join (build side scanned map-side, never
    shuffled), then finish with a broadcast anti join back onto the
    probe.  Nothing wide crosses the wire at all; requires the matched
    key set (≤ |build ∩ probe| + fpp tail) to fit in a broadcast, which
    is exactly the standing-blocklist contract."""
    neg, pos, keys = _split_probe(
        probe, build, probe_key, build_key, m_bits, k, seed, hash, words_row
    )
    if strategy == "split":
        checked = pos.join(keys, on=probe_key, how="left_anti")
        return neg.unionByName(checked)
    if strategy == "broadcast":
        cand = pos.select(probe_key).distinct()
        matched = keys.join(F.broadcast(cand), on=probe_key, how="left_semi").distinct()
        return probe.join(F.broadcast(matched), on=probe_key, how="left_anti")
    raise ValueError(f"unknown strategy {strategy!r} (expected 'split' or 'broadcast')")


def py_bloom_words(
    keys, m_bits: int = M_BITS, k: int = K_HASH, seed: int = SEED
) -> dict[int, int]:
    """Independent pure-Python reference of the frozen md5 spec (tests)."""
    words: dict[int, int] = {}
    for key in keys:
        for i in range(k):
            h = hashlib.md5(f"{i}:{seed}:{key}".encode()).hexdigest()
            p = int(h[:15], 16) % m_bits
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    return words
