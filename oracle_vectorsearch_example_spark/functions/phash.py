"""Perceptual image hashing (X55, multimodal dedup surface) — the
classic DCT pHash (Zauner 2010, "Implementation and Benchmarking of
Perceptual Image Hash Functions"; the pHash.org algorithm): resize to
32×32 grayscale, 2-D DCT, keep the 8×8 low-frequency band, threshold
each coefficient against the band's median → a 63-bit signature whose
hamming distance survives re-encoding, resizing and small edits. This
is the image analog of the text near-dup canon (X2/X35): exact dedup
catches byte-identical files; pHash catches the re-encoded/resized
copies that dominate crawled image sets.

Frozen FIXED-POINT spec (engine-replayable — the reason this golden can
be hash-oracled where a float DCT never could):

- grayscale: ``(299·R + 587·G + 114·B) // 1000`` (integer floor);
- resize: point-sample ``g32[i][j] = gray[(i·h)//32][(j·w)//32]``;
- DCT basis: ``T[u][x] = round(cos((2x+1)·u·π/64) · 32768)`` for
  u∈0..7, x∈0..31 — materialized ONCE below as the integer constant
  table ``PHASH_DCT_TABLE`` (both the Spark exprs and the DuckDB
  oracle consume these exact integers, so no libm/rounding dependence
  survives into the spec);
- ``M1[u][y] = Σ_x T[u][x]·g32[x][y]``;
  ``C[u][v] = Σ_y M1[u][y]·T[v][y]`` — all int64, no overflow
  (|C| ≤ 32²·32768·255 ≈ 2.7e14);
- band values: the 63 row-major C[u][v] with (0,0) excluded; median =
  the 32nd smallest (lower median); bit_i = C_i > median;
  ``phash = Σ bit_i << (62 − i)`` (non-negative, fits a BIGINT).

Near-dup search: hamming ≤ d pairs via the pigeonhole band trick the
BQ/minhash paths already use — split the 63 bits into d+1 bands; two
hashes within hamming d must agree EXACTLY on ≥ 1 band, so candidates
come from equality self-joins on (band_idx, band_value) — never
all-pairs — and one XOR+bit_count verifies. Scale posture: candidate
generation is d+1 skinny (id, band) frames; payloads never move.

Reference anchor: the reference ingests documents as opaque binary +
metadata (01_pdf_to_vector.sql:20-27 CREATE TABLE with BLOB column);
this extends the same binary-column discipline to image identity.
"""

from __future__ import annotations

import itertools
import math
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PHASH_DCT_TABLE",
    "phash_gray_expr",
    "phash_from_gray32",
    "phash_from_pixels",
    "phash_gray_udf_df",
    "phash_df",
    "phash_neardup_pairs",
    "dedup_images",
]

# T[u][x] = round(cos((2x+1)·u·π/64) · 32768), u∈0..7, x∈0..31 —
# generated once from math.cos and frozen by inlining into every
# consumer (column exprs, numpy path, oracle SQL) as plain integers.
PHASH_DCT_TABLE: list[list[int]] = [
    [round(math.cos((2 * x + 1) * u * math.pi / 64) * 32768) for x in range(32)]
    for u in range(8)
]
_T_FLAT = [v for row in PHASH_DCT_TABLE for v in row]  # t(u,x) at u*32+x


def phash_gray_expr(gray: Column) -> Column:
    """The spec as pure column expressions: ``gray`` is a flat
    1024-element int array (row-major 32×32) → BIGINT phash. This is
    the normative implementation the golden hash-checks; the Arrow
    path below is its exact integer equal (tested). The caller should
    stage ``gray`` in its own projection (multi-referenced)."""
    tarr = F.array(*[F.lit(v) for v in _T_FLAT])

    def m1_entry(u, y):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(31)),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.element_at(tarr, u * 32 + x + 1).cast("long")
            * F.element_at(gray, x * 32 + y + 1).cast("long"),
        )

    m1 = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda u: F.transform(
                F.sequence(F.lit(0), F.lit(31)), lambda y: m1_entry(u, y)
            ),
        )
    )

    def from_m1(m1c: Column) -> Column:
        cvals = F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda u: F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda v: F.aggregate(
                        F.sequence(F.lit(0), F.lit(31)),
                        F.lit(0).cast("long"),
                        lambda acc, y: acc
                        + F.element_at(m1c, u * 32 + y + 1)
                        * F.element_at(tarr, v * 32 + y + 1).cast("long"),
                    ),
                ),
            )
        )

        pows = F.array(
            *[F.lit(1 << (62 - i)).cast("long") for i in range(63)]
        )

        def from_band(vals: Column) -> Column:
            med = F.element_at(F.array_sort(vals), 32)
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(62)),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.when(
                    F.element_at(vals, i + 1) > med,
                    F.element_at(pows, i + 1),
                ).otherwise(F.lit(0).cast("long")),
            )

        # bind the 63-value band once via a HOF so it isn't re-evaluated
        # per bit (transform over a 1-element array = a let-binding)
        return F.element_at(
            F.transform(
                F.array(F.slice(cvals, 2, 63)), lambda band: from_band(band)
            ),
            1,
        )

    return F.element_at(
        F.transform(F.array(m1), lambda m1c: from_m1(m1c)), 1
    )


def phash_from_gray32(g32) -> int:
    """numpy int64 path over an already-sampled (32, 32) int gray matrix
    — the EXACT integer equal of :func:`phash_gray_expr` (same table,
    same median/bit rules; parity-tested)."""
    import numpy as np

    g32 = np.asarray(g32, dtype=np.int64).reshape(32, 32)
    t = np.asarray(PHASH_DCT_TABLE, dtype=np.int64)  # (8, 32)
    c = t @ g32 @ t.T  # (8, 8) int64
    vals = c.flatten()[1:]  # 63 row-major, DC excluded
    med = np.sort(vals)[31]
    bits = vals > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << (62 - i)
    return out


def phash_from_pixels(px) -> int:
    """numpy int64 reference/production path over an (h, w, 3) uint8 RGB
    array — grayscale + point-sample per the frozen spec, then
    :func:`phash_from_gray32`. Used inside the decode UDF."""
    import numpy as np

    px = np.asarray(px, dtype=np.int64)
    h, w = px.shape[0], px.shape[1]
    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
    ri = (np.arange(32) * h) // 32
    ci = (np.arange(32) * w) // 32
    return phash_from_gray32(gray[np.ix_(ri, ci)])


def phash_gray_udf_df(
    df: DataFrame,
    gray_col: str = "gray",
    id_col: str = "doc_id",
    out_col: str = "phash",
) -> DataFrame:
    """(id, phash) from flat 1024-int gray arrays via the Arrow path —
    the fast equal of mapping :func:`phash_gray_expr` over the same
    column (the interpreted-HOF expr spec costs ~250 ms/row; the numpy
    matmul microseconds — equality is pytest-pinned, so the golden gate
    runs this one)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _ph(s: pd.Series) -> pd.Series:
        return s.map(lambda g: phash_from_gray32(g))

    return df.select(id_col, _ph(F.col(gray_col)).alias(out_col))


def phash_df(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    out_col: str = "phash",
    on_error: str = "null",
) -> DataFrame:
    """(id, phash) — decode each binary image payload (the X4
    magic-dispatched real decoders: BMP/PNG/GIF/TIFF/JPEG) and hash it.
    Arrow-batched mapInPandas; undecodable payloads yield NULL
    (``on_error='null'``) or raise (``'raise'``). Map-side only —
    payloads never shuffle."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
    )

    from pyspark.sql import types as T

    # id type follows the input (string/UUID media ids must not be
    # cast to long by a hardcoded schema)
    schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType),
            T.StructField(out_col, T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            hashes = []
            for payload in b[payload_col]:
                try:
                    px = decode_image_pixels(bytes(payload))
                    hashes.append(phash_from_pixels(px))
                except Exception:
                    if on_error == "raise":
                        raise
                    hashes.append(None)
            # object dtype, NOT a tuple-list frame: one None in the batch
            # made pandas infer float64 for the whole column, silently
            # rounding 63-bit hashes past float64's 53-bit mantissa — the
            # corrupted value depended on which rows shared a batch
            # (partition layout). Object ints cross Arrow exactly.
            yield pd.DataFrame(
                {
                    id_col: b[id_col].to_numpy(),
                    out_col: pd.Series(hashes, dtype=object),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(run, schema)


# combo counts at or under this stay on the literal-struct-array expr
# path (codegen-safe); above it the Generate blows janino's method-size
# limit, falls back to interpreted eval, and the numpy Arrow path wins
# (~7× measured at C(12,4)=495). Tests monkeypatch this to 0 to pin the
# two paths' banded keys equal.
_ARROW_COMBO_THRESHOLD = 64


def phash_band_table(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """(id, hash, band, bval) — the banded-key blocking index for one
    hash frame: the pigeonhole/Manku combination keys under which any
    two hashes within ``max_hamming`` bits MUST share at least one
    (band, bval) row. The image analog of
    :func:`~..operators.dedup.minhash_band_table`, and persistable the
    same way (incremental ingest appends one band table per batch; the
    hash rides along so candidate joins verify without a second
    signature lookup). NULL hashes drop out."""
    if not 0 <= max_hamming <= 62:
        raise ValueError("max_hamming must be in [0, 62]")
    d = max_hamming
    b = (d + 1) if n_blocks is None else n_blocks
    if not d < b <= 63:
        raise ValueError(
            f"n_blocks must be in (max_hamming, 63], got {n_blocks}"
        )
    combos = list(itertools.combinations(range(b), b - d))
    if len(combos) > 512:
        raise ValueError(
            f"C({b}, {b - d}) = {len(combos)} key combinations — "
            "row replication would dominate; pick n_blocks closer to "
            "max_hamming + 1"
        )
    widths = [63 // b + (1 if k < 63 % b else 0) for k in range(b)]
    starts = [sum(widths[:k]) for k in range(b)]
    h = df.select(F.col(id_col), F.col(hash_col)).filter(
        F.col(hash_col).isNotNull()
    )
    if len(combos) <= _ARROW_COMBO_THRESHOLD:
        # expr path: a literal struct array this size stays inside
        # janino/codegen limits (the default d+1 pigeonhole always
        # lands here — its combos are the d+1 single-block keys)
        def block_val(k: int):
            return F.shiftright(F.col(hash_col), starts[k]).bitwiseAND(
                F.lit((1 << widths[k]) - 1).cast("long")
            )

        entries = []
        for ci, combo in enumerate(combos):
            key = F.lit(0).cast("long")
            shift = 0
            for k in combo:
                # shift is a Python int — the F.shiftleft constraint
                key = key.bitwiseOR(F.shiftleft(block_val(k), shift))
                shift += widths[k]
            entries.append(
                F.struct(F.lit(ci).alias("band"), key.alias("bval"))
            )
        banded = h.select(
            id_col, hash_col, F.explode(F.array(*entries)).alias("__k")
        ).select(
            id_col,
            hash_col,
            F.col("__k.band").alias("band"),
            F.col("__k.bval").alias("bval"),
        )
    else:
        # Arrow path: hundreds of combination keys blow the generated
        # struct array past janino's method-size limit and the whole
        # Generate falls back to interpreted eval (measured ~7× slower
        # than this numpy loop at C(12,4)=495). The keys are identical
        # integers — pytest pins the banded frames equal — computed as
        # C(b,d) vectorized shift/or passes per Arrow batch, map-side.
        # r11 shape: Python returns ONE row per input with the keys as
        # an array column and the (band, bval) explode happens JVM-side
        # (posexplode, codegen'd) — crossing Arrow with n rows × one
        # array instead of C(b,d)·n scalar rows cut the 100k-signature
        # key generation 12.5 → ~3 s (row overhead, not payload bytes,
        # dominated).
        import numpy as np
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(id_col, df.schema[id_col].dataType),
                T.StructField(hash_col, T.LongType()),
                T.StructField("__keys", T.ArrayType(T.LongType())),
            ]
        )
        n_c = len(combos)

        def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for bt in batches:
                if not len(bt):
                    continue
                hs = bt[hash_col].to_numpy(dtype=np.int64)
                blocks = [
                    (hs >> starts[k]) & ((1 << widths[k]) - 1)
                    for k in range(b)
                ]
                keys = np.empty((len(hs), n_c), dtype=np.int64)
                for ci, combo in enumerate(combos):
                    key = np.zeros(len(hs), dtype=np.int64)
                    shift = 0
                    for k in combo:
                        key |= blocks[k] << shift
                        shift += widths[k]
                    keys[:, ci] = key
                yield pd.DataFrame(
                    {
                        id_col: bt[id_col].to_numpy(),
                        hash_col: hs,
                        "__keys": list(keys),
                    }
                )

        banded = (
            h.mapInPandas(run, schema)
            .select(
                id_col,
                hash_col,
                F.posexplode("__keys").alias("band", "bval"),
            )
            .select(id_col, hash_col, "band", "bval")
        )
    return banded


def _band_candidates_raw(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    n_blocks: int | None,
) -> DataFrame:
    """Candidate pairs WITHOUT the dedup — a pair sharing k bands
    appears k times. Internal: callers either ``.distinct()`` here
    (the audit view) or verify hamming FIRST and dedup the
    much smaller survivor set (:func:`phash_neardup_pairs`)."""
    banded = phash_band_table(
        df,
        id_col=id_col,
        hash_col=hash_col,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
    )
    # One explicit shuffle on the join keys, shared by both sides of
    # the self-join (identical exchange subtree => ReusedExchange): at
    # Manku parameters the banded frame is C(b, d)·n rows, and without
    # this the mapInPandas key generation ran ONCE PER SIDE — measured
    # 2× the dominant cost at 100k signatures.
    banded = banded.repartition("band", "bval")
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col(hash_col).alias("__ha"),
        "band",
        "bval",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col(hash_col).alias("__hb"),
        "band",
        "bval",
    )
    # merge (sort-merge) hint (r11): the banded frame is NEVER
    # broadcastable at Manku parameters, but the planner can't see
    # that through the mapInPandas stage (unknown stats inherit the
    # skinny input's size estimate), and a misestimated broadcast of a
    # 50M-row band table OOMed the driver in the crossover bench.
    # Sort-merge is the strategy that degrades gracefully at every
    # scale (it spills; shuffle-hash build maps don't, and 32
    # concurrent tasks sharing one local JVM killed those too).
    return (
        left.hint("merge").join(right.hint("merge"), ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ha", "__hb")
    )


def phash_band_candidates(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """(id_a, id_b, __ha, __hb) — the DISTINCT candidate pairs the
    banding scheme proposes, before the hamming verify. Exposed so
    benchmarks/audits can measure candidate volume (the quantity the
    Manku ``n_blocks`` knob trades against key replication);
    :func:`phash_neardup_pairs` is this plus one XOR+bit_count
    verify (with the dedup deferred past the verify, where the row
    set is orders of magnitude smaller)."""
    return _band_candidates_raw(
        df, id_col, hash_col, max_hamming, n_blocks
    ).distinct()


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) — all pairs within ``max_hamming`` bits,
    id_a < id_b. Generalized pigeonhole banding (Manku, Jain & Das
    Sarma 2007 §3, the simhash web-dedup construction): the 63 bits
    split into ``n_blocks`` > d blocks; two hashes within hamming d
    differ in at most d blocks, so they AGREE on every block of at
    least one (n_blocks − d)-subset — candidates come from equality
    self-joins on each subset's packed key (NEVER all-pairs), then one
    XOR+bit_count verify. NULL hashes (failed decodes) drop out.

    ``n_blocks=None`` (default) keeps d+1 blocks joined on single-block
    keys — the plain pigeonhole. At web-crawl image counts raise it:
    d+1 blocks at d=6 give 9-bit keys (~512 distinct values per band),
    so buckets degenerate toward within-bucket all-pairs; n_blocks=9
    joins on C(9,3)=84 three-block 21-bit keys instead — wider keys,
    same no-false-negative guarantee, candidate volume traded against
    a C(n_blocks, d)-fold row replication of the SKINNY key frame
    (payloads and hashes are long scalars; nothing heavy replicates).
    Measured crossover (r11, random 63-bit signatures at d=8,
    local[32]): plain wins through ~400k; at 1M n_blocks=10 wins 1.6×;
    at 2M it wins 3.3× (35 vs 115 s) — see bench
    ``manku_crossover_2m``. Raise n_blocks further only when bucket
    fill (candidate fraction), not key replication, dominates: at 2M,
    n_blocks=12's 495 replicas still cost more wall than its 27×-lower
    candidate volume saves.
    One pass over the input: keys explode from a literal struct array
    (no per-band union re-scan). The pair dedup runs AFTER the
    XOR+bit_count verify (r11): a pair sharing k bands is verified k
    times (a few integer ops) instead of shuffling the full candidate
    multiset through a distinct — at 100k random signatures the
    candidate set is 400M rows and the verified set is thousands."""
    cand = _band_candidates_raw(
        df, id_col, hash_col, max_hamming, n_blocks
    )
    ham = F.bit_count(
        F.col("__ha").bitwiseXOR(F.col("__hb"))
    ).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def dedup_images(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 6,
    n_blocks: int | None = None,
    keep_undecodable: bool = True,
) -> DataFrame:
    """Corpus-level perceptual image dedup — the full X2-shaped pipeline
    for the image modality: decode → pHash → banded hamming pairs →
    connected-component closure → keep ONE canonical row (min id) per
    visual cluster. Exact byte dups are a special case (hamming 0), so
    this subsumes a sha-based exact pass. Undecodable payloads carry no
    evidence; ``keep_undecodable`` passes them through (quarantine
    decisions belong to the caller — the langid_df posture).

    Scale posture: hashes are one map-side decode pass (payloads never
    shuffle); pairs come from the pigeonhole band joins over skinny
    (id, band) rows; the closure runs on the pair graph
    (pointer-jumping, the X2/X6 machinery); losers anti-join back as an
    id-only frame."""
    from oracle_vectorsearch_example_spark.operators.dedup import (
        dedup_by_components,
    )

    hashes = phash_df(
        media, payload_col=payload_col, id_col=id_col, out_col="__ph"
    )
    pairs = phash_neardup_pairs(
        hashes,
        id_col=id_col,
        hash_col="__ph",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
    )
    deduped = dedup_by_components(media, pairs, id_col=id_col)
    if keep_undecodable:
        return deduped
    bad = hashes.filter(F.col("__ph").isNull()).select(id_col)
    return deduped.join(bad, id_col, "left_anti")
