"""Video near-dup detection + dedup (X59, r10) — completes the
modality sweep of the dedup canon (text: MinHash/SimHash/ExactSubstr;
images: pHash X55; audio: the X57 fingerprint; video: this).

The approach is the standard frame-signature video copy-detection
shape (the CBVCD literature, e.g. TRECVID copy-detection tracks):
sample frames at a fixed fps, perceptually hash each frame (the X55
fixed-point pHash — videos re-encoded, letterboxed, or brightness
shifted keep their frame hashes close), then call two videos near-dups
when a large fraction of BOTH videos' sampled frames find a hamming
match in the other. Frozen spec:

- frames: the :func:`~.multimodal.sample_frames` rule (nearest
  decoded frame at-or-before ``i/fps``, deduped by timestamp, at most
  ``max_frames``) over the X4 real GIF animation decoder, the r12
  AVI chunk walk (functions/avi.py — MJPG via T.81 or raw BI_RGB
  DIB; only sampled frames decode) or the r12 QuickTime MOV atom
  walk (functions/mov.py — 'jpeg' samples, stts timestamps, same
  sampled-only decode); undecodable or unsupported containers
  (H.264 in any container, WebM — reject by name) yield NO frame
  rows under ``on_error='null'`` — such videos carry no evidence
  and pass through dedup as singletons;
- frame match: XOR+bit_count hamming ≤ ``max_hamming`` between frame
  pHashes, candidates from the SHARED X55 banding (pigeonhole or
  Manku ``n_blocks`` — never all-pairs), frame index ignored at match
  time (a trimmed/shifted copy still matches);
- video pair: ``cover = least(matched_a/n_a, matched_b/n_b)`` where
  ``matched_x`` counts the DISTINCT frame indexes of video x with at
  least one match in the other video and ``n_x`` its sampled frame
  count; kept iff ``cover ≥ min_frame_cover`` (6 dp rounding).

Scale posture: frame hashes are one map-side decode pass (payloads
never shuffle); candidates come from band equality joins over skinny
(video, frame, hash) rows packed into one composite long key; the
per-pair aggregation shuffles only verified frame matches (bounded by
true visual overlap, not corpus size); the closure is the X2
pointer-jumping machinery.

Composite-key packing contract: frame keys pack as
``video_id · 2^20 + frame_idx`` — ids must be non-negative longs below
2^43 and ``max_frames ≤ 2^20`` (guarded loudly; (2^43−1)·2^20 + frame
stays within int64). Same caller contract
family as ``dedup_incremental``'s global-unique-long ids.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["video_frame_hashes", "video_neardup_pairs", "dedup_videos"]

_FRAME_SHIFT = 20  # composite key: vid << 20 | frame_idx


def video_frame_hashes(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fps: float = 1.0,
    max_frames: int = 16,
    on_error: str = "null",
) -> DataFrame:
    """(id, frame_idx, ts_sec, phash) — sample frames at ``fps`` from
    each GIF or MJPEG-AVI payload (real decode: GIF compositing/
    disposal/transparency via functions/gif.py, RIFF chunk walk +
    T.81 baseline JPEG via functions/avi.py, incl. the DHT-less MJPEG
    muxer convention) and pHash each frame. One Arrow-batched map-side
    pass; sampling follows the `sample_frames` rule exactly
    (parity-pinned in tests) without the re-encode round trip, and
    hashes the decoded pixels directly. The AVI path exploits the
    container's constant frame clock: timestamps come from chunk
    headers alone, so only the SAMPLED frames are JPEG-decoded — a
    1-hour clip sampled at 16 frames decodes 16 JPEGs, not 36k.
    ``on_error='null'``: a payload that fails to decode (or is an
    unsupported container — MP4/H.264/WebM reject by name) emits no
    frame rows."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, media.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_sec", T.DoubleType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from oracle_vectorsearch_example_spark.functions.avi import (
            _decode_frame,
            avi_frame_table,
            decode_video_frames,
        )
        from oracle_vectorsearch_example_spark.functions.phash import (
            phash_from_pixels,
        )

        def sample_timestamps(ts: list[float]) -> list[int]:
            # the sample_frames rule on timestamps alone: nearest
            # at-or-before target, deduped by timestamp
            duration = ts[-1]
            want, last_t = [], None
            for i in range(max_frames):
                target = i / fps
                if target > duration and i > 0:
                    break
                cand = [j for j, t0 in enumerate(ts) if t0 <= target]
                j = cand[-1] if cand else 0
                if last_t == ts[j]:
                    continue
                last_t = ts[j]
                want.append(j)
            return want

        for b in batches:
            out = []
            for mid, payload in zip(b[id_col], b[payload_col]):
                try:
                    data = bytes(payload)
                    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                        # timestamps from chunk headers; decode only
                        # the sampled frames
                        avi_meta, raw = avi_frame_table(data)
                        nat_fps = avi_meta["fps"]
                        ts = [j / nat_fps for j in range(len(raw))]
                        if not ts:
                            raise ValueError("AVI with no video frames")
                        picked = sample_timestamps(ts)
                        sampled = [
                            (ts[j], _decode_frame(raw[j], avi_meta))
                            for j in picked
                        ]
                    elif len(data) >= 12 and data[4:8] in (
                        b"ftyp", b"moov", b"mdat", b"wide", b"free",
                        b"skip", b"pnot",
                    ):
                        # MOV: timestamps from the stts sample table;
                        # decode only the sampled frames
                        from oracle_vectorsearch_example_spark.functions.jpeg import (  # noqa: E501
                            decode_jpeg_pixels,
                        )
                        from oracle_vectorsearch_example_spark.functions.mov import (  # noqa: E501
                            mov_frame_table,
                        )

                        mov_meta, raw = mov_frame_table(data)
                        ts = mov_meta["timestamps"]
                        if not ts:
                            raise ValueError("MOV with no video frames")
                        picked = sample_timestamps(ts)
                        sampled = [
                            (ts[j], decode_jpeg_pixels(raw[j]))
                            for j in picked
                        ]
                    else:
                        decoded = decode_video_frames(data)
                        picked = sample_timestamps(
                            [t0 for t0, _ in decoded]
                        )
                        sampled = [decoded[j] for j in picked]
                    for i, (t0, fr) in enumerate(sampled):
                        out.append(
                            (mid, i, float(t0), phash_from_pixels(fr))
                        )
                except Exception:
                    if on_error == "raise":
                        raise
            yield pd.DataFrame(
                out, columns=[id_col, "frame_idx", "ts_sec", "phash"]
            )

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def video_neardup_pairs(
    frame_hashes: DataFrame,
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    hash_col: str = "phash",
    max_hamming: int = 6,
    n_blocks: int | None = None,
    min_frame_cover: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, n_a, n_b, matched_a, matched_b, cover) — video
    pairs whose mutual frame-match coverage reaches
    ``min_frame_cover``, id_a < id_b. Candidates via the shared X55
    banding over a packed (video, frame) key; same-video frame matches
    are excluded; ``cover = round(least(matched_a/n_a,
    matched_b/n_b), 6)``."""
    if not 0.0 < min_frame_cover <= 1.0:
        raise ValueError(
            f"min_frame_cover must be in (0, 1], got {min_frame_cover}"
        )
    from oracle_vectorsearch_example_spark.functions.phash import (
        phash_band_candidates,
    )

    guard = F.when(
        (F.col(id_col) < 0)
        | (F.col(id_col) >= F.lit(1 << (63 - _FRAME_SHIFT)))
        | (F.col(frame_col) < 0)
        | (F.col(frame_col) >= F.lit(1 << _FRAME_SHIFT)),
        F.raise_error(
            F.concat(
                F.lit(
                    "video_neardup_pairs packs (id << 20 | frame); ids "
                    "must be in [0, 2^43) and frame_idx in [0, 2^20): "
                ),
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col(frame_col).cast("string"),
            )
        ),
    ).otherwise(
        F.shiftleft(F.col(id_col).cast("long"), _FRAME_SHIFT)
        + F.col(frame_col).cast("long")
    )
    fh = frame_hashes.select(
        guard.alias("__fk"), F.col(hash_col).alias("__fh")
    )
    cand = phash_band_candidates(
        fh,
        id_col="__fk",
        hash_col="__fh",
        max_hamming=max_hamming,
        n_blocks=n_blocks,
    )
    matches = (
        cand.filter(
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
            <= F.lit(max_hamming)
        )
        .select(
            F.shiftright(F.col("id_a"), _FRAME_SHIFT).alias("va"),
            F.col("id_a")
            .bitwiseAND(F.lit((1 << _FRAME_SHIFT) - 1))
            .alias("fa"),
            F.shiftright(F.col("id_b"), _FRAME_SHIFT).alias("vb"),
            F.col("id_b")
            .bitwiseAND(F.lit((1 << _FRAME_SHIFT) - 1))
            .alias("fb"),
        )
        .filter(F.col("va") != F.col("vb"))
    )
    # fk ordering is monotone in video id, so va < vb after the
    # same-video filter — each unordered video pair aggregates once
    per_pair = matches.groupBy("va", "vb").agg(
        F.count_distinct("fa").cast("long").alias("matched_a"),
        F.count_distinct("fb").cast("long").alias("matched_b"),
    )
    counts = frame_hashes.groupBy(F.col(id_col).alias("__vid")).agg(
        F.count("*").cast("long").alias("__n")
    )
    joined = (
        per_pair.join(
            counts.select(
                F.col("__vid").alias("va"), F.col("__n").alias("n_a")
            ),
            "va",
        )
        .join(
            counts.select(
                F.col("__vid").alias("vb"), F.col("__n").alias("n_b")
            ),
            "vb",
        )
    )
    cover = F.round(
        F.least(
            F.col("matched_a").cast("double") / F.col("n_a").cast("double"),
            F.col("matched_b").cast("double") / F.col("n_b").cast("double"),
        ),
        6,
    )
    return (
        joined.withColumn("cover", cover)
        .filter(F.col("cover") >= F.lit(min_frame_cover))
        .select(
            F.col("va").alias("id_a"),
            F.col("vb").alias("id_b"),
            "n_a",
            "n_b",
            "matched_a",
            "matched_b",
            "cover",
        )
    )


def dedup_videos(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fps: float = 1.0,
    max_frames: int = 16,
    max_hamming: int = 6,
    n_blocks: int | None = None,
    min_frame_cover: float = 0.5,
) -> DataFrame:
    """Corpus-level video dedup — decode+sample+hash once, coverage
    pairs, component closure, keep ONE canonical row (min id) per
    visual cluster. Videos with no decodable frames carry no evidence
    and pass through (the `dedup_images keep_undecodable` posture)."""
    from oracle_vectorsearch_example_spark.operators.dedup import (
        dedup_by_components,
    )

    fh = video_frame_hashes(
        media,
        payload_col=payload_col,
        id_col=id_col,
        fps=fps,
        max_frames=max_frames,
    )
    pairs = video_neardup_pairs(
        fh,
        id_col=id_col,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
        min_frame_cover=min_frame_cover,
    )
    return dedup_by_components(media, pairs, id_col=id_col)
