"""Multimodal column plumbing (extension surface).

Images/audio/video are opaque ``binary`` columns with typed metadata
(schemas.MEDIA) — the same column shape as the reference's BLOB
``pdf_content`` (01_pdf_to_vector.sql:52). The Spark-side plumbing (schema,
Arrow batch shape, partitioning) is real and tested; the actual byte
decoding is stubbed: image/audio libs are absent in this environment, so
``decode=fake`` derives deterministic pseudo-features from the bytes and
``decode=real`` raises NotImplementedError.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for image decode: dims and features derived
    from the sha256 of the payload. Replaced by a real decoder (PIL/ffmpeg)
    on clusters that ship those libs."""
    h = hashlib.sha256(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + FEATURE_DIM]]
    return width, height, feats


def extract_media_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched ``mapInPandas``.

    Input: schemas.MEDIA shape (media_id, kind, payload, meta). The batch
    iterator shape is the real production plumbing; only the per-payload
    decode call is a stub.
    """
    if decode == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/ffmpeg, not present "
            "in this environment; use decode='fake' for plumbing tests"
        )
    if decode != "fake":
        raise ValueError("decode must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar batch processing: one list pass per column, no iterrows —
        # the per-payload hash/decode call is inherently per-row, but the
        # frame assembly is vectorized (the template real decoders follow)
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"].tolist()
            ]
            decoded = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "byte_len": [len(p) for p in payloads],
                    "digest": [hashlib.sha256(p).hexdigest()[:16] for p in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                },
                columns=[f.name for f in _FEATURES_SCHEMA.fields],
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, target_w: int, target_h: int, decode: str = "fake"
) -> DataFrame:
    """Resize plumbing: one output row per input, payload re-encoded at
    (target_w, target_h). Arrow-batched ``mapInPandas``; with ``fake``
    decode the output payload is a deterministic digest-stream of
    ~w·h/64 bytes standing in for the re-encoded image."""
    if decode == "real":
        raise NotImplementedError(
            "real resize requires PIL/ffmpeg, absent here; use decode='fake'"
        )
    if decode != "fake":
        raise ValueError("decode must be 'fake' or 'real'")
    n_bytes = max(16, target_w * target_h // 64)

    suffix = f"{target_w}x{target_h}".encode()

    def _resize(payload: bytes) -> bytes:
        seed = hashlib.sha256(payload + suffix).digest()
        buf = bytearray()
        while len(buf) < n_bytes:
            seed = hashlib.sha256(seed).digest()
            buf.extend(seed)
        return bytes(buf[:n_bytes])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"].tolist()
            ]
            n = len(payloads)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "width": [target_w] * n,
                    "height": [target_h] * n,
                    "payload": [_resize(p) for p in payloads],
                },
                columns=[f.name for f in _RESIZED_SCHEMA.fields],
            )

    return df.mapInPandas(run, schema=_RESIZED_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, fps: float = 1.0, max_frames: int = 16, decode: str = "fake"
) -> DataFrame:
    """Frame sampling plumbing: one input video row → N frame rows (the
    generator/UDTF shape, like chunking). With ``fake`` decode the frame
    count derives deterministically from the payload digest and each
    frame payload is a per-index digest."""
    if decode == "real":
        raise NotImplementedError(
            "real frame sampling requires ffmpeg, absent here; use decode='fake'"
        )
    if decode != "fake":
        raise ValueError("decode must be 'fake' or 'real'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # row → N frames is a generator expansion; iterate parallel column
        # lists (not iterrows) and emit flat columns
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, p in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
                payload = bytes(p) if p is not None else b""
                h = hashlib.sha256(payload).digest()
                n = min(max_frames, 1 + h[0] % max_frames)
                ids.extend([mid] * n)
                idxs.extend(range(n))
                tss.extend(i / fps for i in range(n))
                frames.extend(
                    hashlib.sha256(payload + bytes([i])).digest() for i in range(n)
                )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_sec": tss, "payload": frames},
                columns=[f.name for f in _FRAMES_SCHEMA.fields],
            )

    return df.mapInPandas(run, schema=_FRAMES_SCHEMA)


def binary_stats(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """JVM-side binary column ops (no Python): length + md5 digest —
    the fast-path subset of media introspection."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.md5(F.col(payload_col)).alias("digest"),
    )
