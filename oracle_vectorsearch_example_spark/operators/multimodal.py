"""Multimodal column plumbing + real decode for uncompressed formats.

Images/audio/video are opaque ``binary`` columns with typed metadata
(schemas.MEDIA) — the same column shape as the reference's BLOB
``pdf_content`` (01_pdf_to_vector.sql:52).

Decode tiers (honest about the environment):

- **Real, stdlib-only** — formats whose codecs live in the stdlib need
  no media libs: BMP (24-bpp BI_RGB: struct header parse + numpy pixel
  stats), PNG (r5: full chunk walk + zlib inflate + the five scanline
  filters + palette/grayscale/alpha normalization — ``zlib`` IS the PNG
  codec), and PCM WAV (stdlib ``wave``: channels/rate/frames +
  rms/zero-cross over int16 samples). ``image_features`` /
  ``audio_features`` are full real decode paths, fixture writers
  included, DuckDB-oracle-checkable because the writers emit
  analytically predictable payloads.
- **Real, r6** — baseline JPEG joins the built-in set:
  ``functions/jpeg.py`` implements the T.81 baseline sequential process
  (Huffman + IDCT + 4:2:0/4:2:2 upsampling + JFIF color convert) with a
  matching deterministic encoder for fixtures.
- **Stubbed** — the remaining lossy codecs (MP3,
  H.264) require libjpeg-turbo/ffmpeg/torchaudio, absent here:
  ``decode=fake`` derives deterministic pseudo-features from payload
  bytes so the Arrow plumbing (batch shape, schema, partitioning) is
  exercised end-to-end; ``decode=real`` on such a payload raises with
  the codec named.
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


def _real_decode(payload: bytes) -> tuple[int | None, int | None, list[float]]:
    """Magic-byte dispatch to the built-in decoders (BMP / PNG / baseline
    JPEG / PCM WAV); width and height are NULL for audio. Remaining lossy
    codecs (MP3 / H.264) raise — the honest boundary of
    a no-media-libs environment."""
    if (
        payload[:2] == b"BM"
        or payload[:8] == _PNG_MAGIC
        or payload[:3] == b"\xff\xd8\xff"
    ):
        w, h, mr, mg, mb = decode_image_bytes(payload)
        feats = [mr / 255.0, mg / 255.0, mb / 255.0, w / max(h, 1), 0.0, 0.0, 0.0, 0.0]
        return w, h, [round(f, 6) for f in feats[:FEATURE_DIM]]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        nch, rate, n, rms, zcr = decode_wav_bytes(payload)
        feats = [float(nch), rate / 48000.0, n / max(rate, 1), rms / 32768.0, zcr,
                 0.0, 0.0, 0.0]
        return None, None, [round(f, 6) for f in feats[:FEATURE_DIM]]
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        # MP3 (r13): STRUCTURAL features from the frame/side-info walk
        # (duration, rate, channels, gain-envelope stats) — real
        # evidence with no PCM. Full PCM decode stays gated below.
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            mp3_gain_envelope,
            mp3_frame_table,
        )

        meta, _ = mp3_frame_table(payload)
        env = mp3_gain_envelope(payload)
        mean_g = float(env.mean()) if len(env) else 0.0
        std_g = float(env.std()) if len(env) else 0.0
        feats = [float(meta["nch"]), meta["sample_rate"] / 48000.0,
                 meta["duration_sec"], mean_g / 255.0, std_g / 255.0,
                 (meta["bitrate_kbps"] or 0) / 320.0, 0.0, 0.0]
        return None, None, [round(f, 6) for f in feats[:FEATURE_DIM]]
    # MP3-PCM/H.264 stay gated on principle, not effort: correct decode
    # requires ISO-tabulated constants (the Layer III Huffman tables +
    # polyphase synthesis window, CABAC init tables) that are not
    # derivable from a formula — a from-memory approximation would
    # decode real files subtly wrong, which is worse than a named
    # rejection. Every format above is implemented from spec-derivable
    # math and round-trip-verified; MP3 contributes STRUCTURAL
    # (side-info) evidence above without touching PCM.
    raise NotImplementedError(
        "real decode covers built-in-decodable formats only (BMP, PNG, "
        "baseline JPEG, PCM WAV, MP3 structural); MP3-PCM/H.264 need "
        "ffmpeg, absent here"
    )


def extract_media_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched ``mapInPandas``.

    Input: schemas.MEDIA shape (media_id, kind, payload, meta). The batch
    iterator shape is the production plumbing for both modes; ``real``
    decodes BMP/PCM-WAV payloads with stdlib parsers (see module doc),
    ``fake`` is the deterministic stand-in for codec formats.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    decoder = _real_decode if decode == "real" else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar batch processing: one list pass per column, no iterrows —
        # the per-payload hash/decode call is inherently per-row, but the
        # frame assembly is vectorized (the template real decoders follow)
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"].tolist()
            ]
            decoded = [decoder(p) for p in payloads]
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


def resize_bmp_bytes(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bpp BMP: decode → numpy index
    sampling → re-encode. Stdlib + numpy only."""
    px = decode_bmp_pixels(data)
    h, w, _ = px.shape
    ys = (_np.arange(target_h) * h) // target_h
    xs = (_np.arange(target_w) * w) // target_w
    return encode_bmp(px[ys][:, xs])


def resize_image_bytes(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resize of any built-in-decodable image,
    re-encoded in its own container (BMP→BMP, PNG→PNG; r6: JPEG→JPEG at
    quality 90)."""
    data = bytes(data)
    px = decode_image_pixels(data)
    h, w, _ = px.shape
    ys = (_np.arange(target_h) * h) // target_h
    xs = (_np.arange(target_w) * w) // target_w
    out = _np.ascontiguousarray(px[ys][:, xs])
    if data[:8] == _PNG_MAGIC:
        return encode_png(out)
    if data[:3] == b"\xff\xd8\xff":
        from oracle_vectorsearch_example_spark.functions.jpeg import encode_jpeg

        return encode_jpeg(out, quality=90)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from oracle_vectorsearch_example_spark.functions.gif import (
            make_animated_gif,
        )

        # nearest-neighbor keeps the palette a subset, so <=256 holds
        return make_animated_gif([out])
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from oracle_vectorsearch_example_spark.functions.tiff import (
            make_simple_tiff,
        )

        return make_simple_tiff(out, compression="lzw", predictor=True)
    return encode_bmp(out)


def resize_media(
    df: DataFrame, target_w: int, target_h: int, decode: str = "fake"
) -> DataFrame:
    """Resize: one output row per input, payload re-encoded at
    (target_w, target_h). Arrow-batched ``mapInPandas``. ``real`` performs
    an actual nearest-neighbor BMP resize (:func:`resize_bmp_bytes`);
    ``fake`` emits a deterministic digest-stream of ~w·h/64 bytes standing
    in for codec formats. ``real`` handles BMP and PNG (r5), re-encoding
    each in its own container."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    n_bytes = max(16, target_w * target_h // 64)

    suffix = f"{target_w}x{target_h}".encode()

    def _fake_resize(payload: bytes) -> bytes:
        seed = hashlib.sha256(payload + suffix).digest()
        buf = bytearray()
        while len(buf) < n_bytes:
            seed = hashlib.sha256(seed).digest()
            buf.extend(seed)
        return bytes(buf[:n_bytes])

    def _resize(payload: bytes) -> bytes:
        if decode == "real":
            return resize_image_bytes(payload, target_w, target_h)
        return _fake_resize(payload)

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
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if decode == "real":
        # REAL for GIF (r7: functions/gif.py decodes + composites frames)
        # and MJPEG AVI (r12: functions/avi.py RIFF walk + T.81 JPEG);
        # other containers (MP4/H.264, WebM) need ffmpeg, absent here,
        # and raise by name per payload so mixed columns fail loudly.
        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from oracle_vectorsearch_example_spark.functions.avi import (
                decode_video_frames,
            )
            from oracle_vectorsearch_example_spark.functions.gif import (
                make_animated_gif,
            )

            for pdf in batches:
                ids, idxs, tss, frames = [], [], [], []
                for mid, p in zip(
                    pdf["media_id"].tolist(), pdf["payload"].tolist()
                ):
                    payload = bytes(p) if p is not None else b""
                    # GIF sources re-emit sampled frames as single-frame
                    # GIFs (palette-safe by construction, the r7 frozen
                    # shape); AVI/MOV frames come out of a JPEG or raw
                    # decode with arbitrarily many colors, so they emit
                    # as lossless BMP instead (decode_image_pixels
                    # magic-dispatches both on the consumer side)
                    is_gif = payload[:6] in (b"GIF87a", b"GIF89a")
                    decoded = decode_video_frames(payload)
                    # sample at the requested fps against real timestamps
                    duration = decoded[-1][0]
                    want, last_t = [], None
                    for i in range(max_frames):
                        target = i / fps
                        if target > duration and i > 0:
                            break
                        # nearest frame at-or-before target
                        cand = [f for f in decoded if f[0] <= target]
                        t0, fr = cand[-1] if cand else decoded[0]
                        if last_t == t0:
                            continue
                        last_t = t0
                        want.append((t0, fr))
                    for i, (t0, fr) in enumerate(want):
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(float(t0))
                        frames.append(
                            make_animated_gif([fr])
                            if is_gif
                            else encode_bmp(fr)
                        )
                yield pd.DataFrame(
                    {
                        "media_id": ids,
                        "frame_idx": idxs,
                        "ts_sec": tss,
                        "payload": frames,
                    },
                    columns=[f.name for f in _FRAMES_SCHEMA.fields],
                )

        return df.mapInPandas(run_real, schema=_FRAMES_SCHEMA)

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


# ---------------------------------------------- real decode (stdlib-only)
import io as _io
import struct as _struct
import wave as _wave

import numpy as _np


def encode_bmp(pixels: "_np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bpp bottom-up BI_RGB
    BMP. Row 0 of the array is the TOP row (flipped into BMP's bottom-up
    order), so decode(encode(a)) round-trips."""
    h, w, _ = pixels.shape
    bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
    row_size = ((w * 3 + 3) // 4) * 4
    rows = _np.zeros((h, row_size), dtype=_np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    dib = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    offset = 14 + len(dib)
    header = _struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    return header + dib + pixel_data


def make_simple_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Write a valid 24-bpp BMP filled with one color. Deterministic
    fixture writer — the image analog of ``make_simple_pdf``."""
    px = _np.empty((height, width, 3), dtype=_np.uint8)
    px[:] = rgb
    return encode_bmp(px)


def decode_bmp_pixels(data: bytes) -> "_np.ndarray":
    """(h, w, 3) uint8 RGB array (row 0 = top) from a 24-bpp BI_RGB BMP —
    real pixel decode, stdlib struct + numpy only."""
    data = bytes(data)
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = _struct.unpack_from("<I", data, 10)
    _size, width, height, _planes, bpp, compression = _struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bpp uncompressed BMP is decoded without media libs "
            f"(got bpp={bpp}, compression={compression})"
        )
    h = abs(height)
    row_size = ((width * 3 + 3) // 4) * 4
    px = _np.frombuffer(data, dtype=_np.uint8, count=row_size * h, offset=offset)
    px = px.reshape(h, row_size)[:, : width * 3].reshape(h, width, 3)
    if height > 0:  # bottom-up storage → flip to top-down
        px = px[::-1]
    return px[:, :, ::-1]  # BGR → RGB


def decode_bmp_bytes(data: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_r, mean_g, mean_b) — channel stats over the
    real decoded pixels."""
    px = decode_bmp_pixels(data)
    h, w, _ = px.shape
    return w, h, float(px[..., 0].mean()), float(px[..., 1].mean()), float(px[..., 2].mean())


# ----------------------------------------------------------------- PNG (r5)
# PNG's codec is DEFLATE — stdlib zlib — so "compressed image" does not
# mean "needs media libs" here: this is a complete real decoder for
# non-interlaced 8-bit images (gray / gray+alpha / RGB / RGBA / palette),
# i.e. what encoders actually emit for photos-as-PNG and screenshots.
# 16-bit and Adam7-interlaced images raise with the feature named.
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunks(data: bytes):
    i = 8
    while i + 8 <= len(data):
        (length,) = _struct.unpack_from(">I", data, i)
        ctype = data[i + 4 : i + 8]
        yield ctype, data[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + crc


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> "_np.ndarray":
    """Reverse the five PNG scanline filters. None/Up vectorize whole-row;
    Sub vectorizes as a strided cumulative sum; Average/Paeth are
    inherently sequential per pixel (each output feeds the next) and run
    in a per-byte loop — fine for feature extraction, and rare in encoder
    output compared to Sub/Up."""
    out = _np.zeros((h, stride), dtype=_np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = _np.frombuffer(raw, dtype=_np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else _np.zeros(stride, dtype=_np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: cumsum within each residue class mod bpp
            r = row.reshape(-1, bpp) if stride % bpp == 0 else None
            if r is not None:
                row = _np.cumsum(r.astype(_np.uint64), axis=0).astype(_np.uint8).reshape(-1)
            else:  # ragged stride (can't happen for supported formats)
                for i in range(bpp, stride):
                    row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(_np.uint16) + prev) & 0xFF
            row = row.astype(_np.uint8)
        elif ftype == 3:  # Average
            row = row.copy()
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            row = row.copy()
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
    return out


def decode_png_pixels(data: bytes) -> "_np.ndarray":
    """(h, w, 3) uint8 RGB from a non-interlaced 8-bit PNG (color types
    0/2/3/4/6); palette resolves through PLTE, alpha is dropped, gray
    replicates across channels. Stdlib zlib + numpy only."""
    import zlib

    data = bytes(data)
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    w = h = bit_depth = color_type = interlace = None
    plte = None
    idat = []
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = _struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            plte = _np.frombuffer(body, dtype=_np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG decoded without media libs "
            f"(got bit_depth={bit_depth}, interlace={interlace})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unknown PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[..., 0]]
    if color_type == 0:
        return _np.repeat(px, 3, axis=2)
    if color_type == 4:
        return _np.repeat(px[..., :1], 3, axis=2)
    return px[..., :3]  # 2 (RGB) passes through, 6 (RGBA) drops alpha


def encode_png(pixels: "_np.ndarray", *, filter_type: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a non-interlaced 8-bit truecolor PNG.
    ``filter_type`` applies that scanline filter to every row (0..4) —
    the decoder-side inverse of each is exercised by roundtrip tests."""
    import zlib

    h, w, _ = pixels.shape
    stride = w * 3
    flat = pixels.reshape(h, stride).astype(_np.int32)
    rows = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else _np.zeros(stride, dtype=_np.int32)
        left = _np.concatenate([_np.zeros(3, dtype=_np.int32), cur[:-3]])
        ul = _np.concatenate([_np.zeros(3, dtype=_np.int32), prev[:-3]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - ul
            pa, pb, pc = _np.abs(p - left), _np.abs(p - prev), _np.abs(p - ul)
            pred = _np.where(
                (pa <= pb) & (pa <= pc), left, _np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        rows.append(bytes([filter_type]) + (filt & 0xFF).astype(_np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return _struct.pack(">I", len(body)) + ctype + body + _struct.pack(">I", crc)

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(rows), 6)
    return _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def make_simple_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Deterministic solid-color PNG fixture — the PNG analog of
    :func:`make_simple_bmp`, sharing its arithmetic-oracle property."""
    px = _np.empty((height, width, 3), dtype=_np.uint8)
    px[:] = rgb
    return encode_png(px)


def decode_image_pixels(data: bytes) -> "_np.ndarray":
    """(h, w, 3) uint8 RGB from any built-in-decodable image payload,
    dispatched on magic bytes (BMP / PNG / baseline JPEG, r6); remaining
    lossy codecs raise with the codec named."""
    data = bytes(data)
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:8] == _PNG_MAGIC:
        return decode_png_pixels(data)
    if data[:3] == b"\xff\xd8\xff":
        from oracle_vectorsearch_example_spark.functions.jpeg import (
            decode_jpeg_pixels,
        )

        return decode_jpeg_pixels(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):  # first frame (r7)
        from oracle_vectorsearch_example_spark.functions.gif import (
            decode_gif_pixels,
        )

        return decode_gif_pixels(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):  # baseline TIFF (r7)
        from oracle_vectorsearch_example_spark.functions.tiff import (
            decode_tiff_pixels,
        )

        return decode_tiff_pixels(data)
    if data[:2] in (b"P6", b"P5", b"P3", b"P2") and (
        len(data) > 2 and data[2:3].isspace()
    ):  # netpbm (r12)
        return decode_ppm_pixels(data)
    if data[:4] == b"\x00\x00\x01\x00":  # ICO (r12)
        return decode_ico_pixels(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":  # VP8L (r12)
        from oracle_vectorsearch_example_spark.functions.webp import (
            decode_webp_pixels,
        )

        return decode_webp_pixels(data)
    if (
        data[:1] == b"\x0a"
        and len(data) > 67
        and data[2] == 1
        and data[3] in (1, 2, 4, 8)
    ):  # PCX (r12): weak 1-byte magic, so require sane header fields
        return decode_pcx_pixels(data)
    if data[-18:] == b"TRUEVISION-XFILE.\x00":  # TGA v2 footer (r12)
        return decode_tga_pixels(data)
    raise ValueError(
        "unrecognized image payload (expected BMP, PNG, JPEG, GIF, TIFF, "
        "PPM/PGM, ICO, WebP-lossless, PCX, or footered TGA)"
    )


def decode_ppm_pixels(data: bytes) -> "_np.ndarray":
    """netpbm (r12): binary P6 (RGB) / P5 (gray) and ASCII P3 / P2 —
    whitespace-and-comment tokenized header (the netpbm spec), maxval
    ≤ 255 (16-bit rasters reject by name). Gray replicates to RGB."""
    import numpy as _np

    magic = data[:2]
    pos = 2
    tokens: list[int] = []
    # tokenize header: whitespace-separated ints, '#' comments to EOL
    while len(tokens) < (3 if magic in (b"P6", b"P5") else 3):
        if pos >= len(data):
            raise ValueError("netpbm header truncated")
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError(
            f"netpbm maxval {maxval} > 255 (16-bit rasters) unsupported"
        )
    nch = 3 if magic in (b"P6", b"P3") else 1
    if magic in (b"P6", b"P5"):
        pos += 1  # exactly one whitespace byte after maxval (spec)
        raster = _np.frombuffer(
            data[pos : pos + w * h * nch], dtype=_np.uint8
        )
    else:
        vals = data[pos:].split()
        raster = _np.array(vals[: w * h * nch], dtype=_np.uint8)
    if raster.size < w * h * nch:
        raise ValueError("netpbm raster truncated")
    px = raster.reshape(h, w, nch)
    if nch == 1:
        px = _np.repeat(px, 3, axis=2)
    return px.copy()


def make_simple_ppm(
    width: int, height: int, rgb: tuple[int, int, int], ascii_: bool = False
) -> bytes:
    """Solid-color netpbm fixture: binary P6 (default) or ASCII P3."""
    import numpy as _np

    px = _np.zeros((height, width, 3), _np.uint8)
    px[:] = rgb
    if ascii_:
        body = "\n".join(
            " ".join(str(v) for v in row.reshape(-1))
            for row in px
        )
        return f"P3\n{width} {height}\n255\n{body}\n".encode()
    return f"P6\n{width} {height}\n255\n".encode() + px.tobytes()


def decode_tga_pixels(data: bytes) -> "_np.ndarray":
    """Targa TGA (r12): type 2 (uncompressed truecolor) and type 10
    (RLE truecolor), 24/32 bpp BGR(A), honoring the origin bit
    (bit 5 of the descriptor: 0 = bottom-up). Color-mapped and gray
    types reject by name."""
    import struct as _struct

    import numpy as _np

    id_len, cmap_type, img_type = data[0], data[1], data[2]
    w, h = _struct.unpack("<HH", data[12:16])
    bpp, desc = data[16], data[17]
    if cmap_type != 0 or img_type not in (2, 10):
        raise NotImplementedError(
            f"TGA image type {img_type}/cmap {cmap_type} unsupported "
            "(truecolor 2/10 only)"
        )
    if bpp not in (24, 32):
        raise NotImplementedError(f"TGA {bpp} bpp unsupported (24/32)")
    nb = bpp // 8
    pos = 18 + id_len + 0  # no color map (cmap_type 0)
    need = w * h * nb
    if img_type == 2:
        raster = _np.frombuffer(data[pos : pos + need], dtype=_np.uint8)
        if raster.size < need:
            raise ValueError("TGA raster truncated")
    else:  # RLE packets
        out = bytearray()
        while len(out) < need:
            hdr = data[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                out += data[pos : pos + nb] * count
                pos += nb
            else:  # raw packet
                out += data[pos : pos + nb * count]
                pos += nb * count
        raster = _np.frombuffer(bytes(out[:need]), dtype=_np.uint8)
    px = raster.reshape(h, w, nb)[:, :, :3][:, :, ::-1]  # BGR(A) → RGB
    if not desc & 0x20:  # origin bit clear: bottom-up rows
        px = px[::-1]
    return px.copy()


def make_simple_tga(
    width: int, height: int, rgb: tuple[int, int, int], rle: bool = False
) -> bytes:
    """Solid-color TGA fixture (24 bpp, bottom-up, v2 footer so the
    magic-less format stays sniffable): type 2, or type 10 RLE with
    maximal 128-pixel run packets."""
    import struct as _struct

    hdr = bytes([0, 0, 10 if rle else 2]) + b"\x00" * 9 + _struct.pack(
        "<HH", width, height
    ) + bytes([24, 0])
    bgr = bytes([rgb[2], rgb[1], rgb[0]])
    if rle:
        body = bytearray()
        n = width * height
        while n > 0:
            run = min(128, n)
            body += bytes([0x80 | (run - 1)]) + bgr
            n -= run
        raster = bytes(body)
    else:
        raster = bgr * (width * height)
    footer = (
        _struct.pack("<II", 0, 0) + b"TRUEVISION-XFILE.\x00"
    )
    return hdr + raster + footer


def decode_ico_pixels(data: bytes) -> "_np.ndarray":
    """Windows ICO (r12): first directory entry; the image payload is
    either an embedded PNG (Vista+ convention — existing decoder) or a
    BITMAPINFOHEADER DIB whose height covers XOR+AND masks (24/32 bpp
    decoded; the AND mask is ignored — solid icons carry no
    transparency evidence)."""
    import struct as _struct

    import numpy as _np

    (count,) = _struct.unpack("<H", data[4:6])
    if count < 1:
        raise ValueError("ICO with no images")
    # ICONDIRENTRY: w h colors res planes bpp size offset
    _w8, _h8 = data[6], data[7]
    size, off = _struct.unpack("<II", data[14:22])
    payload = data[off : off + size]
    if payload[:8] == _PNG_MAGIC:
        return decode_png_pixels(payload)
    (bisize, w, h2) = _struct.unpack("<Iii", payload[:12])
    (bpp,) = _struct.unpack("<H", payload[14:16])
    if bpp not in (24, 32):
        raise NotImplementedError(
            f"ICO DIB {bpp} bpp unsupported (24/32 truecolor only)"
        )
    h = h2 // 2  # DIB height covers XOR + AND masks
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    xor = payload[bisize : bisize + stride * h]
    rows = _np.frombuffer(xor, dtype=_np.uint8).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)[:, :, :3][:, :, ::-1]
    return px[::-1].copy()  # DIB rows are bottom-up


def decode_pcx_pixels(data: bytes) -> "_np.ndarray":
    """ZSoft PCX (r12): version 5 truecolor — 8 bits/plane × 3 planes,
    RLE encoding 1 (top two bits set = run of ``byte & 0x3F``),
    plane-sequential scanlines padded to bytes_per_line. Paletted
    depths reject by name."""
    import struct as _struct

    import numpy as _np

    if data[0] != 0x0A:
        raise ValueError("not a PCX (missing 0x0A manufacturer byte)")
    encoding, bpp = data[2], data[3]
    xmin, ymin, xmax, ymax = _struct.unpack("<4H", data[4:12])
    planes = data[65]
    (bpl,) = _struct.unpack("<H", data[66:68])
    if encoding != 1:
        raise NotImplementedError(f"PCX encoding {encoding} (RLE=1 only)")
    if bpp != 8 or planes != 3:
        raise NotImplementedError(
            f"PCX {bpp} bpp × {planes} planes unsupported "
            "(24-bit truecolor only; paletted PCX rejects)"
        )
    w, h = xmax - xmin + 1, ymax - ymin + 1
    # RLE decode the full raster: h scanlines × planes × bpl bytes
    need = h * planes * bpl
    out = bytearray()
    pos = 128
    while len(out) < need:
        byte = data[pos]
        pos += 1
        if byte >= 0xC0:
            out += bytes([data[pos]]) * (byte & 0x3F)
            pos += 1
        else:
            out.append(byte)
    rows = _np.frombuffer(bytes(out[:need]), dtype=_np.uint8).reshape(
        h, planes, bpl
    )
    return _np.moveaxis(rows[:, :, :w], 1, 2).copy()


def make_simple_pcx(
    width: int, height: int, rgb: tuple[int, int, int]
) -> bytes:
    """Solid-color truecolor PCX fixture (real RLE runs)."""
    import struct as _struct

    hdr = bytearray(128)
    hdr[0] = 0x0A
    hdr[1] = 5  # version
    hdr[2] = 1  # RLE
    hdr[3] = 8  # bits per plane
    _struct.pack_into("<4H", hdr, 4, 0, 0, width - 1, height - 1)
    hdr[65] = 3  # planes
    bpl = width + (width & 1)  # even bytes per line
    _struct.pack_into("<H", hdr, 66, bpl)
    body = bytearray()
    for _y in range(height):
        for v in rgb:
            n = bpl
            while n > 0:
                run = min(63, n)
                body += bytes([0xC0 | run, v])
                n -= run
    return bytes(hdr) + bytes(body)


def make_simple_ico(
    width: int, height: int, rgb: tuple[int, int, int]
) -> bytes:
    """Solid-color ICO fixture: one 24-bpp DIB entry (XOR image +
    zeroed AND mask, bottom-up padded rows)."""
    import struct as _struct

    nb = 3
    stride = ((width * nb + 3) // 4) * 4
    row = (bytes([rgb[2], rgb[1], rgb[0]]) * width).ljust(stride, b"\x00")
    and_stride = ((width + 31) // 32) * 4
    dib = (
        _struct.pack(
            "<IiiHHIIiiII",
            40, width, height * 2, 1, 24, 0, 0, 0, 0, 0, 0,
        )
        + row * height
        + b"\x00" * (and_stride * height)
    )
    entry = _struct.pack(
        "<BBBBHHII",
        width % 256, height % 256, 0, 0, 1, 24, len(dib), 22,
    )
    return _struct.pack("<HHH", 0, 1, 1) + entry + dib


def decode_image_bytes(data: bytes) -> tuple[int, int, float, float, float]:
    """(width, height, mean_r, mean_g, mean_b) over the real decoded
    pixels of a BMP or PNG payload."""
    px = decode_image_pixels(data)
    h, w, _ = px.shape
    return w, h, float(px[..., 0].mean()), float(px[..., 1].mean()), float(px[..., 2].mean())


def make_simple_wav(
    n_samples: int,
    amplitude: int,
    sample_rate: int = 16000,
    n_channels: int = 1,
) -> bytes:
    """Write a PCM16 WAV of an alternating ±amplitude square wave (sign
    flips every sample) — rms == amplitude and zero-cross rate == 1.0
    exactly, so oracles can predict the decoded stats analytically."""
    samples = _np.full(n_samples, amplitude, dtype=_np.int16)
    samples[1::2] *= -1
    frames = _np.repeat(samples, n_channels).tobytes()
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav_bytes(data: bytes) -> tuple[int, int, int, float, float]:
    """(n_channels, sample_rate, n_samples, rms, zero_cross_rate) from a
    PCM16 WAV — real sample decode via stdlib ``wave``."""
    with _wave.open(_io.BytesIO(bytes(data)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"only PCM16 WAV is decoded without media libs "
                f"(got sample width {w.getsampwidth()})"
            )
        nch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
        raw = w.readframes(n)
    x = _np.frombuffer(raw, dtype="<i2").reshape(-1, nch)[:, 0].astype(_np.float64)
    rms = float(_np.sqrt(_np.mean(x * x))) if len(x) else 0.0
    zcr = (
        float(_np.mean(_np.signbit(x[1:]) != _np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    )
    return nch, rate, n, rms, zcr


def decode_audio_bytes(data: bytes) -> tuple[int, int, int, float, float]:
    """Magic-dispatched audio stats: RIFF/WAV (stdlib ``wave``) or FLAC
    (r7, ``functions.flac`` fixed-predictor subset) — same
    (n_channels, sample_rate, n_samples, rms, zero_cross_rate) contract
    either way."""
    data = bytes(data)
    if data[:4] == b"fLaC":
        from oracle_vectorsearch_example_spark.functions.flac import decode_flac

        rate, pcm = decode_flac(data)
        nch = pcm.shape[1]
        x = pcm[:, 0].astype(_np.float64)
        rms = float(_np.sqrt(_np.mean(x * x))) if len(x) else 0.0
        zcr = (
            float(_np.mean(_np.signbit(x[1:]) != _np.signbit(x[:-1])))
            if len(x) > 1 else 0.0
        )
        return nch, rate, len(pcm), rms, zcr
    return decode_wav_bytes(data)


_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
    ]
)


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """REAL image decode over an Arrow-batched ``mapInPandas``
    (BMP/PNG/JPEG/GIF/TIFF, magic-dispatched) + per-channel means.

    ``on_error``: ``raise`` (default — loud, the correctness posture) or
    ``null`` (corrupt/unsupported payloads yield a null-feature row
    instead of failing the task — the 100 TB posture, where one
    truncated image in a billion must not kill the pipeline; same
    contract as ``extract_text``'s ``on_error``)."""
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def one(p):
        if on_error == "raise":
            return decode_image_bytes(bytes(p))
        try:
            return decode_image_bytes(bytes(p))
        except Exception:  # noqa: BLE001 - any decode failure → null row
            return (None, None, None, None, None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col].tolist()]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_r": [r[2] for r in rows],
                    "mean_g": [r[3] for r in rows],
                    "mean_b": [r[4] for r in rows],
                },
                columns=[f.name for f in _IMAGE_SCHEMA.fields],
            )

    return df.mapInPandas(run, schema=_IMAGE_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "raise",
) -> DataFrame:
    """REAL audio decode over an Arrow-batched ``mapInPandas``: PCM WAV
    header + int16 sample stats (rms, zero-cross rate). ``on_error`` as
    in :func:`image_features`."""
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def one(p):
        if on_error == "raise":
            return decode_audio_bytes(bytes(p))
        try:
            return decode_audio_bytes(bytes(p))
        except Exception:  # noqa: BLE001 - any decode failure → null row
            return (None, None, None, None, None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col].tolist()]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "n_channels": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "n_samples": [r[2] for r in rows],
                    "rms": [r[3] for r in rows],
                    "zero_cross_rate": [r[4] for r in rows],
                },
                columns=[f.name for f in _AUDIO_SCHEMA.fields],
            )

    return df.mapInPandas(run, schema=_AUDIO_SCHEMA)


def binary_stats(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """JVM-side binary column ops (no Python): length + md5 digest —
    the fast-path subset of media introspection."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.md5(F.col(payload_col)).alias("digest"),
    )
