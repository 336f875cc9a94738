"""AVI video container (X59 tail, r12) — the second real video
container after GIF, opened with ZERO new gated math: the RIFF/AVI
container is a stdlib chunk walk (the same RIFF framing as WAV —
multimodal.py:79) and both supported codecs reuse machinery that
already exists — every MJPG ``00dc`` frame chunk is a baseline JPEG
the T.81 decoder (:mod:`.jpeg`) handles, and raw BI_RGB ``00db``
frames are bottom-up padded BGR rows (the BMP pixel layout
``operators/multimodal.py`` already decodes structurally). The
reference's document-conversion surface claims ~150 formats via its
closed converter (01_pdf_to_vector.sql:196-205); this module keeps the
honest-offline subset growing. H.264/MP4/WebM still need a real codec
and stay rejected BY NAME.

Container facts used (public AVI RIFF spec, msdn AVIMAINHEADER /
AVISTREAMHEADER / BITMAPINFOHEADER layouts):

- ``RIFF <size> 'AVI '`` root; children are plain ``<fourcc><u32le
  size>`` chunks, odd sizes padded to even; ``LIST <size> <type>``
  nests.
- ``hdrl`` LIST: ``avih`` (56-byte main header: µs/frame, total
  frames, streams, width, height) then one ``strl`` LIST per stream
  with ``strh`` (fccType ``vids``, fccHandler, dwScale/dwRate — the
  frame clock: fps = rate/scale) and ``strf`` (BITMAPINFOHEADER whose
  ``biCompression`` fourcc names the codec — ``MJPG`` or 0/BI_RGB
  here).
- ``movi`` LIST: frame chunks named ``NNdc``/``NNdb`` (compressed /
  uncompressed DIB of stream NN). Each MJPG frame is a self-contained
  baseline JPEG — except that many real muxers strip the DHT segment
  (the historic "MJPEG has implicit Huffman tables" convention from
  the OpenDML era): decoders MUST fall back to the T.81 Annex K
  standard tables. ``_ensure_dht`` re-injects them when absent, so
  both full-JFIF and stripped streams decode. BI_RGB frames are raw
  bottom-up BGR24 rows, each row padded to 4 bytes (the DIB layout).
- ``idx1``: optional seek index; not needed for a linear walk.

Scale notes: ``avi_frame_table`` walks chunk HEADERS only (no pixel
decode), so fps-based frame sampling decodes exactly the sampled
frames — a constant-frame-clock container gives random access the GIF
path (which must composite every frame up to the target) cannot.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "avi_audio_pcm",
    "avi_frame_table",
    "decode_avi_frames",
    "decode_video_frames",
    "make_simple_avi",
    "riff_info_tags",
    "riff_tag_text",
]

# RIFF LIST-INFO chunk ids → the shared canonical tag keys (the
# mp3/_TAG_ORDER vocabulary) — the public Multimedia Programming
# Interface INFO vocabulary; applies to AVI and WAV alike
_INFO_KEYS = {
    b"INAM": "title", b"IART": "artist", b"IPRD": "album",
    b"ICRD": "year", b"IGNR": "genre", b"ITRK": "track",
}


def riff_info_tags(data: bytes) -> dict[str, str]:
    """Canonical tags from a RIFF file's ``LIST INFO`` chunk (AVI and
    WAV share the layout): NUL-terminated values, UTF-8 with a
    latin-1 fallback. Empty dict when no INFO list exists."""
    data = bytes(data)
    if data[:4] != b"RIFF" or len(data) < 12:
        raise ValueError("not a RIFF file")
    out: dict[str, str] = {}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            ckid = data[pos:pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body, bend = pos + 8, pos + 8 + size
            if bend > end:
                break  # tolerate a truncated trailing chunk
            if ckid == b"LIST":
                if data[body:body + 4] == b"INFO":
                    ipos = body + 4
                    while ipos + 8 <= bend:
                        iid = data[ipos:ipos + 4]
                        (iln,) = struct.unpack(
                            "<I", data[ipos + 4:ipos + 8]
                        )
                        raw = data[ipos + 8:ipos + 8 + iln]
                        key = _INFO_KEYS.get(iid)
                        if key and key not in out:
                            txt = raw.split(b"\x00")[0]
                            try:
                                val = txt.decode("utf-8")
                            except UnicodeDecodeError:
                                val = txt.decode("latin-1")
                            if val.strip():
                                out[key] = val.strip()
                        ipos += 8 + iln + (iln & 1)
                else:
                    walk(body + 4, bend)
            pos = bend + (size & 1)

    walk(12, len(data))
    return out


def riff_tag_text(data: bytes) -> str:
    """The INFO record as one line in the shared fixed key order (the
    :func:`~.mp3.mp3_tag_text` contract)."""
    from oracle_vectorsearch_example_spark.functions.mp3 import _TAG_ORDER

    tags = riff_info_tags(data)
    return " ".join(tags[k] for k in _TAG_ORDER if k in tags)


def _fourcc(b: bytes) -> str:
    return b.decode("latin-1")


def avi_frame_table(data: bytes) -> tuple[dict, list[bytes]]:
    """(meta, [raw frame bytes]) from an AVI — chunk walk only, NO
    pixel decode (callers sample by timestamp first, then decode just
    the frames they keep). ``meta`` carries ``fps``, ``codec``
    (``'MJPG'`` or ``'DIB'``), ``width``, ``height``, ``bpp``.
    Non-AVI RIFF, missing headers, and codecs needing real decoders
    (H264/avc1/...) raise by name; so do non-24-bit raw DIBs."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' signature)")

    meta: dict = {}
    vids_stream: int | None = None
    frames: list[bytes] = []
    stream_no = 0

    def walk(pos: int, end: int) -> None:
        nonlocal vids_stream, stream_no
        while pos + 8 <= end:
            ckid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(
                    f"AVI chunk {_fourcc(ckid)!r} overruns its parent"
                )
            if ckid == b"LIST":
                walk(body_start + 4, body_end)  # skip the list type
            elif ckid == b"strh":
                fcc_type = data[body_start : body_start + 4]
                if fcc_type == b"vids":
                    handler = data[body_start + 4 : body_start + 8]
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20 : body_start + 28]
                    )
                    if handler not in (
                        b"MJPG", b"mjpg", b"DIB ", b"\x00" * 4
                    ):
                        raise NotImplementedError(
                            f"AVI video codec {_fourcc(handler)!r} needs a "
                            "real codec (only MJPG and raw BI_RGB decode "
                            "offline)"
                        )
                    if scale == 0 or rate == 0:
                        raise ValueError("AVI strh with zero frame clock")
                    meta["fps"] = rate / scale
                    vids_stream = stream_no
                stream_no += 1
            elif ckid == b"strf" and vids_stream == stream_no - 1:
                (w, h) = struct.unpack(
                    "<ii", data[body_start + 4 : body_start + 12]
                )
                (bpp,) = struct.unpack(
                    "<H", data[body_start + 14 : body_start + 16]
                )
                compression = data[body_start + 16 : body_start + 20]
                if compression in (b"MJPG", b"mjpg"):
                    meta["codec"] = "MJPG"
                elif compression == b"\x00\x00\x00\x00":  # BI_RGB
                    if bpp != 24:
                        raise NotImplementedError(
                            f"raw BI_RGB AVI at {bpp} bpp is not decoded "
                            "(24-bit BGR only)"
                        )
                    meta["codec"] = "DIB"
                else:
                    raise NotImplementedError(
                        f"AVI biCompression {_fourcc(compression)!r} needs "
                        "a real codec (only MJPG and raw BI_RGB decode "
                        "offline)"
                    )
                meta["width"], meta["height"], meta["bpp"] = w, abs(h), bpp
                meta["topdown"] = h < 0  # negative height = top-down DIB
            elif (
                len(ckid) == 4
                and ckid[2:4] in (b"dc", b"db")
                and ckid[:2].isdigit()
            ):
                if vids_stream is not None and int(ckid[:2]) == vids_stream:
                    frames.append(data[body_start:body_end])
            pos = body_end + (size & 1)  # RIFF even padding

    (root_size,) = struct.unpack("<I", data[4:8])
    walk(12, min(8 + root_size, len(data)))
    if "fps" not in meta:
        raise ValueError("AVI without a 'vids' stream header")
    if "codec" not in meta:
        raise ValueError("AVI vids stream without a strf format block")
    return meta, frames


# standard DHT segment (T.81 Annex K tables, all four), built once —
# injected into DHT-less MJPEG frames per the implicit-tables convention
def _std_dht_segment() -> bytes:
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        STD_AC_CHROM,
        STD_AC_LUM,
        STD_DC_CHROM,
        STD_DC_LUM,
    )

    body = bytearray()
    for tc_th, (bits, vals) in (
        (0x00, STD_DC_LUM),
        (0x10, STD_AC_LUM),
        (0x01, STD_DC_CHROM),
        (0x11, STD_AC_CHROM),
    ):
        body.append(tc_th)
        body += bytes(bits)
        body += bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + bytes(body)


_STD_DHT: bytes | None = None


def _has_dht(frame: bytes) -> bool:
    """True iff the stream carries a real FFC4 DHT MARKER — a marker
    walk like ``_strip_dht``'s, not a substring scan: the byte pair
    0xFF 0xC4 legitimately occurs inside other segment payloads (DQT
    values at low quality, APPn/thumbnail data), which made a
    genuinely DHT-stripped frame look table-complete and fail the
    T.81 decode (ADVICE r12)."""
    pos = 2
    n = len(frame)
    while pos + 4 <= n:
        if frame[pos] != 0xFF:
            return False  # lost sync — let the real decoder complain
        # consume 0xFF fill bytes (legal T.81 §B.1.1.2 padding before
        # any marker): without this a fill run reads as marker==0xFF
        # and the walk desyncs on a bogus segment length (ADVICE r13)
        while pos + 4 <= n and frame[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            return False
        marker = frame[pos + 1]
        if marker == 0xC4:
            return True
        if marker == 0xDA:  # SOS: entropy data follows, no DHT came
            return False
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # bare markers
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", frame[pos + 2 : pos + 4])
        pos += 2 + seg_len
    return False


def _ensure_dht(frame: bytes) -> bytes:
    """Re-inject the Annex K Huffman tables into a DHT-less MJPEG frame
    (inserted right after SOI; a frame that already carries any DHT is
    returned untouched)."""
    global _STD_DHT
    if frame[:2] != b"\xff\xd8":
        raise ValueError("AVI MJPG frame is not a JPEG (missing SOI)")
    if _has_dht(frame):
        return frame
    if _STD_DHT is None:
        _STD_DHT = _std_dht_segment()
    return frame[:2] + _STD_DHT + frame[2:]


def _decode_frame(raw: bytes, meta: dict) -> np.ndarray:
    """One AVI frame chunk → (h, w, 3) uint8 RGB under ``meta``."""
    if meta["codec"] == "MJPG":
        from oracle_vectorsearch_example_spark.functions.jpeg import (
            decode_jpeg_pixels,
        )

        return decode_jpeg_pixels(_ensure_dht(raw))
    w, h = meta["width"], meta["height"]
    stride = ((w * 3 + 3) // 4) * 4  # DIB rows pad to 4 bytes
    if len(raw) < stride * h:
        raise ValueError(
            f"raw DIB frame too short: {len(raw)} < {stride * h}"
        )
    rows = np.frombuffer(raw[: stride * h], dtype=np.uint8)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not meta.get("topdown"):
        rows = rows[::-1]  # DIBs are bottom-up unless height < 0
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_avi_frames(
    data: bytes, max_frames: int | None = None
) -> list[tuple[float, np.ndarray]]:
    """All frames of an MJPEG or raw-BI_RGB AVI as
    ``(timestamp_seconds, (h, w, 3) uint8 RGB)`` — the exact return
    shape of :func:`~.gif.decode_gif_frames`, so every consumer of the
    GIF list (frame sampling, pHash, features) works unchanged. Frame
    i sits at ``i / fps`` on the strh frame clock."""
    meta, raw = avi_frame_table(data)
    if max_frames is not None:
        raw = raw[:max_frames]
    fps = meta["fps"]
    return [(i / fps, _decode_frame(fr, meta)) for i, fr in enumerate(raw)]


def avi_audio_pcm(data: bytes):
    """((n_samples, channels) int array, bits_per_sample) from an
    AVI's FIRST audio stream (r12): strh ``auds`` + strf WAVEFORMATEX
    (wFormatTag 1 = integer PCM at 8/16/24/32 bits — the afp WAV width
    rules, PCM8 unsigned-centered; tag 7 = G.711 µ-law, 6 = A-law via
    the ITU tables) and the stream's ``NNwb`` chunks concatenated in
    file order. Compressed tags (MP3 = 0x55, AAC = 0xFF, ...) reject
    by name. Composes ``dedup_audio`` over video files' soundtracks."""
    import numpy as np

    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' signature)")

    fmt: dict = {}
    auds_stream: int | None = None
    chunks: list[bytes] = []
    stream_no = 0

    def walk(pos: int, end: int) -> None:
        nonlocal auds_stream, stream_no
        while pos + 8 <= end:
            ckid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(
                    f"AVI chunk {_fourcc(ckid)!r} overruns its parent"
                )
            if ckid == b"LIST":
                walk(body_start + 4, body_end)
            elif ckid == b"strh":
                if (
                    data[body_start : body_start + 4] == b"auds"
                    and auds_stream is None
                ):
                    auds_stream = stream_no
                stream_no += 1
            elif ckid == b"strf" and auds_stream == stream_no - 1 and not fmt:
                tag, nch, rate = struct.unpack(
                    "<HHI", data[body_start : body_start + 8]
                )
                (bits,) = struct.unpack(
                    "<H", data[body_start + 14 : body_start + 16]
                )
                fmt.update(tag=tag, nch=nch, rate=rate, bits=bits)
            elif (
                len(ckid) == 4
                and ckid[2:4] == b"wb"
                and ckid[:2].isdigit()
                and auds_stream is not None
                and int(ckid[:2]) == auds_stream
            ):
                chunks.append(data[body_start:body_end])
            pos = body_end + (size & 1)

    (root_size,) = struct.unpack("<I", data[4:8])
    walk(12, min(8 + root_size, len(data)))
    if auds_stream is None or not fmt:
        raise ValueError("AVI without an audio stream header")
    raw = b"".join(chunks)
    nch = max(1, fmt["nch"])
    tag, bits = fmt["tag"], fmt["bits"]
    if tag in (6, 7):  # G.711 A-law / µ-law
        from oracle_vectorsearch_example_spark.functions.afp import (
            _g711_decode,
        )

        return _g711_decode(raw, mu=(tag == 7), nch=nch)
    if tag != 1:
        raise NotImplementedError(
            f"AVI audio wFormatTag 0x{tag:02x} needs a real codec "
            "(PCM=1 and G.711 6/7 decode offline)"
        )
    if bits == 8:  # PCM8 WAV convention: unsigned, center at 0
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 8
    if bits == 16:
        x = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 16
    if bits == 24:
        b = np.frombuffer(raw[: len(raw) // 3 * 3], dtype=np.uint8)
        b = b.reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
        )
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 24
    if bits == 32:
        x = np.frombuffer(raw[: len(raw) // 4 * 4], dtype="<i4")
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 32
    raise NotImplementedError(f"AVI PCM {bits}-bit samples unsupported")


_MOV_LEADING_ATOMS = (
    b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot",
)


def decode_video_frames(
    data: bytes, max_frames: int | None = None
) -> list[tuple[float, np.ndarray]]:
    """Magic-dispatched video decode: GIF87a/GIF89a → the X4 animation
    decoder; RIFF+'AVI ' → MJPEG / raw-DIB AVI; a leading QuickTime
    atom → 'jpeg'-codec MOV (:mod:`.mov`); everything else (H.264 in
    any container, WebM, ...) raises by name — mixed columns fail
    loudly per payload under ``on_error='raise'`` and carry no
    evidence under 'null'."""
    data = bytes(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from oracle_vectorsearch_example_spark.functions.gif import (
            decode_gif_frames,
        )

        return decode_gif_frames(data, max_frames=max_frames)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_frames(data, max_frames=max_frames)
    if len(data) >= 12 and data[4:8] in _MOV_LEADING_ATOMS:
        from oracle_vectorsearch_example_spark.functions.mov import (
            decode_mov_frames,
        )

        return decode_mov_frames(data, max_frames=max_frames)
    if data[:4] == b"\x1a\x45\xdf\xa3":
        # WebM/Matroska (r13): the ELEMENT layer parses for real
        # (functions.ebml — doc type, tracks, duration, tags); frame
        # payloads are VP8/VP9/AV1 and stay gated. Name the codec in
        # the rejection so the evidence gap is attributable per file.
        from oracle_vectorsearch_example_spark.functions.ebml import (
            mkv_meta,
        )

        codecs = ", ".join(
            sorted({t.get("codec_id", "?") for t in mkv_meta(data)["tracks"]})
        ) or "no tracks"
        raise NotImplementedError(
            f"WebM/Matroska frame payloads ({codecs}) need real codecs "
            "(VP8/VP9/AV1 gated by name); the element layer parses via "
            "functions.ebml.mkv_meta/mkv_tags"
        )
    raise NotImplementedError(
        "real frame decode is built-in for GIF, AVI (MJPG / raw "
        "BI_RGB) and MOV ('jpeg' codec) only; other containers "
        "(H.264/MP4) need ffmpeg (absent here)"
    )


def make_simple_avi(
    frames: list[np.ndarray],
    fps: float = 10.0,
    quality: int = 90,
    strip_dht: bool = False,
    codec: str = "MJPG",
    audio_samples=None,
    audio_rate: int = 16000,
    info: dict | None = None,
) -> bytes:
    """Deterministic AVI fixture writer: each (h, w, 3) uint8 RGB frame
    is muxed as a ``00dc``/``00db`` chunk; ``hdrl`` carries a real
    avih + vids strh/strf (fps = dwRate/dwScale, scale fixed at 1000)
    and an ``idx1`` index is written for container realism.

    ``codec='MJPG'`` (default) encodes frames with the X4 baseline
    JPEG encoder (lossy like any JPEG round trip, byte-deterministic
    for fixed inputs); ``strip_dht=True`` removes the Huffman-table
    segments from every frame (the historic MJPEG implicit-tables
    muxer convention) to exercise the decoder's Annex K re-injection
    path. ``codec='DIB'`` writes raw BI_RGB bottom-up BGR24 rows —
    LOSSLESS, so container round trips are pixel-exact."""
    if codec not in ("MJPG", "DIB"):
        raise ValueError(f"codec must be MJPG or DIB (got {codec!r})")
    if strip_dht and codec != "MJPG":
        raise ValueError("strip_dht only applies to the MJPG codec")
    if not frames:
        raise ValueError("make_simple_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    scale = 1000
    rate = round(fps * scale)
    if rate <= 0:
        raise ValueError("fps too small for the 1/1000s frame clock")

    payloads = []
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        fr = np.asarray(fr, dtype=np.uint8)
        if codec == "MJPG":
            from oracle_vectorsearch_example_spark.functions.jpeg import (
                encode_jpeg,
            )

            p = encode_jpeg(fr, quality=quality)
            if strip_dht:
                p = _strip_dht(p)
        else:
            stride = ((w * 3 + 3) // 4) * 4
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * 3] = fr[::-1, :, ::-1].reshape(h, w * 3)
            p = rows.tobytes()
        payloads.append(p)
    max_size = max(len(p) for p in payloads)

    def chunk(ckid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I",
        round(1_000_000 * scale / rate),  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        2 if audio_samples is not None else 1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    handler = b"MJPG" if codec == "MJPG" else b"DIB "
    strh = (
        b"vids"
        + handler
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            scale,
            rate,
            0,  # dwStart
            len(payloads),  # dwLength (frames)
            max_size,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality: default
            0,  # dwSampleSize: varying
            0, 0, w, h,  # rcFrame
        )
    )
    compression = b"MJPG" if codec == "MJPG" else b"\x00\x00\x00\x00"
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        compression,
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    audio_raw = None
    if audio_samples is not None:
        x = np.asarray(audio_samples)
        if x.ndim == 1:
            x = x[:, None]
        nch_a = x.shape[1]
        audio_raw = x.astype("<i2").tobytes()
        strh_a = (
            b"auds"
            + b"\x00" * 4
            + struct.pack(
                "<IHHIIIIIIII4H",
                0, 0, 0, 0,
                1,  # dwScale (samples)
                audio_rate,  # dwRate
                0,
                len(x),  # dwLength (samples)
                len(audio_raw),
                0xFFFFFFFF,
                2 * nch_a,  # dwSampleSize (PCM16 block)
                0, 0, 0, 0,
            )
        )
        # WAVEFORMATEX: PCM16
        strf_a = struct.pack(
            "<HHIIHHH",
            1,  # wFormatTag = PCM
            nch_a,
            audio_rate,
            audio_rate * 2 * nch_a,  # avg bytes/sec
            2 * nch_a,  # block align
            16,  # bits per sample
            0,  # cbSize
        )
        strl += lst(
            b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)
        )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    frame_ckid = b"00dc" if codec == "MJPG" else b"00db"
    movi_body = bytearray()
    offsets = []  # offsets relative to the start of the 'movi' type tag
    for p in payloads:
        offsets.append(4 + len(movi_body))
        movi_body += chunk(frame_ckid, p)
    if audio_raw is not None:
        offsets.append(4 + len(movi_body))
        movi_body += chunk(b"01wb", audio_raw)
    movi = lst(b"movi", bytes(movi_body))

    idx1 = bytearray()
    for off, p in zip(offsets, payloads):
        idx1 += frame_ckid + struct.pack("<III", 0x10, off, len(p))
    if audio_raw is not None:
        idx1 += b"01wb" + struct.pack(
            "<III", 0x10, offsets[-1], len(audio_raw)
        )

    info_list = b""
    if info:
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            _TAG_ORDER,
        )

        rev = {v: k for k, v in _INFO_KEYS.items()}
        items = b"".join(
            chunk(rev[k], str(info[k]).encode("utf-8") + b"\x00")
            for k in _TAG_ORDER if k in info
        )
        info_list = lst(b"INFO", items)

    body = hdrl + info_list + movi + chunk(b"idx1", bytes(idx1))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT (FFC4) segment from a JPEG stream (marker walk,
    stops at SOS — entropy data can contain any byte pair)."""
    out = bytearray(jpeg[:2])
    pos = 2
    while pos < len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("JPEG marker walk lost sync")
        while pos + 2 < len(jpeg) and jpeg[pos + 1] == 0xFF:
            pos += 1  # 0xFF fill bytes before a marker (T.81 §B.1.1.2)
        marker = jpeg[pos + 1]
        if marker == 0xDA:  # SOS: keep the rest verbatim
            out += jpeg[pos:]
            break
        (seg_len,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if marker != 0xC4:
            out += jpeg[pos : pos + 2 + seg_len]
        pos += 2 + seg_len
    return bytes(out)
