"""QuickTime MOV container (X59 tail, r12) — the third real video
container (GIF, AVI, now MOV), again with ZERO new gated math: a MOV
file is a tree of length-prefixed atoms (the layout ISO BMFF/MP4
inherited), and a ``'jpeg'``-codec track's samples are baseline JPEGs
the T.81 decoder (:mod:`.jpeg`) already handles. Modern codecs
(``avc1``/H.264, ``hvc1``, ``vp09``) still need real decoders and
reject BY NAME.

Container facts used (public QuickTime File Format spec):

- Atom = ``[u32be size][4cc type][payload]``; ``size == 1`` switches
  to a 64-bit extended size, ``size == 0`` runs to EOF. Containers
  (``moov``/``trak``/``mdia``/``minf``/``stbl``/...) nest atoms
  directly.
- The sample machinery lives under ``stbl``: ``stsd`` names the codec
  (+ width/height), ``stts`` gives per-sample durations in ``mdhd``
  timescale units, ``stsz`` per-sample byte sizes, ``stsc`` maps
  samples into chunks, ``stco``/``co64`` gives absolute chunk file
  offsets (into ``mdat``). Video tracks carry ``hdlr`` subtype
  ``vide``.
- Decoding therefore needs NO codec work until the sample bytes — the
  chunk walk resolves (timestamp, offset, size) per frame, and only
  the SAMPLED frames get JPEG-decoded (the same random-access win as
  the AVI path).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_mov_frames",
    "make_simple_mov",
    "mov_audio_pcm",
    "mov_frame_table",
    "mov_tag_text",
    "mov_tags",
]

# user-data metadata atoms → the shared canonical tag keys. Two public
# dialects share the fourccs: classic QuickTime puts international
# text atoms ([u16 size][u16 lang]text) directly under moov/udta;
# MP4/iTunes nests them under udta/meta(fullbox)/ilst with each value
# in a 'data' child (type 1 = UTF-8).
_UDTA_KEYS = {
    b"\xa9nam": "title", b"\xa9ART": "artist", b"\xa9alb": "album",
    b"\xa9day": "year", b"\xa9gen": "genre",
}


def mov_tags(data: bytes) -> dict[str, str]:
    """Canonical tags from ``moov/udta`` — both the QuickTime text-atom
    dialect and the MP4 ``meta/ilst`` dialect. Empty dict when the
    file carries no user data."""
    data = bytes(data)
    if len(data) < 12 or data[4:8] not in (
        b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot",
    ):
        raise ValueError("not a QuickTime/ISO-BMFF file")
    out: dict[str, str] = {}

    def read_ilst(pos: int, end: int) -> None:
        for item, ib, ie in _atoms(data, pos, end):
            key = _UDTA_KEYS.get(item)
            if not key or key in out:
                continue
            for child, cb, _ce in _atoms(data, ib, ie):
                if child == b"data" and _ce - cb >= 8:
                    dtype = struct.unpack(">I", data[cb:cb + 4])[0]
                    if dtype & 0xFF == 1:  # UTF-8 text
                        val = data[cb + 8:_ce].decode(
                            "utf-8", "replace"
                        ).strip()
                        if val:
                            out[key] = val
                    break

    def read_udta(pos: int, end: int) -> None:
        for typ, body, nxt in _atoms(data, pos, end):
            if typ == b"meta":
                # ISO 'meta' is a FullBox: 4 version/flags bytes
                # precede the children
                for t2, b2, n2 in _atoms(data, body + 4, nxt):
                    if t2 == b"ilst":
                        read_ilst(b2, n2)
            else:
                key = _UDTA_KEYS.get(typ)
                if key and key not in out and nxt - body >= 4:
                    (size, _lang) = struct.unpack(
                        ">HH", data[body:body + 4]
                    )
                    val = data[body + 4:body + 4 + size].decode(
                        "utf-8", "replace"
                    ).strip()
                    if val:
                        out[key] = val

    for typ, body, nxt in _atoms(data, 0, len(data)):
        if typ == b"moov":
            for t2, b2, n2 in _atoms(data, body, nxt):
                if t2 == b"udta":
                    read_udta(b2, n2)
    return out


def mov_tag_text(data: bytes) -> str:
    """The user-data record as one line in the shared fixed key order
    (the :func:`~.mp3.mp3_tag_text` contract)."""
    from oracle_vectorsearch_example_spark.functions.mp3 import _TAG_ORDER

    tags = mov_tags(data)
    return " ".join(tags[k] for k in _TAG_ORDER if k in tags)

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta",
}


def _atoms(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for the atoms in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit extended size
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(
                f"MOV atom {typ!r} has bad size {size} at offset {pos}"
            )
        yield typ, body, pos + size
        pos += size


def _walk_track(data: bytes, pos: int, end: int) -> dict:
    """Collect the sample tables of one trak atom."""
    t: dict = {}
    for typ, body, nxt in _atoms(data, pos, end):
        if typ in _CONTAINERS:
            t.update(_walk_track(data, body, nxt))
        elif typ == b"hdlr":
            # ver/flags(4) pre_defined(4) handler_type(4)
            t["handler"] = data[body + 8 : body + 12]
        elif typ == b"mdhd":
            ver = data[body]
            off = body + (4 + 16 if ver == 1 else 4 + 8)
            (t["timescale"],) = struct.unpack(
                ">I", data[off : off + 4]
            )
        elif typ == b"stsd":
            (count,) = struct.unpack(">I", data[body + 4 : body + 8])
            if count >= 1:
                e = body + 8
                t["codec"] = data[e + 4 : e + 8]
                t["stsd_entry"] = e  # per-type fields re-read by kind
                # video sample description: 6 reserved + 2 dataref +
                # ver(2) rev(2) vendor(4) tq(4) sq(4) w(2) h(2)
                t["width"], t["height"] = struct.unpack(
                    ">HH", data[e + 32 : e + 36]
                )
        elif typ == b"stts":
            (count,) = struct.unpack(">I", data[body + 4 : body + 8])
            t["stts"] = [
                struct.unpack(
                    ">II", data[body + 8 + 8 * i : body + 16 + 8 * i]
                )
                for i in range(count)
            ]
        elif typ == b"stsz":
            (fixed,) = struct.unpack(">I", data[body + 4 : body + 8])
            (count,) = struct.unpack(">I", data[body + 8 : body + 12])
            if fixed:
                t["sizes"] = [fixed] * count
            else:
                t["sizes"] = list(
                    struct.unpack(
                        f">{count}I", data[body + 12 : body + 12 + 4 * count]
                    )
                )
        elif typ == b"stsc":
            (count,) = struct.unpack(">I", data[body + 4 : body + 8])
            t["stsc"] = [
                struct.unpack(
                    ">III", data[body + 8 + 12 * i : body + 20 + 12 * i]
                )
                for i in range(count)
            ]
        elif typ in (b"stco", b"co64"):
            (count,) = struct.unpack(">I", data[body + 4 : body + 8])
            fmt, wdt = (">Q", 8) if typ == b"co64" else (">I", 4)
            t["chunks"] = [
                struct.unpack(
                    fmt, data[body + 8 + wdt * i : body + 8 + wdt * (i + 1)]
                )[0]
                for i in range(count)
            ]
    return t


def mov_frame_table(data: bytes) -> tuple[dict, list[bytes]]:
    """(meta, [raw JPEG sample bytes]) from a ``'jpeg'``-codec MOV —
    atom walk only, NO pixel decode. ``meta`` carries ``timestamps``
    (seconds per frame, from stts/mdhd), ``fps`` (median frame rate),
    ``width``, ``height``. Non-MOV input and modern codecs
    (avc1/hvc1/vp09/...) raise by name."""
    data = bytes(data)
    if len(data) < 12 or data[4:8] not in (
        b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot",
    ):
        raise ValueError("not a QuickTime MOV (no leading ftyp/moov/mdat)")

    # prefer an explicit 'vide' handler across ALL traks before falling
    # back to handler-less ones; a sound trak also carries codec+chunks,
    # so a MOV whose 'soun' trak precedes the video trak must not win
    # the fallback (ADVICE r12 — mirror of mov_audio_pcm's 'soun' match)
    video = None
    fallback = None
    for typ, body, nxt in _atoms(data, 0, len(data)):
        if typ == b"moov":
            for t2, b2, n2 in _atoms(data, body, nxt):
                if t2 == b"trak":
                    t = _walk_track(data, b2, n2)
                    if t.get("handler") == b"vide":
                        video = t
                        break
                    if (
                        fallback is None
                        and t.get("handler") != b"soun"
                        and "codec" in t
                        and "chunks" in t
                    ):
                        fallback = t
    if video is None:
        video = fallback
    if video is None or "codec" not in video:
        raise ValueError("MOV without a video track")
    codec = video["codec"]
    if codec not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"MOV video codec {codec.decode('latin-1')!r} needs a real "
            "codec (only 'jpeg' decodes offline)"
        )
    sizes = video.get("sizes", [])
    chunks = video.get("chunks", [])
    stsc = video.get("stsc", [(1, 1, 1)])
    timescale = video.get("timescale", 1000)

    # resolve (offset, size) per sample via the stsc chunk map
    frames: list[bytes] = []
    sample = 0
    n_chunks = len(chunks)
    for ci in range(n_chunks):
        spc = 1
        for first, per, _sdid in stsc:
            if ci + 1 >= first:
                spc = per
        off = chunks[ci]
        for _ in range(spc):
            if sample >= len(sizes):
                break
            sz = sizes[sample]
            frames.append(data[off : off + sz])
            off += sz
            sample += 1

    # timestamps: cumulative stts deltas / timescale
    ts, acc = [], 0
    for n, delta in video.get("stts", [(len(frames), timescale)]):
        for _ in range(n):
            ts.append(acc / timescale)
            acc += delta
    ts = ts[: len(frames)]
    deltas = [b - a for a, b in zip(ts, ts[1:])] or [1.0]
    fps = 1.0 / sorted(deltas)[len(deltas) // 2] if deltas[0] else 0.0
    meta = {
        "codec": "jpeg",
        "timestamps": ts,
        "fps": fps,
        "width": video.get("width"),
        "height": video.get("height"),
    }
    return meta, frames


def decode_mov_frames(
    data: bytes, max_frames: int | None = None
) -> list[tuple[float, np.ndarray]]:
    """All frames of a 'jpeg'-codec MOV as ``(timestamp_seconds,
    (h, w, 3) uint8 RGB)`` — the shared video-decode return shape."""
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        decode_jpeg_pixels,
    )

    meta, raw = mov_frame_table(data)
    ts = meta["timestamps"]
    if max_frames is not None:
        raw, ts = raw[:max_frames], ts[:max_frames]
    return [(t, decode_jpeg_pixels(fr)) for t, fr in zip(ts, raw)]


def _resolve_samples(t: dict, data: bytes) -> list[bytes]:
    """(offset, size) per sample via the stsc chunk map → raw bytes."""
    sizes = t.get("sizes", [])
    chunks = t.get("chunks", [])
    stsc = t.get("stsc", [(1, 1, 1)])
    out: list[bytes] = []
    sample = 0
    for ci in range(len(chunks)):
        spc = 1
        for first, per, _sdid in stsc:
            if ci + 1 >= first:
                spc = per
        off = chunks[ci]
        for _ in range(spc):
            if sample >= len(sizes):
                break
            sz = sizes[sample]
            out.append(data[off : off + sz])
            off += sz
            sample += 1
    return out


def mov_audio_pcm(data: bytes):
    """((n_samples, channels) int array, bits_per_sample) from a MOV's
    FIRST sound track (r12): ``hdlr`` subtype ``soun``, sample
    description codecs ``twos`` (big-endian PCM), ``sowt``
    (little-endian PCM), ``raw `` (8-bit unsigned, centered like WAV
    PCM8), ``ulaw``/``alaw`` (G.711 via the shared ITU tables);
    compressed codecs (mp4a/AAC, ima4, ...) reject by name. The
    MOV twin of :func:`~.avi.avi_audio_pcm` — ``dedup_audio`` spans
    QuickTime soundtracks too."""
    import numpy as np

    data = bytes(data)
    if len(data) < 12 or data[4:8] not in (
        b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot",
    ):
        raise ValueError("not a QuickTime MOV (no leading ftyp/moov/mdat)")
    sound = None
    for typ, body, nxt in _atoms(data, 0, len(data)):
        if typ == b"moov":
            for t2, b2, n2 in _atoms(data, body, nxt):
                if t2 == b"trak":
                    t = _walk_track(data, b2, n2)
                    if t.get("handler") == b"soun":
                        sound = t
                        break
    if sound is None or "codec" not in sound:
        raise ValueError("MOV without a sound track")
    codec = sound["codec"]
    # sound description v0: 6 reserved + 2 dataref + ver(2) rev(2)
    # vendor(4) channels(2) bits(2) ... — channels at entry+24
    e = sound["stsd_entry"]
    (nch,) = struct.unpack(">H", data[e + 24 : e + 26])
    nch = max(1, nch)
    raw = b"".join(_resolve_samples(sound, data))
    if codec in (b"ulaw", b"alaw"):
        from oracle_vectorsearch_example_spark.functions.afp import (
            _g711_decode,
        )

        return _g711_decode(raw, mu=(codec == b"ulaw"), nch=nch)
    if codec == b"raw ":  # 8-bit unsigned, center at 0
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 8
    if codec in (b"twos", b"sowt"):
        dt = ">i2" if codec == b"twos" else "<i2"
        x = np.frombuffer(raw[: len(raw) // 2 * 2], dtype=dt).astype(
            np.int16
        )
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 16
    raise NotImplementedError(
        f"MOV audio codec {codec.decode('latin-1')!r} needs a real codec "
        "(twos/sowt/raw /ulaw/alaw decode offline)"
    )


def _atom(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def make_simple_mov(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 90,
    audio_samples=None, audio_rate: int = 16000,
    audio_first: bool = False, flavor: str = "mov",
    tags: dict | None = None,
) -> bytes:
    """Deterministic 'jpeg'-codec MOV fixture writer: samples in one
    ``mdat`` (one chunk per sample), a full ``moov`` sample table
    (stsd/stts/stsc/stsz/stco over a 1000-unit timescale), ``hdlr``
    subtype ``vide``. ``audio_samples`` (int16, (n,) or (n, nch)) adds
    a second ``soun`` trak — ``twos`` big-endian PCM16 as one whole-
    stream sample; ``audio_first=True`` writes the sound trak BEFORE
    the video trak (real muxers emit either order — the reader must
    not take the first codec-bearing trak as video, ADVICE r12).
    Lossy like any JPEG round trip (audio lossless),
    byte-deterministic for fixed inputs. ``flavor='mp4'`` (r13, via
    :func:`~.mp4.make_simple_mp4`) writes the ISO-BMFF dialect of the
    SAME atom grammar: ``isom``/``mp42``-branded ftyp, a
    self-contained ``url `` data reference, and a zeroed hdlr
    pre_defined slot — byte-level dialect only; every sample table is
    identical, which is the point (MP4 inherited QuickTime's
    grammar)."""
    from oracle_vectorsearch_example_spark.functions.jpeg import encode_jpeg

    if flavor not in ("mov", "mp4"):
        raise ValueError(f"flavor must be 'mov' or 'mp4', got {flavor!r}")
    if not frames:
        raise ValueError("make_simple_mov needs at least one frame")
    h, w = frames[0].shape[:2]
    timescale = 1000
    delta = round(timescale / fps)
    if delta <= 0:
        raise ValueError("fps too large for the 1/1000s timescale")

    payloads = []
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        payloads.append(
            encode_jpeg(np.asarray(fr, dtype=np.uint8), quality=quality)
        )

    audio_raw = None
    nch_a = 1
    if audio_samples is not None:
        ax = np.asarray(audio_samples)
        if ax.ndim == 1:
            ax = ax[:, None]
        nch_a = ax.shape[1]
        audio_raw = ax.astype(">i2").tobytes()

    if flavor == "mp4":
        ftyp = _atom(
            b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp42"
        )
    else:
        ftyp = _atom(b"ftyp", b"qt  " + struct.pack(">I", 0) + b"qt  ")
    # mdat goes before moov so stco offsets are known when moov writes
    mdat_body = b"".join(payloads) + (audio_raw or b"")
    mdat_start = len(ftyp) + 8  # offset of first sample byte
    offsets = []
    acc = mdat_start
    for p in payloads:
        offsets.append(acc)
        acc += len(p)
    audio_offset = acc
    mdat = _atom(b"mdat", mdat_body)

    n = len(payloads)
    duration = n * delta
    stsd_entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + struct.pack(">HH", 0, 0)  # version, revision
        + b"\x00" * 4  # vendor
        + struct.pack(">II", 512, 512)  # temporal/spatial quality
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # data size
        + struct.pack(">H", 1)  # frame count per sample
        + b"\x00" * 32  # compressor name (pascal, zero)
        + struct.pack(">Hh", 24, -1)  # depth, color table id
    )
    stsd = _atom(b"stsd", struct.pack(">II", 0, 1) + stsd_entry)
    # stts body: ver/flags, count=1, (n, delta)
    stts = _atom(b"stts", struct.pack(">IIII", 0, 1, n, delta))
    stsc = _atom(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, 1, 1))
    stsz = _atom(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + b"".join(struct.pack(">I", len(p)) for p in payloads),
    )
    stco = _atom(
        b"stco",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _atom(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _atom(b"vmhd", struct.pack(">I", 1) + struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _atom(
        b"dref",
        struct.pack(">II", 0, 1)
        + _atom(
            b"url " if flavor == "mp4" else b"alis",
            struct.pack(">I", 1),  # ISO: flags=1 = self-contained
        ),
    )
    dinf = _atom(b"dinf", dref)
    minf = _atom(b"minf", vmhd + dinf + stbl)
    hdlr_pre = b"\x00" * 4 if flavor == "mp4" else b"mhlr"
    hdlr = _atom(
        b"hdlr",
        struct.pack(">I", 0) + hdlr_pre + b"vide" + b"\x00" * 12 + b"\x00",
    )
    # mdhd body: ver/flags, ctime, mtime, timescale, duration, lang+q
    mdhd = _atom(
        b"mdhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">HH", 0, 0),
    )
    mdia = _atom(b"mdia", mdhd + hdlr + minf)
    tkhd = _atom(
        b"tkhd",
        struct.pack(">IIIII", 0x0000000F, 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _atom(b"trak", tkhd + mdia)
    mvhd = _atom(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # preferred rate 1.0
        + struct.pack(">H", 0x0100)  # preferred volume
        + b"\x00" * 10
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    if audio_raw is not None:
        n_samp = len(audio_raw) // (2 * nch_a)
        stsd_a = _atom(
            b"stsd",
            struct.pack(">II", 0, 1)
            + struct.pack(">I", 36)
            + b"twos"
            + b"\x00" * 6
            + struct.pack(">H", 1)  # data reference index
            + struct.pack(">HH", 0, 0)  # version, revision
            + b"\x00" * 4  # vendor
            + struct.pack(">HH", nch_a, 16)  # channels, bits
            + struct.pack(">HH", 0, 0)  # compression id, packet size
            + struct.pack(">I", (audio_rate & 0xFFFF) << 16 | 0),
        )
        # one whole-stream sample: stts(1, n), stsz(1 entry), one chunk
        stts_a = _atom(b"stts", struct.pack(">IIII", 0, 1, 1, n_samp))
        stsc_a = _atom(
            b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, 1, 1)
        )
        stsz_a = _atom(
            b"stsz", struct.pack(">III", 0, 0, 1)
            + struct.pack(">I", len(audio_raw))
        )
        stco_a = _atom(
            b"stco", struct.pack(">II", 0, 1)
            + struct.pack(">I", audio_offset)
        )
        stbl_a = _atom(b"stbl", stsd_a + stts_a + stsc_a + stsz_a + stco_a)
        smhd = _atom(b"smhd", struct.pack(">IHH", 0, 0, 0))
        minf_a = _atom(b"minf", smhd + dinf + stbl_a)
        hdlr_a = _atom(
            b"hdlr",
            struct.pack(">I", 0) + hdlr_pre + b"soun" + b"\x00" * 12
            + b"\x00",
        )
        mdhd_a = _atom(
            b"mdhd",
            struct.pack(">IIIII", 0, 0, 0, audio_rate, n_samp)
            + struct.pack(">HH", 0, 0),
        )
        mdia_a = _atom(b"mdia", mdhd_a + hdlr_a + minf_a)
        tkhd_a = _atom(
            b"tkhd",
            struct.pack(">IIIII", 0x0000000F, 0, 0, 2, 0)
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0x0100, 0)
            + struct.pack(
                ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", 0, 0),
        )
        trak_a = _atom(b"trak", tkhd_a + mdia_a)
        trak = trak_a + trak if audio_first else trak + trak_a
    udta = b""
    if tags:
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            _TAG_ORDER,
        )

        rev = {v: k for k, v in _UDTA_KEYS.items()}
        if flavor == "mp4":
            # iTunes-style: udta/meta(fullbox)/hdlr(mdir)/ilst/©xxx/data
            items = b""
            for k in _TAG_ORDER:
                if k not in tags or k not in rev:
                    continue
                val = str(tags[k]).encode("utf-8")
                d = _atom(
                    b"data", struct.pack(">II", 1, 0) + val
                )
                items += _atom(rev[k], d)
            hdlr_m = _atom(
                b"hdlr",
                struct.pack(">I", 0) + b"\x00" * 4 + b"mdir"
                + b"appl" + b"\x00" * 9,
            )
            meta = _atom(
                b"meta",
                struct.pack(">I", 0) + hdlr_m + _atom(b"ilst", items),
            )
            udta = _atom(b"udta", meta)
        else:
            # classic QuickTime international text atoms
            body = b""
            for k in _TAG_ORDER:
                if k not in tags or k not in rev:
                    continue
                val = str(tags[k]).encode("utf-8")
                body += _atom(
                    rev[k], struct.pack(">HH", len(val), 0) + val
                )
            udta = _atom(b"udta", body)
    moov = _atom(b"moov", mvhd + trak + udta)
    return ftyp + mdat + moov
