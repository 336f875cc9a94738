"""Matroska / WebM (EBML) structural walk (r13) — the remaining big
video container in real crawls, opened to its honest extent like
MOV/MP4/AVI: the ELEMENT layer (RFC 8794 EBML + the public Matroska
element registry) is pure structure — variable-length ids and sizes,
nested master elements — and yields real corpus evidence with zero
codec math: DocType, duration, per-track codec ids and dimensions,
and the Tags/SimpleTag metadata tree. Codec PAYLOADS (VP8/VP9/AV1
video, Opus/Vorbis audio frames inside Clusters) need the gated
decoders and stay NAMED rejections at the consumer level — this
module never touches Cluster contents.

Honesty note on constants: the element IDs used here (EBML 1A45DFA3,
Segment 18538067, Info/Duration/TimestampScale, Tracks/TrackEntry/
CodecID/Video/Audio, Tags/SimpleTag/TagName/TagString, Cluster) are
structural registry constants, not DSP tables: a wrong ID makes the
walk MISS an element loudly (absent field / no tags), never silently
corrupt values — the opposite failure mode of the synthesis-window
class of constants this repo refuses to write from memory. The
writer/parser roundtrip plus the golden's relational oracle pin the
arithmetic (varint coding, nesting, sizes), which IS the spec-bearing
part.

`make_simple_mkv` writes a structurally valid metadata carrier
(EBML header, Segment with Info/Tracks/Tags and one empty Cluster) —
not a muxer of real frames, and it says so.
"""

from __future__ import annotations

import struct

__all__ = [
    "make_simple_mkv",
    "mkv_meta",
    "mkv_tag_text",
    "mkv_tags",
]

_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLING = 0xB5
_CHANNELS = 0x9F
_TAGS = 0x1254C367
_TAG = 0x7373
_SIMPLE_TAG = 0x67C8
_TAG_NAME = 0x45A3
_TAG_STRING = 0x4487
_CLUSTER = 0x1F43B675

# Matroska TagName values → the shared canonical keys
_MKV_KEYS = {
    "TITLE": "title", "ARTIST": "artist", "ALBUM": "album",
    "DATE_RELEASED": "year", "DATE": "year", "GENRE": "genre",
    "PART_NUMBER": "track",
}

_MASTERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO,
            _TAGS, _TAG, _SIMPLE_TAG}


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, n_bytes) — EBML variable-length integer at ``pos``.
    Element IDs keep the length-marker bit (the registry writes them
    that way); sizes strip it. All-ones payload = unknown size."""
    if pos >= len(data):
        raise ValueError("EBML varint past end of stream")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML varint (leading zero byte)")
    n = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        n += 1
    if pos + n > len(data):
        raise ValueError("EBML varint truncated")
    if keep_marker:
        v = 0
        for i in range(n):
            v = (v << 8) | data[pos + i]
        return v, n
    v = first & (mask - 1)
    unknown = v == mask - 1
    for i in range(1, n):
        v = (v << 8) | data[pos + i]
        unknown = unknown and data[pos + i] == 0xFF
    return (None if unknown else v), n


def _elements(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for the elements in
    [pos, end); unknown-size elements run to the parent's end."""
    while pos < end:
        eid, n1 = _read_vint(data, pos, keep_marker=True)
        size, n2 = _read_vint(data, pos + n1, keep_marker=False)
        body = pos + n1 + n2
        bend = end if size is None else body + size
        if bend > end:
            raise ValueError(
                f"EBML element 0x{eid:X} overruns its parent"
            )
        yield eid, body, bend
        pos = bend


def _uint(data: bytes, body: int, end: int) -> int:
    v = 0
    for i in range(body, end):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, body: int, end: int) -> float:
    n = end - body
    if n == 4:
        return struct.unpack(">f", data[body:end])[0]
    if n == 8:
        return struct.unpack(">d", data[body:end])[0]
    if n == 0:
        return 0.0
    raise ValueError(f"EBML float of width {n}")


def _check_ebml(data: bytes) -> tuple[str, int]:
    """(doc_type, offset past the EBML header)."""
    data = bytes(data)
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("not an EBML stream (missing 1A45DFA3 magic)")
    eid, n1 = _read_vint(data, 0, keep_marker=True)
    size, n2 = _read_vint(data, n1, keep_marker=False)
    body, bend = n1 + n2, n1 + n2 + (size or 0)
    doc = "matroska"  # the spec default when DocType is absent
    for cid, cb, ce in _elements(data, body, bend):
        if cid == _DOCTYPE:
            doc = data[cb:ce].split(b"\x00")[0].decode("utf-8", "replace")
    return doc, bend


def mkv_meta(data: bytes) -> dict:
    """Stream identity with no codec math: ``doc_type``
    ('webm'/'matroska'), ``duration_sec`` (Info Duration ×
    TimestampScale), and ``tracks`` — one dict per TrackEntry with
    ``type`` ('video'/'audio'/other int), ``codec_id`` (e.g. 'V_VP9',
    'A_OPUS'), and dimensions / audio params where present. Cluster
    payloads are never read."""
    data = bytes(data)
    doc, pos = _check_ebml(data)
    out: dict = {"doc_type": doc, "duration_sec": None, "tracks": []}
    for eid, body, bend in _elements(data, pos, len(data)):
        if eid != _SEGMENT:
            continue
        scale = 1_000_000  # nanoseconds per tick, the spec default
        dur_ticks = None
        for cid, cb, ce in _elements(data, body, bend):
            if cid == _INFO:
                for iid, ib, ie in _elements(data, cb, ce):
                    if iid == _TIMESTAMP_SCALE:
                        scale = _uint(data, ib, ie)
                    elif iid == _DURATION:
                        dur_ticks = _float(data, ib, ie)
            elif cid == _TRACKS:
                for tid, tb, te in _elements(data, cb, ce):
                    if tid != _TRACK_ENTRY:
                        continue
                    tr: dict = {}
                    for fid, fb, fe in _elements(data, tb, te):
                        if fid == _TRACK_TYPE:
                            t = _uint(data, fb, fe)
                            tr["type"] = {1: "video", 2: "audio"}.get(t, t)
                        elif fid == _CODEC_ID:
                            tr["codec_id"] = data[fb:fe].split(b"\x00")[
                                0
                            ].decode("utf-8", "replace")
                        elif fid == _VIDEO:
                            for vid_, vb, ve in _elements(data, fb, fe):
                                if vid_ == _PIXEL_W:
                                    tr["width"] = _uint(data, vb, ve)
                                elif vid_ == _PIXEL_H:
                                    tr["height"] = _uint(data, vb, ve)
                        elif fid == _AUDIO:
                            for aid, ab, ae in _elements(data, fb, fe):
                                if aid == _SAMPLING:
                                    tr["rate"] = _float(data, ab, ae)
                                elif aid == _CHANNELS:
                                    tr["nch"] = _uint(data, ab, ae)
                    out["tracks"].append(tr)
            elif cid == _CLUSTER:
                pass  # codec payloads: never read here
        if dur_ticks is not None:
            out["duration_sec"] = dur_ticks * scale / 1e9
        break
    return out


def mkv_tags(data: bytes) -> dict[str, str]:
    """Canonical tags from the Segment's Tags/Tag/SimpleTag tree
    (TagName → TagString, both UTF-8)."""
    data = bytes(data)
    _doc, pos = _check_ebml(data)
    out: dict[str, str] = {}
    for eid, body, bend in _elements(data, pos, len(data)):
        if eid != _SEGMENT:
            continue
        for cid, cb, ce in _elements(data, body, bend):
            if cid != _TAGS:
                continue
            for tid, tb, te in _elements(data, cb, ce):
                if tid != _TAG:
                    continue
                for sid, sb, se in _elements(data, tb, te):
                    if sid != _SIMPLE_TAG:
                        continue
                    name = val = None
                    for fid, fb, fe in _elements(data, sb, se):
                        if fid == _TAG_NAME:
                            name = data[fb:fe].decode("utf-8", "replace")
                        elif fid == _TAG_STRING:
                            val = data[fb:fe].decode("utf-8", "replace")
                    key = _MKV_KEYS.get((name or "").upper())
                    if key and val and val.strip() and key not in out:
                        out[key] = val.strip()
        break
    return out


def mkv_tag_text(data: bytes) -> str:
    """The tag record as one line in the shared fixed key order (the
    :func:`~.mp3.mp3_tag_text` contract)."""
    from oracle_vectorsearch_example_spark.functions.mp3 import _TAG_ORDER

    tags = mkv_tags(data)
    return " ".join(tags[k] for k in _TAG_ORDER if k in tags)


# ------------------------------------------------------------ writer
def _enc_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_size(v: int) -> bytes:
    """Shortest EBML size coding for ``v``."""
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:  # all-ones is reserved (unknown)
            return ((1 << (7 * n)) | v).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def make_simple_mkv(
    doc_type: str = "webm",
    codec_id: str = "V_VP9",
    width: int = 320,
    height: int = 240,
    duration_sec: float = 2.0,
    tags: dict | None = None,
    audio: tuple[str, int, int] | None = None,
) -> bytes:
    """Structurally valid Matroska/WebM METADATA CARRIER: EBML header
    with the given DocType, one Segment holding Info (TimestampScale
    1e6 + Duration), Tracks (a video TrackEntry; ``audio`` =
    (codec_id, rate, channels) adds an audio TrackEntry), optional
    Tags, and one EMPTY Cluster. No frames are muxed — a fixture for
    the element walk, not an encoder, and it says so."""
    header = _el(
        _EBML,
        _el_uint(0x4286, 1)            # EBMLVersion
        + _el_uint(0x42F7, 1)          # EBMLReadVersion
        + _el_uint(0x42F2, 4)          # EBMLMaxIDLength
        + _el_uint(0x42F3, 8)          # EBMLMaxSizeLength
        + _el(_DOCTYPE, doc_type.encode("utf-8"))
        + _el_uint(0x4287, 2)          # DocTypeVersion
        + _el_uint(0x4285, 2),         # DocTypeReadVersion
    )
    info = _el(
        _INFO,
        _el_uint(_TIMESTAMP_SCALE, 1_000_000)
        + _el(_DURATION, struct.pack(">d", duration_sec * 1000.0)),
    )
    video_entry = _el(
        _TRACK_ENTRY,
        _el_uint(0xD7, 1)              # TrackNumber
        + _el_uint(_TRACK_TYPE, 1)
        + _el(_CODEC_ID, codec_id.encode("utf-8"))
        + _el(_VIDEO, _el_uint(_PIXEL_W, width) + _el_uint(_PIXEL_H, height)),
    )
    tracks_body = video_entry
    if audio is not None:
        a_codec, a_rate, a_nch = audio
        tracks_body += _el(
            _TRACK_ENTRY,
            _el_uint(0xD7, 2)
            + _el_uint(_TRACK_TYPE, 2)
            + _el(_CODEC_ID, a_codec.encode("utf-8"))
            + _el(
                _AUDIO,
                _el(_SAMPLING, struct.pack(">d", float(a_rate)))
                + _el_uint(_CHANNELS, a_nch),
            ),
        )
    seg_body = info + _el(_TRACKS, tracks_body)
    if tags:
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            _TAG_ORDER,
        )

        rev = {v: k for k, v in _MKV_KEYS.items() if k != "DATE"}
        simple = b""
        for k in _TAG_ORDER:
            if k in tags and k in rev:
                simple += _el(
                    _SIMPLE_TAG,
                    _el(_TAG_NAME, rev[k].encode("utf-8"))
                    + _el(_TAG_STRING, str(tags[k]).encode("utf-8")),
                )
        seg_body += _el(_TAGS, _el(_TAG, simple))
    seg_body += _el(_CLUSTER, _el_uint(0xE7, 0))  # Timestamp 0, no blocks
    return header + _el(_SEGMENT, seg_body)
