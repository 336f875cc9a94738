"""Ogg container structural walk + VorbisComment metadata (r13) —
the Ogg/Opus/Vorbis sibling of the MP3 side-info work: real crawls
carry .ogg/.opus audio, and its PAGE layer plus metadata are fully
spec-certain (RFC 3533 pages, RFC 7845 OpusHead/OpusTags, the Vorbis I
identification/comment headers) even though the CODEC payloads (Opus
SILK/CELT, Vorbis floor/residue codebooks) need tabulated constants
this container doesn't ship — those stay NAMED gates, the
multimodal.py:84 discipline.

What this module reads without any codec math:

- **Page walk** (`ogg_page_table`): 'OggS' capture pattern, version 0,
  header-type flags (continued/BOS/EOS), 64-bit granule position,
  stream serial, page sequence, segment lacing table. Page CRCs are
  skipped, not verified (tolerant-reader convention; the fixture
  writer emits the RFC 3533 CRC-32 — poly 0x04C11DB7, unreflected,
  zero init — but this repo has no external witness for it, so the
  PARSER never depends on it).
- **Stream identity** (`ogg_meta`): codec name from the BOS packet
  magic ('OpusHead' / '\\x01vorbis' — FLAC-in-Ogg and Theora reject
  by name), channels + rates from the identification header, duration
  from the last page's granule position (Opus: 48 kHz minus pre-skip;
  Vorbis: identification-header rate).
- **Tags** (`ogg_tags` / `ogg_tag_text`): the VorbisComment block
  (vendor string + length-prefixed UTF-8 ``KEY=value`` list) from
  OpusTags / '\\x03vorbis' — the same fixed key order as
  :func:`~.mp3.mp3_tag_text`, so D1 extraction treats every audio
  container uniformly. `flac_tags` reads the SAME block from a bare
  FLAC file's VORBIS_COMMENT metadata block (type 4).

`make_simple_ogg` writes a structurally valid one-stream Opus or
Vorbis file whose codec packets are EMPTY (zero-length audio packets
are legal at the page layer) — a metadata carrier for parser tests,
not an encoder, and it says so.
"""

from __future__ import annotations

import struct

__all__ = [
    "flac_tag_text",
    "flac_tags",
    "make_simple_ogg",
    "ogg_meta",
    "ogg_page_table",
    "ogg_tag_text",
    "ogg_tags",
    "parse_vorbis_comments",
]

# VorbisComment field names → the shared canonical tag keys (the
# MP3/_TAG_ORDER vocabulary, so extract_text reads identically)
_VC_KEYS = {
    "TITLE": "title", "ARTIST": "artist", "ALBUM": "album",
    "DATE": "year", "GENRE": "genre", "TRACKNUMBER": "track",
}


def ogg_page_table(data: bytes) -> list[dict]:
    """All pages of the FIRST Ogg bitstream chain: one dict per page
    with ``flags`` / ``granule`` / ``serial`` / ``seq`` / ``segments``
    (lacing values) / ``payload`` bytes. Raises ValueError when the
    stream does not start with a BOS page."""
    data = bytes(data)
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream (missing OggS capture)")
    pages = []
    pos = 0
    n = len(data)
    while pos + 27 <= n and data[pos:pos + 4] == b"OggS":
        if data[pos + 4] != 0:
            raise ValueError(f"Ogg page version {data[pos + 4]} != 0")
        flags = data[pos + 5]
        (granule,) = struct.unpack("<q", data[pos + 6:pos + 14])
        serial, seq, _crc = struct.unpack("<III", data[pos + 14:pos + 26])
        nseg = data[pos + 26]
        lace = list(data[pos + 27:pos + 27 + nseg])
        body = pos + 27 + nseg
        size = sum(lace)
        pages.append({
            "flags": flags,
            "granule": granule,
            "serial": serial,
            "seq": seq,
            "segments": lace,
            "payload": data[body:body + size],
        })
        pos = body + size
    if not pages or not (pages[0]["flags"] & 0x02):
        raise ValueError("first Ogg page is not a stream begin (BOS)")
    return pages


def _packets(pages: list[dict], serial: int, max_packets: int = 4):
    """Reassemble the first packets of one logical stream from the
    lacing tables (255 = continued segment, < 255 terminates)."""
    out, cur = [], bytearray()
    for p in pages:
        if p["serial"] != serial:
            continue
        off = 0
        for seg in p["segments"]:
            cur += p["payload"][off:off + seg]
            off += seg
            if seg < 255:
                out.append(bytes(cur))
                cur = bytearray()
                if len(out) >= max_packets:
                    return out
    if cur:
        out.append(bytes(cur))
    return out


def parse_vorbis_comments(block: bytes) -> dict[str, str]:
    """The VorbisComment layout (Vorbis I §5 / RFC 7845 §5.2): vendor
    length + vendor, count, count × length-prefixed UTF-8
    ``KEY=value``. Returns canonical-key tags (first win per key);
    unknown keys are ignored."""
    out: dict[str, str] = {}
    if len(block) < 8:
        return out
    (vlen,) = struct.unpack("<I", block[:4])
    pos = 4 + vlen
    if pos + 4 > len(block):
        return out
    (count,) = struct.unpack("<I", block[pos:pos + 4])
    pos += 4
    for _ in range(count):
        if pos + 4 > len(block):
            break
        (ln,) = struct.unpack("<I", block[pos:pos + 4])
        pos += 4
        item = block[pos:pos + ln]
        pos += ln
        try:
            text = item.decode("utf-8")
        except UnicodeDecodeError:
            continue
        key, _, val = text.partition("=")
        canon = _VC_KEYS.get(key.upper())
        if canon and val.strip() and canon not in out:
            out[canon] = val.strip()
    return out


def ogg_meta(data: bytes) -> dict:
    """Stream identity with no codec math: codec name ('opus' /
    'vorbis'), channels, rate (Opus: the 48 kHz decode clock; the
    input rate is informational), duration seconds from the last
    granule position, page/packet counts. FLAC-in-Ogg, Theora, and
    unknown BOS magics reject BY NAME."""
    pages = ogg_page_table(data)
    serial = pages[0]["serial"]
    pkts = _packets(pages, serial, max_packets=2)
    if not pkts:
        raise ValueError("Ogg stream has no packets")
    head = pkts[0]
    if head[:8] == b"OpusHead":
        if head[8] & 0xF0:
            raise NotImplementedError(
                f"OpusHead version {head[8]} is not the v1 family"
            )
        nch = head[9]
        (preskip,) = struct.unpack("<H", head[10:12])
        (in_rate,) = struct.unpack("<I", head[12:16])
        last = max(p["granule"] for p in pages if p["serial"] == serial)
        dur = max(0, last - preskip) / 48000.0
        return {"codec": "opus", "nch": nch, "rate": 48000,
                "input_rate": in_rate, "pre_skip": preskip,
                "duration_sec": dur, "n_pages": len(pages)}
    if head[:7] == b"\x01vorbis":
        nch = head[11]
        (rate,) = struct.unpack("<I", head[12:16])
        last = max(p["granule"] for p in pages if p["serial"] == serial)
        dur = last / rate if rate else 0.0
        return {"codec": "vorbis", "nch": nch, "rate": rate,
                "duration_sec": dur, "n_pages": len(pages)}
    if head[:5] == b"\x7fFLAC":
        raise NotImplementedError(
            "FLAC-in-Ogg needs the Ogg mapping layer; bare FLAC decodes "
            "via functions.flac"
        )
    if head[:7] == b"\x80theora":
        raise NotImplementedError(
            "Theora video needs a real codec (no offline decoder here)"
        )
    raise NotImplementedError(
        f"unknown Ogg BOS packet magic {head[:8]!r} (opus/vorbis parse "
        "offline)"
    )


def ogg_tags(data: bytes) -> dict[str, str]:
    """Canonical tags from the comment header packet (OpusTags /
    '\\x03vorbis' — the second packet of the stream)."""
    pages = ogg_page_table(data)
    serial = pages[0]["serial"]
    pkts = _packets(pages, serial, max_packets=2)
    if len(pkts) < 2:
        return {}
    second = pkts[1]
    if second[:8] == b"OpusTags":
        return parse_vorbis_comments(second[8:])
    if second[:7] == b"\x03vorbis":
        return parse_vorbis_comments(second[7:])
    return {}


def ogg_tag_text(data: bytes) -> str:
    """The tag record as one line in the shared fixed key order (the
    :func:`~.mp3.mp3_tag_text` contract)."""
    from oracle_vectorsearch_example_spark.functions.mp3 import _TAG_ORDER

    tags = ogg_tags(data)
    return " ".join(tags[k] for k in _TAG_ORDER if k in tags)


def flac_tags(data: bytes) -> dict[str, str]:
    """Canonical tags from a bare FLAC file's VORBIS_COMMENT metadata
    block (type 4) — the metadata block walk is pure structure:
    'fLaC' + [1-bit last, 7-bit type, 24-bit BE length] blocks."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 4:
            return parse_vorbis_comments(data[pos + 4:pos + 4 + length])
        pos += 4 + length
        if hdr & 0x80:  # last-metadata-block flag
            break
    return {}


def flac_tag_text(data: bytes) -> str:
    """Bare-FLAC tag line in the shared fixed key order."""
    from oracle_vectorsearch_example_spark.functions.mp3 import _TAG_ORDER

    tags = flac_tags(data)
    return " ".join(tags[k] for k in _TAG_ORDER if k in tags)


def _ogg_crc(page: bytes) -> int:
    """RFC 3533 page CRC-32: polynomial 0x04C11DB7, unreflected, zero
    init, no final xor — computed over the page with the CRC field
    zeroed. Used by the WRITER only (the parser never verifies)."""
    crc = 0
    for b in page:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


def _page(serial: int, seq: int, flags: int, granule: int,
          packets: list[bytes]) -> bytes:
    lace = bytearray()
    body = bytearray()
    for pkt in packets:
        q, r = divmod(len(pkt), 255)
        lace += b"\xff" * q + bytes([r])
        body += pkt
    hdr = (b"OggS\x00" + bytes([flags])
           + struct.pack("<q", granule)
           + struct.pack("<III", serial, seq, 0)
           + bytes([len(lace)]) + bytes(lace))
    crc = _ogg_crc(hdr + bytes(body))
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return bytes(hdr + body)


def make_simple_ogg(
    codec: str = "opus",
    tags: dict | None = None,
    n_audio_pages: int = 3,
    granules_per_page: int = 960,
    nch: int = 1,
    rate: int = 48000,
    serial: int = 0x1357,
) -> bytes:
    """Structurally valid one-stream Ogg METADATA CARRIER — head page
    (OpusHead / Vorbis identification), tags page (OpusTags /
    comment header with the given canonical tags), then
    ``n_audio_pages`` pages of EMPTY audio packets advancing the
    granule clock. Real decoders see a silent/degenerate stream; the
    page/tag layers are fully valid. Not an encoder, and says so."""
    if codec not in ("opus", "vorbis"):
        raise ValueError(f"codec must be 'opus' or 'vorbis', got {codec!r}")
    vc = bytearray()
    vendor = b"oves-fixture"
    vc += struct.pack("<I", len(vendor)) + vendor
    items = []
    if tags:
        rev = {v: k for k, v in _VC_KEYS.items()}
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            _TAG_ORDER,
        )

        for key in _TAG_ORDER:
            if key in tags:
                items.append(
                    f"{rev[key]}={tags[key]}".encode("utf-8")
                )
    vc += struct.pack("<I", len(items))
    for it in items:
        vc += struct.pack("<I", len(it)) + it

    if codec == "opus":
        head = (b"OpusHead" + bytes([1, nch])
                + struct.pack("<H", 312)          # pre-skip
                + struct.pack("<I", rate)
                + struct.pack("<h", 0) + b"\x00")  # gain, mapping 0
        tags_pkt = b"OpusTags" + bytes(vc)
    else:
        head = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([nch])
                + struct.pack("<I", rate)
                + struct.pack("<iii", 0, 0, 0) + b"\xb8\x01")
        tags_pkt = b"\x03vorbis" + bytes(vc) + b"\x01"

    out = bytearray()
    out += _page(serial, 0, 0x02, 0, [head])           # BOS
    out += _page(serial, 1, 0x00, 0, [tags_pkt])
    g = 0
    for i in range(n_audio_pages):
        g += granules_per_page
        flags = 0x04 if i == n_audio_pages - 1 else 0x00  # EOS last
        out += _page(serial, 2 + i, flags, g, [b""])
    return bytes(out)
