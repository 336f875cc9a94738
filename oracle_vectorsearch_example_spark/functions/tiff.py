"""Baseline TIFF codec — pure stdlib/numpy, from the public TIFF 6.0
specification (media-format breadth of the reference's UTL_TO_TEXT/media
claims, 01_pdf_to_vector.sql:196-205).

Decode: both byte orders (II/MM), IFD walk, strip assembly, compressions
``none`` / ``PackBits`` / ``LZW`` (the TIFF LZW variant with early
change is the SAME algorithm PDF streams use — reused from
``functions.extract._lzw_decode``, one implementation for both specs),
horizontal-differencing predictor, and the photometric interpretations a
scanner/exporter actually emits: RGB(A), grayscale (Black/WhiteIsZero),
and palette color. 8-bit samples; anything else raises by name.

The matching :func:`make_simple_tiff` writer keeps fixtures
deterministic and round-trip tests self-contained — the same
writer-reader pattern as the BMP/PNG/JPEG/GIF fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

# (tag, type) sizes per TIFF 6.0 §2
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and data[i + 1] == data[i] and i + 2 < n and data[i + 2] == data[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _read_ifd(data: bytes, fmt: str, at: int) -> dict[int, list]:
    (count,) = struct.unpack_from(fmt + "H", data, at)
    tags: dict[int, list] = {}
    for e in range(count):
        tag, typ, n = struct.unpack_from(fmt + "HHI", data, at + 2 + 12 * e)
        size = _TYPE_SIZE.get(typ, 1) * n
        voff = at + 2 + 12 * e + 8
        if size > 4:
            (voff,) = struct.unpack_from(fmt + "I", data, voff)
        if typ == 3:
            vals = list(struct.unpack_from(fmt + f"{n}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(fmt + f"{n}I", data, voff))
        elif typ in (1, 2, 6, 7):
            vals = list(data[voff : voff + n])
        else:  # rationals etc. — unused by this decoder
            vals = []
        tags[tag] = vals
    return tags


def decode_tiff_pixels(data: bytes) -> np.ndarray:
    """First IFD of a baseline TIFF → (h, w, 3) uint8 RGB."""
    if data[:4] == b"II*\x00":
        fmt = "<"
    elif data[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise ValueError("not a TIFF (missing II*/MM* signature)")
    (ifd_at,) = struct.unpack_from(fmt + "I", data, 4)
    tags = _read_ifd(data, fmt, ifd_at)

    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    bits = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    offsets = tags.get(273, [])
    spp = tags.get(277, [1])[0]
    rows_per_strip = tags.get(278, [h])[0] or h
    counts = tags.get(279, [])
    predictor = tags.get(317, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} (only 8-bit)")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} (only none/LZW/PackBits)"
        )
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if not offsets or not w or not h:
        raise ValueError("TIFF missing strip offsets or dimensions")

    raw = bytearray()
    for i, off in enumerate(offsets):
        n = counts[i] if i < len(counts) else len(data) - off
        strip = bytes(data[off : off + n])
        if comp == 5:
            from oracle_vectorsearch_example_spark.functions.extract import (
                _lzw_decode,
            )

            strip = _lzw_decode(strip)
        elif comp == 32773:
            strip = _packbits_decode(strip)
        # each strip covers rows_per_strip rows (last may be short)
        raw += strip
    px = np.frombuffer(bytes(raw[: h * w * spp]), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing, per sample
        px = np.cumsum(px.astype(np.int64), axis=1).astype(np.uint8)
    if photo == 2:  # RGB(A) — drop alpha
        return np.ascontiguousarray(px[..., :3])
    if photo == 3:  # palette: ColorMap is 3×2^bits of 16-bit values
        cmap = tags.get(320, [])
        ncol = len(cmap) // 3
        pal = (
            np.array(cmap, np.uint32).reshape(3, ncol).T // 257
        ).astype(np.uint8)
        idx = px[..., 0]
        return pal[np.clip(idx, 0, ncol - 1)]
    g = px[..., 0]
    if photo == 0:  # WhiteIsZero
        g = 255 - g
    return np.dstack([g, g, g])


def make_simple_tiff(
    pixels_or_w,
    height: int | None = None,
    rgb: tuple[int, int, int] | None = None,
    *,
    compression: str = "none",
    byte_order: str = "<",
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Deterministic TIFF fixture writer. Either
    ``make_simple_tiff(w, h, (r, g, b))`` for a solid color or
    ``make_simple_tiff(array)`` for an (h, w, 3) uint8 image.
    ``compression``: ``none`` / ``lzw`` / ``packbits``; ``predictor``
    applies horizontal differencing (LZW's usual companion)."""
    if isinstance(pixels_or_w, (int, np.integer)):
        px = np.zeros((height, pixels_or_w, 3), np.uint8)
        px[:] = rgb
    else:
        px = np.asarray(pixels_or_w, np.uint8)
    h, w, spp = px.shape
    rps = rows_per_strip or h
    fmt = byte_order
    store = px
    if predictor:
        d = px.astype(np.int64)
        store = np.empty_like(px)
        store[:, 0] = px[:, 0]
        store[:, 1:] = ((d[:, 1:] - d[:, :-1]) % 256).astype(np.uint8)

    strips: list[bytes] = []
    for top in range(0, h, rps):
        body = store[top : top + rps].tobytes()
        if compression == "lzw":
            from oracle_vectorsearch_example_spark.functions.extract import (
                _lzw_encode,
            )

            body = _lzw_encode(body)
        elif compression == "packbits":
            body = _packbits_encode(body)
        elif compression != "none":
            raise ValueError(f"unknown compression {compression!r}")
        strips.append(body)
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}[compression]

    # layout: header(8) + pixel strips + IFD + out-of-line values
    header = struct.pack(fmt + "2sHI", b"II" if fmt == "<" else b"MM", 42, 0)
    data_at = 8
    offs, pos = [], data_at
    for sbody in strips:
        offs.append(pos)
        pos += len(sbody)
    ifd_at = pos

    entries = []  # (tag, type, count, packed-or-offset-needed values)
    extra = bytearray()

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 3, [w])
    entry(257, 3, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [comp_tag])
    entry(262, 3, [2])
    entry(273, 4, offs)
    entry(277, 3, [spp])
    entry(278, 3, [min(rps, 0xFFFF)])
    entry(279, 4, [len(sb) for sb in strips])
    if predictor:
        entry(317, 3, [2])
    entries.sort()
    ifd_size = 2 + 12 * len(entries) + 4
    extra_at = ifd_at + ifd_size

    out = bytearray()
    out += struct.pack(fmt + "2sH", b"II" if fmt == "<" else b"MM", 42)
    out += struct.pack(fmt + "I", ifd_at)
    for sbody in strips:
        out += sbody
    out += struct.pack(fmt + "H", len(entries))
    for tag, typ, vals in entries:
        sz = _TYPE_SIZE[typ] * len(vals)
        code = "H" if typ == 3 else "I"
        if sz <= 4:
            packed = struct.pack(fmt + code * len(vals), *vals)
            packed += b"\x00" * (4 - len(packed))
        else:
            packed = struct.pack(fmt + "I", extra_at + len(extra))
            extra += struct.pack(fmt + code * len(vals), *vals)
        out += struct.pack(fmt + "HHI", tag, typ, len(vals)) + packed
    out += struct.pack(fmt + "I", 0)  # no next IFD
    out += extra
    return bytes(out)
