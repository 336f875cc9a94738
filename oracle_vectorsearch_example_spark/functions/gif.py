"""GIF87a/89a codec — pure stdlib/numpy, from the public GIF89a
specification (the media-format breadth surface of the reference's
UTL_TO_TEXT/media claims, 01_pdf_to_vector.sql:196-205).

Decode: logical screen descriptor, global/local color tables, GIF-LZW
(LSB-first bit packing, variable 3–12-bit codes, clear/EOI — a different
variant from the PDF/TIFF LZW in ``extract.py``), interlaced row
ordering, and ANIMATION: graphic-control extensions (per-frame delay,
transparency index, disposal methods 0–3 including restore-to-background
and restore-to-previous) composited onto the logical screen, so
:func:`decode_gif_frames` yields real (h, w, 3) frames with timestamps —
which makes the multimodal ``sample_frames(decode='real')`` path REAL
for one container instead of a blanket ffmpeg gate.

The matching :func:`make_simple_gif` / :func:`make_animated_gif` writers
keep fixtures deterministic and round-trip tests self-contained (the
same writer-reader pattern as the BMP/PNG/JPEG fixtures). Spec
conformance is additionally anchored by decoding the canonical 43-byte
1×1 red-pixel GIF89a byte sequence in tests — a known-good stream this
module did not produce.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ LZW


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: LSB-first packing, clear/EOI codes, code width
    grows AFTER the table fills the current width (no early change)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    bitbuf = nbits = 0
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _gif_lzw_encode(pixels: list[int], min_code_size: int) -> bytes:
    """Matching GIF-LZW writer (LSB-first; emits clear up front and EOI
    at the end, resets the table when it reaches 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    cur: tuple[int, ...] = ()
    for px in pixels:
        if px >= clear:
            raise ValueError(
                f"pixel index {px} exceeds the {clear}-entry code space of "
                f"min_code_size={min_code_size}"
            )
        nxt = cur + (px,)
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = (px,)
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> list[tuple[float, np.ndarray]]:
    """All frames of a (possibly animated) GIF as ``(timestamp_seconds,
    (h, w, 3) uint8 RGB)`` composited per the disposal rules; timestamps
    accumulate the per-frame delays (first frame at 0.0)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    w, h = struct.unpack("<HH", data[6:10])
    packed, bg_idx, _aspect = data[10], data[11], data[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    bg_rgb = canvas[0, 0].copy()

    frames: list[tuple[float, np.ndarray]] = []
    t = 0.0
    delay = 0.0
    transparent: int | None = None
    disposal = 0
    prev_canvas = None

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while p < len(data):
            ln = data[p]
            p += 1
            if ln == 0:
                break
            chunks.append(data[p : p + ln])
            p += ln
        return b"".join(chunks), p

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            body, pos = read_subblocks(pos + 2)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gpacked = body[0]
                disposal = (gpacked >> 2) & 0x07
                delay = struct.unpack("<H", body[1:3])[0] / 100.0
                transparent = body[3] if gpacked & 0x01 else None
            continue
        if b == 0x2C:  # image descriptor
            left, top, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:  # local color table
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image with no color table")
            mcs = data[pos]
            pos += 1
            lzw, pos = read_subblocks(pos)
            idx = np.array(
                _gif_lzw_decode(lzw, mcs)[: iw * ih], np.int32
            ).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            if disposal == 3:
                prev_canvas = canvas.copy()
            rgb = pal[np.clip(idx, 0, len(pal) - 1)]
            region = canvas[top : top + ih, left : left + iw]
            if transparent is not None:
                mask = (idx != transparent)[..., None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append((t, canvas.copy()))
            t += delay
            if disposal == 2:  # restore background
                canvas[top : top + ih, left : left + iw] = bg_rgb
            elif disposal == 3 and prev_canvas is not None:
                canvas = prev_canvas
                prev_canvas = None
            transparent = None
            disposal = 0
            delay = 0.0
            if max_frames is not None and len(frames) >= max_frames:
                break
            continue
        pos += 1  # unknown byte: skip
    if not frames:
        raise ValueError("GIF contained no image data")
    return frames


def decode_gif_pixels(data: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(data, max_frames=1)[0][1]


# ---------------------------------------------------------------- encode


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, dict]:
    colors: dict[tuple[int, int, int], int] = {}
    for f in frames:
        for c in {tuple(int(x) for x in px) for px in f.reshape(-1, 3)}:
            if c not in colors:
                colors[c] = len(colors)
    if len(colors) > 256:
        raise ValueError(
            f"GIF writer supports <= 256 distinct colors, got {len(colors)}"
        )
    size = 2
    while size < max(2, len(colors)):
        size *= 2
    pal = np.zeros((size, 3), np.uint8)
    for c, i in colors.items():
        pal[i] = c
    return pal, colors


def make_animated_gif(
    frames: list[np.ndarray], delays_cs: list[int] | None = None
) -> bytes:
    """(h, w, 3) uint8 frames → GIF89a with per-frame delays (in
    centiseconds; default 10 = 10 fps). <= 256 distinct colors across
    all frames (fixture-grade, like the other writers)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    delays = delays_cs or [10] * len(frames)
    pal, colors = _build_palette(frames)
    depth = max(1, (len(pal) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag+size, bg 0, aspect
    out += pal.tobytes()
    if len(frames) > 1:  # Netscape loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for f, d in zip(frames, delays):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", d) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        idx = [colors[tuple(int(x) for x in px)] for px in f.reshape(-1, 3)]
        lzw = _gif_lzw_encode(idx, mcs)
        out += bytes([mcs])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def make_simple_gif(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Deterministic solid-color single-frame GIF fixture."""
    f = np.zeros((height, width, 3), np.uint8)
    f[:] = rgb
    return make_animated_gif([f])
