"""TIFF codec (r7, functions/tiff.py): round-trips across compressions
(none/LZW/PackBits), byte orders, predictor, strip splits; hand-built
grayscale/palette streams; multimodal dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff_pixels,
    make_simple_tiff,
)


def test_roundtrip_matrix():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    for comp in ("none", "lzw", "packbits"):
        for bo in ("<", ">"):
            for pred in (False, True) if comp == "lzw" else (False,):
                for rps in (None, 4):
                    d = make_simple_tiff(
                        img, compression=comp, byte_order=bo,
                        predictor=pred, rows_per_strip=rps,
                    )
                    assert np.array_equal(decode_tiff_pixels(d), img), (
                        comp, bo, pred, rps,
                    )


def test_solid_and_determinism():
    solid = decode_tiff_pixels(make_simple_tiff(6, 4, (9, 90, 200)))
    assert solid.shape == (4, 6, 3) and tuple(solid[0, 0]) == (9, 90, 200)
    assert make_simple_tiff(3, 3, (1, 2, 3)) == make_simple_tiff(3, 3, (1, 2, 3))


def test_packbits_codec():
    for payload in (b"", b"a", b"aaaaaab", bytes(range(50)) * 3, b"ab" * 200):
        assert _packbits_decode(_packbits_encode(payload)) == payload
    # spec literal: 128 is a no-op byte
    assert _packbits_decode(b"\x80\x00a") == b"a"


def _hand_tiff(photo: int, samples: bytes, w: int, h: int, cmap=None) -> bytes:
    """Minimal little-endian single-strip TIFF with the given photometric
    interpretation — built by hand, NOT by make_simple_tiff, to exercise
    the gray/palette decode paths the writer doesn't emit."""
    entries = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [photo]), (273, 4, [8]), (277, 3, [1]), (278, 3, [h]),
        (279, 4, [len(samples)]),
    ]
    extra = bytearray()
    ifd_at = 8 + len(samples)
    if cmap is not None:
        entries.append((320, 3, cmap))
    entries.sort()
    ifd_size = 2 + 12 * len(entries) + 4
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_at))
    out += samples
    out += struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        code = "H" if typ == 3 else "I"
        sz = (2 if typ == 3 else 4) * len(vals)
        if sz <= 4:
            packed = struct.pack("<" + code * len(vals), *vals)
            packed += b"\x00" * (4 - len(packed))
        else:
            packed = struct.pack("<I", ifd_at + ifd_size + len(extra))
            extra += struct.pack("<" + code * len(vals), *vals)
        out += struct.pack("<HHI", tag, typ, len(vals)) + packed
    out += struct.pack("<I", 0)
    out += extra
    return bytes(out)


def test_grayscale_black_and_white_is_zero():
    samples = bytes([0, 128, 255, 64])
    black0 = decode_tiff_pixels(_hand_tiff(1, samples, 2, 2))
    assert tuple(black0[0, 0]) == (0, 0, 0) and tuple(black0[0, 1]) == (128,) * 3
    white0 = decode_tiff_pixels(_hand_tiff(0, samples, 2, 2))
    assert tuple(white0[0, 0]) == (255, 255, 255)
    assert tuple(white0[1, 1]) == (255 - 64,) * 3


def test_palette_color():
    # 4-entry colormap: 16-bit channel values (v*257 maps 8-bit to 16-bit)
    cmap = [v * 257 for v in (10, 20, 30, 40)] \
        + [v * 257 for v in (50, 60, 70, 80)] \
        + [v * 257 for v in (90, 100, 110, 120)]
    px = decode_tiff_pixels(_hand_tiff(3, bytes([0, 3, 1, 2]), 2, 2, cmap=cmap))
    assert tuple(px[0, 0]) == (10, 50, 90)
    assert tuple(px[0, 1]) == (40, 80, 120)


def test_named_gates():
    with pytest.raises(ValueError, match="signature"):
        decode_tiff_pixels(b"not a tiff")
    bad = bytearray(make_simple_tiff(4, 4, (1, 2, 3)))
    # flip compression tag value 1 -> 7 (JPEG-in-TIFF): named rejection
    at = bad.find(struct.pack("<HHI", 259, 3, 1))
    bad[at + 8] = 7
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff_pixels(bytes(bad))


def test_multimodal_dispatch_and_resize():
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        resize_image_bytes,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
    d = make_simple_tiff(img, compression="packbits")
    assert np.array_equal(decode_image_pixels(d), img)
    rz = resize_image_bytes(d, 7, 5)
    assert rz[:2] == b"II" and decode_image_pixels(rz).shape == (5, 7, 3)
