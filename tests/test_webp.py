"""VP8L (WebP lossless) subset — exact writer/decoder roundtrips over
every implemented feature (simple + normal prefix codes, color cache,
plain-distance LZ77, subtract-green / all-14-predictor / color
transforms), container dispatch, and the named gates (lossy VP8, VP8X,
color-indexing, short-distance map)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.webp import (
    decode_webp_pixels,
    make_simple_webp,
)


def _rand(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(
        np.uint8
    )


def test_literal_and_simple_code_roundtrips():
    px = _rand(7, 11)
    assert np.array_equal(decode_webp_pixels(make_simple_webp(px)), px)
    # two-color image → two-symbol simple codes on every channel
    px2 = np.zeros((6, 10, 3), np.uint8)
    px2[::2] = (10, 20, 30)
    px2[1::2] = (200, 150, 100)
    blob = make_simple_webp(px2)
    assert np.array_equal(decode_webp_pixels(blob), px2)
    # 1×1 edge
    one = np.array([[[5, 6, 7]]], np.uint8)
    assert np.array_equal(decode_webp_pixels(make_simple_webp(one)), one)


def test_cache_and_lz77_shrink_and_roundtrip():
    px = np.repeat(_rand(5, 1, seed=3), 24, axis=1)
    plain = make_simple_webp(px)
    lz = make_simple_webp(px, lz77_runs=True)
    cached = make_simple_webp(px, use_cache_bits=4)
    assert np.array_equal(decode_webp_pixels(lz), px)
    assert np.array_equal(decode_webp_pixels(cached), px)
    assert len(lz) < len(plain) and len(cached) < len(plain)


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes_roundtrip(mode):
    smooth = np.cumsum(
        np.random.RandomState(9).randint(0, 4, (9, 13, 3)), axis=1
    ).astype(np.uint8)
    blob = make_simple_webp(smooth, predictor_mode=mode)
    assert np.array_equal(decode_webp_pixels(blob), smooth)


def test_color_transform_and_combinations():
    px = _rand(8, 9, seed=5)
    assert np.array_equal(
        decode_webp_pixels(make_simple_webp(px, color_cte=(33, 200, 7))), px
    )
    smooth = np.cumsum(
        np.random.RandomState(2).randint(0, 3, (7, 12, 3)), axis=1
    ).astype(np.uint8)
    combo = make_simple_webp(
        smooth, subtract_green=True, predictor_mode=12,
        use_cache_bits=3, lz77_runs=True,
    )
    assert np.array_equal(decode_webp_pixels(combo), smooth)


def test_image_features_dispatch(spark):
    """decode_image_pixels magic-dispatches WebP; the Spark feature
    path decodes it beside the other formats."""
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        image_features,
    )

    px = np.zeros((6, 8, 3), np.uint8)
    px[:] = (40, 90, 160)
    blob = make_simple_webp(px, subtract_green=True)
    assert np.array_equal(decode_image_pixels(blob), px)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, payload binary"
    )
    row = image_features(media).first()
    assert (row.width, row.height) == (8, 6)
    assert (row.mean_r, row.mean_g, row.mean_b) == (40.0, 90.0, 160.0)


def test_named_gates():
    px = np.zeros((4, 4, 3), np.uint8)
    blob = bytearray(make_simple_webp(px))
    lossy = blob.replace(b"VP8L", b"VP8 ")
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp_pixels(bytes(lossy))
    ext = blob.replace(b"VP8L", b"VP8X")
    with pytest.raises(NotImplementedError, match="VP8X"):
        decode_webp_pixels(bytes(ext))
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp_pixels(b"not a webp at all")

    # color-indexing transform: craft header bits announcing type 3
    from oracle_vectorsearch_example_spark.functions.webp import _BitWriter

    bw = _BitWriter()
    bw.write(3, 14)  # w-1
    bw.write(3, 14)  # h-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # COLOR_INDEXING
    payload = bytes([0x2F]) + bytes(bw.out)
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    with pytest.raises(NotImplementedError, match="color-indexing"):
        decode_webp_pixels(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_short_distance_map_gated():
    """A backward reference with dist_code <= 120 (the neighborhood
    map) raises by name instead of silently mis-decoding — the table
    cannot be verified offline. Build a stream whose distance code
    carries symbol 2 (prefix value 3 <= 120)."""
    from oracle_vectorsearch_example_spark.functions.webp import (
        _BitWriter,
        _write_simple_code,
    )

    bw = _BitWriter()
    bw.write(3, 14)  # w = 4
    bw.write(0, 14)  # h = 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # the length symbol (>= 256) is beyond a simple code's 8-bit
    # symbol cap, so the green code must be a two-length normal code
    # over the 280-symbol alphabet
    # green: A=280 → x=232 at 8 bits, 48 at 9 bits (symbol 256 at 9)
    bw.write(0, 1)
    bw.write(13 - 4, 4)
    clc = {8: 1, 9: 1}
    from oracle_vectorsearch_example_spark.functions.webp import _CLC_ORDER

    for i in range(13):
        bw.write(clc.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)
    for sym in range(280):
        bw.write_code(0 if sym < 232 else 1, 1)
    _write_simple_code(bw, [0])  # red
    _write_simple_code(bw, [0])  # blue
    _write_simple_code(bw, [255])  # alpha
    _write_simple_code(bw, [2])  # distance symbol 2 → dist_code 3
    # pixels: one literal (green 0 → 8-bit code 0) then a copy
    bw.write_code(0, 8)  # green literal 0
    # red/blue/alpha are single-symbol → 0 bits
    bw.write_code(2 * 232 + (256 - 232), 9)  # green symbol 256 (len 1)
    payload = bytes([0x2F]) + bytes(bw.out) + b"\x00\x00"
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + payload
    with pytest.raises(NotImplementedError, match="neighborhood"):
        decode_webp_pixels(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_cash_truncates_toward_zero():
    """Mode-13 ClampAddSubtractHalf uses the spec's C `/2` (truncation
    toward zero), not Python floor division — they differ for negative
    odd deltas (ADVICE r12). Channel setup: a=avg2(l,t)=11, c=14 →
    delta=-3 → trunc gives 11-1=10 (floor would give 9)."""
    from oracle_vectorsearch_example_spark.functions.webp import _cash

    l = (0xFF << 24) | 10
    t = (0xFF << 24) | 13
    tl = (0xFF << 24) | 14
    assert _cash(l, t, tl) & 0xFF == 10


def test_rightmost_column_tr_is_same_row_leftmost():
    """Spec rule for the TR pixel on the rightmost column: the leftmost
    pixel of the SAME row, already reconstructed in scan order (ADVICE
    r12 — previously fell back to the previous row's leftmost). Zero
    residuals make every pixel equal its predictor, so (1, w-1) under
    mode 3 (TR) must equal argb[1, 0], not argb[0, 0]."""
    from oracle_vectorsearch_example_spark.functions.webp import (
        _inv_predictor,
    )

    w = 3
    argb = np.zeros((2, w), dtype=np.uint32)
    argb[0, 0] = 0x00010203  # residual at origin (pred is 0xFF000000)
    argb[1, 0] = 0x00050505  # residual vs T=argb[0,0]
    pred_img = np.array([[3 << 8]], dtype=np.uint32)  # mode 3 everywhere
    _inv_predictor(argb, pred_img, bits=8)
    assert argb[1, 0] != argb[0, 0]
    assert argb[1, w - 1] == argb[1, 0]
