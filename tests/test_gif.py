"""GIF codec (r7, functions/gif.py): spec-anchored decode, LZW
round-trips, animation compositing (disposal/transparency/interlace),
and the REAL sample_frames path it unlocks."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.gif import (
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif_frames,
    decode_gif_pixels,
    make_animated_gif,
    make_simple_gif,
)

# The canonical 43-byte 1×1 red-pixel GIF89a — a known-good stream this
# module did NOT produce, anchoring LSB-first LZW bit order, clear/EOI
# handling, and header parsing against the published spec example.
RED_DOT = bytes.fromhex(
    "47494638396101000100800000ff00000000002"
    "1f90400000000002c00000000010001000002024401003b"
)


def test_spec_anchor_red_dot():
    px = decode_gif_pixels(RED_DOT)
    assert px.shape == (1, 1, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)


def test_lzw_roundtrip_various():
    for mcs, pixels in (
        (2, [0, 1, 0]),
        (2, [0] * 1000),
        (4, list(range(16)) * 100),
        (8, [i % 256 for i in range(5000)]),
        (8, [0, 0, 0, 1, 1, 1] * 900),  # forces table growth + 4096 reset
    ):
        assert _gif_lzw_decode(_gif_lzw_encode(pixels, mcs), mcs) == pixels


def test_single_frame_roundtrip_and_solid():
    rng = np.random.RandomState(2)
    f = (rng.randint(0, 6, (13, 17, 3)) * 40).astype(np.uint8)
    assert np.array_equal(decode_gif_pixels(make_animated_gif([f])), f)
    solid = decode_gif_pixels(make_simple_gif(7, 5, (10, 200, 30)))
    assert solid.shape == (5, 7, 3)
    assert (solid == (10, 200, 30)).all()


def test_animation_frames_and_timestamps():
    rng = np.random.RandomState(3)
    frames = [(rng.randint(0, 4, (9, 11, 3)) * 60).astype(np.uint8) for _ in range(4)]
    data = make_animated_gif(frames, delays_cs=[5, 10, 20, 40])
    dec = decode_gif_frames(data)
    assert [round(t, 4) for t, _ in dec] == [0.0, 0.05, 0.15, 0.35]
    assert all(np.array_equal(a, b) for (_, a), b in zip(dec, frames))
    # max_frames truncation
    assert len(decode_gif_frames(data, max_frames=2)) == 2


def test_transparency_and_disposal_compositing():
    """A transparent sub-rectangle frame must composite over the prior
    canvas; disposal=2 restores the background under the rect."""
    base = np.zeros((4, 4, 3), np.uint8)
    base[:] = (0, 0, 255)
    data = bytearray(make_animated_gif([base], delays_cs=[10]))
    assert data[-1] == 0x3B
    body = bytes(data[:-1])
    # append a hand-built 2×2 overlay at (1,1): color index 1 with index 0
    # transparent, disposal=2 — palette from the base GIF (blue at 0; we
    # add a GCE + image block reusing the GLOBAL table, color 1 arbitrary)
    # GCE: disposal=2, transparency on, transparent idx 0
    gce = b"\x21\xf9\x04" + bytes([(2 << 2) | 1]) + struct.pack("<H", 10) + b"\x00\x00"
    idx_pixels = [1, 0, 0, 1]  # diagonal opaque
    lzw = _gif_lzw_encode(idx_pixels, 2)
    img = (
        b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2) + b"\x00" + bytes([2])
        + bytes([len(lzw)]) + lzw + b"\x00"
    )
    frames = decode_gif_frames(body + gce + img + b"\x3b")
    assert len(frames) == 2
    f2 = frames[1][1]
    pal1 = f2[1, 1]  # opaque overlay pixel = global palette color 1
    assert tuple(f2[1, 2]) == (0, 0, 255)  # transparent → base shows through
    assert tuple(f2[2, 1]) == (0, 0, 255)
    assert tuple(f2[2, 2]) == tuple(pal1)


def test_interlaced_image_decodes():
    """Re-pack a frame's rows in interlace order with the interlace flag
    set; decode must restore the original row order."""
    rng = np.random.RandomState(5)
    f = (rng.randint(0, 4, (8, 6, 3)) * 50).astype(np.uint8)
    plain = make_animated_gif([f])
    # find the image descriptor and rebuild with interlaced row order
    at = plain.index(b"\x2c")
    left, top, iw, ih = struct.unpack("<HHHH", plain[at + 1 : at + 9])
    assert (iw, ih) == (6, 8)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, ih, step))
    # decode the plain stream's indices via the public path, then re-encode
    # rows permuted + interlace flag
    from oracle_vectorsearch_example_spark.functions.gif import _build_palette

    pal, colors = _build_palette([f])
    idx = np.array(
        [colors[tuple(int(x) for x in px)] for px in f.reshape(-1, 3)], np.int32
    ).reshape(ih, iw)
    inter = idx[order]  # rows as they appear in an interlaced stream
    depth = max(1, (len(pal) - 1).bit_length())
    mcs = max(2, depth)
    lzw = _gif_lzw_encode([int(v) for v in inter.reshape(-1)], mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", iw, ih)
    out += bytes([0x80 | (depth - 1), 0, 0]) + pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, iw, ih) + bytes([0x40, mcs])
    out += bytes([len(lzw)]) + lzw + b"\x00\x3b"
    assert np.array_equal(decode_gif_pixels(bytes(out)), f)


def test_too_many_colors_rejected():
    rng = np.random.RandomState(7)
    f = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError, match="256"):
        make_animated_gif([f])


def test_multimodal_dispatch_and_real_frame_sampling(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        image_features,
        resize_image_bytes,
        sample_frames,
    )

    rng = np.random.RandomState(4)
    frames = [(rng.randint(0, 4, (12, 16, 3)) * 60).astype(np.uint8) for _ in range(5)]
    gif = make_animated_gif(frames, delays_cs=[50] * 5)  # 2 fps
    df = spark.createDataFrame([(1, bytearray(gif))], "media_id long, payload binary")
    got = sample_frames(df, fps=2.0, max_frames=10, decode="real").collect()
    assert [(r.frame_idx, r.ts_sec) for r in got] == [
        (0, 0.0), (1, 0.5), (2, 1.0), (3, 1.5), (4, 2.0)
    ]
    assert np.array_equal(decode_gif_pixels(bytes(got[0].payload)), frames[0])
    feat = image_features(df).collect()[0]
    assert (feat.width, feat.height) == (16, 12)
    rz = resize_image_bytes(gif, 8, 6)
    assert rz[:6] == b"GIF89a" and decode_image_pixels(rz).shape == (6, 8, 3)
    # non-GIF payloads still gate by name on the real path
    from oracle_vectorsearch_example_spark.operators.multimodal import make_simple_bmp

    bdf = spark.createDataFrame(
        [(2, bytearray(make_simple_bmp(4, 4, (1, 2, 3))))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(bdf, decode="real").collect()
