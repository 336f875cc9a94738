"""Baseline JPEG codec (r6): T.81 decode + matching fixture encoder.

Round-trip tolerances are quantization-bounded: at quality ≥ 90 a smooth
gradient reconstructs within a few levels; solid colors land within ±2
(DC-only blocks). The encoder exists to make these tests self-contained
— same writer-reader discipline as the BMP/PNG/DOCX/DOC fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg,
    encode_jpeg_progressive,
    make_simple_jpeg,
)


def _gradient(h, w):
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w)[None, :]
    img[..., 1] = np.linspace(255, 0, h)[:, None]
    img[..., 2] = 128
    return img


def test_solid_color_roundtrip_tight():
    data = make_simple_jpeg(20, 12, (200, 60, 30))
    px = decode_jpeg_pixels(data)
    assert px.shape == (12, 20, 3)
    mean = px.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(mean, [200, 60, 30], atol=2.5)


def test_fixture_is_deterministic():
    assert make_simple_jpeg(9, 7, (1, 2, 3)) == make_simple_jpeg(9, 7, (1, 2, 3))


@pytest.mark.parametrize("subsample", [False, True])
def test_gradient_roundtrip_nonaligned_dims(subsample):
    """33×41 exercises MCU edge padding in both axes; 4:2:0 exercises
    chroma subsample + upsample."""
    img = _gradient(33, 41)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=95, subsample=subsample))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(float) - img.astype(float))
    assert err.max() <= (8 if subsample else 3)
    assert err.mean() < (3 if subsample else 1)


def test_restart_markers_roundtrip():
    img = _gradient(40, 56)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=92, restart_interval=3))
    assert np.abs(dec.astype(float) - img.astype(float)).max() <= 4
    dec2 = decode_jpeg_pixels(
        encode_jpeg(img, quality=92, subsample=True, restart_interval=2)
    )
    assert np.abs(dec2.astype(float) - img.astype(float)).max() <= 8


def test_high_quality_noise():
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(noise, quality=100))
    assert np.abs(dec.astype(float) - noise.astype(float)).mean() < 2


def test_bad_input_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"not a jpeg")
    # a baseline stream whose SOF marker is flipped to SOF2 is CORRUPT
    # (its single scan claims the whole 0..63 band at once): a clear
    # error, not a silent wrong image
    data = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
    data[data.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg_pixels(bytes(data))


@pytest.mark.parametrize("subsample", [False, True])
def test_progressive_matches_baseline_exactly(subsample):
    """SOF2 round-trip (r7): the progressive encoder's 10-scan script
    (DC Al=1 -> banded AC with successive approximation -> DC/AC
    refinement passes) decodes to PIXEL-IDENTICAL output vs the baseline
    codec at the same quality — same quantized coefficients, different
    entropy layout, so any coefficient mis-accumulated across scans
    would show."""
    img = _gradient(33, 41)
    base = decode_jpeg_pixels(encode_jpeg(img, quality=90, subsample=subsample))
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(img, quality=90, subsample=subsample)
    )
    np.testing.assert_array_equal(base, prog)


def test_progressive_solid_color_long_eob_runs():
    """A solid image makes every AC band an EOB: the encoder accumulates
    multi-block EOB runs (EOBn symbols, r > 0) and the decoder's
    eobrun-skip path runs for real — plus accuracy vs the source."""
    img = np.zeros((48, 64, 3), np.uint8)
    img[:] = (180, 90, 45)
    prog = decode_jpeg_pixels(encode_jpeg_progressive(img, quality=90))
    base = decode_jpeg_pixels(encode_jpeg(img, quality=90))
    np.testing.assert_array_equal(base, prog)
    mean = prog.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(mean, [180, 90, 45], atol=2.5)


def test_progressive_noise_and_determinism():
    """High-entropy input at odd dims: dense AC coefficients exercise
    ZRL runs and the correction-bit (refinement) interleave; the encoded
    bytes are deterministic."""
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 256, (23, 17, 3)).astype(np.uint8)
    blob = encode_jpeg_progressive(noise, quality=95)
    assert blob == encode_jpeg_progressive(noise, quality=95)
    prog = decode_jpeg_pixels(blob)
    base = decode_jpeg_pixels(encode_jpeg(noise, quality=95))
    np.testing.assert_array_equal(base, prog)


def test_multimodal_dispatch_and_resize(spark):
    """JPEG payloads ride the same image_features / resize paths as
    BMP/PNG — the Spark-side contract."""
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_bytes,
        image_features,
        resize_image_bytes,
    )

    data = make_simple_jpeg(32, 16, (10, 200, 90))
    w, h, mr, mg, mb = decode_image_bytes(data)
    assert (w, h) == (32, 16)
    np.testing.assert_allclose([mr, mg, mb], [10, 200, 90], atol=2.5)

    small = resize_image_bytes(data, 8, 4)
    assert small[:3] == b"\xff\xd8\xff"  # stays a JPEG
    px = decode_jpeg_pixels(small)
    assert px.shape == (4, 8, 3)

    df = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    row = image_features(df).collect()[0]
    assert (row.width, row.height) == (32, 16)
    np.testing.assert_allclose(
        [row.mean_r, row.mean_g, row.mean_b], [10, 200, 90], atol=2.5
    )


def test_progressive_restart_markers_roundtrip():
    """DRI in a progressive stream: restart markers interrupt every scan
    (per-scan RSTn numbering, EOB runs flushed at boundaries, predictors
    reset) — still pixel-identical to baseline."""
    img = _gradient(40, 56)
    rng = np.random.RandomState(5)
    noisy = rng.randint(0, 256, (17, 25, 3)).astype(np.uint8)
    for src, q in ((img, 92), (noisy, 95)):
        base = decode_jpeg_pixels(encode_jpeg(src, quality=q))
        for dri in (1, 3):
            prog = decode_jpeg_pixels(
                encode_jpeg_progressive(src, quality=q, restart_interval=dri)
            )
            np.testing.assert_array_equal(base, prog)
    # and with chroma subsampling (MCU-interleaved DC scan units)
    base = decode_jpeg_pixels(encode_jpeg(img, quality=92, subsample=True))
    prog = decode_jpeg_pixels(
        encode_jpeg_progressive(img, quality=92, subsample=True, restart_interval=2)
    )
    np.testing.assert_array_equal(base, prog)
