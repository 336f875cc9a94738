"""FLAC codec (r7, functions/flac.py): exact lossless round-trips,
CRC verification, stereo decorrelation (hand-built frames), named
gates, and the audio_features dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.flac import (
    _BitW,
    _crc8,
    _crc16,
    decode_flac,
    make_simple_flac,
)


def test_roundtrip_exact_mono_noise():
    rng = np.random.RandomState(3)
    x = rng.randint(-32768, 32768, 5000).astype(np.int16)
    sr, got = decode_flac(make_simple_flac(x, 22050, block_size=1024))
    assert sr == 22050 and got.shape == (5000, 1)
    assert np.array_equal(got[:, 0], x.astype(np.int32))


def test_roundtrip_exact_stereo_smooth():
    """Smooth signals engage the fixed predictors (order chosen per
    frame) — still bit-exact."""
    t = np.arange(7000)
    x = np.stack(
        [(3000 * np.sin(t / 20)).astype(np.int16),
         (2000 * np.cos(t / 15)).astype(np.int16)], axis=1,
    )
    sr, got = decode_flac(make_simple_flac(x, 44100))
    assert np.array_equal(got, x.astype(np.int32))


def test_roundtrip_constant_and_edge_sizes():
    c = np.full(300, -123, np.int16)
    _, got = decode_flac(make_simple_flac(c, 8000, block_size=192))
    assert np.array_equal(got[:, 0], c.astype(np.int32))
    one = np.array([5], np.int16)
    _, got = decode_flac(make_simple_flac(one, 8000))
    assert got.shape == (1, 1) and got[0, 0] == 5
    assert make_simple_flac(c, 8000) == make_simple_flac(c, 8000)


def test_crc_mismatch_detected():
    x = np.arange(500, dtype=np.int16)
    data = bytearray(make_simple_flac(x, 16000))
    data[-1] ^= 0xFF  # corrupt the final frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))


def test_lpc_roundtrip_and_mode_decision():
    """LPC subframes (RFC 9639 §9.2.5): the Levinson–Durbin writer path
    round-trips bit-exactly, beats the fixed predictor on tonal signals,
    and the mode decision falls back to fixed/constant where LPC can't
    help (noise, constants)."""
    rng = np.random.default_rng(3)
    t = np.arange(20000)
    sig = (
        8000 * np.sin(2 * np.pi * 440 * t / 16000)
        + 2000 * np.sin(2 * np.pi * 1313 * t / 16000)
        + 150 * rng.normal(size=t.size)
    ).astype(np.int16)
    fixed = make_simple_flac(sig, 16000)
    lpc = make_simple_flac(sig, 16000, lpc_order=8)
    _, got = decode_flac(lpc)
    assert np.array_equal(got[:, 0], sig.astype(np.int32))
    assert len(lpc) < len(fixed)  # tonal → LPC residual is smaller
    # stereo + constant + short-block edge cases all stay lossless
    st = np.stack([sig[:5000], (sig[:5000] // 3)], axis=1).astype(np.int16)
    _, got2 = decode_flac(make_simple_flac(st, 16000, lpc_order=4))
    assert np.array_equal(got2, st.astype(np.int32))
    const = np.full(300, -7, np.int16)
    _, got3 = decode_flac(make_simple_flac(const, 8000, lpc_order=8))
    assert np.array_equal(got3[:, 0], const.astype(np.int32))


def test_lpc_invalid_precision_and_shift_rejected():
    """Decoder hardening: precision code 15 and negative shifts are
    named ValueErrors, not silent garbage."""
    from oracle_vectorsearch_example_spark.functions.flac import (
        _Bits,
        _decode_subframe,
    )

    def frame_bits(prec_code: int, shift5: int) -> _Bits:
        bw = _BitW()
        bw.write(0, 1)          # padding
        bw.write(32 | 0, 6)     # LPC order 1
        bw.write(0, 1)          # no wasted bits
        bw.write(5 & 0xFFFF, 16)  # 1 warm-up sample
        bw.write(prec_code, 4)
        bw.write(shift5, 5)
        bw.write(1, 15)         # one coefficient (only read when prec ok)
        bw.write(0, 2)          # rice method 0
        bw.write(0, 4)          # partition order 0
        bw.write(0, 4)          # rice param 0
        for _ in range(3):
            bw.write_unary(0)
        bw.align()
        return _Bits(bytes(bw.out))

    with pytest.raises(ValueError, match="precision"):
        _decode_subframe(frame_bits(15, 12), 4, 16)
    with pytest.raises(ValueError, match="shift"):
        _decode_subframe(frame_bits(13, 0b10100), 4, 16)  # -12 signed


def _stereo_frame(mode: int, a: list[int], b: list[int], bits_a: int, bits_b: int):
    """Hand-build a single-frame FLAC stream with the given stereo
    decorrelation mode (8=left/side, 9=right/side, 10=mid/side) using
    VERBATIM subframes — exercises decode paths the writer never emits."""
    bs = len(a)
    bw = _BitW()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)           # 16-bit blocksize follows
    bw.write(0, 4)           # sample rate from streaminfo
    bw.write(mode, 4)
    bw.write(4, 3)           # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)           # frame 0
    bw.write(bs - 1, 16)
    hdr = bytes(bw.out)
    bw.write(_crc8(hdr), 8)
    for vals, nb in ((a, bits_a), (b, bits_b)):
        bw.write(0, 1)
        bw.write(1, 6)       # VERBATIM
        bw.write(0, 1)
        for v in vals:
            bw.write(v & ((1 << nb) - 1), nb)
    bw.align()
    frame = bytes(bw.out)

    si = bytearray()
    si += struct.pack(">HH", bs, bs)
    si += b"\x00\x00\x00" * 2
    sr = 8000
    si += bytes([
        (sr >> 12) & 0xFF, (sr >> 4) & 0xFF,
        ((sr & 0x0F) << 4) | (1 << 1) | ((16 - 1) >> 4),
        (((16 - 1) & 0x0F) << 4) | 0,
    ])
    si += struct.pack(">I", bs)
    si += b"\x00" * 16
    return (
        b"fLaC" + bytes([0x80]) + struct.pack(">I", len(si))[1:] + bytes(si)
        + frame + struct.pack(">H", _crc16(frame))
    )


@pytest.mark.parametrize("mode", [8, 9, 10])
def test_stereo_decorrelation_modes(mode):
    left = [100, -200, 300, 0, -5, 17, 1000, -1000]
    right = [90, -180, 250, 10, -5, 20, 999, -998]
    side = [l - r for l, r in zip(left, right)]
    if mode == 8:    # left/side
        a, ba = left, 16
        b, bb = side, 17
    elif mode == 9:  # side/right
        a, ba = side, 17
        b, bb = right, 16
    else:            # mid/side: mid = (l + r) >> 1 (floor), side as above
        a = [(l + r) >> 1 for l, r in zip(left, right)]
        ba = 16
        b, bb = side, 17
    sr, got = decode_flac(_stereo_frame(mode, a, b, ba, bb))
    assert np.array_equal(got[:, 0], np.array(left))
    assert np.array_equal(got[:, 1], np.array(right))


def test_audio_features_dispatch(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        audio_features,
        make_simple_wav,
    )

    sq = np.tile(np.array([1500, -1500], np.int16), 500)
    rows = [
        (1, bytearray(make_simple_wav(1000, 1500, sample_rate=8000))),
        (2, bytearray(make_simple_flac(sq, 8000))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in audio_features(df).collect()}
    # same square-wave stats through either container
    for mid in (1, 2):
        assert got[mid].sample_rate == 8000
        assert got[mid].n_samples == 1000
        assert got[mid].rms == 1500.0
        assert got[mid].zero_cross_rate == 1.0
