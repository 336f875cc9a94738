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


def test_lpc_named_gate():
    """A frame whose subframe type says LPC must raise by name, not
    misdecode."""
    x = np.zeros(16, np.int16)
    data = bytearray(make_simple_flac(x, 8000, block_size=16))
    # frame starts after 4 (fLaC) + 4 + 34 (STREAMINFO): find sync
    at = data.index(b"\xff\xf8", 8)
    # subframe header byte sits right after the 16-bit blocksize + crc8;
    # simplest robust corruption: flip the subframe type bits directly by
    # scanning for the encoded 0b0_001000_0 (FIXED order 0) byte
    probe = bytes(data)
    found = False
    for i in range(at, len(probe)):
        b = probe[i]
        if b == 0b00010000:  # pad0 + type 001000 (FIXED order 0) + wasted 0
            data[i] = 0b01000000  # type 100000 = LPC order 0
            found = True
            break
    assert found
    with pytest.raises(Exception, match="LPC|CRC"):
        decode_flac(bytes(data))


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
