"""MP4 / ISO-BMFF container (X59 tail, r13): ISO-dialect writer ↔
shared QuickTime walker roundtrips, cross-container dedup parity with
GIF/AVI/MOV, PCM soundtrack through the audio path, named gates for
avc1/mp4a."""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.mp4 import (
    decode_mp4_frames,
    make_simple_mp4,
    mp4_audio_pcm,
    mp4_brand,
    mp4_frame_table,
)


def _px(seed, h=32, w=32):
    x = (np.arange(h)[:, None] // 4) * 16 + (np.arange(w)[None, :] // 4) * 8
    v = ((x + seed * 32) % 256).astype(np.uint8)
    return np.stack([v, (v * 2) % 256, (v * 3) % 256], axis=-1)


def _sig(seed, n=800):
    return (np.sin(np.arange(n) * 0.01 * (seed + 3)) * 9000).astype(
        np.int16
    )


def test_iso_dialect_roundtrip():
    frames = [_px(s) for s in (0, 3, 6)]
    blob = make_simple_mp4(frames, fps=2.0, audio_samples=_sig(1))
    assert mp4_brand(blob) == "isom"
    # ISO markers actually present: url dataref + zeroed hdlr slot
    assert b"url " in blob and b"alis" not in blob and b"mhlr" not in blob
    meta, raw = mp4_frame_table(blob)
    assert meta["codec"] == "jpeg" and len(raw) == 3
    assert meta["timestamps"] == [0.0, 0.5, 1.0]
    assert (meta["width"], meta["height"]) == (32, 32)
    for (_, got), want in zip(decode_mp4_frames(blob), frames):
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 4.0
    pcm, bits = mp4_audio_pcm(blob)
    assert bits == 16 and np.array_equal(pcm[:, 0], _sig(1))
    # sound-trak-first ordering (the ADVICE r12 MOV fix covers ISO too)
    first = make_simple_mp4(
        frames, fps=2.0, audio_samples=_sig(1), audio_first=True
    )
    m2, raw2 = mp4_frame_table(first)
    assert m2["codec"] == "jpeg" and len(raw2) == 3


def test_named_gates():
    blob = make_simple_mp4([_px(0)], fps=1.0, audio_samples=_sig(2))
    with pytest.raises(NotImplementedError, match="avc1"):
        mp4_frame_table(blob.replace(b"jpeg", b"avc1", 1))
    with pytest.raises(NotImplementedError, match="mp4a"):
        mp4_audio_pcm(blob.replace(b"twos", b"mp4a", 1))
    assert mp4_brand(b"RIFF....AVI LIST") is None


def test_cross_container_video_dedup(spark):
    """The SAME frames muxed as GIF, MOV, and MP4 collapse onto one
    survivor in dedup_videos — the MP4 route needs zero new wiring
    (magic dispatch keys on the ftyp family)."""
    from oracle_vectorsearch_example_spark.functions.gif import (
        make_animated_gif,
    )
    from oracle_vectorsearch_example_spark.functions.mov import (
        make_simple_mov,
    )
    from oracle_vectorsearch_example_spark.operators.video import (
        dedup_videos,
    )

    base = [_px(s) for s in (0, 3, 6)]
    other = [_px(s)[::-1, :, :] for s in (10, 13, 16)]
    media = spark.createDataFrame(
        [
            (1, bytearray(make_animated_gif(base))),
            (2, bytearray(make_simple_mov(base, fps=10.0))),
            (3, bytearray(make_simple_mp4(base, fps=10.0))),
            (4, bytearray(make_simple_mp4(other, fps=10.0))),
        ],
        "media_id long, payload binary",
    )
    kept = sorted(
        r.media_id
        for r in dedup_videos(
            media, fps=10.0, max_frames=8, max_hamming=10
        ).collect()
    )
    assert kept == [1, 4]


def test_mp4_soundtrack_dedups_with_wav(spark):
    """An MP4's PCM soundtrack and the bare WAV of the same samples
    carry the same 63-bit code — cross-format identity through the
    audio dedup path (the MOV/AVI discipline extended to ISO)."""
    import io
    import wave

    from oracle_vectorsearch_example_spark.functions.afp import (
        dedup_audio,
    )

    def _wav(sig):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(sig.astype("<i2").tobytes())
        return bytearray(buf.getvalue())

    frames = [_px(s, h=8, w=8) for s in (0, 1)]
    media = spark.createDataFrame(
        [
            (1, _wav(_sig(6))),
            (2, bytearray(make_simple_mp4(frames, fps=5.0,
                                          audio_samples=_sig(6)))),
            (3, bytearray(make_simple_mp4(frames, fps=5.0,
                                          audio_samples=_sig(12)))),
        ],
        "media_id long, payload binary",
    )
    kept = sorted(
        r.media_id
        for r in dedup_audio(media, max_hamming=0).collect()
    )
    assert kept == [1, 3]
