"""X59 video near-dup — frame-hash sampling parity with sample_frames,
coverage semantics over synthetic hash frames (frame-index-agnostic
matching, thresholds, packing guard), and real animated-GIF dedup end
to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.video import (
    dedup_videos,
    video_frame_hashes,
    video_neardup_pairs,
)


def _px(seed, h=32, w=32):
    """Coarse-colored pattern (GIF writers need ≤256 palette colors)."""
    x = (np.arange(h)[:, None] // 4) * 16 + (np.arange(w)[None, :] // 4) * 8
    v = ((x + seed * 32) % 256).astype(np.uint8)
    return np.stack([v, (v * 2) % 256, (v * 3) % 256], axis=-1)


def _gif(frames, delays_cs=None):
    from oracle_vectorsearch_example_spark.functions.gif import (
        make_animated_gif,
    )

    return bytearray(make_animated_gif(frames, delays_cs))


def test_frame_hash_sampling_matches_sample_frames(spark):
    """video_frame_hashes follows the sample_frames rule exactly and
    its hashes equal pHashing the frames sample_frames emits."""
    from oracle_vectorsearch_example_spark.functions.phash import (
        phash_from_pixels,
    )
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        sample_frames,
    )

    frames = [_px(s) for s in (0, 3, 6)]
    media = spark.createDataFrame(
        [(1, _gif(frames, [100, 100, 100]))],  # 1 fps worth of frames
        "media_id long, payload binary",
    )
    got = {
        r.frame_idx: (r.ts_sec, r.phash)
        for r in video_frame_hashes(media, fps=1.0, max_frames=8).collect()
    }
    want = {}
    for r in sample_frames(media, fps=1.0, max_frames=8, decode="real").collect():
        px = decode_image_pixels(bytes(r.payload))
        want[r.frame_idx] = (r.ts_sec, phash_from_pixels(px))
    assert got == want and len(got) == 3


def test_coverage_semantics_on_hash_frames(spark):
    """Direct pair math: a shifted copy (same hashes, different frame
    indexes) still matches fully; a half-overlap sits exactly at cover
    0.5; disjoint videos pair nowhere."""
    h = [int(x) for x in (1 << 5, 1 << 15, 1 << 25, 1 << 35)]
    far = [int(1 << 55) | 0b111111, int(1 << 54) | 0b1010101]
    rows = (
        [(1, i, h[i]) for i in range(4)]
        + [(2, i, h[(i + 2) % 4]) for i in range(4)]  # shifted full copy
        + [(3, 0, h[0]), (3, 1, far[0])]              # half overlap w/ 1
        + [(4, 0, far[1])]                            # disjoint
    )
    fh = spark.createDataFrame(rows, "media_id long, frame_idx int, phash long")
    got = {
        (r.id_a, r.id_b): (r.matched_a, r.matched_b, r.cover)
        for r in video_neardup_pairs(
            fh, max_hamming=0, min_frame_cover=0.5
        ).collect()
    }
    assert got[(1, 2)] == (4, 4, 1.0)  # frame order ignored
    assert got[(1, 3)] == (1, 1, 0.25) if (1, 3) in got else True
    # (1,3): matched 1 of 4 vs 1 of 2 → least = 0.25 < 0.5 → excluded
    assert (1, 3) not in got and (1, 4) not in got
    # lowering the bar admits the half-overlap pair at its true cover
    got2 = {
        (r.id_a, r.id_b): r.cover
        for r in video_neardup_pairs(
            fh, max_hamming=0, min_frame_cover=0.25
        ).collect()
    }
    assert got2[(1, 3)] == 0.25 and got2[(2, 3)] == 0.25

    with pytest.raises(ValueError, match="min_frame_cover"):
        video_neardup_pairs(fh, min_frame_cover=0.0)
    bad = spark.createDataFrame(
        [(1 << 50, 0, 5)], "media_id long, frame_idx int, phash long"
    )
    with pytest.raises(Exception, match="packs"):
        video_neardup_pairs(bad).collect()


def test_dedup_videos_end_to_end(spark):
    """Real animated GIFs: an exact re-encode and a per-frame near
    edit collapse onto the original; a different video and a
    non-video payload survive."""
    base = [_px(s) for s in (0, 3, 6)]
    near = []
    for f in base:
        g = f.copy()
        g[:4, :4, :] = f[4, 4, :]  # small corner patch, palette-safe
        near.append(g)
    other = [_px(s)[::-1, :, :] for s in (10, 13, 16)]
    rows = [
        (1, _gif(base)),
        (2, _gif(base)),    # exact copy
        (3, _gif(near)),    # near copy
        (4, _gif(other)),   # distinct
        (5, bytearray(b"not a video")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(
        r.media_id
        for r in dedup_videos(
            media, fps=10.0, max_frames=8, max_hamming=10
        ).collect()
    )
    assert kept == [1, 4, 5]


def test_layout_determinism(spark):
    frames = [_px(s) for s in (1, 4)]
    rows = [(i, _gif(frames)) for i in range(6)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    a = sorted(map(tuple, video_frame_hashes(media).collect()))
    b = sorted(map(tuple, video_frame_hashes(media.repartition(4)).collect()))
    assert a == b


def _avi(frames, fps=10.0, **kw):
    from oracle_vectorsearch_example_spark.functions.avi import (
        make_simple_avi,
    )

    return bytearray(make_simple_avi(frames, fps=fps, **kw))


def test_avi_container_roundtrip():
    """MJPEG AVI fixture writer ↔ chunk-walk parser: frame clock from
    strh dwRate/dwScale, every 00dc chunk decodes through the T.81
    baseline decoder (lossy-close pixels), DHT-stripped streams (the
    historic MJPEG implicit-tables convention) decode bit-identically
    after Annex K re-injection, and non-MJPG codecs reject by name."""
    from oracle_vectorsearch_example_spark.functions.avi import (
        avi_frame_table,
        decode_avi_frames,
    )

    frames = [_px(s, h=48, w=64) for s in (0, 2, 4)]
    blob = bytes(_avi(frames, fps=4.0))
    meta, raw = avi_frame_table(blob)
    assert meta["fps"] == 4.0 and meta["codec"] == "MJPG" and len(raw) == 3
    dec = decode_avi_frames(blob)
    assert [t for t, _ in dec] == [0.0, 0.25, 0.5]
    for (_, got), want in zip(dec, frames):
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 4.0

    stripped = bytes(_avi(frames, fps=4.0, strip_dht=True))
    assert len(stripped) < len(blob)  # tables actually removed
    dec2 = decode_avi_frames(stripped)
    assert all(
        np.array_equal(a[1], b[1]) for a, b in zip(dec, dec2)
    )

    h264 = bytearray(blob)
    h264 = h264.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError, match="H264"):
        avi_frame_table(bytes(h264))


def test_avi_frame_hashes_match_gif_twin(spark):
    """The SAME pixel frames muxed as animated GIF and as MJPEG AVI
    yield near-identical frame pHashes (both containers decode to the
    same pixels up to JPEG loss), and the AVI path samples by the
    frame clock without decoding unsampled frames."""
    frames = [_px(s) for s in (0, 3, 6)]
    media = spark.createDataFrame(
        [(1, _gif(frames, [100, 100, 100])), (2, _avi(frames, fps=1.0))],
        "media_id long, payload binary",
    )
    fh = video_frame_hashes(media, fps=1.0, max_frames=8)
    rows = {(r.media_id, r.frame_idx): r for r in fh.collect()}
    assert sorted(rows) == [(1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]
    for i in range(3):
        g, a = rows[(1, i)], rows[(2, i)]
        assert g.ts_sec == a.ts_sec
        # GIF is lossless, AVI is JPEG-lossy: hashes agree within a
        # small hamming distance
        assert bin(g.phash ^ a.phash).count("1") <= 6


def test_dedup_videos_mixed_containers(spark):
    """dedup_videos accepts a MIXED column of GIF and MJPEG-AVI
    payloads: an AVI re-encode of a GIF collapses onto it; distinct
    clips and undecodable payloads survive (on_error='null')."""
    base = [_px(s) for s in (0, 3, 6)]
    other = [_px(s)[::-1, :, :] for s in (10, 13, 16)]
    rows = [
        (1, _gif(base)),
        (2, _avi(base, fps=10.0)),           # cross-container re-encode
        (3, _avi(base, fps=10.0, strip_dht=True)),  # DHT-less muxer
        (4, _avi(other, fps=10.0)),          # distinct
        (5, bytearray(b"\x00\x00\x01\xbaMP4-ish")),  # no evidence
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(
        r.media_id
        for r in dedup_videos(
            media, fps=10.0, max_frames=8, max_hamming=10
        ).collect()
    )
    assert kept == [1, 4, 5]


def test_sample_frames_real_avi(spark):
    """multimodal.sample_frames(decode='real') dispatches AVI too and
    emits the sampled frames as standalone image payloads."""
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        sample_frames,
    )

    frames = [_px(s, h=16, w=16) for s in (1, 5)]
    media = spark.createDataFrame(
        [(7, _avi(frames, fps=1.0))], "media_id long, payload binary"
    )
    got = sample_frames(media, fps=1.0, max_frames=4, decode="real").collect()
    assert [r.frame_idx for r in got] == [0, 1]
    px = decode_image_pixels(bytes(got[1].payload))
    assert px.shape == (16, 16, 3)


def test_avi_raw_dib_lossless_roundtrip(spark):
    """codec='DIB' writes raw BI_RGB bottom-up BGR24 rows — a LOSSLESS
    container round trip (pixel-exact, unlike the JPEG path), decoded
    through the same frame-table walk; mixed MJPG/DIB/GIF columns
    dedup together."""
    from oracle_vectorsearch_example_spark.functions.avi import (
        avi_frame_table,
        decode_avi_frames,
    )

    frames = [_px(s, h=17, w=21) for s in (0, 3, 6)]  # odd sizes: padding
    blob = bytes(_avi(frames, fps=2.0, codec="DIB"))
    meta, raw = avi_frame_table(blob)
    assert meta["codec"] == "DIB" and meta["bpp"] == 24
    dec = decode_avi_frames(blob)
    assert [t for t, _ in dec] == [0.0, 0.5, 1.0]
    for (_, got), want in zip(dec, frames):
        assert np.array_equal(got, want)  # lossless

    # a 16-bpp raw DIB rejects by name; strip_dht is MJPG-only
    bad = blob.replace(
        struct.pack("<H", 24) + b"\x00\x00\x00\x00",
        struct.pack("<H", 16) + b"\x00\x00\x00\x00",
    )
    with pytest.raises(NotImplementedError, match="16 bpp"):
        avi_frame_table(bad)
    with pytest.raises(ValueError, match="strip_dht"):
        _avi(frames, codec="DIB", strip_dht=True)

    # mixed-container dedup: DIB copy of the GIF collapses onto it
    base = [_px(s) for s in (0, 3, 6)]
    media = spark.createDataFrame(
        [
            (1, _gif(base)),
            (2, _avi(base, fps=10.0, codec="DIB")),
            (3, _avi([f[::-1] for f in base], fps=10.0, codec="DIB")),
        ],
        "media_id long, payload binary",
    )
    kept = sorted(
        r.media_id
        for r in dedup_videos(
            media, fps=10.0, max_frames=8, max_hamming=10
        ).collect()
    )
    assert kept == [1, 3]


def test_mov_container_and_mixed_dedup(spark):
    """r12: 'jpeg'-codec QuickTime MOV decodes through the atom walk +
    T.81 decoder — timestamps from the stts sample table, only sampled
    frames decoded in video_frame_hashes; avc1 (H.264) rejects by
    name; a MOV re-encode collapses onto its GIF original in a mixed
    GIF/AVI/MOV column."""
    from oracle_vectorsearch_example_spark.functions.mov import (
        decode_mov_frames,
        make_simple_mov,
        mov_frame_table,
    )

    frames = [_px(s) for s in (0, 3, 6)]
    blob = bytes(make_simple_mov(frames, fps=1.0))
    meta, raw = mov_frame_table(blob)
    assert meta["codec"] == "jpeg" and meta["timestamps"] == [0.0, 1.0, 2.0]
    assert (meta["width"], meta["height"]) == (32, 32)
    dec = decode_mov_frames(blob)
    for (_, got), want in zip(dec, frames):
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 4.0

    with pytest.raises(NotImplementedError, match="avc1"):
        mov_frame_table(blob.replace(b"jpeg", b"avc1", 1))

    base = [_px(s) for s in (0, 3, 6)]
    other = [_px(s)[::-1, :, :] for s in (10, 13, 16)]
    media = spark.createDataFrame(
        [
            (1, _gif(base)),
            (2, bytearray(make_simple_mov(base, fps=10.0))),
            (3, _avi(base, fps=10.0)),
            (4, bytearray(make_simple_mov(other, fps=10.0))),
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

    # sample_frames(decode='real') dispatches MOV too
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        sample_frames,
    )

    got = sample_frames(
        spark.createDataFrame(
            [(9, bytearray(make_simple_mov(frames, fps=1.0)))],
            "media_id long, payload binary",
        ),
        fps=1.0, max_frames=4, decode="real",
    ).collect()
    assert [r.frame_idx for r in got] == [0, 1, 2]


def test_mov_audio_first_trak_order():
    """A MOV whose 'soun' trak precedes the video trak must still yield
    the video track: audio traks also carry codec+chunks, so a
    first-match fallback used to take 'twos' as the video codec and
    raise (silently dropping frame evidence under on_error='null')
    (ADVICE r12). Audio extraction must be order-insensitive too."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.mov import (
        make_simple_mov,
        mov_audio_pcm,
        mov_frame_table,
    )

    frames = [_px(s) for s in (0, 3, 6)]
    sig = (np.sin(np.arange(800) * 0.05) * 9000).astype(np.int16)
    blob = bytes(
        make_simple_mov(frames, fps=1.0, audio_samples=sig, audio_first=True)
    )
    meta, raw = mov_frame_table(blob)
    assert meta["codec"] == "jpeg" and len(raw) == 3
    assert meta["timestamps"] == [0.0, 1.0, 2.0]
    pcm, bits = mov_audio_pcm(blob)
    assert bits == 16 and pcm.shape == (800, 1)
    assert np.array_equal(pcm[:, 0], sig)


def test_ensure_dht_ignores_ffc4_in_payloads():
    """The DHT presence check must walk markers, not substring-scan:
    the byte pair FF C4 inside a COM/APPn payload made a genuinely
    DHT-stripped frame look table-complete, so the Annex K tables were
    never injected and the decode failed — evidence silently dropped
    under on_error='null' (ADVICE r12)."""
    import struct as _struct

    from oracle_vectorsearch_example_spark.functions.avi import (
        _ensure_dht,
        _has_dht,
        _strip_dht,
    )
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    frame = _px(3, h=16, w=16)
    full = encode_jpeg(frame, quality=90)
    stripped = _strip_dht(full)
    # plant FF C4 inside a COM segment right after SOI
    payload = b"x\xff\xc4y"
    com = b"\xff\xfe" + _struct.pack(">H", 2 + len(payload)) + payload
    booby = stripped[:2] + com + stripped[2:]
    assert b"\xff\xc4" in booby and not _has_dht(booby)
    assert _has_dht(full)
    fixed = _ensure_dht(booby)
    assert _has_dht(fixed)
    got = decode_jpeg_pixels(fixed)
    assert got.shape == frame.shape


def test_dht_walk_skips_fill_bytes():
    """0xFF fill bytes are legal T.81 §B.1.1.2 padding before any
    marker (ADVICE r13): a fill run made marker==0xFF read a bogus
    segment length, desyncing the walk — a frame with a real DHT
    after padding then got a SECOND DHT injected."""
    from oracle_vectorsearch_example_spark.functions.avi import (
        _ensure_dht,
        _has_dht,
        _strip_dht,
    )
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    frame = _px(4, h=16, w=16)
    full = encode_jpeg(frame, quality=90)
    padded = full[:2] + b"\xff" * 5 + full[2:]
    assert _has_dht(padded)  # the ADVICE repro: fill before a real DHT
    assert padded == _ensure_dht(padded)  # no double injection
    stripped = _strip_dht(padded)  # fill must not desync the strip walk
    assert not _has_dht(stripped)
    refill = stripped[:2] + b"\xff" * 3 + stripped[2:]
    assert not _has_dht(refill)
    got = decode_jpeg_pixels(_ensure_dht(stripped))
    assert got.shape == frame.shape
