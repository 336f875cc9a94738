"""Multimodal column plumbing (X4): schema, Arrow batch shape, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark import schemas
from oracle_vectorsearch_example_spark.operators.multimodal import (
    FEATURE_DIM,
    binary_stats,
    extract_media_features,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"payload-one", ("image/png", 10, 10, None)),
        (2, "audio", b"", ("audio/wav", None, None, 1200)),
        (3, "video", None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, schemas.MEDIA)


def test_feature_extraction_plumbing(media):
    out = {r.media_id: r for r in extract_media_features(media, decode="fake").collect()}
    assert set(out) == {1, 2, 3}
    r = out[1]
    assert r.byte_len == len(b"payload-one")
    assert r.digest == hashlib.sha256(b"payload-one").hexdigest()[:16]
    assert 16 <= r.width < 256 and 16 <= r.height < 256
    assert len(r.features) == FEATURE_DIM
    # null payload treated as empty bytes
    assert out[3].byte_len == 0


def test_fake_decode_deterministic(media):
    a = sorted(map(tuple, extract_media_features(media, decode="fake").collect()))
    b = sorted(map(tuple, extract_media_features(media, decode="fake").collect()))
    assert a == b


def test_real_decode_gated(media):
    with pytest.raises(NotImplementedError):
        extract_media_features(media, decode="real")
    with pytest.raises(ValueError):
        extract_media_features(media, decode="maybe")


def test_binary_stats_jvm_side(media):
    out = {r.media_id: r for r in binary_stats(media).collect()}
    assert out[1].byte_len == len(b"payload-one")
    assert out[1].digest == hashlib.md5(b"payload-one").hexdigest()
    plan = binary_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan  # stays JVM-side


def test_resize_plumbing(media):
    from oracle_vectorsearch_example_spark.operators.multimodal import resize_media

    out = resize_media(media, 64, 48).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (64, 48)
        assert len(r.payload) == max(16, 64 * 48 // 64)
    # deterministic: same inputs -> same payload bytes
    again = resize_media(media, 64, 48).collect()
    assert sorted(r.payload for r in out) == sorted(r.payload for r in again)
    # different target -> different payload
    other = resize_media(media, 32, 32).collect()
    assert sorted(r.payload for r in out) != sorted(r.payload for r in other)


def test_frame_sampling_generator_shape(media):
    from oracle_vectorsearch_example_spark.operators.multimodal import sample_frames

    out = sample_frames(media, fps=2.0, max_frames=8).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {1, 2, 3}
    for mid, frames in by_id.items():
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))  # contiguous 0-based
        assert 1 <= len(frames) <= 8
        for f in frames:
            assert f.ts_sec == f.frame_idx / 2.0
            assert len(f.payload) == 32  # sha256 frame stand-in


def test_resize_gates_real_decode(media):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        resize_media,
        sample_frames,
    )

    with pytest.raises(NotImplementedError):
        resize_media(media, 8, 8, decode="real")
    with pytest.raises(NotImplementedError):
        sample_frames(media, decode="real")
