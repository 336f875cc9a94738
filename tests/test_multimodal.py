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
