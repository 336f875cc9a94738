"""TFRecord source/sink (r14): masked-CRC32C framing (public check
vectors), tf.train.Example codec (packed + unpacked writer variants),
the distributed typed reader, write→read roundtrip, and corruption
posture."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.tfrecord import (
    _crc32c,
    encode_example,
    iter_tfrecord,
    make_tfrecord,
    parse_example,
    read_tfrecord,
    write_tfrecord,
)


def test_crc32c_known_vectors():
    """Castagnoli check value + RFC 3720 test vector — the framing
    checksum is the real CRC32C, not an approximation."""
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_example_codec_roundtrip_and_variants():
    feats = {
        "caption": "hello world",
        "label": [3, -7, 1 << 40],
        "score": [0.25, -1.5],
        "img": [b"\xff\xd8abc", b"second"],
    }
    back = parse_example(encode_example(feats))
    assert back["caption"] == [b"hello world"]
    assert back["label"] == [3, -7, 1 << 40]
    assert back["score"] == [0.25, -1.5]
    assert back["img"] == [b"\xff\xd8abc", b"second"]
    # writers that emit UNPACKED numeric lists decode identically
    from oracle_vectorsearch_example_spark.functions.onnx_rt import (
        _enc_len,
        _enc_tag,
        _enc_varint,
    )

    il = _enc_tag(1, 0) + _enc_varint(5) + _enc_tag(1, 0) + _enc_varint(9)
    entry = _enc_len(1, b"n") + _enc_len(2, _enc_len(3, il))
    assert parse_example(_enc_len(1, _enc_len(1, entry)))["n"] == [5, 9]
    fl = (_enc_tag(1, 5) + struct.pack("<f", 2.5)
          + _enc_tag(1, 5) + struct.pack("<f", -4.0))
    entry = _enc_len(1, b"f") + _enc_len(2, _enc_len(2, fl))
    assert parse_example(_enc_len(1, _enc_len(1, entry)))["f"] == \
        [2.5, -4.0]


def test_framing_offsets_and_corruption():
    recs = [encode_example({"x": i}) for i in range(5)] + [b""]
    shard = make_tfrecord(recs)
    ms = list(iter_tfrecord(shard))
    assert [m["record"] for m in ms] == recs
    assert sum(m["length"] for m in ms) == len(shard)
    for m in ms:  # frames re-parse standalone (the ranged contract)
        one = list(
            iter_tfrecord(shard[m["offset"]:m["offset"] + m["length"]])
        )
        assert len(one) == 1 and one[0]["record"] == m["record"]
    bad = bytearray(shard)
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        list(iter_tfrecord(bytes(bad)))
    with pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecord(shard[:-2]))


def test_read_write_roundtrip_distributed(spark, tmp_path):
    docs = spark.range(73).select(
        F.col("id"),
        F.concat(F.lit("caption "), F.col("id")).alias("caption"),
        (F.col("id") % 9).alias("label"),
        (F.col("id").cast("float") / 4).alias("score"),
    )
    shards = write_tfrecord(
        docs,
        {"caption": "bytes", "label": "int64", "score": "float"},
        n_shards=4,
    ).localCheckpoint()
    assert shards.count() <= 4
    back = read_tfrecord(
        spark, files_df=shards,
        features={"caption": "bytes", "label": "int64",
                  "score": "float"},
    )
    rows = back.collect()
    assert len(rows) == 73
    by_cap = {bytes(r.caption[0]): r for r in rows}
    r = by_cap[b"caption 17"]
    assert r.label == [8] and r.score == [4.25]
    # raw (index) shape: offsets + records, no spec needed
    idx = read_tfrecord(spark, files_df=shards)
    assert idx.columns == ["shard", "offset", "length", "record"]
    assert idx.count() == 73
    raw = {bytes(r.record) for r in idx.collect()}
    assert encode_example(
        {"caption": b"caption 17", "label": 8, "score": 4.25}
    ) in raw
    # plan: one task per shard, no Exchange before the walk
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0]


def test_corrupt_shard_posture(spark):
    good = make_tfrecord([encode_example({"x": 1})])
    bad = bytearray(good)
    bad[len(good) - 2] ^= 0xFF  # flip data CRC
    files = spark.createDataFrame(
        [("mem://good", bytearray(good)), ("mem://bad", bytes(bad))],
        "path string, content binary",
    )
    rows = read_tfrecord(spark, files_df=files).collect()
    marks = [r for r in rows if r.record is None]
    assert len(rows) == 2 and len(marks) == 1
    assert marks[0].shard == "mem://bad"
    with pytest.raises(Exception, match="CRC"):
        read_tfrecord(spark, files_df=files, on_error="raise").collect()


def test_verify_crc_off_reads_same(spark):
    shard = make_tfrecord(
        [encode_example({"x": i, "t": f"v{i}"}) for i in range(20)]
    )
    files = spark.createDataFrame(
        [("mem://s", bytearray(shard))], "path string, content binary"
    )
    spec = {"x": "int64", "t": "bytes"}
    a = sorted(
        (r.x[0], bytes(r.t[0]))
        for r in read_tfrecord(
            spark, files_df=files, features=spec
        ).collect()
    )
    b = sorted(
        (r.x[0], bytes(r.t[0]))
        for r in read_tfrecord(
            spark, files_df=files, features=spec, verify_crc=False
        ).collect()
    )
    assert a == b and len(a) == 20


def test_streaming_tfrecord_ingest_matches_batch(spark, tmp_path):
    """binaryFile readStream + foreachBatch through
    read_tfrecord(files_df=) — availableNow equals batch."""
    d = tmp_path / "tfr_stream"
    d.mkdir()
    for s in range(3):
        recs = [encode_example({"k": s * 10 + i}) for i in range(5)]
        (d / f"part-{s}.tfrecord").write_bytes(make_tfrecord(recs))
    spec = {"k": "int64"}
    batch = sorted(
        r.k[0]
        for r in read_tfrecord(spark, str(d), features=spec).collect()
    )
    got = []

    def sink(b, _bid):
        got.extend(
            r.k[0] for r in read_tfrecord(
                b.sparkSession, files_df=b.select("path", "content"),
                features=spec,
            ).collect()
        )

    q = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .load(str(d))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == batch and len(batch) == 15
