"""Avro OCF source/sink (r14): zigzag spec table, header/metadata
grammar, both codecs, sync-marker corruption posture, the supported
schema subset's named rejections, and the distributed roundtrip. No
independent Avro implementation exists in this environment (fastavro/
avro absent) — verification is the spec-table pins + the hash-oracled
golden + the corruption/rejection contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.avro_ocf import (
    _zz_dec,
    _zz_enc,
    avro_schema_of,
    iter_avro,
    make_avro,
    read_avro,
    write_avro,
)

_SCHEMA = {"type": "record", "name": "doc", "fields": [
    {"name": "id", "type": "long"},
    {"name": "text", "type": ["null", "string"]},
    {"name": "score", "type": "double"},
    {"name": "emb", "type": {"type": "array", "items": "float"}},
]}


def _rows(n, base=0):
    return [{"id": base + i,
             "text": None if i % 5 == 4 else f"doc {base + i}",
             "score": (base + i) / 4,
             "emb": [float(base + i), 0.5]} for i in range(n)]


def test_zigzag_spec_table():
    for v, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                   (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                   (64, b"\x80\x01")]:
        assert _zz_enc(v) == enc
        assert _zz_dec(enc, 0)[0] == v


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_both_codecs(codec):
    rows = _rows(25)
    blob = make_avro(_SCHEMA, rows, codec=codec, objects_per_block=7)
    assert list(iter_avro(blob)) == rows
    assert avro_schema_of(blob)["name"] == "doc"
    assert blob == make_avro(
        _SCHEMA, rows, codec=codec, objects_per_block=7
    )  # deterministic


def test_corruption_and_subset_rejections():
    blob = bytearray(make_avro(_SCHEMA, _rows(20), objects_per_block=6))
    i = blob.find(bytes(range(16)), 40)  # second sync marker
    blob[i + 3] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        list(iter_avro(bytes(blob)))
    with pytest.raises(NotImplementedError, match="subset|union"):
        make_avro({"type": "record", "name": "r", "fields": [
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ]}, [])
    with pytest.raises(NotImplementedError, match="codec"):
        make_avro(_SCHEMA, [], codec="snappy")
    with pytest.raises(ValueError, match="magic"):
        list(iter_avro(b"NOPE" + b"\x00" * 32))


def test_read_write_roundtrip_distributed(spark, tmp_path):
    d = tmp_path / "avro"
    d.mkdir()
    for s in range(3):
        (d / f"part-{s}.avro").write_bytes(
            make_avro(_SCHEMA, _rows(10, base=s * 10), codec="deflate")
        )
    df = read_avro(spark, str(d))
    rows = df.collect()
    assert len(rows) == 30
    assert df.columns == ["shard", "id", "text", "score", "emb"]
    r = next(r for r in rows if r.id == 12)
    assert r.text == "doc 12" and r.score == 3.0 and r.emb == [12.0, 0.5]
    assert next(r for r in rows if r.id == 14).text is None
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0]

    # write side: schema derives from the DataFrame, nullables union
    docs = spark.range(41).select(
        F.col("id"),
        F.when(F.col("id") % 7 != 6,
               F.concat(F.lit("t"), F.col("id"))).alias("text"),
        (F.col("id").cast("double") / 2).alias("half"),
    )
    shards = write_avro(docs, n_shards=4).localCheckpoint()
    assert shards.count() <= 4
    sc = avro_schema_of(bytes(shards.first().content))
    assert [f["name"] for f in sc["fields"]] == ["id", "text", "half"]
    back = read_avro(spark, files_df=shards)
    got = {r.id: (r.text, r.half) for r in back.collect()}
    assert len(got) == 41
    assert got[15] == ("t15", 7.5) and got[16][0] == "t16"
    assert got[13][0] is None and got[27][0] is None  # % 7 == 6 rows


def test_corrupt_shard_and_drift_posture(spark):
    good = make_avro(_SCHEMA, _rows(3))
    other = make_avro({"type": "record", "name": "r", "fields": [
        {"name": "renamed", "type": "long"}]}, [{"renamed": 1}])
    files = spark.createDataFrame(
        [("mem://good.avro", bytearray(good)),
         ("mem://bad.avro", bytearray(b"Obj\x01garbage"))],
        "path string, content binary",
    )
    rows = read_avro(spark, files_df=files).collect()
    marks = [r for r in rows if r.id is None and r.text is None
             and r.score is None]
    assert len(marks) == 1 and marks[0].shard == "mem://bad.avro"
    files2 = spark.createDataFrame(
        [("mem://good.avro", bytearray(good)),
         ("mem://other.avro", bytearray(other))],
        "path string, content binary",
    )
    with pytest.raises(Exception, match="do not match"):
        read_avro(spark, files_df=files2).collect()
