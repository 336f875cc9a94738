"""Sources/sinks: parquet reader quirks, binaryFile scan (S1), constraint
validators (§1.3), model registry (EP2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.io import (
    read_binary_files,
    read_table,
    register_views,
    validate_constraints,
    write_table,
)
from oracle_vectorsearch_example_spark.sources.registry import ModelRegistry

SF = "/root/testdata/sf0.001"


def test_events_ts_is_timestamp(spark):
    ev = read_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(F.col("ts").isNull()).count() == 0


def test_all_tables_read_canonical(spark):
    """Every test table reads to its canonical logical schema, whatever the
    physical parquet encoding of this test-data generation."""
    from oracle_vectorsearch_example_spark.schemas import CANONICAL_TEST_TABLES
    from oracle_vectorsearch_example_spark.sources.io import TABLES

    for name in TABLES:
        got = dict(read_table(spark, SF, name).dtypes)
        assert got == CANONICAL_TEST_TABLES[name], name


def test_normalize_coerces_ntz_parquet(spark, tmp_path):
    """A regenerated events.parquet carrying TIMESTAMP_NTZ must come back as
    TIMESTAMP with identical µs values (the round-2 regression)."""
    ev = read_table(spark, SF, "events")
    drifted = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    drifted.write.parquet(str(tmp_path / "events.parquet"))
    back = read_table(spark, str(tmp_path), "events")
    assert dict(back.dtypes)["ts"] == "timestamp"
    want = ev.select(F.sum(F.unix_micros("ts"))).collect()[0][0]
    got = back.select(F.sum(F.unix_micros("ts"))).collect()[0][0]
    assert got == want


def test_normalize_unknown_drift_fails_loudly(spark, tmp_path):
    """Un-coercible drift raises at read with the column named, instead of a
    DATATYPE_MISMATCH deep inside an operator."""
    ev = read_table(spark, SF, "events").limit(10)
    ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd")).write.parquet(
        str(tmp_path / "events.parquet")
    )
    with pytest.raises(ValueError, match="'ts'.*reads as 'string'"):
        read_table(spark, str(tmp_path), "events")


def test_normalize_missing_column_fails_loudly(spark, tmp_path):
    ev = read_table(spark, SF, "events").limit(10)
    ev.drop("value").write.parquet(str(tmp_path / "events.parquet"))
    with pytest.raises(ValueError, match="value"):
        read_table(spark, str(tmp_path), "events")


def test_register_views_sql_path(spark):
    register_views(spark, SF, ["region", "nation"])
    n = spark.sql(
        "SELECT count(*) AS n FROM region JOIN nation ON r_regionkey = n_regionkey"
    ).collect()[0].n
    assert n == 25


def test_binary_file_scan(spark):
    df = read_binary_files(spark, os.path.dirname(os.path.abspath(__file__)), "*.py")
    rows = df.select("path", "length", "content").collect()
    assert rows and all(r.length == len(r.content) for r in rows)


def test_validate_constraints(spark):
    li = read_table(spark, SF, "lineitem")
    orders = read_table(spark, SF, "orders")
    # the synthetic lineitem does NOT have a unique (orderkey, linenumber);
    # orders.o_orderkey is the clean PK and the FK target
    out = validate_constraints(
        orders,
        pk=["o_orderkey"],
        not_null=["o_custkey"],
    )
    assert out == {"pk_violations": 0, "null_o_custkey": 0}
    fk = validate_constraints(li, fk=(orders, ["l_orderkey"], ["o_orderkey"]))
    assert fk == {"fk_violations": 0}


def test_validate_constraints_catches_violations(spark):
    df = spark.createDataFrame([(1, None), (1, "x")], "id long, v string")
    out = validate_constraints(df, pk=["id"], not_null=["v"])
    assert out["pk_violations"] == 1 and out["null_v"] == 1


def test_write_table_partitioned(spark, tmp_path):
    df = read_table(spark, SF, "region")
    path = str(tmp_path / "region_by_key")
    write_table(df, path, partition_by=["r_regionkey"])
    back = spark.read.parquet(path)
    assert back.count() == 5
    assert any("r_regionkey=" in d for d in os.listdir(path))


def test_model_registry_lifecycle(tmp_path):
    wh = str(tmp_path / "wh")
    model = tmp_path / "m.onnx"
    model.write_bytes(b"fake-onnx")
    reg = ModelRegistry(wh)
    assert reg.list_models() == []
    assert reg.load("minilm", str(model), model_id="m1", dim=384)
    assert not reg.load("minilm", str(model))          # skip when loaded
    assert reg.load("minilm", str(model), model_id="m1", dim=384, force=True)
    assert reg.list_models() == ["minilm"] and reg.is_loaded("minilm")
    e = reg.get("minilm")
    assert e.dim == 384 and os.path.exists(e.file_path)
    assert reg.orphans({"other"}) == ["minilm"]
    assert reg.drop("minilm")
    assert not reg.drop("minilm")
    assert reg.list_models() == []


def test_models_cli_roundtrip(tmp_path, capsys):
    """EP2 CLI parity: load [id] [--force] / list / drop / orphans."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from models_cli import main

    wh = str(tmp_path / "wh")
    f1, f2 = tmp_path / "a.onnx", tmp_path / "b.onnx"
    f1.write_bytes(b"model-a")
    f2.write_bytes(b"model-b")
    cfg = tmp_path / "models.json"
    cfg.write_text(json.dumps([
        {"id": "a", "name": "A", "db_model_name": "MODEL_A", "file": str(f1), "dim": 8},
        {"id": "b", "name": "B", "db_model_name": "MODEL_B", "file": str(f2), "dim": 16},
    ]))

    assert main(["-w", wh, "load", "-c", str(cfg)]) == 0
    out = capsys.readouterr().out
    assert "2 loaded, 0 skipped" in out

    # re-load without force -> all skipped (load_models.py:161-167 semantics)
    assert main(["-w", wh, "load", "-c", str(cfg)]) == 0
    assert "0 loaded, 2 skipped" in capsys.readouterr().out

    assert main(["-w", wh, "list"]) == 0
    assert capsys.readouterr().out.split() == ["MODEL_A", "MODEL_B"]

    # single-id load with force
    assert main(["-w", wh, "load", "-c", str(cfg), "a", "--force"]) == 0
    assert "1 loaded" in capsys.readouterr().out

    # unknown id errors
    assert main(["-w", wh, "load", "-c", str(cfg), "zz"]) == 1

    # orphan = loaded but no longer configured (drop_models.py:120-126)
    cfg.write_text(json.dumps([
        {"id": "a", "name": "A", "db_model_name": "MODEL_A", "file": str(f1)},
    ]))
    assert main(["-w", wh, "orphans", "-c", str(cfg)]) == 0
    assert capsys.readouterr().out.split() == ["MODEL_B"]

    assert main(["-w", wh, "drop", "MODEL_B"]) == 0
    assert main(["-w", wh, "drop", "MODEL_B"]) == 1  # already gone
    capsys.readouterr()
    assert main(["-w", wh, "list"]) == 0
    assert capsys.readouterr().out.split() == ["MODEL_A"]


def test_download_model_zip_and_plain(tmp_path):
    """S10 download/extract (download_models.py:18-49 pattern) via file://
    URLs: zip archives extract only matching members, plain files copy."""
    import zipfile

    from oracle_vectorsearch_example_spark.sources.registry import download_model

    src = tmp_path / "src"
    src.mkdir()
    z = src / "bundle.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("nested/dir/model.onnx", b"onnx-bytes")
        zf.writestr("README.txt", b"skip me")
    dest = tmp_path / "out"
    got = download_model(z.as_uri(), str(dest))
    assert [p.split("/")[-1] for p in got] == ["model.onnx"]
    assert (dest / "model.onnx").read_bytes() == b"onnx-bytes"
    assert not (dest / "README.txt").exists()

    plain = src / "raw.onnx"
    plain.write_bytes(b"raw-model")
    got2 = download_model(plain.as_uri(), str(dest))
    assert (dest / "raw.onnx").read_bytes() == b"raw-model"
    assert got2 == [str(dest / "raw.onnx")]
