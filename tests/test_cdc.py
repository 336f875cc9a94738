"""§2.10 × S12 streaming CDC apply: micro-batch MERGE into the
Warehouse — batch-twin equality, within-batch last-change reduction,
op-column deletes, and replay idempotence (the exactly-once argument)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.txn import Warehouse, merge_rows
from oracle_vectorsearch_example_spark.streaming.cdc import (
    apply_changes_sink,
    latest_change_per_key,
)

SCHEMA = "id long, name string, bal double, seq long, op string"


def _write_changes(spark, path):
    """Two parquet files = two availableNow micro-batches (file order by
    name), with multi-change keys and a delete."""
    b1 = spark.createDataFrame(
        [
            (1, "a", 10.0, 1, "U"),
            (2, "b", 20.0, 2, "U"),
            (2, "b2", 22.0, 3, "U"),  # same key twice in one batch
            (3, "c", 30.0, 4, "U"),
        ],
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            (1, "a2", 11.0, 5, "U"),
            (3, None, 0.0, 6, "D"),  # delete key 3
            (4, "d", 40.0, 7, "U"),
        ],
        SCHEMA,
    )
    b1.coalesce(1).write.parquet(f"{path}/batch=0")
    b2.coalesce(1).write.parquet(f"{path}/batch=1")


def _run(spark, changes_dir, wh_root, ckpt):
    static = spark.read.parquet(f"{changes_dir}/batch=0")
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{changes_dir}/batch=*")
    )
    q = (
        apply_changes_sink(
            stream, wh_root, "t", ["id"], sequence_col="seq", op_col="op"
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_latest_change_per_key(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0, 1, "U"), (1, "y", 2.0, 3, "U"), (1, "z", 3.0, 2, "U")],
        SCHEMA,
    )
    got = latest_change_per_key(df, ["id"], "seq").collect()
    assert len(got) == 1 and got[0]["name"] == "y"
    # ties on seq stay deterministic (ordered by remaining columns)
    tie = spark.createDataFrame(
        [(1, "p", 1.0, 9, "U"), (1, "q", 2.0, 9, "U")], SCHEMA
    )
    a = latest_change_per_key(tie, ["id"], "seq").collect()
    b = latest_change_per_key(tie.repartition(5), ["id"], "seq").collect()
    assert a == b


def test_stream_matches_sequential_merges(spark, tmp_path):
    changes = str(tmp_path / "changes")
    _write_changes(spark, changes)
    _run(spark, changes, str(tmp_path / "wh"), str(tmp_path / "ckpt"))
    wh = Warehouse(spark, str(tmp_path / "wh"))
    got = sorted(map(tuple, wh.read("t").collect()))
    # batch twin: apply the same two batches through merge_rows by hand
    # (the sink strips op — the change descriptor — and keeps seq)
    state = latest_change_per_key(
        spark.read.parquet(f"{changes}/batch=0"), ["id"], "seq"
    ).drop("op")  # fresh table = inserts
    b2 = latest_change_per_key(
        spark.read.parquet(f"{changes}/batch=1"), ["id"], "seq"
    )
    ups = b2.filter(F.col("op") != "D").drop("op")
    dels = b2.filter(F.col("op") == "D").drop("op")
    state = merge_rows(state, ups, ["id"])
    state = merge_rows(state, dels, ["id"], when_matched="delete", insert_unmatched=False)
    want = sorted(map(tuple, state.collect()))
    assert got == want
    assert got == [
        (1, "a2", 11.0, 5),
        (2, "b2", 22.0, 3),
        (4, "d", 40.0, 7),
    ]


def test_replay_idempotent(spark, tmp_path):
    """Re-running the whole stream with a FRESH checkpoint (the
    worst-case replay: every batch re-applied) leaves the table
    byte-identical — the exactly-once argument."""
    changes = str(tmp_path / "changes")
    _write_changes(spark, changes)
    wh_root = str(tmp_path / "wh")
    _run(spark, changes, wh_root, str(tmp_path / "ckpt1"))
    wh = Warehouse(spark, wh_root)
    before = sorted(map(tuple, wh.read("t").collect()))
    v_before = wh.current_version()
    _run(spark, changes, wh_root, str(tmp_path / "ckpt2"))
    after = sorted(map(tuple, wh.read("t").collect()))
    assert after == before
    assert wh.current_version() > v_before  # versions advance, rows don't


def test_null_op_upserts(spark, tmp_path):
    """A NULL op must not vanish: `op != 'D'` and `op == 'D'` are both
    NULL-false, so a naive split drops the row from BOTH sides. The sink
    routes NULL ops to the upsert side (malformed feeds must not lose
    data silently)."""
    changes = str(tmp_path / "changes")
    b1 = spark.createDataFrame(
        [(1, "a", 10.0, 1, "U"), (2, "b", 20.0, 2, None)], SCHEMA
    )
    b1.coalesce(1).write.parquet(f"{changes}/batch=0")
    _run(spark, changes, str(tmp_path / "wh"), str(tmp_path / "ckpt"))
    wh = Warehouse(spark, str(tmp_path / "wh"))
    got = sorted(map(tuple, wh.read("t").collect()))
    assert got == [(1, "a", 10.0, 1), (2, "b", 20.0, 2)]


def test_upsert_only_without_op_col(spark, tmp_path):
    changes = str(tmp_path / "changes")
    _write_changes(spark, changes)
    static = spark.read.parquet(f"{changes}/batch=0")
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{changes}/batch=*")
    )
    q = (
        apply_changes_sink(
            stream.drop("op"), str(tmp_path / "wh"), "t", ["id"], sequence_col="seq"
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    got = sorted(map(tuple, wh.read("t").collect()))
    # key 3's "delete" row upserts instead (op column was dropped by the
    # caller, so it is just a row); seq stays in the table
    assert (3, None, 0.0, 6) in got and len(got) == 4
