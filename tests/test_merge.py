"""S12 MERGE: ANSI/Oracle MERGE semantics as a pure DataFrame op
(merge_rows) and as an atomic Warehouse operation (Warehouse.merge) —
update/delete/insert paths, the ORA-30926 unstable-row guard, time
travel across merges, create-on-merge, and layout determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.txn import Warehouse, merge_rows


@pytest.fixture()
def frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(2, "b2", 22.0), (4, "d", 40.0)],
        "id long, name string, bal double",
    )
    return target, source


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_upsert(spark, frames):
    target, source = frames
    got = merge_rows(target, source, ["id"])
    assert _rows(got) == [
        (1, "a", 10.0),
        (2, "b2", 22.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]


def test_update_only_no_insert(spark, frames):
    target, source = frames
    got = merge_rows(target, source, ["id"], insert_unmatched=False)
    assert _rows(got) == [(1, "a", 10.0), (2, "b2", 22.0), (3, "c", 30.0)]


def test_delete_matched(spark, frames):
    target, source = frames
    got = merge_rows(target, source, ["id"], when_matched="delete")
    assert _rows(got) == [(1, "a", 10.0), (3, "c", 30.0), (4, "d", 40.0)]
    got2 = merge_rows(
        target, source, ["id"], when_matched="delete", insert_unmatched=False
    )
    assert _rows(got2) == [(1, "a", 10.0), (3, "c", 30.0)]


def test_composite_key(spark):
    t = spark.createDataFrame([(1, "x", 1.0), (1, "y", 2.0)], "a long, b string, v double")
    s = spark.createDataFrame([(1, "y", 9.0), (2, "z", 3.0)], "a long, b string, v double")
    got = merge_rows(t, s, ["a", "b"])
    assert _rows(got) == [(1, "x", 1.0), (1, "y", 9.0), (2, "z", 3.0)]


def test_duplicate_source_keys_rejected(spark, frames):
    target, _ = frames
    dup = spark.createDataFrame(
        [(2, "p", 1.0), (2, "q", 2.0)], "id long, name string, bal double"
    )
    with pytest.raises(ValueError, match="stable set of rows"):
        merge_rows(target, dup, ["id"])
    # explicit opt-out keeps both rows (documented risk)
    got = merge_rows(target, dup, ["id"], check_unique_source=False)
    assert len(got.collect()) == 4  # 1,3 pass-through + both source rows


def test_bad_args_rejected(spark, frames):
    target, source = frames
    with pytest.raises(ValueError, match="when_matched"):
        merge_rows(target, source, ["id"], when_matched="upsert")
    with pytest.raises(ValueError, match="non-empty"):
        merge_rows(target, source, [])
    with pytest.raises(ValueError, match="missing"):
        merge_rows(target, source, ["nope"])


def test_repartition_determinism(spark, frames):
    target, source = frames
    a = _rows(merge_rows(target, source, ["id"]))
    b = _rows(merge_rows(target.repartition(7), source.repartition(3), ["id"]))
    assert a == b


def test_warehouse_merge_atomic_versions(spark, frames, tmp_path):
    target, source = frames
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v1 = wh.commit({"t": target})
    v2 = wh.merge("t", source, ["id"])
    assert v2 == v1 + 1
    assert _rows(wh.read("t")) == [
        (1, "a", 10.0),
        (2, "b2", 22.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
    ]
    # time travel: the pre-merge snapshot is intact
    assert _rows(wh.read("t", version=v1)) == _rows(target)
    # second merge (delete mode) stacks another version
    v3 = wh.merge("t", source, ["id"], when_matched="delete", insert_unmatched=False)
    assert v3 == v2 + 1
    assert _rows(wh.read("t")) == [(1, "a", 10.0), (3, "c", 30.0)]
    assert _rows(wh.read("t", version=v2))[1] == (2, "b2", 22.0)


def test_warehouse_merge_creates_missing_table(spark, frames, tmp_path):
    target, source = frames
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.commit({"other": target})
    wh.merge("fresh", source, ["id"])
    assert _rows(wh.read("fresh")) == _rows(source)
    with pytest.raises(KeyError, match="insert_unmatched"):
        wh.merge("missing", source, ["id"], insert_unmatched=False)


def test_warehouse_merge_dup_guard_on_create(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    dup = spark.createDataFrame(
        [(2, "p", 1.0), (2, "q", 2.0)], "id long, name string, bal double"
    )
    with pytest.raises(ValueError, match="stable set of rows"):
        wh.merge("t", dup, ["id"])


def test_schema_evolution(spark, frames):
    """Delta mergeSchema semantics: new source columns widen the output
    (pass-through rows read NULL); without the flag, loud rejection."""
    target, _ = frames
    src = spark.createDataFrame(
        [(2, "b2", 22.0, "eu"), (4, "d", 40.0, "us")],
        "id long, name string, bal double, region string",
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        merge_rows(target, src, ["id"])
    got = merge_rows(target, src, ["id"], schema_evolution=True)
    assert got.columns == ["id", "name", "bal", "region"]
    rows = {r["id"]: r["region"] for r in got.collect()}
    assert rows == {1: None, 2: "eu", 3: None, 4: "us"}


def test_schema_evolution_through_warehouse(spark, frames, tmp_path):
    target, _ = frames
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.commit({"t": target})
    src = spark.createDataFrame(
        [(1, "a2", 11.0, True)], "id long, name string, bal double, vip boolean"
    )
    with pytest.raises(ValueError, match="schema_evolution"):
        wh.merge("t", src, ["id"])
    wh.merge("t", src, ["id"], schema_evolution=True)
    got = {r["id"]: (r["name"], r["vip"]) for r in wh.read("t").collect()}
    assert got == {1: ("a2", True), 2: ("b", None), 3: ("c", None)}
