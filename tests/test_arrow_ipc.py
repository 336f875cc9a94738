"""Arrow IPC source/sink (r14): file + stream dialects, write→read
roundtrip, driver-side schema resolution, loud schema-drift failure,
corrupt-shard posture, and the HF-datasets-cache-style read."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.arrow_ipc import (
    arrow_ipc_schema,
    read_arrow_ipc,
    write_arrow_ipc,
)


def _shard(tbl, stream=False):
    sink = io.BytesIO()
    opener = pa.ipc.new_stream if stream else pa.ipc.new_file
    with opener(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue()


@pytest.mark.parametrize("stream", [False, True])
def test_read_both_dialects(spark, tmp_path, stream):
    d = tmp_path / "arrow"
    d.mkdir()
    for s in range(3):
        tbl = pa.table({
            "id": [s * 10 + i for i in range(10)],
            "text": [f"doc {s}/{i}" for i in range(10)],
            "emb": [[float(i), float(s)] for i in range(10)],
        })
        (d / f"part-{s}.arrow").write_bytes(_shard(tbl, stream))
    df = read_arrow_ipc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 30
    assert df.columns == ["shard", "id", "text", "emb"]
    r = next(r for r in rows if r.id == 12)
    assert r.text == "doc 1/2" and r.emb == [2.0, 1.0]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0]


def test_write_read_roundtrip(spark):
    docs = spark.range(57).select(
        F.col("id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.array(F.col("id").cast("double"),
                (F.col("id") * 2).cast("double")).alias("v"),
    )
    shards = write_arrow_ipc(docs, n_shards=4).localCheckpoint()
    assert shards.count() <= 4
    p = shards.first()
    assert p.path.endswith(".arrow")
    assert arrow_ipc_schema(bytes(p.content)).names == ["id", "text", "v"]
    back = read_arrow_ipc(spark, files_df=shards)
    got = {r.id: (r.text, r.v) for r in back.collect()}
    assert len(got) == 57 and got[13] == ("t13", [13.0, 26.0])
    # stream dialect roundtrip
    s2 = write_arrow_ipc(docs, n_shards=2, stream=True)
    back2 = read_arrow_ipc(spark, files_df=s2)
    assert {r.id for r in back2.collect()} == set(range(57))


def test_schema_drift_fails_loudly(spark):
    a = pa.table({"id": [1, 2], "text": ["a", "b"]})
    b = pa.table({"id": [3, 4], "body": ["c", "d"]})  # renamed column
    files = spark.createDataFrame(
        [("mem://a.arrow", bytearray(_shard(a))),
         ("mem://b.arrow", bytearray(_shard(b)))],
        "path string, content binary",
    )
    with pytest.raises(Exception, match="does not match"):
        read_arrow_ipc(spark, files_df=files).collect()


def test_corrupt_shard_posture(spark):
    good = pa.table({"id": [1], "text": ["x"]})
    files = spark.createDataFrame(
        [("mem://good.arrow", bytearray(_shard(good))),
         ("mem://bad.arrow", bytearray(b"ARROW1\x00\x00garbage"))],
        "path string, content binary",
    )
    rows = read_arrow_ipc(spark, files_df=files).collect()
    marks = [r for r in rows if r.id is None]
    assert len(rows) == 2 and len(marks) == 1
    assert marks[0].shard == "mem://bad.arrow"
    with pytest.raises(Exception):
        read_arrow_ipc(
            spark, files_df=files, on_error="raise"
        ).collect()


def test_corpus_from_arrow_composition(spark):
    """Arrow shards (the HF cache shape) → curated corpus in one
    call: exact-duplicate texts collapse, ids stay the dataset's own
    when given."""
    import numpy as np

    from oracle_vectorsearch_example_spark.plans.corpus import (
        corpus_from_arrow,
    )

    vocab = ("amber basalt cedar dynamo ember fjord garnet harbor "
             "iris jasper").split()

    def body(seed):
        r = np.random.default_rng(seed)
        return " ".join(
            vocab[r.integers(len(vocab))] + str(r.integers(10000))
            for _ in range(25)
        )

    rows = []
    for i in range(40):
        src = i - 1 if i % 8 == 7 else i  # every 8th mirrors previous
        rows.append({"rid": i, "text": body(src)})
    tbl = pa.table({
        "rid": [r["rid"] for r in rows],
        "text": [r["text"] for r in rows],
    })
    files = spark.createDataFrame(
        [("mem://ds-00000.arrow", bytearray(_shard(tbl)))],
        "path string, content binary",
    )
    out = corpus_from_arrow(
        spark, files_df=files, id_col="rid", split_weights=None,
    )
    kept = sorted(r.doc_id for r in out["documents"].collect())
    assert kept == [i for i in range(40) if i % 8 != 7]
