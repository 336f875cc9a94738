"""Sequence packing (operators/packing.py): the concat-and-chunk training
layout. Invariants pinned here; the exact arithmetic is oracle-checked by
the ``pack_sequences`` golden query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.textstats import ws_token_count
from oracle_vectorsearch_example_spark.operators.packing import pack_sequences
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"
L = 128


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def packed(docs):
    return pack_sequences(docs, max_tokens=L, n_shards=4).cache()


def test_no_token_lost_or_invented(docs, packed):
    total_in = docs.select(F.sum(ws_token_count(F.col("text")))).collect()[0][0]
    total_out = packed.select(F.sum("n_tokens")).collect()[0][0]
    assert total_out == total_in


def test_every_pack_full_except_trailing(packed):
    """Concat-and-chunk guarantee: within a shard every pack is exactly L
    tokens except the last one."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("fill")
    )
    last = per_pack.groupBy("shard").agg(F.max("pack_id").alias("last_pack"))
    full = per_pack.join(last, "shard").filter(F.col("pack_id") < F.col("last_pack"))
    bad = full.filter(F.col("fill") != L).count()
    assert bad == 0
    assert per_pack.filter(F.col("fill") > L).count() == 0


def test_segments_tile_each_pack(packed):
    """Within a pack, segments are disjoint and contiguous from offset 0."""
    rows = packed.filter((F.col("shard") == 0)).collect()
    by_pack: dict[int, list] = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append((r.pack_offset, r.n_tokens))
    for pid, segs in by_pack.items():
        segs.sort()
        pos = 0
        for off, n in segs:
            assert off == pos, (pid, segs)
            pos = off + n
        assert pos <= L


def test_spanning_docs_split_consistently(spark):
    """A doc longer than L must appear in consecutive packs, offsets 0 in
    the follow-up packs, token counts summing to its length."""
    rows = [(i, " ".join(["w"] * n)) for i, n in [(1, 50), (2, 300), (3, 10)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=L, n_shards=1).collect()
    segs = sorted((r.pack_id, r.pack_offset, r.n_tokens) for r in out if r.doc_id == 2)
    assert sum(s[2] for s in segs) == 300
    assert len(segs) >= 2
    for (p0, _, _), (p1, o1, _) in zip(segs, segs[1:]):
        assert p1 == p0 + 1 and o1 == 0


def test_determinism_and_shard_stability(docs):
    a = sorted(map(tuple, pack_sequences(docs, max_tokens=L, n_shards=4).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(13), max_tokens=L, n_shards=4).collect())
    )
    assert a == b


def test_rejects_bad_max_tokens(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, max_tokens=0)


def test_plan_is_one_shuffle(docs):
    """The packing plan pays exactly ONE Exchange (the per-shard window
    cumsum); token counting, span explode, and offset math are all
    map-side around it."""
    # params differ from the cached `packed` fixture so the cache can't
    # substitute an InMemoryTableScan for the real plan
    plan = (
        pack_sequences(docs, max_tokens=64, n_shards=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
