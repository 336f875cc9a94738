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


# ------------------------------------------------------ BFD no-split packing
@pytest.fixture(scope="module")
def bfd(docs):
    from oracle_vectorsearch_example_spark.operators.packing import (
        pack_sequences_bfd,
    )

    return pack_sequences_bfd(docs, max_tokens=L, n_shards=4).cache()


def test_bfd_no_doc_splits_and_none_lost(docs, bfd):
    """Exactly one row per non-empty doc; token counts pass through."""
    n_docs = docs.filter(ws_token_count(F.col("text")) > 0).count()
    assert bfd.count() == n_docs
    assert bfd.select("doc_id").distinct().count() == n_docs
    total_in = docs.select(F.sum(ws_token_count(F.col("text")))).collect()[0][0]
    assert bfd.select(F.sum("n_tokens")).collect()[0][0] == total_in


def test_bfd_no_pack_overflows_and_offsets_tile(bfd):
    rows = bfd.collect()
    packs: dict[tuple, list] = {}
    for r in rows:
        packs.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for key, members in packs.items():
        total = sum(r["n_tokens"] for r in members)
        assert total <= L, (key, total)
        # insertion-order offsets tile the used prefix exactly
        segs = sorted((r["pack_offset"], r["n_tokens"]) for r in members)
        pos = 0
        for off, n in segs:
            assert off == pos, (key, segs)
            pos += n


def test_bfd_matches_python_reference(spark):
    """The frozen BFD spec replayed independently in python."""
    import bisect

    from oracle_vectorsearch_example_spark.operators.packing import (
        pack_sequences_bfd,
    )
    from oracle_vectorsearch_example_spark.operators.sampling import BUCKETS

    sizes = [60, 60, 50, 40, 30, 30, 20, 10, 10, 5, 127, 1, 64, 64]
    rows = [(i, "w " * sizes[i]) for i in range(len(sizes))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences_bfd(df, max_tokens=L, n_shards=2, seed=7).collect()
    }
    # python reference: same shard hash, same (tokens desc, id) order,
    # same best-fit tie-break
    import hashlib

    def bucket(i):
        h = int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:8], 16) % BUCKETS
        return h % 2

    shards: dict[int, list] = {}
    for i, s in enumerate(sizes):
        shards.setdefault(bucket(i), []).append((s, i))
    want = {}
    for sh, items in shards.items():
        bins, fills = [], {}
        for t, i in sorted(items, key=lambda r: (-r[0], r[1])):
            j = bisect.bisect_left(bins, (t, -1))
            if j < len(bins):
                rem, pid = bins.pop(j)
                rem -= t
            else:
                pid, rem = len(fills), L - t
            off = fills.get(pid, 0)
            fills[pid] = off + t
            bisect.insort(bins, (rem, pid))
            want[i] = (sh, pid, off)
    assert got == want


def test_bfd_overflow_policies(spark):
    from oracle_vectorsearch_example_spark.operators.packing import (
        pack_sequences_bfd,
    )

    df = spark.createDataFrame(
        [(1, "w " * 200), (2, "w " * 10)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="max_tokens"):
        pack_sequences_bfd(df, max_tokens=L).collect()
    trunc = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_sequences_bfd(df, max_tokens=L, overflow="truncate").collect()
    }
    assert trunc == {1: L, 2: 10}
    dropped = pack_sequences_bfd(df, max_tokens=L, overflow="drop")
    assert [r["doc_id"] for r in dropped.collect()] == [2]
    with pytest.raises(ValueError, match="overflow"):
        pack_sequences_bfd(df, overflow="maybe")


def test_bfd_layout_determinism(docs):
    from oracle_vectorsearch_example_spark.operators.packing import (
        pack_sequences_bfd,
    )

    a = sorted(map(tuple, pack_sequences_bfd(docs, max_tokens=L, n_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences_bfd(
                docs.repartition(13), max_tokens=L, n_shards=4
            ).collect(),
        )
    )
    assert a == b


def test_bfd_string_ids(spark):
    from oracle_vectorsearch_example_spark.operators.packing import (
        pack_sequences_bfd,
    )

    df = spark.createDataFrame(
        [("a", "w " * 10), ("b", "w " * 20)], "doc_id string, text string"
    )
    out = pack_sequences_bfd(df, max_tokens=L, n_shards=1)
    assert dict(out.dtypes)["doc_id"] == "string"
    assert sorted(r["doc_id"] for r in out.collect()) == ["a", "b"]
