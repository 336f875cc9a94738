"""X40 bloom-filter runtime join pruning: frozen-spec parity vs an
independent Python reference, the no-false-negative guarantee, exact
equality of the pruned joins vs naive joins under BOTH hash functions,
layout independence, and the no-UDF / no-probe-shuffle plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.bloom import (
    BloomFilter,
    bloom_anti_join,
    bloom_build,
    bloom_semi_join,
    bloom_words_df,
    bloom_words_row,
    py_bloom_words,
)

M = 1 << 12  # small filter so tests exercise real collisions
K = 5


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.range(0, 2000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("tag")
    )
    build = spark.range(0, 3000, 3).select(F.col("id").alias("bkey"))
    return probe, build


def test_words_match_python_reference(spark):
    keys = [0, 1, 17, 999, 123456]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    got = {
        r["word_idx"]: r["word"]
        for r in bloom_words_df(df, "key", m_bits=M, k=K, hash="md5").collect()
    }
    assert got == py_bloom_words(keys, m_bits=M, k=K)


def test_words_row_densifies_sparse_words(spark):
    keys = [0, 1, 17, 999, 123456]
    df = spark.createDataFrame([(k,) for k in keys], "key long")
    [row] = bloom_words_row(df, "key", m_bits=M, k=K, hash="md5").collect()
    dense = row[0]
    assert len(dense) == M // 32
    ref = py_bloom_words(keys, m_bits=M, k=K)
    for idx, w in enumerate(dense):
        assert w == ref.get(idx, 0)


@pytest.mark.parametrize("hash", ["md5", "xx"])
def test_no_false_negatives(spark, frames, hash):
    _, build = frames
    bf = bloom_build(build, "bkey", m_bits=M, k=K, hash=hash)
    members = build.select(F.col("bkey").alias("key"))
    n = members.count()
    assert members.filter(bf.might_contain(F.col("key"))).count() == n


def test_fpp_bounded(spark, frames):
    _, build = frames
    bf = bloom_build(build, "bkey", m_bits=M, k=K)
    # definite non-members: ids way outside the build range
    non = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("key"))
    fp = non.filter(bf.might_contain(F.col("key"))).count() / 10_000
    # m=4096 bits over 1000 keys -> ~4.1 bits/key; theory fpp ~0.1; the
    # observed-load estimate should be in the same regime and the
    # measured rate close to it
    assert fp < 0.35
    assert abs(fp - bf.fpp_estimate()) < 0.1


@pytest.mark.parametrize("hash", ["md5", "xx"])
def test_semi_and_anti_equal_exact(spark, frames, hash):
    probe, build = frames
    exact_semi = probe.join(
        build.select(F.col("bkey").alias("key")), on="key", how="left_semi"
    )
    exact_anti = probe.join(
        build.select(F.col("bkey").alias("key")), on="key", how="left_anti"
    )
    got_semi = bloom_semi_join(probe, build, "key", "bkey", m_bits=M, k=K, hash=hash)
    got_anti = bloom_anti_join(probe, build, "key", "bkey", m_bits=M, k=K, hash=hash)
    assert sorted(map(tuple, got_semi.collect())) == sorted(
        map(tuple, exact_semi.collect())
    )
    assert sorted(map(tuple, got_anti.collect())) == sorted(
        map(tuple, exact_anti.collect())
    )
    # partition: the two branches tile the probe side exactly
    assert got_semi.count() + got_anti.count() == probe.count()


def test_repartition_determinism(spark, frames):
    _, build = frames
    a = bloom_build(build, "bkey", m_bits=M, k=K).words
    b = bloom_build(build.repartition(7), "bkey", m_bits=M, k=K).words
    assert a == b


def test_empty_build_side(spark, frames):
    probe, build = frames
    empty = build.filter(F.lit(False))
    assert bloom_semi_join(probe, empty, "key", "bkey", m_bits=M, k=K).count() == 0
    assert (
        bloom_anti_join(probe, empty, "key", "bkey", m_bits=M, k=K).count()
        == probe.count()
    )


def test_fast_path_plan_no_probe_shuffle(spark, frames):
    """The bloom-negative branch: broadcast of the one-row word frame is
    allowed; a shuffle of the probe side is not, and no Python UDF
    anywhere."""
    probe, build = frames
    from oracle_vectorsearch_example_spark.operators.bloom import (
        _WORDS_COL,
        _contains,
        bloom_words_row,
    )

    wrow = bloom_words_row(build, "bkey", m_bits=M, k=K)
    fast = (
        probe.join(F.broadcast(wrow))
        .filter(~_contains(F.col(_WORDS_COL), F.col("key"), M, K, 42, "xx"))
        .drop(_WORDS_COL)
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only permitted shuffle is the tiny words aggregate (keyed on
    # word_idx, <= m/32 rows) inside the broadcast subtree — the probe
    # side itself must not exchange
    import re

    shuffle_keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert all(k == "word_idx" for k in shuffle_keys), shuffle_keys
    assert "Exchange rangepartitioning" not in plan


def test_string_keys(spark):
    probe = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",)], "key string"
    )
    build = spark.createDataFrame([("beta",), ("delta",), ("zeta",)], "key string")
    got = bloom_anti_join(probe, build, "key", m_bits=M, k=K)
    assert sorted(r["key"] for r in got.collect()) == ["alpha", "gamma"]


def test_broadcast_strategy_equals_split(spark, frames):
    probe, build = frames
    exact = probe.join(
        build.select(F.col("bkey").alias("key")), on="key", how="left_anti"
    )
    got = bloom_anti_join(
        probe, build, "key", "bkey", m_bits=M, k=K, strategy="broadcast"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))
    with pytest.raises(ValueError, match="unknown strategy"):
        bloom_anti_join(probe, build, "key", "bkey", strategy="bogus")


def test_prebuilt_words_row(spark, frames):
    """A prebuilt (checkpointed) filter frame gives identical results to
    the inline build — the build-once / probe-many contract."""
    probe, build = frames
    wrow = bloom_words_row(build, "bkey", m_bits=M, k=K).localCheckpoint()
    for strategy in ("split", "broadcast"):
        got = bloom_anti_join(
            probe, build, "key", "bkey", m_bits=M, k=K,
            words_row=wrow, strategy=strategy,
        )
        ref = bloom_anti_join(
            probe, build, "key", "bkey", m_bits=M, k=K, strategy=strategy
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_null_probe_keys_survive_anti(spark):
    """left_anti never matches a null key, so null-key probe rows must
    appear in the result — under both strategies."""
    probe = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "key string"
    )
    build = spark.createDataFrame([("b",), ("c",)], "key string")
    for strategy in ("split", "broadcast"):
        got = bloom_anti_join(probe, build, "key", m_bits=M, k=K, strategy=strategy)
        assert sorted(
            (r["key"] or "~null") for r in got.collect()
        ) == ["a", "~null", "~null"]


def test_word_count_validation():
    with pytest.raises(ValueError, match="expected"):
        BloomFilter([0] * 3, m_bits=M, k=K, seed=42)


def test_unknown_hash_rejected(spark, frames):
    probe, build = frames
    with pytest.raises(ValueError, match="unknown hash"):
        bloom_anti_join(probe, build, "key", "bkey", hash="sha9000").collect()
