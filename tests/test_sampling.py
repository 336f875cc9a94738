"""Deterministic corpus splitting & sampling (operators/sampling.py).

Contract: assignments are pure functions of (seed, id) — reproducible
across runs and partition layouts — and the plans are map-side only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.sampling import (
    BUCKETS,
    hash_bucket,
    hash_sample,
    hash_split,
    stratified_sample,
)
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


def test_split_is_total_and_deterministic(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    assert out.count() == n
    assert out.filter(F.col("split").isNull()).count() == 0
    a = sorted((r.doc_id, r.split) for r in out.select("doc_id", "split").collect())
    b = sorted(
        (r.doc_id, r.split)
        for r in hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split")
        .collect()
    )
    assert a == b


def test_split_respects_weights(docs):
    out = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    # md5 buckets are uniform; 500 docs → allow generous tolerance
    assert counts["train"] / n == pytest.approx(0.9, abs=0.06)
    assert counts.get("val", 0) / n == pytest.approx(0.05, abs=0.04)
    assert counts.get("test", 0) / n == pytest.approx(0.05, abs=0.04)


def test_split_stable_under_repartition(docs):
    """The assignment must not depend on partition layout (the df.sample
    failure mode this operator exists to avoid)."""
    base = {r.doc_id: r.split for r in hash_split(docs).select("doc_id", "split").collect()}
    shuffled = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(17)).select("doc_id", "split").collect()
    }
    assert base == shuffled


def test_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, {"a": 0.5, "b": 0.1})


def test_sample_fraction_and_nesting(docs):
    n = docs.count()
    s10 = hash_sample(docs, 0.1)
    s30 = hash_sample(docs, 0.3)
    assert s10.count() / n == pytest.approx(0.1, abs=0.05)
    assert s30.count() / n == pytest.approx(0.3, abs=0.06)
    ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
    ids30 = {r.doc_id for r in s30.select("doc_id").collect()}
    assert ids10 <= ids30  # cutoff sampling nests by construction
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == n
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_seed_changes_selection(docs):
    a = {r.doc_id for r in hash_sample(docs, 0.2, seed=1).select("doc_id").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.2, seed=2).select("doc_id").collect()}
    assert a != b


def test_stratified_rates_and_default(docs):
    per_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = stratified_sample(docs, {"en": 0.25}, strata_col="lang", default_fraction=1.0)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["en"] / per_lang["en"] == pytest.approx(0.25, abs=0.12)
    for lang, n in per_lang.items():
        if lang != "en":
            assert got[lang] == n  # default 1.0 keeps strata whole
    dropped = stratified_sample(docs, {"en": 1.0}, strata_col="lang")
    assert {r.lang for r in dropped.select("lang").distinct().collect()} == {"en"}
    with pytest.raises(ValueError, match="stratum"):
        stratified_sample(docs, {"en": 2.0})


def test_plans_are_map_side_only(docs):
    """No Exchange anywhere: split/sample are projections + filters that
    survive any scale-up without a shuffle."""
    for df in (
        hash_split(docs),
        hash_sample(docs, 0.25),
        stratified_sample(docs, {"en": 0.5}, default_fraction=0.1),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_bucket_matches_frozen_spec(spark):
    """Pin the hash spec itself: bucket = int(md5('<seed>:<id>')[:8], 16)
    % 10000 — the cross-engine contract the DuckDB oracles re-derive."""
    import hashlib

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    got = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id", hash_bucket(F.col("doc_id"), seed=42).alias("b")
        ).collect()
    }
    for i in range(100):
        want = int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:8], 16) % BUCKETS
        assert got[i] == want, i
