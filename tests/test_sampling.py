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
    mix_sources,
    repeat_epochs,
    source_seed,
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


def test_repeat_epochs_counts_and_nesting(docs):
    n = docs.count()
    # integer epochs: exact multiple, epochs 0..k-1 each complete
    two = repeat_epochs(docs, 2.0)
    assert two.count() == 2 * n
    assert {r.epoch for r in two.select("epoch").distinct().collect()} == {0, 1}
    # fractional tail ~ frac·n, and is EXACTLY hash_sample's row set
    mixed = repeat_epochs(docs, 1.25, seed=42)
    tail_ids = {
        r.doc_id for r in mixed.filter(F.col("epoch") == 1).collect()
    }
    sample_ids = {r.doc_id for r in hash_sample(docs, 0.25, seed=42).collect()}
    assert tail_ids == sample_ids
    assert mixed.filter(F.col("epoch") == 0).count() == n
    # zero epochs → empty, schema intact
    z = repeat_epochs(docs, 0.0)
    assert z.count() == 0 and "epoch" in z.columns
    with pytest.raises(ValueError, match="epochs"):
        repeat_epochs(docs, -1)


def test_repeat_epochs_deterministic_under_repartition(docs):
    def run(d):
        return sorted((r.doc_id, r.epoch) for r in repeat_epochs(d, 2.3).collect())

    assert run(docs.repartition(7)) == run(docs.coalesce(1))


def test_mix_sources_tags_and_weights(docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    mix = mix_sources({"wiki": (a, 2.0), "web": (b, 0.5)})
    per = {
        (r.source, r.epoch): r.n
        for r in mix.groupBy("source", "epoch").agg(F.count("*").alias("n")).collect()
    }
    na, nb = a.count(), b.count()
    assert per[("wiki", 0)] == na and per[("wiki", 1)] == na
    assert per[("web", 0)] == pytest.approx(nb * 0.5, abs=0.15 * nb)
    # per-source derived seeds decorrelate fractional draws on a shared
    # id space: same frame, same fraction, different sources
    m2 = mix_sources({"x": (b, 0.5), "y": (b, 0.5)})
    xs = {r.doc_id for r in m2.filter(F.col("source") == "x").collect()}
    ys = {r.doc_id for r in m2.filter(F.col("source") == "y").collect()}
    assert xs != ys
    assert source_seed(42, "x") != source_seed(42, "y")
    with pytest.raises(ValueError, match="at least one"):
        mix_sources({})


def test_mix_plan_is_shuffle_free(docs):
    mix = mix_sources({"a": (docs, 1.5), "b": (docs, 1.0)})
    plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_deterministic_shuffle(docs):
    from oracle_vectorsearch_example_spark.operators.sampling import (
        deterministic_shuffle,
    )

    a = [r.doc_id for r in deterministic_shuffle(docs.repartition(7)).collect()]
    b = [r.doc_id for r in deterministic_shuffle(docs.coalesce(1)).collect()]
    assert a == b                      # same order, any layout
    assert sorted(a) != a              # and it isn't the natural order
    c = [r.doc_id for r in deterministic_shuffle(docs, seed=7).collect()]
    assert c != a and sorted(c) == sorted(a)  # seed changes order only
    import hashlib

    want = sorted(
        (hashlib.md5(f"42:{i}".encode()).hexdigest(), i) for i in sorted(a)
    )
    assert a == [i for _, i in want]   # pinned to the frozen md5 spec


def test_group_sample_fixed_count(spark):
    """group_sample: exactly min(n, group size) rows per group, stable
    under repartition, monotone under corpus growth (bounded churn)."""
    import pytest
    from oracle_vectorsearch_example_spark.operators.sampling import group_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 20 else "b") for i in range(23)], "doc_id long, g string"
    )
    got = group_sample(df, 5, "g")
    counts = {r["g"]: r["n"] for r in got.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 3}  # b has only 3 members
    # layout independence
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, group_sample(df.repartition(7), 5, "g").collect()))
    assert a == b
    # growth: adding rows only evicts by hash order; the n=5 sample of
    # the grown group is the 5 smallest hashes of the union
    grown = df.unionByName(
        spark.createDataFrame([(100 + i, "a") for i in range(10)], "doc_id long, g string")
    )
    s_old = {r["doc_id"] for r in group_sample(df, 5, "g").filter("g = 'a'").collect()}
    s_new = {r["doc_id"] for r in group_sample(grown, 5, "g").filter("g = 'a'").collect()}
    # every survivor of the old sample that is still in the new sample
    # kept its membership for the same reason (hash order) — and the
    # new sample still has exactly 5
    assert len(s_new) == 5
    assert len(s_old & s_new) >= 1
    with pytest.raises(ValueError, match="n must be"):
        group_sample(df, 0, "g")


def test_temperature_multipliers(spark):
    """XLM-R temperature sampling (r10): alpha < 1 upsamples the small
    source; alpha = 1 reproduces natural proportions (all multipliers
    1.0 at total=N); the mixture totals the requested budget through
    mix_sources' epoch arithmetic."""
    from oracle_vectorsearch_example_spark.operators.sampling import (
        mix_sources,
        temperature_multipliers,
    )

    sizes = {"big": 9000, "small": 1000}
    nat = temperature_multipliers(sizes, alpha=1.0)
    assert nat["big"] == pytest.approx(1.0) and nat["small"] == pytest.approx(1.0)
    m = temperature_multipliers(sizes, alpha=0.3)
    # expected mixture size is conserved...
    assert sum(m[s] * sizes[s] for s in sizes) == pytest.approx(10_000)
    # ...while the small source is upsampled and the big one trimmed
    assert m["small"] > 1.0 > m["big"]
    # hand-check one share: q_small = .1^.3 / (.9^.3 + .1^.3)
    q_small = 0.1**0.3 / (0.9**0.3 + 0.1**0.3)
    assert m["small"] == pytest.approx(q_small * 10_000 / 1000)

    # composes with mix_sources: realized doc counts track q_s * T
    big = spark.range(900).select(F.col("id").alias("doc_id"))
    small = spark.range(900, 1000).select(F.col("id").alias("doc_id"))
    mm = temperature_multipliers({"big": 900, "small": 100}, alpha=0.3)
    mixed = mix_sources({"big": (big, mm["big"]), "small": (small, mm["small"])})
    counts = {r.source: r.n for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    q_small2 = 0.1**0.3 / (0.9**0.3 + 0.1**0.3)
    assert counts["small"] == pytest.approx(q_small2 * 1000, abs=12)
    assert counts["big"] == pytest.approx((1 - q_small2) * 1000, abs=12)

    with pytest.raises(ValueError, match="alpha"):
        temperature_multipliers(sizes, alpha=0.0)
    with pytest.raises(ValueError, match="positive"):
        temperature_multipliers({"x": 0})
