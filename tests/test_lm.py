"""Bigram-LM perplexity gate (X29) — frozen-spec checks.

Hand-computed corpus (alpha = 0.5):
  train d0 "a b a c", d1 "a b b"
  c12: (a,b)=2 (b,a)=1 (a,c)=1 (b,b)=1;  c1: a=3 b=2;  V = 3 + 1 = 4
  score "a b c": -ln(2.5/5) - ln(0.5/4) = -ln(.5) - ln(.125)
                 → ppl = exp(nll/2) = 4.0
  score "a z"  : -ln(0.5/5) = -ln(.1) → ppl = 10.0 (OOV path)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.lm import (
    perplexity_df,
    perplexity_filter,
    train_bigram_lm,
)

TRAIN = [(0, "a b a c"), (1, "a b b")]


@pytest.fixture(scope="module")
def lm(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return train_bigram_lm(docs, alpha=0.5)


def test_trained_counts(lm):
    assert lm.vocab_size == 4.0
    bc = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    assert bc == {("a", "b"): 2.0, ("b", "a"): 1.0, ("a", "c"): 1.0, ("b", "b"): 1.0}
    cx = {r.w1: r.c1 for r in lm.contexts.collect()}
    assert cx == {"a": 3.0, "b": 2.0}


def test_hand_computed_perplexity(spark, lm):
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "a z")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in perplexity_df(docs, lm).collect()}
    assert rows[10].n_bigrams == 2 and rows[10].ppl == pytest.approx(4.0, abs=1e-3)
    assert rows[11].n_bigrams == 1 and rows[11].ppl == pytest.approx(10.0, abs=1e-3)


def test_addk_distribution_sums_to_one(lm):
    """For any seen context, Sigma P(w|ctx) over vocab + the OOV slot
    must be exactly 1 — the property the derived context counts buy."""
    a, v = lm.alpha, lm.vocab_size
    bc = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    cx = {r.w1: r.c1 for r in lm.contexts.collect()}
    for ctx in cx:
        vocab = {"a", "b", "c", "__oov__"}
        total = sum(
            (bc.get((ctx, w), 0.0) + a) / (cx[ctx] + a * v) for w in vocab
        )
        assert total == pytest.approx(1.0, abs=1e-12)


def test_short_docs_drop_out(spark, lm):
    docs = spark.createDataFrame(
        [(20, "a"), (21, ""), (22, "a b")], "doc_id long, text string"
    )
    ids = {r.doc_id for r in perplexity_df(docs, lm).collect()}
    assert ids == {22}


def test_filter_keeps_fluent_and_unscorable(spark, lm):
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "a z a z"), (20, "a")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in perplexity_filter(docs, lm, max_ppl=6.0).collect()}
    # 10 scores 4.0 (kept); 11 pairs a seen context with unseen words
    # (ppl exp((2·ln10 + ln4)/3) ≈ 7.37, cut); 20 has no bigram evidence
    # (kept by contract)
    assert kept == {10, 20}


def test_oov_context_is_uniform(spark, lm):
    """Unseen context → P = 1/V for any next word."""
    docs = spark.createDataFrame([(30, "q r")], "doc_id long, text string")
    row = perplexity_df(docs, lm).collect()[0]
    assert row.ppl == pytest.approx(lm.vocab_size, abs=1e-3)


def test_repartition_determinism(spark):
    texts = [
        (i, " ".join("abcdefg"[(i * 7 + j * 3) % 7] for j in range(30)))
        for i in range(200)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    lm7 = train_bigram_lm(docs.repartition(7))
    lm1 = train_bigram_lm(docs.coalesce(1))
    assert lm7.vocab_size == lm1.vocab_size

    def run(d, m):
        return sorted(
            (r.doc_id, r.n_bigrams, r.ppl) for r in perplexity_df(d, m).collect()
        )

    assert run(docs.repartition(13), lm7) == run(docs.coalesce(1), lm1)


def test_matches_local_reference(spark, lm):
    """Independent Python forward computation of the frozen spec."""
    text = "a b b a c z a"
    docs = spark.createDataFrame([(40, text)], "doc_id long, text string")
    got = perplexity_df(docs, lm).collect()[0]
    bc = {(r.w1, r.w2): r.c12 for r in lm.bigrams.collect()}
    cx = {r.w1: r.c1 for r in lm.contexts.collect()}
    toks = text.split()
    nll = -sum(
        math.log(
            (bc.get((w1, w2), 0.0) + lm.alpha)
            / (cx.get(w1, 0.0) + lm.alpha * lm.vocab_size)
        )
        for w1, w2 in zip(toks, toks[1:])
    )
    want = round(math.exp(round(nll, 6) / (len(toks) - 1)), 4)
    assert got.n_bigrams == len(toks) - 1
    assert got.ppl == pytest.approx(want, abs=1e-9)


def test_broadcast_lm_same_result(spark, lm):
    docs = spark.createDataFrame(
        [(10, "a b c"), (11, "a z")], "doc_id long, text string"
    )
    plain = sorted(map(tuple, perplexity_df(docs, lm).collect()))
    bcast = sorted(
        map(tuple, perplexity_df(docs, lm, broadcast_lm=True).collect())
    )
    assert plain == bcast


def test_no_python_udf_in_plan(spark, lm):
    docs = spark.createDataFrame([(10, "a b c")], "doc_id long, text string")
    plan = perplexity_df(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------- CCNet terciles (X29+)
def test_buckets_tercile_sizes_and_order(spark, lm):
    """9 docs with strictly increasing ppl split 3/3/3; head holds the
    lowest-ppl third (CCNet's cleanest bucket)."""
    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_buckets,
    )

    # vary OOV density to spread ppl: more 'z's -> higher perplexity
    rows = [(i, "a b " * (9 - i) + "z y x w " * i) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs, lm).collect()
    by_bucket: dict[str, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["ppl"])
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3,
    }
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_buckets_grouped_cuts_are_per_group(spark, lm):
    """Per-group cuts: a group whose ppls are ALL higher than another's
    still gets its own head/middle/tail — the CCNet per-language rule."""
    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_buckets,
    )

    clean = [(i, "a b " * (6 - i) + "z " * i, "en") for i in range(6)]
    noisy = [(10 + i, "z y x " * (i + 1) + "a b", "xx") for i in range(6)]
    docs = spark.createDataFrame(
        clean + noisy, "doc_id long, text string, lang string"
    )
    out = perplexity_buckets(docs, lm, group_col="lang").collect()
    for lang in ("en", "xx"):
        buckets = {r["bucket"] for r in out if r["lang"] == lang}
        assert buckets == {"head", "middle", "tail"}, (lang, buckets)


def test_buckets_layout_determinism(spark, lm):
    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_buckets,
    )

    rows = [(i, "a b " * (9 - i) + "z y " * i) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, perplexity_buckets(docs, lm).collect()))
    b = sorted(map(tuple, perplexity_buckets(docs.repartition(5), lm).collect()))
    assert a == b


def test_buckets_approx_agrees_with_exact_at_200k(spark):
    """r9 tolerance gate for the approx= knob: at 200k docs the
    percentile_approx cuts must place >= 99.9% of documents in the same
    tercile as the exact interpolated cuts. Only docs whose ppl lands
    between the exact and sketch cut can differ -- the boundary band the
    GK rank error (n/accuracy) bounds."""
    import os

    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_buckets,
        train_bigram_lm,
    )
    from oracle_vectorsearch_example_spark.sources.corpus_fixture import (
        ensure_corpus_fixture,
    )

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".corpus_fixture",
    )
    docs = ensure_corpus_fixture(spark, base)  # 200k cached parquet
    lm = train_bigram_lm(docs.filter(F.col("doc_id") < 5000))
    exact = perplexity_buckets(docs, lm, broadcast_lm=True).select(
        "doc_id", F.col("bucket").alias("b_exact")
    )
    approx = perplexity_buckets(
        docs, lm, broadcast_lm=True, approx=10000
    ).select("doc_id", F.col("bucket").alias("b_approx"))
    j = exact.join(approx, "doc_id")
    total = j.count()
    agree = j.filter(F.col("b_exact") == F.col("b_approx")).count()
    assert total == 200_000
    assert agree / total >= 0.999, f"agreement {agree}/{total}"


def test_buckets_approx_validation(spark, lm):
    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_buckets,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="accuracy"):
        perplexity_buckets(docs, lm, approx=0)
