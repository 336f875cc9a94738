"""DSIR importance resampling (X33) — frozen-spec checks against an
independent Python computation of the same model."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.dsir import (
    dsir_fit,
    dsir_sample,
    dsir_scores,
)

TARGET = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick fox runs over the hill"),
]
RAW = [
    (10, "the quick brown fox jumps high"),  # target-like
    (11, "the quick fox"),                   # target-like, short
    (12, "zz xx yy ww vv uu"),               # nothing like target
    (13, "buy now cheap deals buy now"),     # nothing like target
    (14, "the lazy dog sleeps over the hill"),
]
NB = 4096


def _bucket(bg: str) -> int:
    return int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) % NB


def _feat_counts(rows):
    counts: dict[int, float] = {}
    for _, text in rows:
        toks = text.split()
        for w1, w2 in zip(toks, toks[1:]):
            b = _bucket(f"{w1} {w2}")
            counts[b] = counts.get(b, 0.0) + 1.0
    return counts


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, "doc_id long, text string")
    r = spark.createDataFrame(RAW, "doc_id long, text string")
    return t, r


@pytest.fixture(scope="module")
def model(frames):
    t, r = frames
    return dsir_fit(t, r, n_buckets=NB, alpha=1.0)


def test_fit_matches_reference(model):
    tc = {r.b: r.ct for r in model.target_counts.collect()}
    rc = {r.b: r.cr for r in model.raw_counts.collect()}
    want_t, want_r = _feat_counts(TARGET), _feat_counts(RAW)
    assert tc == want_t and rc == want_r
    assert model.target_total == sum(want_t.values())
    assert model.raw_total == sum(want_r.values())


def test_scores_match_reference(frames, model):
    _, r = frames
    got = {row.doc_id: row for row in dsir_scores(r, model).collect()}
    want_t, want_r = _feat_counts(TARGET), _feat_counts(RAW)
    a, nb = model.alpha, float(NB)
    for did, text in RAW:
        toks = text.split()
        lw = 0.0
        for w1, w2 in zip(toks, toks[1:]):
            b = _bucket(f"{w1} {w2}")
            lw += math.log(want_t.get(b, 0.0) + a) - math.log(
                model.target_total + a * nb
            )
            lw -= math.log(want_r.get(b, 0.0) + a) - math.log(
                model.raw_total + a * nb
            )
        assert got[did].n_feats == len(toks) - 1
        assert got[did].logw == pytest.approx(round(lw, 6), abs=1e-9)


def test_target_like_docs_outscore_unlike(frames, model):
    _, r = frames
    s = {row.doc_id: row.logw for row in dsir_scores(r, model).collect()}
    # target-like docs must beat junk at comparable length (raw logw is
    # the DSIR spec; no length normalization)
    assert s[10] > s[12]
    assert s[11] > s[13]


def test_sample_is_deterministic_and_sized(frames, model):
    _, r = frames

    def run(d):
        return sorted(
            row.doc_id for row in dsir_sample(d, model, n=3).collect()
        )

    a = run(r.repartition(7))
    assert len(a) == 3
    assert a == run(r.coalesce(1))
    # different seed → (almost surely) different Gumbel keys; just check
    # the call works and returns the right size
    b = sorted(
        row.doc_id
        for row in dsir_sample(r, model, n=3, seed=7).collect()
    )
    assert len(b) == 3


def test_no_python_udf(frames, model):
    _, r = frames
    plan = (
        dsir_scores(r, model)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
