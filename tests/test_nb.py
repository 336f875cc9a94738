"""X47 NB quality classifier — frozen-spec checks against an
independent Python computation of the same model, separation behavior,
prior handling, the filter, plan hygiene, layout determinism."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.nb import (
    nb_filter,
    nb_fit,
    nb_scores,
)

# the DSIR lesson (dsir.py:99): rate differences, not membership —
# the target's characteristic tokens repeat well above count 1
TARGET = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick fox runs over the lazy hill"),
    (2, "a lazy dog naps while the quick fox jumps"),
]
RAW = [
    (10, "the quick brown fox jumps high"),     # target-like
    (11, "quick fox lazy dog"),                 # target-like, short
    (12, "zz xx yy ww vv uu"),                  # nothing like target
    (13, "buy now cheap deals buy now cheap"),  # spam-like
    (14, "the of and to in it is was"),         # generic function words
]
NB_BUCKETS = 4096


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % NB_BUCKETS


def _tok(text: str):
    return [t for t in text.lower().split(" ") if t != ""]


def _counts(rows):
    counts: dict[int, float] = {}
    for _, text in rows:
        for t in _tok(text):
            b = _bucket(t)
            counts[b] = counts.get(b, 0.0) + 1.0
    return counts


def _py_score(text, tc, rc, tt, rt, ntd, nrd, alpha=1.0, prior=True):
    s = math.log(ntd) - math.log(nrd) if prior else 0.0
    for t in _tok(text):
        b = _bucket(t)
        s += math.log(tc.get(b, 0.0) + alpha) - math.log(tt + alpha * NB_BUCKETS)
        s -= math.log(rc.get(b, 0.0) + alpha) - math.log(rt + alpha * NB_BUCKETS)
    return round(s, 6)


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, "doc_id long, text string")
    r = spark.createDataFrame(RAW, "doc_id long, text string")
    return t, r


@pytest.fixture(scope="module")
def model(frames):
    t, r = frames
    return nb_fit(t, r, n_buckets=NB_BUCKETS, alpha=1.0)


def test_fit_matches_reference(model):
    tc = {r.b: r.ct for r in model.target_counts.collect()}
    rc = {r.b: r.cr for r in model.raw_counts.collect()}
    assert tc == _counts(TARGET)
    assert rc == _counts(RAW)
    assert model.target_total == sum(_counts(TARGET).values())
    assert model.raw_total == sum(_counts(RAW).values())
    assert model.n_target_docs == len(TARGET)
    assert model.n_raw_docs == len(RAW)


def test_scores_match_reference(frames, model):
    _, r = frames
    tc, rc = _counts(TARGET), _counts(RAW)
    tt, rt = sum(tc.values()), sum(rc.values())
    got = {row.doc_id: row for row in nb_scores(r, model).collect()}
    for doc_id, text in RAW:
        want = _py_score(text, tc, rc, tt, rt, len(TARGET), len(RAW))
        assert abs(got[doc_id]["score"] - want) <= 1e-6, doc_id
        assert got[doc_id]["n_tokens"] == len(_tok(text))


def test_use_prior_false_drops_the_prior(frames, model):
    _, r = frames
    with_p = {x.doc_id: x.score for x in nb_scores(r, model).collect()}
    without = {
        x.doc_id: x.score
        for x in nb_scores(r, model, use_prior=False).collect()
    }
    prior = math.log(len(TARGET)) - math.log(len(RAW))
    for d in with_p:
        assert abs((with_p[d] - without[d]) - prior) <= 2e-6


def test_target_like_outscores_unlike(frames, model):
    _, r = frames
    s = {x.doc_id: x.score for x in nb_scores(r, model).collect()}
    assert s[10] > s[12] and s[10] > s[13]
    assert s[11] > s[12] and s[11] > s[13]


def test_filter_keeps_payload_rows(frames, model):
    _, r = frames
    s = {x.doc_id: x.score for x in nb_scores(r, model).collect()}
    thresh = (s[11] + s[12]) / 2  # between target-like and junk
    kept = nb_filter(r, model, threshold=thresh)
    assert sorted(x.doc_id for x in kept.collect()) == sorted(
        d for d, v in s.items() if v > thresh
    )
    assert kept.columns == r.columns  # payload schema untouched


def test_zero_token_docs_drop(spark, model):
    empty = spark.createDataFrame(
        [(99, ""), (100, "   ")], "doc_id long, text string"
    )
    assert nb_scores(empty, model).count() == 0
    assert nb_filter(empty, model, threshold=-1e9).count() == 0


def test_layout_determinism(frames, model):
    _, r = frames
    a = sorted(map(tuple, nb_scores(r, model).collect()))
    b = sorted(map(tuple, nb_scores(r.repartition(7), model).collect()))
    assert a == b


def test_no_python_udf(frames, model):
    _, r = frames
    plan = nb_scores(r, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_count_tables_broadcast(frames, model):
    """The 100 TB posture: both bucket-bounded count tables join
    broadcast — the corpus-scaled event frame must never sort-merge
    against metadata."""
    _, r = frames
    plan = nb_scores(r, model)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_empty_class_raises_descriptive(spark):
    """r8 ADVICE regression: an empty class must fail loudly at fit time,
    not as a bare math-domain error when the prior is taken at scoring."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    full = spark.createDataFrame([(1, "some words here")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one document"):
        nb_fit(empty, full)
    with pytest.raises(ValueError, match="at least one document"):
        nb_fit(full, empty)


def test_model_save_load_roundtrip(spark, model, frames, tmp_path):
    """S7 discipline: the model is bounded metadata — one atomic JSON
    file; a reloaded model scores identically."""
    from oracle_vectorsearch_example_spark.operators.nb import NbQualityModel

    _, raw = frames
    p = str(tmp_path / "nb.json")
    assert model.save(p) == p
    m2 = NbQualityModel.load(spark, p)
    a = sorted(map(tuple, nb_scores(raw, model).collect()))
    b = sorted(map(tuple, nb_scores(raw, m2).collect()))
    assert a == b


def test_pareto_keeps_a_stochastic_tail(spark, model, frames):
    """The GPT-3 rule's defining property: unlike the hard threshold,
    the Pareto draw keeps SOME documents the threshold would drop (and
    high-score docs keep with probability → 1). Deterministic: same
    seed, same keep set, regardless of layout."""
    from oracle_vectorsearch_example_spark.operators.nb import (
        nb_pareto_filter,
        nb_pareto_scores,
    )

    _, raw = frames
    sc = nb_pareto_scores(raw, model, alpha=9.0, seed=42)
    rows = sc.collect()
    assert rows and all(r.pareto >= 0.0 for r in rows)
    # keep bit consistent with the rule
    import math as m

    for r in rows:
        want = r.pareto > round(1.0 - 1.0 / (1.0 + m.exp(-r.score)), 6)
        assert r.keep == want
    a = sorted(r.doc_id for r in nb_pareto_filter(raw, model).collect())
    b = sorted(
        r.doc_id for r in nb_pareto_filter(raw.repartition(5), model).collect()
    )
    assert a == b


def test_pareto_draw_salted_and_split_decorrelated(spark, model, frames):
    """The Pareto uniform must come from md5("pareto:<seed>:<id>"), NOT
    hash_split's bare md5("<seed>:<id>") stream: with a shared stream a
    doc survives iff u clears a score-dependent floor AND the same u
    picks its split, so marginal survivors could never reach low train
    buckets and val/test would systematically skew low-quality."""
    from oracle_vectorsearch_example_spark.operators.nb import (
        nb_pareto_scores,
    )

    _, raw = frames
    got = {
        r.doc_id: r.pareto
        for r in nb_pareto_scores(raw, model, alpha=9.0, seed=42).collect()
    }

    def u_from(salt, did):
        h = hashlib.md5(f"{salt}:{did}".encode()).hexdigest()
        return (int(h[:8], 16) % 10000) / 10000.0

    for did, pareto in got.items():
        want = round((1.0 - u_from("pareto:42", did)) ** (-1.0 / 9.0) - 1.0, 6)
        assert pareto == pytest.approx(want, abs=1e-9)
    # and the salted stream actually differs from the split stream
    diverged = [
        did
        for did in got
        if u_from("pareto:42", did) != u_from("42", did)
    ]
    assert diverged  # shared-seed coupling would make these identical


def test_pareto_alpha_validation(spark, model, frames):
    from oracle_vectorsearch_example_spark.operators.nb import nb_pareto_scores

    _, raw = frames
    with pytest.raises(ValueError, match="alpha"):
        nb_pareto_scores(raw, model, alpha=0.0)


def test_corpus_pareto_gate_exclusive(spark, model):
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    out = build_training_corpus(
        docs, nb_model=model, nb_pareto_alpha=9.0, n_shards=1, max_tokens=64
    )
    assert out["documents"].count() >= 0  # runs end to end
    with pytest.raises(ValueError, match="not both"):
        build_training_corpus(
            docs, nb_model=model, nb_min_score=0.0, nb_pareto_alpha=9.0,
            n_shards=1,
        )
