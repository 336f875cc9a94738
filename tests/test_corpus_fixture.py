"""Dedup-at-scale fixture (r5): determinism + planted-duplicate recall."""

from __future__ import annotations

from oracle_vectorsearch_example_spark.operators.dedup import minhash_lsh_pairs
from oracle_vectorsearch_example_spark.sources.corpus_fixture import (
    doc_text,
    generate_corpus,
)

P = dict(n_docs=4000, words=60, vocab=50_000, dup_rate=0.10, seed=11)


def test_distributed_matches_driver_formula(spark):
    ids = [0, 17, 123, 3999]
    got = {
        r["doc_id"]: r["text"]
        for r in generate_corpus(spark, **P)
        .filter("doc_id in (0, 17, 123, 3999)")
        .collect()
    }
    kw = {k: P[k] for k in ("words", "vocab", "dup_rate", "seed")}
    for i in ids:
        assert got[i] == doc_text(i, **kw)


def test_planted_duplicates_are_recovered(spark):
    """Ground truth is known by construction: every dup doc differs from
    its base by ONE word. The banded MinHash join must recover ≥ 95% of
    the (dup ∪ base) membership."""
    kw = {k: P[k] for k in ("words", "vocab", "dup_rate", "seed")}
    docs = generate_corpus(spark, **P).cache()
    truth_dups = {i for i in range(16, P["n_docs"]) if _is_dup(i, kw)}
    pairs = minhash_lsh_pairs(docs).collect()
    flagged = {x for r in pairs for x in (r.id_a, r.id_b)}
    assert truth_dups, "fixture must plant duplicates"
    hit = len(truth_dups & flagged) / len(truth_dups)
    assert hit >= 0.95, (hit, len(truth_dups))


def _is_dup(doc_id, kw):
    from oracle_vectorsearch_example_spark.sources.corpus_fixture import _mix

    return (_mix(kw["seed"] + doc_id * 3) % 10_000) < int(kw["dup_rate"] * 10_000)
