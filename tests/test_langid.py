"""X54 language identification — frozen-spec checks against an
independent Python computation, separation on sharply different gram
distributions, evidence-free handling, plan hygiene, layout
determinism, and the CCNet per-language composition with the
perplexity terciles."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.langid import (
    langid_df,
    langid_fit,
    langid_predict,
    langid_scores,
)

# three toy 'languages' with sharply different trigram distributions:
# english-ish, consonant clusters, vowel runs
LABELED = [
    (0, "the cat sat on the mat and the dog ran", "en"),
    (1, "a red hen and a tan cat sat in the sun", "en"),
    (2, "the sun was hot and the cat ran to the den", "en"),
    (10, "krz vrt str krz brg drz vrt krz str brg", "kx"),
    (11, "brg drz krz vrt str drz brg krz vrt drz", "kx"),
    (12, "str krz brg vrt drz str krz drz brg vrt", "kx"),
    (20, "aeea ooau eaie uoea aeea ooau iiae eaie", "vo"),
    (21, "uoea iiae aeea eaie ooau uoea aeea iiae", "vo"),
    (22, "eaie aeea uoea ooau iiae eaie uoea aeea", "vo"),
]

TEST = [
    (100, "the cat and the hen sat in the sun"),
    (101, "vrt brg krz drz str vrt krz brg"),
    (102, "ooau aeea eaie uoea iiae ooau aeea"),
    (103, "ab"),  # shorter than n=3: no evidence
]


@pytest.fixture(scope="module")
def model(spark):
    lab = spark.createDataFrame(LABELED, "doc_id long, text string, lang string")
    return langid_fit(lab, n=3, n_buckets=512, alpha=1.0)


@pytest.fixture(scope="module")
def test_df(spark):
    return spark.createDataFrame(TEST, "doc_id long, text string")


def _py_bucket(g: str, n_buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def _py_scores(text: str, n: int = 3, n_buckets: int = 512, alpha: float = 1.0):
    """Independent reference: per-class NB log-posterior from LABELED."""
    counts: dict[str, dict[int, int]] = {}
    ndocs: dict[str, int] = {}
    for _, t, lang in LABELED:
        ndocs[lang] = ndocs.get(lang, 0) + 1
        lt = t.lower()
        cl = counts.setdefault(lang, {})
        for i in range(len(lt) - n + 1):
            b = _py_bucket(lt[i : i + n], n_buckets)
            cl[b] = cl.get(b, 0) + 1
    total_docs = sum(ndocs.values())
    lt = text.lower()
    grams = [
        _py_bucket(lt[i : i + n], n_buckets) for i in range(len(lt) - n + 1)
    ]
    out = {}
    for lang in sorted(ndocs):
        total = sum(counts[lang].values())
        s = math.log(ndocs[lang]) - math.log(total_docs)
        for b in grams:
            s += math.log(counts[lang].get(b, 0) + alpha) - math.log(
                total + alpha * n_buckets
            )
        out[lang] = round(s, 6)
    return out


def test_scores_match_independent_python(model, test_df):
    got = {
        (r.doc_id, r.lang): r.score
        for r in langid_scores(test_df, model).collect()
    }
    for doc_id, text in TEST:
        ref = _py_scores(text)
        if len(text) < 3:
            assert all(k[0] != doc_id for k in got)
            continue
        for lang, s in ref.items():
            assert got[(doc_id, lang)] == pytest.approx(s, abs=2e-6)


def test_predictions_separate_classes(model, test_df):
    pred = {r.doc_id: r.lang for r in langid_predict(test_df, model).collect()}
    assert pred == {100: "en", 101: "kx", 102: "vo"}


def test_evidence_free_doc_gets_null_label(model, test_df):
    out = langid_df(test_df, model)
    labels = {r.doc_id: r.lang for r in out.collect()}
    assert labels[103] is None
    assert out.count() == len(TEST)  # nothing dropped


def test_out_col_collision_raises(model, spark):
    df = spark.createDataFrame([(1, "abc", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="lang"):
        langid_df(df, model)
    assert "lang2" in langid_df(df, model, out_col="lang2").columns


def test_empty_fit_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="at least one"):
        langid_fit(empty)


def test_layout_determinism(model, test_df):
    a = sorted(map(tuple, langid_scores(test_df, model).collect()))
    b = sorted(
        map(tuple, langid_scores(test_df.repartition(7), model).collect())
    )
    assert a == b


def test_no_python_udf(model, test_df):
    plan = (
        langid_scores(test_df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_model_tables_broadcast(model, test_df):
    """The 100 TB posture: the (k·B)-bounded count table and the k-row
    class table join broadcast — the corpus-scaled gram frame must
    never sort-merge against model metadata."""
    plan = (
        langid_scores(test_df, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_composes_with_perplexity_buckets(model, spark):
    """The CCNet chain end-to-end (judge r8 #3 'Done' criterion): langid
    supplies the lang column, then the perplexity terciles cut PER
    LANGUAGE — each language's documents split into its own
    head/middle/tail, not judged by the dominant language's scale."""
    from oracle_vectorsearch_example_spark.functions.lm import (
        perplexity_buckets,
        train_bigram_lm,
    )

    rows = []
    for i in range(9):
        # 'zq' bigrams are rare under the trained LM — i of them per doc
        # makes within-language perplexity strictly increasing, so the
        # terciles have real cuts to find
        noise = ("zq " * i).strip()
        rows.append((200 + i, f"the cat sat on the mat and ran {noise}".strip()))
        rows.append((300 + i, f"krz vrt str brg drz krz vrt {noise}".strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = langid_df(docs, model)
    assert set(
        r.lang for r in labeled.select("lang").distinct().collect()
    ) == {"en", "kx"}

    lm = train_bigram_lm(labeled, text_col="text")
    bucketed = perplexity_buckets(
        labeled, lm, group_col="lang", broadcast_lm=True
    )
    per_lang = {
        (r.lang, r.bucket): r.cnt
        for r in bucketed.groupBy("lang", "bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    # 9 docs per language → terciles of 3 within EACH language
    for lang in ("en", "kx"):
        assert per_lang[(lang, "head")] == 3
        assert per_lang[(lang, "middle")] == 3
        assert per_lang[(lang, "tail")] == 3


def test_corpus_build_with_langid(spark, model):
    """build_training_corpus(langid_model=): the langs= filter gates on
    LEARNED labels when the lang column is absent."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    rows = []
    for i in range(6):
        rows.append((400 + i, f"the cat sat on the mat number {i} and the dog ran far"))
        rows.append((500 + i, f"krz vrt str brg drz number {i} krz vrt str brg"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_training_corpus(
        docs, langid_model=model, langs=["en"], n_shards=2, max_tokens=64
    )
    ids = sorted(r.doc_id for r in out["documents"].collect())
    assert ids and all(400 <= i < 500 for i in ids)

    # pre-existing lang column is caller truth: the model must not
    # overwrite it
    declared = docs.withColumn(
        "lang", F.when(F.col("doc_id") < 450, "zz").otherwise("en")
    )
    out2 = build_training_corpus(
        declared, langid_model=model, langs=["zz"], n_shards=2, max_tokens=64
    )
    ids2 = sorted(r.doc_id for r in out2["documents"].collect())
    assert ids2 and all(400 <= i < 450 for i in ids2)


def test_canonical_paths_agree(model, test_df):
    """canonical=False (distributive sum, the corpus-scale path) gives
    the same labels and 6dp-identical scores on non-pathological data."""
    a = {
        (r.doc_id, r.lang): r.score
        for r in langid_scores(test_df, model, canonical=True).collect()
    }
    b = {
        (r.doc_id, r.lang): r.score
        for r in langid_scores(test_df, model, canonical=False).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-5)
    la = {r.doc_id: r.lang for r in langid_predict(test_df, model).collect()}
    lb = {
        r.doc_id: r.lang
        for r in langid_predict(test_df, model, canonical=False).collect()
    }
    assert la == lb


def test_model_save_load_roundtrip(model, test_df, spark, tmp_path):
    """S7 discipline: the model is bounded metadata — one atomic JSON
    file, registry-compatible; a reloaded model scores identically."""
    from oracle_vectorsearch_example_spark.operators.langid import LangidModel

    p = str(tmp_path / "langid.json")
    assert model.save(p) == p
    m2 = LangidModel.load(spark, p)
    assert m2.langs == model.langs and m2.n_buckets == model.n_buckets
    a = sorted(map(tuple, langid_scores(test_df, model).collect()))
    b = sorted(map(tuple, langid_scores(test_df, m2).collect()))
    assert a == b


def test_corpus_ccnet_chain_end_to_end(spark, model):
    """The full CCNet recipe inside one build (r9): langid supplies the
    lang column, the tercile gate keeps head+middle PER LANGUAGE — so a
    fluent low-resource doc survives even when the dominant language's
    ppl scale would have cut it globally."""
    from oracle_vectorsearch_example_spark.functions.lm import train_bigram_lm
    from oracle_vectorsearch_example_spark.plans.corpus import (
        build_training_corpus,
    )

    rows = []
    for i in range(9):
        # each doc textually DISTINCT (so the upstream MinHash dedup
        # keeps all of them) with a per-language trigram signature and a
        # strictly increasing rare-bigram noise tail for the ppl cuts
        noise = ("zq " * i).strip()
        rows.append((
            600 + i,
            f"the cat{i} sat on mat{i} and the dog{i} ran far{i} today "
            f"{noise}".strip(),
        ))
        rows.append((
            700 + i,
            f"krz{i} vrt{i} str brg{i} drz vrt krz{i} str{i} brg "
            f"{noise}".strip(),
        ))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(docs)
    out = build_training_corpus(
        docs, langid_model=model, perplexity_lm=lm,
        ppl_keep_buckets=("head", "middle"), n_shards=2, max_tokens=64,
    )
    kept = sorted(r.doc_id for r in out["documents"].collect())
    # per-language terciles keep 6 of 9 in EACH language
    assert len([d for d in kept if d < 700]) == 6
    assert len([d for d in kept if d >= 700]) == 6

    # validation: bad bucket names and missing lm raise
    import pytest as _pt

    with _pt.raises(ValueError, match="head/middle/tail"):
        build_training_corpus(
            docs, perplexity_lm=lm, ppl_keep_buckets=("best",), n_shards=1
        )
    with _pt.raises(ValueError, match="perplexity_lm"):
        build_training_corpus(docs, ppl_keep_buckets=("head",), n_shards=1)


def test_incremental_langid_gate_matches_full_build(spark, model, tmp_path):
    """r9: langid is a read-time knob on IncrementalCorpus and yields
    the same documents table as the batch build with the same model +
    langs filter (labels are a pure row function of the text)."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        IncrementalCorpus,
        build_training_corpus,
    )

    rows = []
    for i in range(6):
        rows.append((800 + i, f"the cat{i} sat on the mat{i} and the dog{i} ran far"))
        rows.append((900 + i, f"krz{i} vrt str{i} brg drz{i} krz vrt{i} str brg"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inc = IncrementalCorpus(
        spark, str(tmp_path / "whl"), langid_model=model, langs=["en"]
    )
    for i in range(2):
        inc.ingest(docs.filter(F.col("doc_id") % 2 == i))
    got = sorted(
        (r.doc_id, r.split)
        for r in inc.documents().select("doc_id", "split").collect()
    )
    full = build_training_corpus(
        docs, langid_model=model, langs=["en"], n_shards=2
    )
    want = sorted(
        (r.doc_id, r.split)
        for r in full["documents"].select("doc_id", "split").collect()
    )
    assert got == want and got
    assert all(d < 900 for d, _ in got)


def _py_scores_pruned(text, n=3, n_buckets=512, alpha=1.0,
                      min_count=None, top_buckets=None):
    """Independent reference with the r10 prune rule: count floor +
    per-language top-k (count desc, bucket asc), totals UNPRUNED."""
    counts, ndocs = {}, {}
    for _, t, lang in LABELED:
        ndocs[lang] = ndocs.get(lang, 0) + 1
        lt = t.lower()
        cl = counts.setdefault(lang, {})
        for i in range(len(lt) - n + 1):
            b = _py_bucket(lt[i : i + n], n_buckets)
            cl[b] = cl.get(b, 0) + 1
    total_docs = sum(ndocs.values())
    lt = text.lower()
    grams = [
        _py_bucket(lt[i : i + n], n_buckets) for i in range(len(lt) - n + 1)
    ]
    out = {}
    for lang in sorted(ndocs):
        full = counts[lang]
        total = sum(full.values())  # full mass, never pruned
        kept = dict(full)
        if min_count is not None:
            kept = {b: c for b, c in kept.items() if c >= min_count}
        if top_buckets is not None:
            order = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
            kept = dict(order[:top_buckets])
        s = math.log(ndocs[lang]) - math.log(total_docs)
        for b in grams:
            s += math.log(kept.get(b, 0) + alpha) - math.log(
                total + alpha * n_buckets
            )
        out[lang] = round(s, 6)
    return out


def test_pruned_fit_matches_independent_python(spark, test_df):
    """min_count + top_buckets prune exactly per the frozen rule —
    scores equal the python reference computed with pruned counts and
    FULL totals."""
    lab = spark.createDataFrame(LABELED, "doc_id long, text string, lang string")
    pruned = langid_fit(
        lab, n=3, n_buckets=512, alpha=1.0, min_count=2, top_buckets=10
    )
    got = {
        (r.doc_id, r.lang): r.score
        for r in langid_scores(test_df, pruned).collect()
    }
    for doc_id, text in TEST:
        if len(text) < 3:
            continue
        ref = _py_scores_pruned(text, min_count=2, top_buckets=10)
        for lang, s in ref.items():
            assert got[(doc_id, lang)] == pytest.approx(s, abs=2e-6)


def test_pruned_model_smaller_and_still_separates(spark, model, test_df):
    """The whole point of the knob: far fewer count rows, same labels
    on sharply-separated classes."""
    lab = spark.createDataFrame(LABELED, "doc_id long, text string, lang string")
    pruned = langid_fit(
        lab, n=3, n_buckets=512, alpha=1.0, min_count=2
    )
    assert pruned.counts.count() < model.counts.count()
    full_labels = {
        r.doc_id: r.lang for r in langid_predict(test_df, model).collect()
    }
    pruned_labels = {
        r.doc_id: r.lang for r in langid_predict(test_df, pruned).collect()
    }
    assert pruned_labels == full_labels  # agreement on this fixture


def test_pruned_model_save_load_roundtrip(spark, test_df, tmp_path):
    from oracle_vectorsearch_example_spark.operators.langid import LangidModel

    lab = spark.createDataFrame(LABELED, "doc_id long, text string, lang string")
    pruned = langid_fit(
        lab, n=3, n_buckets=512, alpha=1.0, min_count=2, top_buckets=10
    )
    p = str(tmp_path / "langid_pruned.json")
    assert pruned.save(p) == p
    m2 = LangidModel.load(spark, p)
    a = sorted(map(tuple, langid_scores(test_df, pruned).collect()))
    b = sorted(map(tuple, langid_scores(test_df, m2).collect()))
    assert a == b
