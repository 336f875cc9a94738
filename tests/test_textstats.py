"""Text analysis functions (X3) and sessionization invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.textstats import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    ws_token_count,
)
from oracle_vectorsearch_example_spark.operators.sessionize import sessionize
from oracle_vectorsearch_example_spark.sources.io import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "the cat and the dog went to a house"),
        (2, "el perro y la casa de que"),
        (3, "zzz qqq xxx"),
        (4, ""),
        (5, "Hello, world! One2three."),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _col(df, col):
    return {r.id: r.v for r in df.select("id", col.alias("v")).collect()}


def test_token_counts(texts):
    ws = _col(texts, ws_token_count(F.col("text")))
    assert ws[1] == 9 and ws[4] == 0
    bpe = _col(texts, bpe_ish_token_count(F.col("text")))
    # "Hello, world! One2three." -> hello , world ! one 2 three . = 8
    assert bpe[5] == 8


def test_lang_id(texts):
    lang = _col(texts, lang_id(F.col("text")))
    assert lang[1] == "en" and lang[2] == "es" and lang[3] == "unk" and lang[4] == "unk"


def test_quality_score_bounds(texts):
    q = _col(texts, quality_score(F.col("text")))
    assert all(0.0 <= v <= 1.0 for v in q.values())
    assert q[1] > q[3]  # stopword-rich english beats gibberish


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "A  B\tC"), (2, "a b c"), (3, "a b d")], "id long, text string"
    )
    fp = _col(df, fingerprint(F.col("text")))
    assert fp[1] == fp[2] != fp[3]
    assert len(fp[1]) == 16


def test_sessionize_invariants(spark):
    ev = read_table(spark, SF, "events")
    s = sessionize(ev, gap_minutes=30.0)
    # session ids start at 1 and are contiguous per user
    agg = s.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.countDistinct("session_id").alias("n"),
    )
    bad = agg.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count()
    assert bad == 0
    assert s.count() == ev.count()


def test_winnow_fingerprints_edit_stability(spark):
    """A local edit perturbs only nearby fingerprints: the surviving
    overlap stays high — the property whole-doc hashing lacks."""
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.functions.textstats import (
        winnow_fingerprints_df,
    )

    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base.replace("jumps over", "leaps past", 1)  # one local edit
    df = spark.createDataFrame([(1, base), (2, edited)], "id long, text string")
    rows = {
        r.id: set(r.fps)
        for r in winnow_fingerprints_df(df, "text", out_col="fps")
        .select("id", "fps")
        .collect()
    }
    inter = len(rows[1] & rows[2])
    union = len(rows[1] | rows[2])
    assert inter / union > 0.5, (inter, union)
    # degenerate inputs yield empty sets, not errors
    tiny = spark.createDataFrame([(1, "short"), (2, ""), (3, None)], "id long, text string")
    out = winnow_fingerprints_df(tiny, "text", out_col="fps").collect()
    assert all(r.fps == [] for r in out)


def test_nfc_normalize_folds_combining_marks(spark):
    import unicodedata

    from oracle_vectorsearch_example_spark.functions.textstats import nfc_normalize

    decomposed = "café über"   # e + combining acute, u + diaeresis
    composed = unicodedata.normalize("NFC", decomposed)
    assert composed != decomposed  # fixture really is decomposed
    df = spark.createDataFrame([(1, decomposed), (2, composed), (3, None)],
                               "id long, text string")
    out = {r.id: r.n for r in df.select("id", nfc_normalize(F.col("text")).alias("n")).collect()}
    assert out[1] == out[2] == composed
    assert out[3] is None


def test_repetition_metrics(spark):
    """Gopher-style repetition signals (r4): duplicate n-gram fraction and
    top-word share — exact values on controlled inputs, zeros on
    degenerate ones."""
    from oracle_vectorsearch_example_spark.functions.textstats import (
        dup_ngram_fraction,
        top_word_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # 3 bigrams, 1 distinct
            (2, "all words here are unique"),    # no repetition
            (3, "one"),                          # too short for bigrams
            (4, ""),                             # empty
        ],
        "doc_id long, text string",
    )
    t = F.col("text")
    got = {
        r.doc_id: (round(r.d2, 6), round(r.tw, 6))
        for r in df.select(
            "doc_id",
            dup_ngram_fraction(t, 2).alias("d2"),
            top_word_fraction(t).alias("tw"),
        ).collect()
    }
    assert got[1] == (round(1 - 1 / 3, 6), 1.0)   # "spam spam" ×3 → 2/3 dup; all same word
    assert got[2] == (0.0, 0.2)
    assert got[3] == (0.0, 1.0)
    assert got[4] == (0.0, 0.0)


def test_staged_metrics_refuse_colliding_columns(spark):
    """ADVICE r4 #5 regression: staged temp columns must not silently
    replace-and-drop same-named caller columns."""
    import pytest as _pytest

    from oracle_vectorsearch_example_spark.functions.textstats import (
        repetition_metrics_df,
        text_metrics_df,
    )

    df = spark.createDataFrame([("hello world", 1)], "text string, __toks int")
    with _pytest.raises(ValueError, match="__toks"):
        repetition_metrics_df(df)
    with _pytest.raises(ValueError, match="__toks"):
        text_metrics_df(df)


# ------------------------------------------------- Gopher rule gate (X50)
def test_gopher_rules_hand_fixture(spark):
    """Each rule witnessed by a doc that fails exactly it (plus one doc
    passing all): symbol ratio, bullets, ellipses, alpha fraction,
    min words, stop-word presence."""
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_rules_df,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and that is fine "
        "to have with be of " * 4
    )
    rows = [
        (1, good),                                        # passes all
        (2, "# # # # # tiny"),                            # symbols + short
        (3, "- b one\n- b two\n- b three\nnormal"),       # 75% bullets ok, short
        (4, "dots...\nmore dots...\nclean"),              # 66% ellipsis lines
        (5, "1 2 3 4 5 6 7 8 9 10"),                      # no alpha words
        (6, ""),                                          # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules_df(df, min_words=5).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[1]["stop_hits"] == 8  # every Gopher stop word present
    assert out[2]["symbol_ratio"] > 0.1 and out[2]["gopher_pass"] is False
    assert out[3]["bullet_line_frac"] == 0.75
    assert out[4]["ellipsis_line_frac"] == 0.666667
    assert out[4]["gopher_pass"] is False
    assert out[5]["alpha_word_frac"] == 0.0 and out[5]["gopher_pass"] is False
    assert out[6]["n_words"] == 0 and out[6]["gopher_pass"] is False


def test_gopher_rules_no_udf_no_shuffle(spark):
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_rules_df,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_rules_df(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_gopher_repetition_hand_fixture(spark):
    """§A1.2 suite against hand-computed fractions (r9)."""
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_repetition_df,
    )

    rows = [
        (1, "a b\na b\nc d"),                    # dup line 'a b' ×2 of 3
        (2, "p q r\n\np q r\n\nx y z"),          # dup para ×2 of 3
        (3, "w1 w2 w3 w1 w2 w3 w1 w2 w3 tail"),  # heavy gram repetition
        (4, "unique words only here now friend"),
        (5, ""),
        (6, " padded \n padded \nother line"),   # compared TRIMMED
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_repetition_df(df).collect()}

    assert out[1]["n_lines"] == 3 and out[1]["dup_line_frac"] == 0.666667
    assert out[1]["dup_line_char_frac"] == 0.666667  # 6 of 9 line chars
    assert out[1]["n_paras"] == 1 and out[1]["dup_para_frac"] == 0.0
    assert out[2]["dup_para_frac"] == 0.666667
    assert out[2]["dup_para_char_frac"] == 0.666667
    # doc 3: top bigram 'w1 w2' ×3, len 5, over 31 normalized chars
    assert out[3]["top2_char_frac"] == round(15 / 31, 6)
    # dup 5-grams: two groups ×2 occurrences, len 14 each → the frozen
    # occurrence-sum proxy exceeds 1 on degenerate repetition
    assert out[3]["dup5_char_frac"] == round(56 / 31, 6)
    assert out[3]["repetition_pass"] is False
    assert out[4]["dup_line_frac"] == 0.0
    # all-unique grams: top bigram is the LEX-SMALLEST ('here now', len 8)
    assert out[4]["top2_char_frac"] == round(8 / 33, 6)
    assert out[5]["n_lines"] == 0 and out[5]["repetition_pass"] is True
    # trimmed comparison: ' padded ' lines dedup against each other
    assert out[6]["dup_line_frac"] == 0.666667
    assert out[6]["dup_line_char_frac"] == round(12 / 22, 6)


def test_gopher_repetition_arrow_pinned_to_expr_spec(spark):
    """The Arrow throughput twin must emit EXACTLY the expr spec's 16
    numbers + pass bit — column for column on a fixture spanning dup
    lines/paras, gram repetition, trimmed comparison, tabs/CRs
    (Java \\s parity), non-ASCII spaces (must NOT split: Java \\s is
    ASCII-only), empty text, and NULL text (expr yields size(NULL)=−1
    counts + 0.0 fractions)."""
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_repetition_arrow_df,
        gopher_repetition_df,
    )

    rows = [
        (1, "a b\na b\nc d"),
        (2, "p q r\n\np q r\n\nx y z"),
        (3, "w1 w2 w3 w1 w2 w3 w1 w2 w3 tail"),
        (4, "unique words only here now friend"),
        (5, ""),
        (6, " padded \n padded \nother line"),
        (7, "tab\tsplit\tand\rcr and\x0bvt"),        # ASCII \s variants
        (8, "nbsp joined stays one token"),  # unicode spaces
        (9, "MiXeD Case DUP line\nmixed case dup line"),
        (10, None),
        (11, "x " * 300 + "y"),                      # long degenerate doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {r["doc_id"]: r.asDict() for r in gopher_repetition_df(df).collect()}
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition_arrow_df(df).collect()
    }
    assert set(want) == set(got)
    for did in want:
        assert got[did] == want[did], f"doc {did}: {got[did]} != {want[did]}"


def test_gopher_repetition_thresholds_parameterized(spark):
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_repetition_df,
    )

    df = spark.createDataFrame([(1, "a b\na b\nc d\ne f\ng h")], "doc_id long, text string")
    short_doc_tops = dict(
        max_top2_char_frac=1.0, max_top3_char_frac=1.0, max_top4_char_frac=1.0,
        max_dup_line_char_frac=1.0,
    )
    strict = gopher_repetition_df(df, max_dup_line_frac=0.1, **short_doc_tops).first()
    loose = gopher_repetition_df(df, max_dup_line_frac=0.9, **short_doc_tops).first()
    assert strict["repetition_pass"] is False
    assert loose["repetition_pass"] is True


def test_gopher_repetition_no_udf_no_shuffle(spark):
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_repetition_df,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        gopher_repetition_df(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_gopher_repetition_staging_collision(spark):
    from oracle_vectorsearch_example_spark.functions.textstats import (
        gopher_repetition_df,
    )

    df = spark.createDataFrame([(1, "x", "y")], "doc_id long, text string, __s5 string")
    with pytest.raises(ValueError, match="collide"):
        gopher_repetition_df(df)


def test_barrier_filter_blocks_predicate_pushdown(spark):
    """r11: filtering on a staged metric column lets predicate pushdown
    substitute the staged aliases into the condition and push it below
    the projections — re-inlining the tokenize into every HOF lambda
    (measured 400x at 20k for the dup3 gate). barrier_filter must keep
    the Filter ABOVE the staged projection, referencing the projected
    column; results identical either way."""
    from oracle_vectorsearch_example_spark.functions.textstats import (
        barrier_filter,
        gopher_repetition_df,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x " * 40)], "doc_id long, text string"
    )
    scored = gopher_repetition_df(df)

    def filter_lines(frame):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        return [ln for ln in plan.split("\n") if "Filter " in ln]

    naked = scored.filter(F.col("repetition_pass")).select("doc_id")
    assert any("split(" in ln for ln in filter_lines(naked))  # the trap

    safe = barrier_filter(scored, F.col("repetition_pass")).select("doc_id")
    lines = filter_lines(safe)
    assert lines and all("split(" not in ln for ln in lines)
    # results identical
    assert sorted(r.doc_id for r in safe.collect()) == sorted(
        r.doc_id for r in naked.collect()
    )
    # staging-collision guard applies to the barrier column too
    with pytest.raises(ValueError, match="collide"):
        barrier_filter(
            scored.withColumn("__pd_barrier", F.lit(1)), F.lit(True)
        )
