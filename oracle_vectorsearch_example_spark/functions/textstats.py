"""Text analysis for large-scale training-data pipelines (extension
surface): token counting, language-ID heuristic, quality scoring, document
fingerprinting. All pure column expressions (JVM codegen) — these run over
every document at 100 TB, so no Python in the hot path.

Frozen specs (DuckDB-reimplementable for the oracle harness):
- ws_token_count: count of whitespace tokens (empties dropped).
- bpe_ish_token_count: matches of ``[a-z]+|[0-9]+|[^a-z0-9\\s]`` over
  lower(text) — a BPE-ish pre-tokenizer proxy.
- lang_id: stopword-hit heuristic over a tiny per-language marker set;
  deterministic tie-break by fixed language order (en, es, unk).
- quality_score: 0.4·cap(avg_word_len/8) + 0.3·stopword_ratio
  + 0.3·(1 − punct_ratio), rounded downstream.
- fingerprint: first 16 hex chars of md5 of the whitespace-normalized
  lowercase text (content-defined doc identity for dedup bookkeeping).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

EN_MARKERS = ["the", "and", "of", "to", "a"]
ES_MARKERS = ["el", "la", "de", "y", "que"]

_PUNCT_RE = r"[.!?,;:]"
_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != F.lit(""))


def ws_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    # regexp_count, not size(regexp_extract_all(...)): only the COUNT is
    # needed, and materializing the match array measured ~9x the cost of
    # counting at 2M docs (r14 opt). Same non-overlapping match count.
    return F.regexp_count(F.lower(text), F.lit(_BPE_RE)).cast("long")


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """Marker-word language guess; 'unk' when no markers hit. Punctuation is
    stripped from tokens before matching.

    The strip runs on the STRING, then tokenizes — identical hits to the
    per-token transform (punct removal never creates whitespace, so token
    boundaries hold; punct-only tokens vanish instead of becoming "",
    and "" never matches a marker) at one codegen'd regex pass instead of
    an interpreted per-token lambda (r14 opt)."""
    toks = tokens(F.regexp_replace(text, _PUNCT_RE, ""))
    en = _marker_hits(toks, EN_MARKERS)
    es = _marker_hits(toks, ES_MARKERS)
    return (
        F.when((en >= es) & (en > 0), F.lit("en"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unk"))
    )


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.regexp_count(text, F.lit(_PUNCT_RE))  # count only — no match array
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    # denominator = ORIGINAL token count (the transform kept arity, so its
    # size equaled tokens(text)); hits over string-level strip + retokenize
    # — identical counts, see lang_id
    n = F.size(tokens(text))
    hits = _marker_hits(
        tokens(F.regexp_replace(text, _PUNCT_RE, "")), EN_MARKERS + ES_MARKERS
    )
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def avg_word_len(text: Column) -> Column:
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0, 1]."""
    wl = F.least(avg_word_len(text) / F.lit(8.0), F.lit(1.0))
    return (
        F.lit(0.4) * wl
        + F.lit(0.3) * stopword_ratio(text)
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio(text), F.lit(1.0)))
    )


def _ngrams(toks: Column, n: int) -> Column:
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_fraction_of(grams: Column) -> Column:
    total = F.size(grams)
    return F.when(
        total > 0, F.lit(1.0) - F.size(F.array_distinct(grams)) / total
    ).otherwise(F.lit(0.0))


def _top_run_fraction_of(sorted_toks: Column) -> Column:
    """Max run length in a SORTED token array / total — one O(m)
    aggregate pass (run-length), instead of the O(distinct·m) nested
    filter count that interpreted HOFs make quadratic-with-big-constant."""
    n = F.size(sorted_toks)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(sorted_toks, init, step, lambda acc: acc["best"])
    return F.when(n > 0, best / n).otherwise(F.lit(0.0))


def _check_staging_free(df, names: tuple[str, ...]) -> None:
    """The staged metric functions materialize temp columns then drop
    them; a same-named input column would be silently replaced and then
    dropped, corrupting caller data (ADVICE r4 #5) — refuse instead."""
    clash = [c for c in names if c in df.columns]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with staging columns; rename them first"
        )


def barrier_filter(df, cond: Column):
    """``df.filter(cond)`` behind a predicate-pushdown BARRIER — use
    whenever ``cond`` references DERIVED METRIC COLUMNS of the staged
    frames in this module (r11, measured 12–400× at 20k–200k docs).

    The trap: ``PushPredicateThroughNonJoin`` substitutes the staged
    aliases into the filter condition and pushes it below every staged
    projection — re-inlining e.g. the tokenize into each HOF lambda
    body, where interpreted evaluation recomputes it PER ELEMENT (the
    select_winnow lesson, triggered by the OPTIMIZER instead of the
    author). Projections of the same columns stay fast because
    ``CollapseProject`` has a repeated-alias guard that predicate
    pushdown lacks. A non-deterministic column in the projection blocks
    the push, but only if the filter references it — an unused column
    is pruned first, restoring a deterministic projection; hence the
    conjunct below. Results are identical to ``df.filter(cond)`` (the
    guard conjunct is always true); only the plan changes."""
    _check_staging_free(df, ("__pd_barrier",))
    out = df.withColumn("__pd_barrier", F.monotonically_increasing_id())
    return out.filter(cond & (F.col("__pd_barrier") >= 0)).drop(
        "__pd_barrier"
    )


def repetition_metrics_df(df, text_col: str = "text"):
    """Per-document repetition signals of the publicly described
    Gopher/MassiveText quality rules, STAGED for scale: duplicate 2-/3-
    gram fractions (1 − distinct/total) and top-word share, added as
    ``dup2_frac`` / ``dup3_frac`` / ``top_word_frac`` columns.

    Tokens and gram arrays materialize in their own projections —
    multi-referenced columns survive CollapseProject, so the interpreted
    lambdas see plain attribute references instead of re-evaluating the
    tokenize per element (the ``select_winnow`` lesson); the top-word
    share is a sort + single run-length aggregate, never a nested
    per-distinct-token count. Row-local throughout: no shuffle, no UDF.
    

    Filtering on the returned METRIC COLUMNS must go through
    :func:`barrier_filter` — a plain ``.filter`` lets predicate
    pushdown re-inline the staged tokenize into every HOF lambda
    (r11; measured 12-400x).
    """
    _check_staging_free(df, ("__toks", "__g2", "__g3", "__sorted"))
    staged = df.withColumn("__toks", tokens(F.col(text_col)))
    staged = staged.withColumn("__g2", _ngrams(F.col("__toks"), 2)).withColumn(
        "__g3", _ngrams(F.col("__toks"), 3)
    ).withColumn("__sorted", F.array_sort(F.col("__toks")))
    return staged.withColumn(
        "dup2_frac", _dup_fraction_of(F.col("__g2"))
    ).withColumn("dup3_frac", _dup_fraction_of(F.col("__g3"))).withColumn(
        "top_word_frac", _top_run_fraction_of(F.col("__sorted"))
    ).drop("__toks", "__g2", "__g3", "__sorted")


def dup_ngram_fraction(text: Column, n: int = 2) -> Column:
    """Scalar-column form of the duplicate-n-gram fraction. Convenient
    for filters on already-narrow data (e.g. the corpus-build gate);
    for whole-table scans prefer :func:`repetition_metrics_df`, which
    stages the token materialization."""
    return _dup_fraction_of(_ngrams(tokens(text), n))


def top_word_fraction(text: Column) -> Column:
    """Scalar-column form of the top-word share (sorted run-length
    pass). Prefer :func:`repetition_metrics_df` for whole-table scans."""
    return _top_run_fraction_of(F.array_sort(tokens(text)))


def fingerprint(text: Column) -> Column:
    """16-hex-char md5 fingerprint of normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, 16)


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization (corpus-prep step: canonically-equivalent
    byte sequences — e.g. precomposed vs combining accents — must hash,
    dedup, and shingle identically). Arrow-batched pandas UDF over stdlib
    ``unicodedata``; there is no JVM builtin for Unicode normalization in
    the Spark function library."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t) if t is not None else None)

    return _nfc(text)


def text_metrics_df(df, text_col: str = "text"):
    """All per-document text metrics in one staged pass: tokenize ONCE into
    materialized columns, then compute counts/lang/quality from the arrays.
    Same outputs as the per-column functions above (which re-tokenize per
    metric when composed — fine for one metric, 5× the work for five).
    Adds: ws_tokens, bpe_tokens, fp, lang_guess, quality.

    Filtering on the returned METRIC COLUMNS must go through
    :func:`barrier_filter` — a plain ``.filter`` lets predicate
    pushdown re-inline the staged tokenize into every HOF lambda
    (r11; measured 12-400x).
    """
    t = F.col(text_col)
    _check_staging_free(df, ("__toks", "__clean"))
    # __clean: string-level punct strip + retokenize — identical marker
    # hits to the old per-token transform (see lang_id) at one codegen'd
    # regex pass over the text instead of an interpreted lambda per token
    # (r14 opt: the transform was ~40% of this stage's wall at 2M docs).
    # NOTE __clean may be SHORTER than __toks (punct-only tokens vanish);
    # only marker hits read it, so counts are unaffected.
    staged = df.withColumn("__toks", tokens(t)).withColumn(
        "__clean", tokens(F.regexp_replace(t, _PUNCT_RE, ""))
    )
    toks, clean = F.col("__toks"), F.col("__clean")
    n_tok = F.size(toks)
    en = _marker_hits(clean, EN_MARKERS)
    es = _marker_hits(clean, ES_MARKERS)
    stop_hits = _marker_hits(clean, EN_MARKERS + ES_MARKERS)
    n = F.length(t)
    n_punct = F.regexp_count(t, F.lit(_PUNCT_RE))  # count only — no array
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    awl = F.when(n_tok > 0, tok_chars.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    sr = F.when(n_tok > 0, stop_hits.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0))
    pr = F.when(n > 0, n_punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return staged.withColumns(
        {
            "ws_tokens": n_tok.cast("long"),
            "bpe_tokens": bpe_ish_token_count(t),
            "fp": fingerprint(t),
            "lang_guess": (
                F.when((en >= es) & (en > 0), F.lit("en"))
                .when(es > 0, F.lit("es"))
                .otherwise(F.lit("unk"))
            ),
            "quality": (
                F.lit(0.4) * F.least(awl / F.lit(8.0), F.lit(1.0))
                + F.lit(0.3) * sr
                + F.lit(0.3) * (F.lit(1.0) - F.least(pr, F.lit(1.0)))
            ),
        }
    ).drop("__toks", "__clean")


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules_df(
    df,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
):
    """The Gopher rule-based quality gate (Rae et al. 2021, §A1.1 —
    the NAMED rule set most public pipelines cite, distinct from the
    composite heuristic in :func:`text_metrics_df`): per document,

    1. word count within [min_words, max_words];
    2. mean word length within [min/max_mean_word_len];
    3. symbol-to-word ratio ('#' chars + '…' chars + non-overlapping
       '...' occurrences, over words) ≤ max_symbol_ratio;
    4. fraction of non-blank lines starting with a bullet
       ('•', '-', '*') ≤ max_bullet_line_frac;
    5. fraction of non-blank lines ending with an ellipsis ≤
       max_ellipsis_line_frac;
    6. fraction of words containing ≥ 1 ASCII alphabetic char ≥
       min_alpha_word_frac (the rule that makes Gopher an
       English-corpus gate — CJK text fails it by design);
    7. ≥ min_stop_hits DISTINCT Gopher stop words present
       ({the, be, to, of, and, that, have, with}).

    Appends the metric columns (6 dp — per-row arithmetic, identical on
    both engines) and boolean ``gopher_pass``. Pure column expressions,
    map-side, no shuffle; words tokenize once into a staged column.

    Filtering on the returned METRIC COLUMNS must go through
    :func:`barrier_filter` — a plain ``.filter`` lets predicate
    pushdown re-inline the staged tokenize into every HOF lambda
    (r11; measured 12-400x).
    """
    t = F.col(text_col)
    _check_staging_free(df, ("__gw", "__gl"))
    staged = df.withColumn(
        "__gw", F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    ).withColumn(
        "__gl",
        F.filter(F.split(t, "\n"), lambda l: F.trim(l) != F.lit("")),
    )
    words, lines = F.col("__gw"), F.col("__gl")
    n_words = F.size(words)
    tok_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.when(
        n_words > 0,
        F.round(tok_chars.cast("double") / n_words.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_uni_ellip = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    n_dot_ellip = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n_words > 0,
        F.round(
            (n_hash + n_uni_ellip + n_dot_ellip).cast("double")
            / n_words.cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("•")
            | F.ltrim(l).startswith("-")
            | F.ltrim(l).startswith("*"),
        )
    )
    ellip = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("…") | F.rtrim(l).endswith("..."),
        )
    )
    bullet_frac = F.when(
        n_lines > 0, F.round(bullet.cast("double") / n_lines.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    ellip_frac = F.when(
        n_lines > 0, F.round(ellip.cast("double") / n_lines.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(
        n_words > 0, F.round(alpha.cast("double") / n_words.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)), stops
        )
    )
    passes = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_line_frac)
        & (ellip_frac <= max_ellipsis_line_frac)
        & (alpha_frac >= min_alpha_word_frac)
        & (stop_hits >= min_stop_hits)
    )
    return staged.withColumns(
        {
            "n_words": n_words.cast("long"),
            "mean_word_len": mean_wl,
            "symbol_ratio": symbol_ratio,
            "bullet_line_frac": bullet_frac,
            "ellipsis_line_frac": ellip_frac,
            "alpha_word_frac": alpha_frac,
            "stop_hits": stop_hits.cast("long"),
            "gopher_pass": passes,
        }
    ).drop("__gw", "__gl")


def _dup_run_stats(sorted_arr: Column) -> Column:
    """One O(m) run-length pass over a SORTED string array, returning a
    struct of the §A1.2 building blocks: ``docc`` = occurrences that
    belong to duplicated groups (count ≥ 2, first copy included — every
    copy of a duplicated element is a duplicate of another), ``dch`` =
    their summed char lengths, ``maxrun``/``bestlen`` = the most
    frequent element's count and char length (ascending sort + strict
    '>' keeps the lexicographically smallest on ties — deterministic in
    any engine). Same single-aggregate discipline as
    :func:`_top_run_fraction_of` — never a nested per-distinct count."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("docc"),
        F.lit(0).cast("long").alias("dch"),
        F.lit(0).alias("maxrun"),
        F.lit(0).alias("bestlen"),
    )

    def step(acc, x):
        same = (acc["run"] > 0) & (x == acc["prev"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1))
        inc = (
            F.when(same & (acc["run"] == 1), F.lit(2))
            .when(same, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        new_best = run > acc["maxrun"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc["docc"] + inc).alias("docc"),
            (acc["dch"] + inc * F.length(x).cast("long")).alias("dch"),
            F.when(new_best, run).otherwise(acc["maxrun"]).alias("maxrun"),
            F.when(new_best, F.length(x)).otherwise(acc["bestlen"]).alias(
                "bestlen"
            ),
        )

    return F.aggregate(sorted_arr, init, step)


def gopher_repetition_df(
    df,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top2_char_frac: float = 0.20,
    max_top3_char_frac: float = 0.18,
    max_top4_char_frac: float = 0.16,
    max_dup5_char_frac: float = 0.15,
    max_dup6_char_frac: float = 0.14,
    max_dup7_char_frac: float = 0.13,
    max_dup8_char_frac: float = 0.12,
    max_dup9_char_frac: float = 0.11,
    max_dup10_char_frac: float = 0.10,
):
    """The full Gopher repetition-removal suite (Rae et al. 2021 §A1.2,
    Table A1 — the NAMED set beside the §A1.1 quality rules of
    :func:`gopher_rules_df`; default thresholds are the paper's):

    - ``dup_line_frac`` / ``dup_para_frac``: fraction of lines /
      paragraphs that are duplicates (occurrences in groups appearing
      ≥ 2 times, first copy included, over all kept lines/paragraphs);
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: fraction of
      line/paragraph CHARACTERS inside those duplicated groups;
    - ``top{2,3,4}_char_frac``: characters covered by the single most
      frequent word n-gram (count × gram char length, over normalized
      text chars; ties → lexicographically smallest gram);
    - ``dup{5..10}_char_frac``: characters inside word n-grams occurring
      ≥ 2 times — the frozen OCCURRENCE-SUM proxy (Σ count·len over
      duplicated grams; overlapping occurrences counted each, so
      degenerate repetition can exceed 1.0) for the paper's
      position-coverage measure, chosen because it replays as exact
      relational math in any SQL engine.

    Frozen spec: lines = '\\n'-split, trimmed, empties dropped,
    compared trimmed; paragraphs the same on '\\n{2,}'; words = the repo
    tokenizer (lowercase, '\\s+'-split); gram char length includes its
    single-space joins; char denominator for gram fractions =
    length(words joined by single spaces); ratios 6 dp. Appends the 13
    metric columns + ``n_lines``/``n_paras``/``n_words`` + boolean
    ``repetition_pass``. Pure column expressions — each metric is one
    sort + one O(m) run-length aggregate, map-side, no shuffle/UDF.

    Filtering on the returned METRIC COLUMNS must go through
    :func:`barrier_filter` — a plain ``.filter`` lets predicate
    pushdown re-inline the staged tokenize into every HOF lambda
    (r11; measured 12-400x).
    """
    t = F.col(text_col)
    staging = ("__rw", "__rl", "__rp") + tuple(f"__s{n}" for n in range(2, 11)) + (
        "__sl", "__sp",
    )
    _check_staging_free(df, staging)
    staged = (
        df.withColumn("__rw", tokens(t))
        .withColumn(
            "__rl",
            F.array_sort(
                F.filter(
                    F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
                    lambda l: l != F.lit(""),
                )
            ),
        )
        .withColumn(
            "__rp",
            F.array_sort(
                F.filter(
                    F.transform(F.split(t, r"\n{2,}"), lambda p_: F.trim(p_)),
                    lambda p: p != F.lit(""),
                )
            ),
        )
    )
    staged = staged.withColumn("__sl", _dup_run_stats(F.col("__rl"))).withColumn(
        "__sp", _dup_run_stats(F.col("__rp"))
    )
    for n in range(2, 11):
        staged = staged.withColumn(
            f"__s{n}",
            _dup_run_stats(F.array_sort(_ngrams(F.col("__rw"), n))),
        )

    def _arr_chars(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )

    def _frac(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        ).otherwise(F.lit(0.0))

    n_words = F.size(F.col("__rw"))
    char_den = F.when(n_words > 0, _arr_chars(F.col("__rw")) + n_words - 1).otherwise(
        F.lit(0).cast("long")
    )
    n_lines, n_paras = F.size(F.col("__rl")), F.size(F.col("__rp"))
    line_chars, para_chars = _arr_chars(F.col("__rl")), _arr_chars(F.col("__rp"))
    cols = {
        "n_words": n_words.cast("long"),
        "n_lines": n_lines.cast("long"),
        "n_paras": n_paras.cast("long"),
        "dup_line_frac": _frac(F.col("__sl.docc"), n_lines),
        "dup_line_char_frac": _frac(F.col("__sl.dch"), line_chars),
        "dup_para_frac": _frac(F.col("__sp.docc"), n_paras),
        "dup_para_char_frac": _frac(F.col("__sp.dch"), para_chars),
    }
    for n in (2, 3, 4):
        cols[f"top{n}_char_frac"] = _frac(
            F.col(f"__s{n}.maxrun").cast("long") * F.col(f"__s{n}.bestlen"),
            char_den,
        )
    for n in range(5, 11):
        cols[f"dup{n}_char_frac"] = _frac(F.col(f"__s{n}.dch"), char_den)
    out = staged.withColumns(cols)
    passes = (
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_para_frac") <= max_dup_para_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("dup_para_char_frac") <= max_dup_para_char_frac)
        & (F.col("top2_char_frac") <= max_top2_char_frac)
        & (F.col("top3_char_frac") <= max_top3_char_frac)
        & (F.col("top4_char_frac") <= max_top4_char_frac)
        & (F.col("dup5_char_frac") <= max_dup5_char_frac)
        & (F.col("dup6_char_frac") <= max_dup6_char_frac)
        & (F.col("dup7_char_frac") <= max_dup7_char_frac)
        & (F.col("dup8_char_frac") <= max_dup8_char_frac)
        & (F.col("dup9_char_frac") <= max_dup9_char_frac)
        & (F.col("dup10_char_frac") <= max_dup10_char_frac)
    )
    return out.withColumn("repetition_pass", passes).drop(*staging)


def gopher_repetition_arrow_df(
    df,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top2_char_frac: float = 0.20,
    max_top3_char_frac: float = 0.18,
    max_top4_char_frac: float = 0.16,
    max_dup5_char_frac: float = 0.15,
    max_dup6_char_frac: float = 0.14,
    max_dup7_char_frac: float = 0.13,
    max_dup8_char_frac: float = 0.12,
    max_dup9_char_frac: float = 0.11,
    max_dup10_char_frac: float = 0.10,
):
    """Arrow throughput twin of :func:`gopher_repetition_df` — the SAME
    16 numbers + pass bit per document, computed per Arrow batch with
    Counter/str ops instead of 11 interpreted HOF folds (Spark's
    `aggregate` lambdas never reach codegen, and the fold cost — not
    the algorithm — dominated the 200k bench at 0.21 ms/doc). The expr
    version stays the golden/normative spec; this path is pytest-pinned
    equal to it column-for-column (same fixture, incl. rounding and
    null-text behavior) — the langid canonical=False / pHash Arrow-path
    precedent. Use for corpus-scale gating; never for hash goldens.

    Parity traps honored: Java ``\\s`` is ASCII-only (``re.ASCII``),
    Spark ``trim`` strips 0x20 only, ``F.round`` is HALF_UP on the
    double's shortest decimal repr (``Decimal(repr(x))``), and a NULL
    text mirrors the expr path's NULL counts with 0.0 fractions."""
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import types as T

    ws = re.compile(r"\s+", re.ASCII)
    nl2 = re.compile(r"\n{2,}")
    thr = (
        max_dup_line_frac, max_dup_para_frac, max_dup_line_char_frac,
        max_dup_para_char_frac, max_top2_char_frac, max_top3_char_frac,
        max_top4_char_frac, max_dup5_char_frac, max_dup6_char_frac,
        max_dup7_char_frac, max_dup8_char_frac, max_dup9_char_frac,
        max_dup10_char_frac,
    )
    metric_names = [
        "n_words", "n_lines", "n_paras",
        "dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac",
        "top2_char_frac", "top3_char_frac", "top4_char_frac",
        "dup5_char_frac", "dup6_char_frac", "dup7_char_frac",
        "dup8_char_frac", "dup9_char_frac", "dup10_char_frac",
        "repetition_pass",
    ]
    _check_staging_free(df, tuple(metric_names))
    q6 = Decimal("0.000001")

    def rnd(num: int, den: int) -> float:
        if den <= 0:
            return 0.0
        return float(
            Decimal(repr(num / den)).quantize(q6, rounding=ROUND_HALF_UP)
        )

    def dup_stats(items: list[str]) -> tuple[int, int, int, int]:
        """(docc, dch, maxrun, bestlen) — Counter twin of the sorted
        run-length fold (ascending order + strict '>' == most frequent
        with lexicographically smallest tie-break)."""
        from collections import Counter

        c = Counter(items)
        docc = dch = maxrun = bestlen = 0
        for x in sorted(c):
            n = c[x]
            if n >= 2:
                docc += n
                dch += n * len(x)
            if n > maxrun:
                maxrun, bestlen = n, len(x)
        return docc, dch, maxrun, bestlen

    def one(text) -> list:
        if text is None:
            # expr parity: size(NULL array) is NULL under Spark 4's
            # defaults; fractions guard to 0.0 and the pass bit holds
            return [None, None, None] + [0.0] * 13 + [True]
        low = text.strip(" ").lower()
        toks = [w for w in ws.split(low) if w]
        lines = [x for x in (s.strip(" ") for s in text.split("\n")) if x]
        paras = [x for x in (s.strip(" ") for s in nl2.split(text)) if x]
        nw, nl, np_ = len(toks), len(lines), len(paras)
        char_den = sum(len(w) for w in toks) + nw - 1 if nw > 0 else 0
        line_chars = sum(len(x) for x in lines)
        para_chars = sum(len(x) for x in paras)
        l_docc, l_dch, _, _ = dup_stats(lines)
        p_docc, p_dch, _, _ = dup_stats(paras)
        row = [
            nw, nl, np_,
            rnd(l_docc, nl), rnd(l_dch, line_chars),
            rnd(p_docc, np_), rnd(p_dch, para_chars),
        ]
        for n in (2, 3, 4):
            grams = [
                " ".join(toks[i : i + n]) for i in range(nw - n + 1)
            ]
            _, _, maxrun, bestlen = dup_stats(grams)
            row.append(rnd(maxrun * bestlen, char_den))
        for n in range(5, 11):
            grams = [
                " ".join(toks[i : i + n]) for i in range(nw - n + 1)
            ]
            docc, dch, _, _ = dup_stats(grams)
            row.append(rnd(dch, char_den))
        row.append(all(v <= t for v, t in zip(row[3:16], thr)))
        return row

    fields = list(df.schema.fields) + [
        T.StructField("n_words", T.LongType()),
        T.StructField("n_lines", T.LongType()),
        T.StructField("n_paras", T.LongType()),
        *[
            T.StructField(nm, T.DoubleType())
            for nm in metric_names[3:16]
        ],
        T.StructField("repetition_pass", T.BooleanType()),
    ]
    schema = T.StructType(fields)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            vals = [one(t) for t in b[text_col]]
            out = b.copy()
            for j, nm in enumerate(metric_names):
                out[nm] = [v[j] for v in vals]
            yield out

    return df.mapInPandas(run, schema)


def gram_hashes(text: Column, k: int = 8) -> Column:
    """Rolling k-gram hash stream of the normalized text: 32-bit md5-prefix
    ints, one per character position. Empty for texts shorter than k."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    gram_hash = lambda i: F.conv(  # noqa: E731 - local lambda reads clearer inline
        F.substring(F.md5(F.substring(norm, i + 1, F.lit(k))), F.lit(1), F.lit(8)),
        16,
        10,
    ).cast("bigint")
    return F.when(
        F.length(norm) >= k,
        F.transform(F.sequence(F.lit(0), F.length(norm) - k), gram_hash),
    ).otherwise(F.array().cast("array<bigint>"))


def select_winnow(hashes: Column, w: int = 4) -> Column:
    """Winnowing selection: min of each w-wide hash window, deduped.

    Single-pass ``aggregate`` fold with a (ring of last w−1, selections)
    accumulator, NOT a windows-by-index ``transform``: the index form
    references the hash stream in two places, and when Catalyst's project
    collapsing inlines the (O(n)-md5) stream into each, the interpreted
    lambda re-evaluates it per window — measured 100× slower. The fold
    touches the stream exactly once, so it stays O(n·w) cheap ops no
    matter how the surrounding projections are rewritten."""
    empty = F.array().cast("array<bigint>")
    folded = F.aggregate(
        hashes,
        F.struct(empty.alias("ring"), empty.alias("sel")),
        lambda acc, x: F.struct(
            F.when(
                F.size(acc["ring"]) < w - 1, F.concat(acc["ring"], F.array(x))
            )
            .otherwise(F.concat(F.slice(acc["ring"], 2, w - 2), F.array(x)))
            .alias("ring"),
            F.when(
                F.size(acc["ring"]) == w - 1,
                F.concat(
                    acc["sel"],
                    F.array(F.array_min(F.concat(acc["ring"], F.array(x)))),
                ),
            )
            .otherwise(acc["sel"])
            .alias("sel"),
        ),
        lambda acc: F.array_distinct(acc["sel"]),
    )
    return F.when(F.size(hashes) >= w, folded).otherwise(empty)


def winnow_fingerprints_df(
    df, text_col: str = "text", k: int = 8, w: int = 4, out_col: str = "fingerprints"
):
    """Winnowing document fingerprints (the rolling-hash scheme): hash
    every k-char gram of the normalized text, slide a w-hash window, keep
    each window's minimum, dedupe. Near-identical documents share most
    selected fingerprints even under local edits — unlike the whole-doc
    md5, which any edit changes. Texts shorter than k + w − 1 chars yield
    an empty set. Two projections by design (see :func:`select_winnow`)."""
    _check_staging_free(df, ("__gram_hashes",))
    staged = df.withColumn("__gram_hashes", gram_hashes(F.col(text_col), k))
    return staged.withColumn(out_col, select_winnow(F.col("__gram_hashes"), w)).drop(
        "__gram_hashes"
    )
