"""N-gram language-model perplexity scoring — the CCNet-style quality
gate (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", arXiv:1911.00359): score every document
by the perplexity of a language model trained on a trusted reference
corpus, then keep the fluent (low-perplexity) tail. CCNet uses a KenLM
5-gram; this module is the same pipeline stage with an exactly-frozen,
engine-reproducible spec — an add-alpha (Lidstone) bigram model — so
the golden query hash-matches an independent DuckDB replay. It extends
the reference's text-quality posture (the corpus gates feeding the
vector pipeline, 01_pdf_to_vector.sql:186-205) with the model-based
filter every large-scale training-data pipeline runs.

Frozen model spec (what both engines compute):

- tokens: lowercase, split on single space, empties dropped — the same
  deliberately-minimal tokenizer as operators/bm25.py;
- bigram counts c(w1,w2) over the training corpus; context counts
  c(w1) = Sigma_w2 c(w1,w2) DERIVED from the bigram table (so the
  add-alpha distribution sums to exactly 1 over the event space);
- vocabulary V = distinct training tokens + 1 (one reserved slot of
  smoothing mass for out-of-vocabulary words);
- log P(w2|w1) = ln((c(w1,w2) + alpha) / (c(w1) + alpha*V)) — unseen
  contexts degrade gracefully to ln(1/V);
- document score: nll = round(Sigma -log P, 6) over the doc's bigrams,
  ppl = round(exp(nll / n_bigrams), 4). Docs with < 2 tokens have no
  bigram events and drop out of the scored frame.

Scale posture: training is two shuffles on natural keys (bigram
group-by, then the w1 re-aggregation); scoring explodes each scored
doc into (w1, w2) event rows and joins the LM tables on their keys —
the postings-join family (BM25's plan shape). Document payloads never
shuffle for scoring; only skinny event rows do. A trained LM is
corpus-vocabulary-bounded (typically MBs) — pass ``broadcast_lm=True``
to pin the join map-side; by default AQE decides from runtime sizes.
The per-document sum uses the order-canonicalized fold (position-sorted
``collect_list`` + ``F.aggregate``) so the floating sum is a pure
function of the event set, not partition layout — the same determinism
discipline as operators/bm25.py.

Everything is JVM built-ins; no UDFs anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks) rows: lowercase single-space tokens, empties dropped
    (the bm25 tokenizer, kept as arrays for map-side bigram extraction)."""
    return df.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        ).alias("toks"),
    )


def _bigram_events(toks: DataFrame, id_col: str) -> DataFrame:
    """Explode token arrays into (id, pos, w1, w2) bigram event rows —
    pure map stage (transform over the array; no window, no self-join)."""
    return (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> struct(i AS pos, toks[i] AS w1, toks[i+1] AS w2))"
                )
            ).alias("e"),
        )
        .select(id_col, "e.pos", "e.w1", "e.w2")
    )


class BigramLM(NamedTuple):
    """Trained LM: two skinny count tables + two scalars. DataFrames —
    persist or write them like any table for reuse across scoring runs."""

    bigrams: DataFrame  # (w1, w2, c12)
    contexts: DataFrame  # (w1, c1) — c1 = Sigma_w2 c12
    vocab_size: float  # distinct training tokens + 1 (OOV slot)
    alpha: float


def train_bigram_lm(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
) -> BigramLM:
    """Count bigrams over the training corpus: one tokenize pass, one
    group-by shuffle on (w1, w2), one re-aggregation to context counts.
    V collects as a scalar — the same bounded-metadata contract as IVF
    centroids and BM25's (N, avgdl)."""
    toks = _token_arrays(docs, id_col, text_col)
    events = _bigram_events(toks, id_col)
    bigrams = events.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c12")
    )
    contexts = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    n_vocab = (
        toks.select(F.explode("toks").alias("w"))
        .agg(F.count_distinct("w"))
        .collect()[0][0]
    )
    return BigramLM(bigrams, contexts, float(n_vocab) + 1.0, float(alpha))


def perplexity_df(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "ppl",
    broadcast_lm: bool = False,
) -> DataFrame:
    """(id, n_bigrams, ppl) for every document with >= 2 tokens. Event
    rows join the LM on (w1, w2) / (w1); document text never shuffles.
    ``broadcast_lm`` pins both LM tables map-side (use when the trained
    vocabulary is known-small); otherwise AQE picks the strategy."""
    events = _bigram_events(_token_arrays(docs, id_col, text_col), id_col)
    bg, cx = lm.bigrams, lm.contexts
    if broadcast_lm:
        bg, cx = F.broadcast(bg), F.broadcast(cx)
    a, v = lm.alpha, lm.vocab_size
    scored = (
        events.join(bg, ["w1", "w2"], "left")
        .join(cx, "w1", "left")
        .select(
            id_col,
            "pos",
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0.0)) + F.lit(a))
                    / (F.coalesce(F.col("c1"), F.lit(0.0)) + F.lit(a * v))
                )
            ).alias("nlp"),
        )
    )
    return (
        scored.groupBy(id_col)
        # order-canonicalized fold: position-sorted events, left fold —
        # the sum is a pure function of the event set (see module docs)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "nlp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["nlp"],
            ).alias("__nll"),
        )
        .withColumn(
            out_col,
            F.round(F.exp(F.round("__nll", 6) / F.col("n_bigrams")), 4),
        )
        .drop("__nll")
    )


def perplexity_buckets(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    broadcast_lm: bool = False,
    out_col: str = "bucket",
    approx: int | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail partitioning (Wenzek et al. 2020 §4.3):
    per ``group_col`` (typically language — CCNet cuts per language so
    low-resource languages aren't judged by the dominant one's scale),
    documents split into perplexity TERCILES: head = cleanest third,
    middle, tail. Returns (id[, group], n_bigrams, ppl, bucket).

    Frozen spec: cutoffs are the exact interpolated percentiles at 1/3
    and 2/3 of the group's ppl values, rounded to 6 dp (both engines
    interpolate rank p·(n−1) identically); bucket = head iff ppl ≤ c1,
    middle iff ppl ≤ c2, else tail. The cutoff frame is group-bounded
    metadata and broadcasts; payloads never shuffle.

    ``approx`` (r9, the 100 TB knob): the exact interpolated percentile
    is a full-sort-shaped aggregate — at corpus scale pass an accuracy
    (the Greenwald-Khanna inverse relative error of
    ``percentile_approx``; 10000 ⇒ rank error ≤ n/10000) to compute the
    cuts with the mergeable sketch instead. Sketch cuts are NOT part of
    the hash-golden spec (approx ops are never hash-checked, SURVEY §5);
    the tolerance gate in tests pins bucket-assignment agreement ≥ 0.999
    against the exact cuts at 200k docs. Only documents whose ppl lands
    between the exact and sketch cut can change bucket — the boundary
    band the rank error bounds."""
    ppl = perplexity_df(docs, lm, id_col, text_col, broadcast_lm=broadcast_lm)
    if group_col is not None:
        ppl = ppl.join(docs.select(id_col, group_col), id_col)
        cuts = ppl.groupBy(group_col)
    else:
        cuts = ppl.groupBy()
    if approx is not None:
        if approx < 1:
            raise ValueError("approx (percentile_approx accuracy) must be >= 1")
        cuts = cuts.agg(
            F.round(F.percentile_approx("ppl", 1.0 / 3, approx), 6).alias("__c1"),
            F.round(F.percentile_approx("ppl", 2.0 / 3, approx), 6).alias("__c2"),
        )
    else:
        cuts = cuts.agg(
            F.round(F.percentile("ppl", 1.0 / 3), 6).alias("__c1"),
            F.round(F.percentile("ppl", 2.0 / 3), 6).alias("__c2"),
        )
    joined = (
        ppl.join(F.broadcast(cuts), group_col)
        if group_col is not None
        else ppl.crossJoin(F.broadcast(cuts))
    )
    bucket = (
        F.when(F.col("ppl") <= F.col("__c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("__c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    keep = [id_col] + ([group_col] if group_col is not None else [])
    return joined.select(*keep, "n_bigrams", "ppl", bucket.alias(out_col))


def perplexity_filter(
    docs: DataFrame,
    lm: BigramLM,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """Keep documents whose LM perplexity is <= ``max_ppl`` (CCNet's
    head/middle bucket selection as a single threshold). Docs with < 2
    tokens carry no evidence either way and are KEPT — a length gate is
    a different filter (functions/textstats.py). Payloads re-join the
    passing id set semi-join-style; only ids cross the wire twice."""
    passing = (
        perplexity_df(docs, lm, id_col, text_col, broadcast_lm=broadcast_lm)
        .filter(F.col("ppl") > max_ppl)
        .select(id_col)
    )
    return docs.join(passing, id_col, "left_anti")
