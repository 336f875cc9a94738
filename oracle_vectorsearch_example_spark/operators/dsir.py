"""DSIR-style data selection — importance resampling of a raw corpus
toward a target distribution (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169: the
method behind quality-targeted pre-training mixes). Given a small
TARGET corpus (e.g. curated text) and a large RAW corpus, each raw
document gets an importance weight

    log w(x) = Σ_{b ∈ features(x)} [ ln p̂_target(b) − ln p̂_raw(b) ]

under a bag-of-hashed-bigrams model, and documents are sampled without
replacement ∝ w via the Gumbel-top-k trick (Kool et al. 2019, public).

Frozen spec (engine-replayable, the repo's standard disciplines):

- features: word bigrams (the bm25 tokenizer: lowercase single-space
  split) hashed to ``n_buckets`` by the md5-bucket idiom
  (operators/sampling.py) over ``w1 || ' ' || w2``;
- p̂(b) = (count(b) + alpha) / (total + alpha·n_buckets) — add-alpha,
  so unseen buckets stay finite on both sides;
- per-document sum = the order-canonicalized fold (position-sorted
  events) + 6 dp rounding — layout-independent, oracle-reproducible;
- sampling noise: Gumbel g(id) = −ln(−ln(u)) with u = (hash_bucket(id,
  "dsir:<seed>") + 0.5) / BUCKETS — a pure function of (id, seed), the X7
  discipline (no RNG streams, reproducible under repartition). Top-n by
  (log w + g) is exactly sampling-without-replacement ∝ softmax(log w).

Scale posture: BOTH feature-count tables are bucket-bounded
(≤ n_buckets rows) and broadcast; totals are scalars. The raw corpus
explodes to skinny bigram-event rows once and re-aggregates per doc —
one shuffle on doc id; payloads never shuffle (selection re-joins ids
semi-join-style). No UDFs anywhere.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import BUCKETS, hash_bucket


def _bigram_buckets(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, pos, b) hashed-bigram event rows — map-side only."""
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        ).alias("toks"),
    )
    events = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> struct(i AS pos, "
                    "concat(toks[i], ' ', toks[i+1]) AS bg))"
                )
            ).alias("e"),
        )
        .select(id_col, "e.pos", "e.bg")
    )
    b = (
        F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")
    return events.select(id_col, "pos", b.alias("b"))


class DsirModel(NamedTuple):
    """Fitted feature statistics: two bucket-bounded count tables
    (≤ n_buckets rows each) + totals + the smoothing constant."""

    target_counts: DataFrame  # (b, ct)
    raw_counts: DataFrame  # (b, cr)
    target_total: float
    raw_total: float
    n_buckets: int
    alpha: float


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> DsirModel:
    """Count hashed-bigram features over both corpora. Each count table
    is one group-by on the bucket key and is ≤ n_buckets rows.

    Target size matters: DSIR discriminates by RATE differences, not
    membership — with singleton counts the add-alpha ratios
    (1+a)/(c_r+a) vs (0+a)/(1+a) nearly cancel and log w carries no
    signal. Fit on a target corpus large (or internally repetitive)
    enough that its characteristic features reach counts well above 1."""

    def counts(df):
        return (
            _bigram_buckets(df, id_col, text_col, n_buckets)
            .groupBy("b")
            .agg(F.count("*").cast("double").alias("c"))
        )

    tc = counts(target).withColumnRenamed("c", "ct")
    rc = counts(raw).withColumnRenamed("c", "cr")
    tt = tc.agg(F.sum("ct")).collect()[0][0] or 0.0
    rt = rc.agg(F.sum("cr")).collect()[0][0] or 0.0
    return DsirModel(tc, rc, float(tt), float(rt), n_buckets, float(alpha))


def dsir_scores(
    docs: DataFrame,
    model: DsirModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "logw",
) -> DataFrame:
    """(id, n_feats, logw) — per-document log importance weight, summed
    with the order-canonicalized fold and rounded to 6 dp. Documents
    with < 2 tokens carry no features and drop out."""
    ev = _bigram_buckets(docs, id_col, text_col, model.n_buckets)
    a, nb = model.alpha, float(model.n_buckets)
    contrib = (
        F.log(F.coalesce(F.col("ct"), F.lit(0.0)) + F.lit(a))
        - F.lit(math.log(model.target_total + a * nb))
        - F.log(F.coalesce(F.col("cr"), F.lit(0.0)) + F.lit(a))
        + F.lit(math.log(model.raw_total + a * nb))
    )
    scored = (
        ev.join(F.broadcast(model.target_counts), "b", "left")
        .join(F.broadcast(model.raw_counts), "b", "left")
        .select(id_col, "pos", contrib.alias("lw"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("pos", "lw"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["lw"],
                ),
                6,
            ).alias(out_col),
        )
    )


def dsir_sample(
    docs: DataFrame,
    model: DsirModel,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Select ``n`` documents without replacement ∝ softmax(log w) via
    Gumbel-top-k with HASH-DERIVED noise — the whole draw is a pure
    function of (corpus, target, seed), reproducible under repartition.
    Returns the selected documents (payload re-joined by id)."""
    scores = dsir_scores(docs, model, id_col, text_col)
    # salted sub-stream: sharing the bare (seed, id) bucket with
    # hash_split would couple the Gumbel noise to split assignment
    # (high-u picks could only land in high/val-test buckets)
    u = (
        hash_bucket(F.col(id_col), f"dsir:{seed}").cast("double") + 0.5
    ) / float(BUCKETS)
    keyed = scores.withColumn("__g", F.col("logw") - F.log(-F.log(u)))
    picked = keyed.orderBy(
        F.col("__g").desc(), F.col(id_col)
    ).limit(n).select(id_col)
    return docs.join(picked, id_col, "left_semi")
