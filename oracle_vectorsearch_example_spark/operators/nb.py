"""Learned quality gate via multinomial Naive Bayes over hashed tokens
(X47, training-pipeline extension surface) — the GPT-3 / CCNet-style
classifier gate that is LEARNED from data rather than rule-based: train
on a curated TARGET corpus against the RAW pool, then keep the raw
documents the classifier scores toward the target class (GPT-3's
WebText-vs-CommonCrawl quality classifier, Brown et al. 2020 appendix A;
CCNet's target-LM ordering, Wenzek et al. 2020).

Why Naive Bayes and not logistic regression: NB's fit IS two count
tables — integer bucket counts plus totals — and its score is a sum of
log count ratios. Both are exact fold math, so the entire train+score
path replays in DuckDB for hash-golden verification (a trained LR's
SGD trajectory never would). The score is the class log-odds

    score(x) = [ ln n_target_docs − ln n_raw_docs ]           (prior)
             + Σ_{tokens t ∈ x} [ ln p̂_T(b(t)) − ln p̂_R(b(t)) ]

with p̂_c(b) = (count_c(b) + α) / (total_c + α·B) — add-alpha, so unseen
buckets stay finite on both sides. score > 0 ⇔ P(target|x) > P(raw|x).

Relation to the siblings: X29 (bigram-LM perplexity) gates on fluency
under ONE reference model; X33 (DSIR) importance-RESAMPLES toward a
target distribution with hashed-bigram ratios and no prior; this gate
CLASSIFIES — two-class, unigram features, document prior — and is
thresholded, not sampled.

Frozen spec (engine-replayable, the repo's standard disciplines):

- tokens: the bm25 tokenizer (lowercase, split on single space, drop
  empties) hashed to ``n_buckets`` by the md5-bucket idiom
  (operators/sampling.py): first 8 md5 hex chars as a BIGINT mod B;
- counts and totals are exact integers (cast double for the ratios);
- the per-document sum folds position-sorted token events
  (order-canonicalized, operators/bm25.py discipline) + 6 dp rounding —
  layout-independent, oracle-reproducible.

Scale posture: both count tables are bucket-bounded (≤ n_buckets rows)
and BROADCAST; totals and doc counts are scalars. Scoring explodes the
corpus to skinny (id, pos, bucket) rows once and re-aggregates per doc
— one shuffle on doc id; payloads never shuffle (``nb_filter`` re-joins
ids semi-join-style). No UDFs anywhere.

The DSIR lesson applies verbatim (operators/dsir.py:99): NB
discriminates by RATE differences — fit on a target corpus large (or
internally repetitive) enough that its characteristic tokens reach
counts well above 1, or the smoothed ratios carry no signal.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["NbQualityModel", "nb_fit", "nb_scores", "nb_filter", "nb_pareto_scores", "nb_pareto_filter"]


def _token_buckets(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, pos, b) hashed-unigram event rows — map-side only."""
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        ).alias("toks"),
    )
    events = (
        toks.filter(F.size("toks") >= 1)
        .select(
            F.col(id_col),
            F.posexplode("toks").alias("pos", "tok"),
        )
    )
    b = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")
    return events.select(id_col, "pos", b.alias("b"))


class NbQualityModel(NamedTuple):
    """Fitted NB statistics: two bucket-bounded count tables
    (≤ n_buckets rows each) + token totals + document counts (the class
    prior) + the smoothing constant."""

    target_counts: DataFrame  # (b, ct)
    raw_counts: DataFrame  # (b, cr)
    target_total: float  # token events in target
    raw_total: float  # token events in raw
    n_target_docs: int
    n_raw_docs: int
    n_buckets: int
    alpha: float

    def save(self, path: str) -> str:
        """Write the model as one atomic JSON file (registry-compatible
        — the S7 semantics, like PcaModel/LangidModel): both count
        tables collect n_buckets-bounded."""
        import json
        import os

        tc = sorted(
            [int(r["b"]), float(r["ct"])] for r in self.target_counts.collect()
        )
        rc = sorted(
            [int(r["b"]), float(r["cr"])] for r in self.raw_counts.collect()
        )
        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "kind": "nb_quality",
                    "target_counts": tc,
                    "raw_counts": rc,
                    "target_total": self.target_total,
                    "raw_total": self.raw_total,
                    "n_target_docs": self.n_target_docs,
                    "n_raw_docs": self.n_raw_docs,
                    "n_buckets": self.n_buckets,
                    "alpha": self.alpha,
                },
                fh,
            )
        os.replace(tmp, path)  # atomic, like the registry manifest
        return path

    @classmethod
    def load(cls, spark, path: str) -> "NbQualityModel":
        import json

        with open(path) as fh:
            d = json.load(fh)
        tc = spark.createDataFrame(
            [(int(b), float(c)) for b, c in d["target_counts"]],
            "b int, ct double",
        )
        rc = spark.createDataFrame(
            [(int(b), float(c)) for b, c in d["raw_counts"]],
            "b int, cr double",
        )
        return cls(
            tc,
            rc,
            float(d["target_total"]),
            float(d["raw_total"]),
            int(d["n_target_docs"]),
            int(d["n_raw_docs"]),
            int(d["n_buckets"]),
            float(d["alpha"]),
        )


def nb_fit(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> NbQualityModel:
    """Count hashed-token features over both classes. Each count table
    is one group-by on the bucket key, ≤ n_buckets rows, broadcast at
    scoring time. Document counts feed the class prior."""

    def counts(df):
        return (
            _token_buckets(df, id_col, text_col, n_buckets)
            .groupBy("b")
            .agg(F.count("*").cast("double").alias("c"))
        )

    n_target_docs, n_raw_docs = target.count(), raw.count()
    if n_target_docs == 0 or n_raw_docs == 0:
        raise ValueError(
            "nb_fit needs at least one document per class "
            f"(target={n_target_docs}, raw={n_raw_docs}); an empty class "
            "would make the log-prior undefined at scoring time"
        )
    tc = counts(target).withColumnRenamed("c", "ct")
    rc = counts(raw).withColumnRenamed("c", "cr")
    tt = tc.agg(F.sum("ct")).collect()[0][0] or 0.0
    rt = rc.agg(F.sum("cr")).collect()[0][0] or 0.0
    return NbQualityModel(
        tc,
        rc,
        float(tt),
        float(rt),
        int(n_target_docs),
        int(n_raw_docs),
        n_buckets,
        float(alpha),
    )


def nb_scores(
    docs: DataFrame,
    model: NbQualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "score",
    use_prior: bool = True,
) -> DataFrame:
    """(id, n_tokens, score) — per-document NB class log-odds, summed
    with the order-canonicalized fold and rounded to 6 dp. score > 0
    means the classifier prefers the target class. Documents with zero
    tokens carry no features and drop out (no evidence either way)."""
    ev = _token_buckets(docs, id_col, text_col, model.n_buckets)
    a, nb = model.alpha, float(model.n_buckets)
    prior = (
        math.log(model.n_target_docs) - math.log(model.n_raw_docs)
        if use_prior
        else 0.0
    )
    contrib = (
        F.log(F.coalesce(F.col("ct"), F.lit(0.0)) + F.lit(a))
        - F.lit(math.log(model.target_total + a * nb))
        - F.log(F.coalesce(F.col("cr"), F.lit(0.0)) + F.lit(a))
        + F.lit(math.log(model.raw_total + a * nb))
    )
    scored = (
        ev.join(F.broadcast(model.target_counts), "b", "left")
        .join(F.broadcast(model.raw_counts), "b", "left")
        .select(id_col, "pos", contrib.alias("lr"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("pos", "lr"))),
                    F.lit(float(prior)),
                    lambda acc, x: acc + x["lr"],
                ),
                6,
            ).alias(out_col),
        )
    )


def nb_filter(
    docs: DataFrame,
    model: NbQualityModel,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_prior: bool = True,
) -> DataFrame:
    """Documents whose NB score exceeds ``threshold`` (default 0 — the
    classifier's own decision boundary), payloads re-joined by id
    (semi join; payloads never enter the scoring shuffle). Zero-token
    documents carry no evidence and are dropped with the sub-threshold
    rows (a quality gate has no reason to keep empty text)."""
    keep = nb_scores(docs, model, id_col, text_col, use_prior=use_prior).filter(
        F.col("score") > F.lit(threshold)
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")


def nb_pareto_scores(
    docs: DataFrame,
    model: NbQualityModel,
    alpha: float = 9.0,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_prior: bool = True,
) -> DataFrame:
    """GPT-3's actual selection rule (Brown et al. 2020 appendix A): a
    document is kept iff ``np.random.pareto(α) > 1 − document_score`` —
    a STOCHASTIC gate that keeps some lower-scored documents (mostly
    unlike the prompt distribution, "including, in the limit, some
    documents judged as low quality"), instead of a hard threshold.

    Frozen replayable spec: the per-document uniform is the SALTED
    md5-bucket draw u = hash_bucket("pareto:<seed>", id)/10000 (the
    repo's hash-cutoff sampling discipline — layout-independent,
    re-runnable; the salt decorrelates this draw from
    :func:`~.sampling.hash_split`'s bare-(seed, id) stream — sharing it
    would make survival and split assignment the same uniform, so
    marginal-quality survivors could never land in low train buckets
    and val/test would skew low-scored), the Pareto
    deviate is the standard inverse-CDF transform
    ``(1−u)^(−1/α) − 1`` (numpy's ``pareto`` draw), the document score
    is the sigmoid of the 6 dp class log-odds, and the kept bit
    compares 6 dp roundings of both sides. Returns
    (id, n_tokens, score, pareto, keep)."""
    from oracle_vectorsearch_example_spark.operators.sampling import (
        BUCKETS,
        hash_bucket,
    )

    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    scored = nb_scores(docs, model, id_col, text_col, use_prior=use_prior)
    u = hash_bucket(F.col(id_col), f"pareto:{seed}").cast("double") / F.lit(
        float(BUCKETS)
    )
    pareto = F.round(
        F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0), 6
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))
    return scored.select(
        id_col,
        "n_tokens",
        "score",
        pareto.alias("pareto"),
        (pareto > F.round(F.lit(1.0) - p, 6)).alias("keep"),
    )


def nb_pareto_filter(
    docs: DataFrame,
    model: NbQualityModel,
    alpha: float = 9.0,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_prior: bool = True,
) -> DataFrame:
    """Documents surviving the GPT-3 Pareto draw (see
    :func:`nb_pareto_scores`), payloads re-joined by id semi-join-style
    — the stochastic sibling of :func:`nb_filter`."""
    keep = nb_pareto_scores(
        docs, model, alpha, seed, id_col, text_col, use_prior=use_prior
    ).filter(F.col("keep")).select(id_col)
    return docs.join(keep, id_col, "left_semi")
