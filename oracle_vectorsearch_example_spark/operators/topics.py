"""Cluster topic description via class-based TF-IDF (X56,
training-pipeline extension surface) — BERTopic's c-TF-IDF (Grootendorst
2022, arXiv:2203.05794 §2.3): treat each CLUSTER's concatenated
documents as one class document, then rank terms per class by

    score(t, c) = tf_{t,c} · ln(1 + A / f_t)

with tf_{t,c} = occurrences of term t inside class c, f_t = occurrences
of t across the whole corpus, and A = the average number of token
events per class. The top-k terms are the human-readable label of each
cluster — the reporting step after any clustering this repo already
produces (IVF centroids, SemDeDup KMeans blocks, `assign_centers`).

Why this operator matters for a 100 TB corpus build: dedup and gating
decide what survives; c-TF-IDF is how curators SEE what a cluster of
millions of surviving documents actually is (topic composition audits,
mixture-weight decisions, contamination triage by topic).

Frozen spec (engine-replayable): the bm25 tokenizer (lowercase, split
on whitespace, drop empties); integer tf and f_t; A = total events /
number of non-empty classes (double); score rounded to 6 dp; per-class
rank by (score desc, term asc) — deterministic in any engine.

Scale posture: one explode to skinny (cluster, term) events, one
group-by per (cluster, term), one vocabulary-keyed join onto the f_t
frame (term-partitioned — no broadcast assumption on vocabulary size),
one window bounded to top_k rows per class. Document payloads never
shuffle; the assignment frame carries ids only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ctfidf_terms", "topic_stats"]


def ctfidf_terms(
    docs: DataFrame,
    assign: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster",
    top_k: int = 10,
) -> DataFrame:
    """(cluster, rank, term, tf, score) — the ``top_k`` c-TF-IDF terms
    per cluster. ``assign`` maps ids to clusters (from IVF assignment,
    SemDeDup blocks, ``assign_centers``, or any labeling); docs absent
    from ``assign`` take no part."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("__toks"),
    )
    ev = (
        toks.join(assign.select(id_col, cluster_col), id_col)
        .select(cluster_col, F.explode("__toks").alias("term"))
    )
    tf = ev.groupBy(cluster_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    ft = ev.groupBy("term").agg(F.count("*").cast("long").alias("ft"))
    totals = ev.groupBy().agg(
        F.count("*").cast("double").alias("n_events"),
        F.count_distinct(cluster_col).cast("double").alias("n_classes"),
    )
    scored = (
        tf.join(ft, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            cluster_col,
            "term",
            "tf",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    F.lit(1.0)
                    + (F.col("n_events") / F.col("n_classes"))
                    / F.col("ft").cast("double")
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(cluster_col, "rank", "term", "tf", "score")
    )


def topic_stats(
    docs: DataFrame,
    assign: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster",
    top_k: int = 5,
    metric_cols: tuple = (),
) -> DataFrame:
    """(cluster, n_docs, n_tokens, top_terms[, mean_<m>...]) — the
    curator report that CONSUMES the X56 labels (r10): per cluster, how
    many documents survived, how many whitespace tokens they carry, the
    top-k c-TF-IDF terms concatenated in rank order, and the mean of
    each named per-document metric column (e.g. the gate stage's
    ``quality`` or a perplexity score). This is the table a curator
    reads to decide mixture weights or triage a contaminated topic —
    :func:`~..plans.corpus.build_training_corpus(topic_assign=)` emits
    it beside documents/packs/stats.

    Frozen spec: n_tokens = Σ ws-token counts (integer, exact);
    mean_<m> = round(Σ floor(m·1e6 + 0.5) / (n_<m>·1e6), 6) where
    n_<m> counts the docs whose metric is NON-NULL (== n_docs whenever
    the metric is total; gate-derived metrics like ppl are undefined
    for < 2-token docs and must not dilute the mean) — per-doc
    metrics are scaled to integers BEFORE summing, so the aggregate is
    exact associative integer math (hash-stable under any partition
    layout, unlike a double sum) and still one map-side partial
    aggregate at 100 TB (no canonical collect_list fold needed);
    ``floor(x·1e6 + 0.5)`` is HALF_UP identically in any engine ONLY
    for non-negative values — ``metric_cols`` MUST be non-negative
    per-document scores (quality in [0,1], perplexity > 0, counts); a
    negative metric (NB log-odds, log-perplexity) would round
    half-toward-+inf and drift from true HALF_UP at the 6th dp, so the
    plan guards it: any negative metric value raises in-plan rather
    than silently drifting (r10 ADVICE). top_terms joins from
    :func:`ctfidf_terms` per its spec."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    base = docs.join(assign.select(id_col, cluster_col), id_col)
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(toks).cast("long")).alias("n_tokens"),
    ]
    for m in metric_cols:
        # fail-fast non-negativity guard: the scaled-integer HALF_UP
        # identity only holds for m >= 0 (see docstring)
        checked = F.when(
            F.col(m) < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"topic_stats: metric column {m!r} must be "
                        "non-negative (scaled-integer HALF_UP mean), got "
                    ),
                    F.col(m).cast("string"),
                )
            ).cast("double"),
        ).otherwise(F.col(m))
        aggs.append(
            F.sum(
                F.floor(checked * F.lit(1e6) + F.lit(0.5)).cast("long")
            ).alias(f"__s_{m}")
        )
        # divisor = docs that HAVE the metric (r11): gate-derived
        # metrics like ppl are undefined for some docs (< 2 tokens);
        # a NULL must not dilute the mean toward 0. Equals n_docs —
        # and thus the original spec — whenever the metric is total.
        aggs.append(F.count(F.col(m)).cast("long").alias(f"__n_{m}"))
    per = base.groupBy(cluster_col).agg(*aggs)
    for m in metric_cols:
        per = per.withColumn(
            f"mean_{m}",
            F.round(
                F.col(f"__s_{m}").cast("double")
                / (F.col(f"__n_{m}").cast("double") * F.lit(1e6)),
                6,
            ),
        ).drop(f"__s_{m}", f"__n_{m}")
    label = (
        ctfidf_terms(
            docs, assign, id_col=id_col, text_col=text_col,
            cluster_col=cluster_col, top_k=top_k,
        )
        .groupBy(cluster_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "term"))),
                    lambda x: x["term"],
                ),
            ).alias("top_terms")
        )
    )
    out_cols = [cluster_col, "n_docs", "n_tokens", "top_terms"] + [
        f"mean_{m}" for m in metric_cols
    ]
    return per.join(label, cluster_col, "left").select(*out_cols)
