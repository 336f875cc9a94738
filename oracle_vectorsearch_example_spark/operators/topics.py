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

__all__ = ["ctfidf_terms"]


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
