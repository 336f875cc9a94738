"""Retrieval evaluation metrics (X45, retrieval extension surface):
MRR, nDCG@k, precision/recall@k over a ranked-results frame and a
relevance-judgments frame — the IR-stack half of index quality that
D5+'s ``accuracy_report`` covers only for recall-vs-ground-truth.

Why an operator and not a notebook: at corpus scale the judgments
frame is produced BY pipelines (click logs, exact-search ground truth,
decontamination labels) and the evaluation must be layout-independent
and engine-replayable like every other golden — so the formulas are
frozen:

- rank is the results frame's own 1-based ``rank`` column (ties were
  already broken deterministically by the search operators);
- MRR          = mean over queries of 1/first-relevant-rank (0 when no
                 relevant hit in the top k);
- DCG@k        = Σ_{hits} rel / log2(rank+1)   (binary or graded rel);
- IDCG@k       = the same sum over the TOP-k judged rels in descending
                 (rel, doc-id) order — the deterministic ideal;
- nDCG@k       = DCG/IDCG (0 when a query has no judgments);
- precision@k  = |relevant ∩ top-k| / k;  recall@k = ... / |relevant|.

Per-query sums fold ≤ k terms, order-canonicalized (rank-sorted array
fold) + round(6) — the bm25.py hash-stability discipline, so DuckDB
replays them with plain round(sum(), 6). Per-metric means over queries
fold the per-query values in ascending-query order the same way.

Plan shape: one equi-join of results to judgments on (query, doc) and
group-bys keyed on the query id — both frames are ranked/judged rows
(bounded per query), never corpus payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["eval_rankings", "eval_summary", "grounding_score"]


def _canon_sum(col_struct: str, term_field: str):
    return F.round(
        F.aggregate(
            F.array_sort(F.collect_list(col_struct)),
            F.lit(0.0),
            lambda acc, s: acc + s[term_field],
        ),
        6,
    )


def eval_rankings(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    doc_id: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query metrics: (query_id, mrr, dcg, idcg, ndcg, precision,
    recall, n_rel). ``results`` = (query_id, doc_id, rank 1-based);
    ``qrels`` = (query_id, doc_id, rel > 0, graded or binary). The
    per-query frame is results ∪ judged query ids (the trec_eval
    convention): a judged query the engine returned NOTHING for scores
    0 across the board instead of silently vanishing from the means.
    Queries present in results but without judgments report
    ndcg/recall 0."""
    res = results.filter(F.col(rank_col) <= k).select(
        query_id, doc_id, F.col(rank_col).alias("__rank")
    )
    jj = qrels.filter(F.col(rel_col) > 0).select(
        query_id, doc_id, F.col(rel_col).cast("double").alias("__rel")
    )
    hits = res.join(jj, [query_id, doc_id], "inner").select(
        query_id,
        F.struct(
            F.col("__rank").alias("rank"),
            (F.col("__rel") / F.log2(F.col("__rank") + 1)).alias("g"),
            (F.lit(1.0) / F.col("__rank")).alias("rr"),
        ).alias("h"),
    )
    per_q_hits = hits.groupBy(query_id).agg(
        _canon_sum("h", "g").alias("dcg"),
        F.round(F.max(F.col("h.rr")), 6).alias("mrr"),
        F.count("*").alias("n_hit"),
    )
    # deterministic ideal: top-k judged rels in (rel desc, doc asc) order
    w = Window.partitionBy(query_id).orderBy(
        F.col("__rel").desc(), F.col(doc_id).asc()
    )
    ideal = (
        jj.withColumn("__irank", F.row_number().over(w))
        .filter(F.col("__irank") <= k)
        .select(
            query_id,
            F.struct(
                F.col("__irank").alias("rank"),
                (F.col("__rel") / F.log2(F.col("__irank") + 1)).alias("g"),
            ).alias("h"),
        )
        .groupBy(query_id)
        .agg(_canon_sum("h", "g").alias("idcg"))
    )
    n_rel = jj.groupBy(query_id).agg(F.count("*").alias("n_rel"))
    # trec_eval denominator: every query that was searched OR judged.
    # results-only would drop a judged query with zero returned rows,
    # inflating the corpus means (ADVICE r7).
    base = (
        results.select(query_id)
        .union(jj.select(query_id))
        .distinct()
    )
    out = (
        base.join(per_q_hits, query_id, "left")
        .join(ideal, query_id, "left")
        .join(n_rel, query_id, "left")
        .select(
            query_id,
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
            F.coalesce("idcg", F.lit(0.0)).alias("idcg"),
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0,
                F.round(
                    F.coalesce("dcg", F.lit(0.0)) / F.coalesce("idcg", F.lit(0.0)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision"),
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_hit", F.lit(0))
                    / F.col("n_rel").cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
        )
    )
    return out


def eval_summary(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id: str = "qid",
    doc_id: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """One-row corpus summary: means of the per-query metrics, folded in
    ascending-query order (layout-independent, engine-replayable)."""
    per_q = eval_rankings(results, qrels, k, query_id, doc_id, rank_col, rel_col)
    folded = per_q.groupBy().agg(
        F.count("*").alias("n_queries"),
        *[
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(query_id).alias("q"), F.col(m).alias("v")))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["v"],
                )
                / F.count("*"),
                6,
            ).alias(f"mean_{m}")
            for m in ("mrr", "ndcg", "precision", "recall")
        ],
    )
    return folded


def grounding_score(
    answers: DataFrame,
    contexts: DataFrame,
    n: int = 3,
    query_id: str = "qid",
    answer_col: str = "answer",
    context_col: str = "context",
) -> DataFrame:
    """Answer groundedness — the RAG faithfulness proxy (the overlap
    half of RAGAS-style faithfulness, public): the fraction of an
    answer's word n-gram OCCURRENCES that appear anywhere in the same
    query's retrieved context. An answer stitched from its context
    scores ~1; a hallucinated answer scores ~0. Complements X45 (was
    the RANKING right) with "did the ANSWER stay inside what was
    retrieved".

    Frozen spec: tokens = lowercase single-space split, drop empties
    (the bm25 tokenizer); n-grams joined with single spaces; an answer
    n-gram at position p is supported iff that exact n-gram occurs in
    ANY context row of the query; score = supported / total, 6 dp
    (integer counts — no fold discipline needed). Answers with fewer
    than ``n`` tokens emit no n-grams and drop out (no evidence).

    Plan shape: answers explode to skinny (qid, pos, gram) events;
    contexts to DISTINCT (qid, gram) rows; one equi-join on
    (qid, gram) — the join key includes the gram, so hot queries don't
    skew a partition — then a per-query count aggregate. Payloads
    never shuffle past tokenization."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def _grams(df, text_col, with_pos):
        toks = df.select(
            query_id,
            F.filter(
                F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
            ).alias("toks"),
        ).filter(F.size("toks") >= n)
        ev = toks.select(
            query_id,
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}), "
                    f"i -> struct(i AS pos, "
                    f"array_join(slice(toks, i + 1, {n}), ' ') AS gram))"
                )
            ).alias("e"),
        )
        cols = [query_id, "e.gram"] + (["e.pos"] if with_pos else [])
        return ev.select(*cols)

    a = _grams(answers, answer_col, with_pos=True)
    c = _grams(contexts, context_col, with_pos=False).distinct()
    hit = c.withColumn("__hit", F.lit(1))
    joined = a.join(hit, [query_id, "gram"], "left")
    return joined.groupBy(query_id).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_supported"),
        F.round(
            F.sum(F.coalesce("__hit", F.lit(0))).cast("double")
            / F.count("*"),
            6,
        ).alias("grounding"),
    )
