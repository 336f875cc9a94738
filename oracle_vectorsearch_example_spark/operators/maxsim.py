"""Multi-vector MaxSim search (X27) — late-interaction retrieval over
per-chunk embeddings, Spark-first.

The reference's pipeline materializes MANY vectors per document (one per
chunk: doc_chunks(doc_id, chunk_id, embed_vector),
01_pdf_to_vector.sql:60-97) but then searches them as independent rows.
Late interaction (ColBERT — Khattab & Zaharia, SIGIR 2020,
arXiv:2004.12832) is the retrieval model built for exactly that data
shape: score(q, d) = Σ_i max_j sim(q_i, d_j) — each query vector picks
its best-matching document vector, and the per-query maxima sum.

Data model: multi-vector documents stay EXPLODED — (doc_id, token_idx,
embedding) rows, the doc_chunks shape itself. No array-of-arrays
payloads, so parquet encoding, partition pruning and shuffle sizing are
unchanged from single-vector tables.

Plan shapes:

- ``candidates=None`` (exact/bruteforce): corpus token rows ⋈ broadcast
  query token rows — a bounded broadcast nested loop (THE intended
  crossJoin sibling to golden.py's region×nation: the query frame is
  small by contract). Cost |corpus_tokens| × |query_tokens|; correct at
  any scale, affordable when queries are bounded.
- ``candidates=(qid, doc_id)`` (the 100 TB serving topology): ColBERT's
  own two-stage design — a first-stage retriever (IVF/HNSW/BM25 over
  token vectors or doc centroids, all already in this repo) proposes
  candidate docs per query, and MaxSim reranks ONLY those: corpus
  tokens equi-join the candidate list on doc_id (corpus-scaled side
  moves once, on its natural key), then broadcast-join the query
  tokens. Cost |candidate doc tokens| × |query tokens|.

Determinism: per-(query-vector, doc) maxima are order-independent; the
sum over query vectors uses the repo's ORDER-CANONICALIZED fold
(qtidx-sorted collect_list + left fold + round 6 dp — see
operators/bm25.py for why a plain sum() is partition-order-dependent),
so scores are layout-independent and DuckDB-reproducible. Everything is
JVM column expressions (zip_with/aggregate folds from
functions/distances.py); no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distances import cosine_similarity, dot_product


def maxsim_topk(
    corpus_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "doc_id",
    query_id: str = "qid",
    qtok_col: str = "qtidx",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """(qid, rank, doc_id, score): top-k documents per query under
    MaxSim. ``query_tokens`` is (qid, qtidx, vec) — bounded, broadcast.
    ``candidates`` (qid, doc_id) switches to the rerank plan. Scores
    round to 6 dp; ties break by doc id."""
    if metric == "cosine":
        sim = cosine_similarity
    elif metric in ("dot", "dot_product"):
        sim = dot_product
    else:
        raise ValueError(f"metric must be cosine or dot, got {metric!r}")

    q = query_tokens.select(
        query_id, F.col(qtok_col).alias("__qtidx"), F.col(vec_col).alias("__qv")
    )
    c = corpus_tokens.select(id_col, F.col(vec_col).alias("__cv"))
    if candidates is not None:
        cand = candidates.select(query_id, id_col).distinct()
        pairs = c.join(cand, id_col).join(F.broadcast(q), query_id)
    else:
        pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col(id_col) != F.col(query_id))

    best = (
        pairs.withColumn("__sim", sim(F.col("__cv"), F.col("__qv")))
        .groupBy(query_id, id_col, "__qtidx")
        .agg(F.max("__sim").alias("__best"))
    )
    scored = best.groupBy(query_id, id_col).agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("__qtidx", "__best"))),
                F.lit(0.0),
                lambda a, x: a + x["__best"],
            ),
            6,
        ).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "score")
    )


def doc_centroids(
    corpus_tokens: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    out_col: str = "embedding",
) -> DataFrame:
    """(doc_id, centroid): the mean token vector per document — the
    standard single-vector proxy a first-stage ANN index (IVF/HNSW)
    serves to produce MaxSim ``candidates``. Mean uses the canonical
    qidx-free path: element-wise sum via a zip_with fold over the
    collected token list (sorted for layout independence) / count."""
    agg = corpus_tokens.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.transform(vec_col, lambda x: x.cast("double")))
        ).alias("__vs"),
        F.count("*").alias("__n"),
    )
    summed = F.aggregate(
        F.col("__vs"),
        F.transform(F.element_at("__vs", 1), lambda _: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
    )
    return agg.select(
        id_col,
        F.transform(summed, lambda s: s / F.col("__n")).alias(out_col),
    )
