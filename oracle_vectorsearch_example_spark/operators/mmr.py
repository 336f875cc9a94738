"""Maximal Marginal Relevance re-ranking (X44, retrieval extension
surface — Carbonell & Goldstein 1998, "The use of MMR, diversity-based
reranking for reordering documents and producing summaries", SIGIR).

The problem it solves in the reference's pipeline: overlapping chunks
of one document (the 100-word/10-overlap config, 01_pdf_to_vector.sql:
239) embed almost identically, so a plain top-k returns k near-copies
of the best passage. MMR greedily re-picks from an oversampled
candidate set, trading relevance against redundancy:

    next = argmax_c  λ·rel(c)  −  (1−λ)·max_{s∈selected} sim(c, s)

λ=1 reproduces the relevance ranking exactly (tested); λ→0 maximizes
diversity. Deterministic: ties break by candidate id, so the picked
sequence is a pure function of (candidates, λ).

Execution shape: stage 1 is the existing ``topk_search`` at
k·oversample (all its plan properties apply); the greedy loop is
inherently sequential in k but PER-QUERY independent and bounded at
(k·oversample)² similarities — it runs as one ``applyInPandas`` task
per query over candidate rows only (k·oversample rows per query cross
the shuffle, never the corpus). The argmax scans are numpy BLAS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mmr_select", "mmr_topk_search"]


def mmr_select(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    query_id: str = "qid",
    base_id: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "distance",
) -> DataFrame:
    """Greedy MMR pick of k rows per query from a candidate frame of
    (query_id, base_id, vec_col, rel_col-as-DISTANCE — smaller is more
    relevant; cosine sim between candidates measures redundancy).
    Returns (query_id, rank, base_id, distance) like every search op.
    One applyInPandas task per query over its candidates only."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")

    def pick(key, pdf):
        import numpy as np
        import pandas as pd

        ids = pdf[base_id].to_numpy()
        order0 = np.argsort(ids, kind="mergesort")
        pdf = pdf.iloc[order0]
        ids = pdf[base_id].to_numpy()
        rel = -pdf[rel_col].to_numpy(dtype=np.float64)  # distance -> relevance
        v = np.stack(pdf[vec_col].map(lambda x: np.asarray(x, dtype=np.float64)))
        n = len(ids)
        norm = np.linalg.norm(v, axis=1)
        norm[norm == 0] = 1.0
        u = v / norm[:, None]
        kk = min(k, n)
        picked: list[int] = []
        # empty selected set = no redundancy penalty (first pick is pure
        # relevance, the standard MMR convention)
        max_sim = np.zeros(n)
        avail = np.ones(n, dtype=bool)
        for _ in range(kk):
            score = lam * rel - (1.0 - lam) * max_sim
            score_masked = np.where(avail, score, -np.inf)
            # argmax with id tie-break: ids are ascending, np.argmax
            # returns the FIRST max — exactly the smallest id
            j = int(np.argmax(score_masked))
            picked.append(j)
            avail[j] = False
            sim_j = u @ u[j]
            max_sim = np.maximum(max_sim, sim_j)
        return pd.DataFrame(
            {
                query_id: [key[0]] * kk,
                "rank": np.arange(1, kk + 1, dtype=np.int64),
                base_id: ids[picked],
                rel_col: pdf[rel_col].to_numpy()[picked],
            }
        )

    # id field types come from the candidate frame itself — string or
    # int ids (both valid across the search stack) must round-trip, not
    # fail against a hardcoded `long` (ADVICE r7)
    from pyspark.sql.types import LongType, StructField, StructType

    in_fields = {f.name: f for f in candidates.schema.fields}
    out_schema = StructType(
        [
            StructField(query_id, in_fields[query_id].dataType, True),
            StructField("rank", LongType(), False),
            StructField(base_id, in_fields[base_id].dataType, True),
            StructField(rel_col, in_fields[rel_col].dataType, True),
        ]
    )
    return candidates.groupBy(query_id).applyInPandas(pick, schema=out_schema)


def mmr_topk_search(
    base: DataFrame,
    queries: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    oversample: int = 4,
    metric: str = "cosine",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qvec",
    exclude_self: bool = False,
) -> DataFrame:
    """Diversified top-k: exact ``topk_search`` at k·oversample, join the
    candidate vectors back (candidate rows only), then the MMR pick.
    λ=1 returns exactly the plain top-k head (tested)."""
    from oracle_vectorsearch_example_spark.operators.search import topk_search

    cand = topk_search(
        base,
        queries,
        k=k * oversample,
        metric=metric,
        base_id=base_id,
        base_vec=base_vec,
        query_id=query_id,
        query_vec=query_vec,
        exclude_self=exclude_self,
    )
    with_vec = cand.join(
        base.select(base_id, base_vec), on=base_id, how="inner"
    ).select(query_id, base_id, base_vec, "distance")
    return mmr_select(
        with_vec,
        k=k,
        lam=lam,
        query_id=query_id,
        base_id=base_id,
        vec_col=base_vec,
        rel_col="distance",
    )
