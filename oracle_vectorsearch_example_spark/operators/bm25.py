"""BM25 lexical search + reciprocal-rank-fusion hybrid retrieval —
the keyword half of Oracle AI Vector Search's hybrid vector index
(Oracle 23ai pairs the reference's vector search,
01_pdf_to_vector.sql:84-97, with Oracle Text keyword scoring and fuses
the two rankings; this module is that surface, Spark-first).

Everything is JVM built-ins — no UDFs anywhere:

Index: one tokenize pass (split/lower/explode) feeds three skinny
tables — postings (term, doc_id, tf), doc lengths, per-term document
frequencies — plus two scalars (N, avgdl). Each is one shuffle on its
natural key; corpus text crosses the wire once, at tokenize time.

Search: query terms are a bounded frame → broadcast-joined against the
postings (the corpus-scaled side never moves), per-(query, doc, term)
contributions aggregate with an ORDER-CANONICALIZED fold —
``array_sort(collect_list(struct(term, contrib)))`` + ``F.aggregate`` —
so the floating-point sum is a pure function of the contribution SET,
not of partitioning or aggregation order (the determinism discipline
that makes the golden hash-stable: a plain ``sum()`` over doubles varies
in the last ulp with partition layout, which flips near-tie ranks).
Scores round to 6 dp before ranking for the same reason: the DuckDB
oracle's independent summation agrees to ~1e-12, so both engines rank
identical values.

Fusion: ``rrf_fuse`` implements reciprocal-rank fusion
(score = Σ 1/(k0 + rank)) over any number of rank frames — the standard
hybrid-search combiner (Cormack et al., SIGIR 2009; what Oracle/Elastic
expose for vector+keyword). A full outer join on (qid, doc) keeps
docs found by only one retriever; missing ranks contribute 0.

BM25 parameters: k1=1.2, b=0.75 (the Robertson defaults); idf is the
Lucene-style ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — strictly positive,
so a term in >half the corpus can't flip scores negative.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) rows: lowercase whitespace tokens, empties dropped.
    Deliberately the simplest spec that an oracle can replicate exactly
    (split on single space); real pipelines can pre-normalize with
    functions/textstats.py's tokenizer."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )


class Bm25Index(NamedTuple):
    """Skinny index tables + corpus scalars. All DataFrames; persist or
    write them like any table for reuse."""

    postings: DataFrame  # (term, doc_id, tf)
    doc_len: DataFrame  # (doc_id, dl)
    term_df: DataFrame  # (term, dfc)
    n_docs: float
    avgdl: float


def bm25_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> Bm25Index:
    """One tokenize pass → postings / doc-length / doc-frequency tables.
    The two scalars (N, avgdl) collect as metadata — the same bounded
    contract as IVF centroids."""
    tok = _tokens(docs, id_col, text_col)
    postings = tok.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    doc_len = tok.groupBy(id_col).agg(F.count("*").cast("double").alias("dl"))
    term_df = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("dfc")
    )
    row = doc_len.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return Bm25Index(postings, doc_len, term_df, float(row["n"]),
                     float(row["avgdl"]))


def bm25_search(
    index: Bm25Index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    id_col: str = "doc_id",
) -> DataFrame:
    """(qid, rank, doc_id, score): top-k BM25 per query. Distributed end
    to end — the query frame tokenizes in-plan and broadcast-joins the
    postings on term; nothing is collected, so corpus-sized query frames
    work (same posture as IvfIndex.search_df)."""
    qt = _tokens(queries, qid_col, qtext_col).distinct()
    joined = (
        index.postings.join(F.broadcast(qt), "term")
        .join(index.doc_len, id_col)
        .join(index.term_df.withColumnRenamed("term", "__t"),
              F.col("term") == F.col("__t"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(index.n_docs) - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.lit(index.avgdl)
    )
    contrib = (idf * F.col("tf") * (k1 + 1.0) / denom).alias("contrib")
    scored = (
        joined.select(qid_col, id_col, "term", contrib)
        .groupBy(qid_col, id_col)
        # order-canonicalized fold: sort contributions by term, then
        # left-fold — the sum is a pure function of the contribution
        # set (see module docs)
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("term", "contrib"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("__s")
        )
        .withColumn("score", F.round(F.col("__s"), 6))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "score")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion over N rank frames (each with columns
    (qid, rank, doc_id)): fused = Σ_i 1/(k0 + rank_i), absent retrievers
    contribute 0. Output (qid, rank, doc_id, rrf_score) top-k. The sum
    has a fixed operand order (retriever list order), so it is exactly
    reproducible — no rounding needed."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked frame")
    fused = None
    for i, df in enumerate(ranked):
        part = df.select(
            qid_col, id_col,
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))).alias(f"__r{i}"),
        )
        fused = part if fused is None else fused.join(
            part, [qid_col, id_col], "full_outer"
        )
    score = None
    for i in range(len(ranked)):
        term = F.coalesce(F.col(f"__r{i}"), F.lit(0.0))
        score = term if score is None else score + term
    w = Window.partitionBy(qid_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rrf_score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "rrf_score")
    )


def bm25_search_terms(
    index: Bm25Index,
    qterms: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    qid_col: str = "qid",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 over an explicit WEIGHTED term frame (qid, term, w) — the
    generalized core of :func:`bm25_search` (which is the w=1 case):
    score(q, d) = round(Σ_t w_t · bm25(t, d), 6). Lets callers expand,
    reweight, or translate queries (PRF below, synonym maps, …) without
    touching the scoring plan."""
    joined = (
        index.postings.join(F.broadcast(qterms), "term")
        .join(index.doc_len, id_col)
        .join(index.term_df.withColumnRenamed("term", "__t"),
              F.col("term") == F.col("__t"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(index.n_docs) - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.lit(index.avgdl)
    )
    contrib = (F.col("w") * idf * F.col("tf") * (k1 + 1.0) / denom).alias(
        "contrib"
    )
    scored = (
        joined.select(qid_col, id_col, "term", contrib)
        .groupBy(qid_col, id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("__s")
        )
        .withColumn("score", F.round(F.col("__s"), 6))
    )
    w_ = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "score")
    )


def prf_terms(
    index: Bm25Index,
    queries: DataFrame,
    fb_docs: int = 5,
    fb_terms: int = 8,
    expand_weight: float = 0.5,
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pseudo-relevance-feedback expansion (the RM3/Rocchio family —
    Lavrenko & Croft 2001; Rocchio 1971): run BM25 once, take each
    query's top ``fb_docs`` hits as assumed-relevant, rank their terms
    by the relevance-model weight Σ_d tf(t,d)/dl(d), and add the top
    ``fb_terms`` NON-query terms at fixed weight ``expand_weight``
    (original terms keep weight 1 — the Rocchio-style binary expansion;
    the RM weight selects WHICH terms, keeping the frozen scoring spec
    one multiply). Returns the weighted (qid, term, w) frame for
    :func:`bm25_search_terms`.

    Determinism: the per-(query, term) weight folds in doc-id order and
    rounds to 6 dp; term selection ties break lexicographically."""
    r1 = bm25_search(index, queries, k=fb_docs, qid_col=qid_col,
                     qtext_col=qtext_col, id_col=id_col)
    fb = r1.select(qid_col, id_col)
    cand = (
        index.postings.join(fb, id_col)
        .join(index.doc_len, id_col)
        .select(
            qid_col, "term", id_col,
            (F.col("tf") / F.col("dl")).alias("__c"),
        )
    )
    wts = cand.groupBy(qid_col, "term").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(id_col, "__c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["__c"],
            ),
            6,
        ).alias("__w")
    )
    orig = _tokens(queries, qid_col, qtext_col).distinct()
    exp_pick = Window.partitionBy(qid_col).orderBy(
        F.col("__w").desc(), F.col("term").asc()
    )
    expansion = (
        wts.join(orig, [qid_col, "term"], "left_anti")
        .withColumn("__rn", F.row_number().over(exp_pick))
        .filter(F.col("__rn") <= fb_terms)
        .select(qid_col, "term", F.lit(float(expand_weight)).alias("w"))
    )
    return orig.withColumn("w", F.lit(1.0)).unionByName(expansion)


def bm25_search_prf(
    index: Bm25Index,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 8,
    expand_weight: float = 0.5,
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    id_col: str = "doc_id",
) -> DataFrame:
    """Two-round BM25 with pseudo-relevance feedback: expand via
    :func:`prf_terms`, score via :func:`bm25_search_terms`."""
    terms = prf_terms(
        index, queries, fb_docs, fb_terms, expand_weight,
        qid_col, qtext_col, id_col,
    )
    return bm25_search_terms(index, terms, k=k, qid_col=qid_col,
                             id_col=id_col)


class IncrementalBm25:
    """Batch-incremental BM25 index maintenance — the lexical sibling of
    the vector index's streaming ``add()`` (X14): each ``ingest``
    tokenizes ONLY the new batch and commits its postings + doc-length
    tables in one atomic manifest swap (:class:`~..sources.txn.
    Warehouse`); per-term document frequencies and the (N, avgdl)
    scalars derive at read time from the table unions, so ``index()``
    is always EXACTLY ``bm25_index`` over everything ever ingested
    (equivalence tested — corpus-wide statistics can't go stale, unlike
    designs that freeze idf at ingest time). Per-ingest cost is
    O(batch); ``compact()`` folds the per-batch tables once the union
    width (not data volume) becomes the read cost, same discipline as
    ``IncrementalDedup.compact``. Document ids must be unique across
    ingests (re-ingesting a doc would double-count its terms — dedup
    upstream, the same contract as the dedup raw batches)."""

    def __init__(self, spark, root: str, id_col: str = "doc_id",
                 text_col: str = "text", prefix: str = "bm25"):
        from oracle_vectorsearch_example_spark.sources.txn import Warehouse

        self.spark = spark
        self.wh = Warehouse(spark, root)
        self.id_col, self.text_col, self.prefix = id_col, text_col, prefix

    def _tables(self, kind: str) -> list[str]:
        pre = f"{self.prefix}_{kind}_"
        return sorted(t for t in self.wh.tables() if t.startswith(pre))

    def ingest(self, batch: DataFrame) -> int:
        """Fold one document batch in; returns the committed version."""
        tok = _tokens(batch, self.id_col, self.text_col)
        postings = tok.groupBy(self.id_col, "term").agg(
            F.count("*").cast("double").alias("tf")
        )
        doclen = tok.groupBy(self.id_col).agg(
            F.count("*").cast("double").alias("dl")
        )
        n = len(self._tables("postings"))
        return self.wh.commit({
            f"{self.prefix}_postings_{n:06d}": postings,
            f"{self.prefix}_doclen_{n:06d}": doclen,
        })

    def _unions(self):
        from functools import reduce

        posts = reduce(
            DataFrame.unionByName,
            (self.wh.read(t) for t in self._tables("postings")),
        )
        dl = reduce(
            DataFrame.unionByName,
            (self.wh.read(t) for t in self._tables("doclen")),
        )
        return posts, dl

    def index(self) -> Bm25Index:
        """Current index over every ingested batch — df/N/avgdl always
        computed corpus-wide, never frozen per batch."""
        if not self._tables("postings"):
            raise ValueError("no batches ingested yet")
        posts, dl = self._unions()
        term_df = posts.groupBy("term").agg(
            F.count("*").cast("double").alias("dfc")
        )
        row = dl.agg(
            F.count("*").cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ).collect()[0]
        return Bm25Index(posts, dl, term_df, float(row["n"]),
                         float(row["avgdl"]))

    def compact(self) -> int | None:
        """Fold the per-batch tables into one pair in a single atomic
        swap; results identical (postings rows are a set). Returns the
        new version, or None when there is nothing to fold."""
        pt, dt = self._tables("postings"), self._tables("doclen")
        if len(pt) <= 1:
            return None
        posts, dl = self._unions()
        keep = {
            f"{self.prefix}_postings_000000": posts,
            f"{self.prefix}_doclen_000000": dl,
        }
        drop = [t for t in pt + dt if t not in keep]
        return self.wh.commit(keep, drop=drop)
