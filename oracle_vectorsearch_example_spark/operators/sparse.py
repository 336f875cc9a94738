"""Sparse vector search (X25) — Oracle 23ai's SPARSE vector dimension
format, Spark-first. The reference's table stores dense embeddings
(01_pdf_to_vector.sql:67-77); 23ai's other storage format for the same
VECTOR type is SPARSE (explicit (index, value) pairs — the natural shape
for TF-IDF/SPLADE-style learned-sparse embeddings, where a 30k-dim
vector has ~100 non-zeros).

Representation: two ordinary array columns — ``indices array<int>``
(ascending) + ``values array<double>`` — so parquet encoding, pruning
and payload handling all work unchanged (the same "ordinary columns"
posture as SQ8/BQ codes).

All transformations are pure JVM expressions (no UDFs):

- ``to_sparse`` / ``to_dense`` convert by magnitude threshold inside
  whole-stage codegen (one transform+filter; the inverse is a
  map_from_arrays lookup over ``sequence(0, dim-1)``).
- ``sparse_topk_search`` is the inverted-index inner product: corpus
  rows explode ONCE into (id, idx, val) postings, the bounded query
  frame explodes and broadcast-joins on idx — the classic sparse
  retrieval plan (identical shuffle shape to BM25, operators/bm25.py:
  the corpus-scaled side never moves, candidates are only rows sharing
  a non-zero index with the query). Per-(query, doc) contributions sum
  with the ORDER-CANONICALIZED fold (idx-sorted ``collect_list`` +
  ``F.aggregate`` left fold + round 6 dp) so scores are pure functions
  of the contribution set — partition-layout-independent and
  reproducible by the DuckDB oracle (see bm25.py module docs for why a
  plain ``sum()`` is neither).

Cosine norms come from the SPARSE components only (the frozen spec the
oracle replicates: ``sqrt(Σ v_i²)`` over kept components, left fold in
index order).

At 100 TB: postings shuffle once at index time and bucket by idx;
query-side explode is Q·nnz rows. Skewed indices (stopword-like
dimensions) behave exactly like skewed join keys — drop them at
``to_sparse`` time (threshold) or salt, same playbook as skew.py.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def to_sparse(
    df: DataFrame,
    vec_col: str = "embedding",
    threshold: float = 0.0,
    indices_col: str = "indices",
    values_col: str = "values",
) -> DataFrame:
    """Add (indices, values) columns keeping components with
    ``abs(x) > threshold`` — one JVM transform+filter, original column
    order (→ ascending indices) preserved."""
    pairs = F.expr(
        f"filter(transform({vec_col}, (x, i) -> struct(i AS idx, "
        f"CAST(x AS DOUBLE) AS val)), p -> abs(p.val) > {threshold!r})"
    )
    return df.withColumn("__pairs", pairs).withColumns(
        {
            indices_col: F.expr("transform(__pairs, p -> p.idx)"),
            values_col: F.expr("transform(__pairs, p -> p.val)"),
        }
    ).drop("__pairs")


def to_dense(
    df: DataFrame,
    dim: int,
    indices_col: str = "indices",
    values_col: str = "values",
    out_col: str = "dense",
) -> DataFrame:
    """Reconstruct the dense array (absent components = 0.0) — a JVM
    map lookup per position."""
    return df.withColumn(
        out_col,
        F.expr(
            f"transform(sequence(0, {dim - 1}), i -> "
            f"coalesce(element_at(map_from_arrays({indices_col}, "
            f"{values_col}), i), 0D))"
        ),
    )


def _norm_expr(values_col: str):
    """Deterministic sparse L2 norm: left fold in stored (index) order."""
    return F.sqrt(
        F.aggregate(F.col(values_col), F.lit(0.0), lambda a, x: a + x * x)
    )


def sparse_topk_search(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    query_id: str = "qid",
    indices_col: str = "indices",
    values_col: str = "values",
    exclude_self: bool = False,
) -> DataFrame:
    """(qid, rank, id, score): top-k inner-product/cosine over sparse
    vectors via the inverted-index join. Distributed end to end — the
    query frame explodes in-plan and broadcasts; nothing collected.
    ``metric='dot'`` ranks by the raw inner product; ``'cosine'``
    divides by the sparse L2 norms (both rounded to 6 dp before
    ranking; ties break by id)."""
    if metric not in ("dot", "cosine"):
        raise ValueError(f"metric must be dot or cosine, got {metric!r}")

    def explode_side(df, key, prefix):
        out = df.select(
            F.col(key),
            *( [(_norm_expr(values_col)).alias(f"{prefix}norm")]
               if metric == "cosine" else [] ),
            F.explode(
                F.arrays_zip(
                    F.col(indices_col).alias("idx"),
                    F.col(values_col).alias("val"),
                )
            ).alias("p"),
        )
        return out.select(
            key,
            *( [f"{prefix}norm"] if metric == "cosine" else [] ),
            F.col("p.idx").alias("idx"),
            F.col("p.val").alias(f"{prefix}val"),
        )

    post = explode_side(corpus, id_col, "c")
    qpost = explode_side(queries, query_id, "q")
    joined = post.join(F.broadcast(qpost), "idx")
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id))
    contrib = (F.col("cval") * F.col("qval")).alias("contrib")
    grouped = (
        joined.select(
            query_id, id_col, "idx", contrib,
            *( ["cnorm", "qnorm"] if metric == "cosine" else [] ),
        )
        .groupBy(query_id, id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("idx", "contrib"))),
                F.lit(0.0),
                lambda a, x: a + x["contrib"],
            ).alias("__dot"),
            *(
                [F.first("cnorm").alias("cnorm"),
                 F.first("qnorm").alias("qnorm")]
                if metric == "cosine" else []
            ),
        )
    )
    if metric == "cosine":
        score = F.when(
            (F.col("cnorm") > 0) & (F.col("qnorm") > 0),
            F.col("__dot") / (F.col("cnorm") * F.col("qnorm")),
        ).otherwise(F.lit(0.0))
    else:
        score = F.col("__dot")
    scored = grouped.withColumn("score", F.round(score, 6))
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "score")
    )


class TfidfModel(NamedTuple):
    """Fitted corpus statistics: the hashed document-frequency table
    (≤ dim rows) + N + the hash dimension. Queries transform with the
    CORPUS model (the fit/transform split every vectorizer needs — a
    query's idf must come from the indexed corpus, not the query frame)."""

    dfs: DataFrame  # (idx, dfc)
    n_docs: float
    dim: int


def _hashed_tf(
    docs: DataFrame, dim: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, idx, tf) hashed term-frequency rows — one tokenize pass, one
    group-by shuffle. Frozen hash spec: idx = int(md5(term)[:8 hex], 16)
    mod dim (the operators/sampling.py md5-bucket idiom)."""
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % dim
    ).cast("int")
    return (
        tok.select(id_col, bucket.alias("idx"))
        .groupBy(id_col, "idx")
        .agg(F.count("*").cast("double").alias("tf"))
    )


def tfidf_fit(
    docs: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> TfidfModel:
    """Fit the hashed document-frequency statistics on a corpus. The df
    table is bucket-bounded (≤ dim rows) and N is a scalar — the same
    bounded-metadata contract as BM25's (N, avgdl)."""
    tfs = _hashed_tf(docs, dim, id_col, text_col)
    dfs = tfs.groupBy("idx").agg(F.count("*").cast("double").alias("dfc"))
    return TfidfModel(dfs, float(docs.count()), dim)


def tfidf_transform(
    docs: DataFrame,
    model: TfidfModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    indices_col: str = "indices",
    values_col: str = "values",
    sublinear: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Vectorize any frame with a fitted model → (id, indices, values).
    Buckets unseen at fit time take the maximum smooth idf
    (df treated as 0) — the standard convention. Plan: hashed-tf shuffle,
    BROADCAST join against the ≤ dim-row df table, one re-nest shuffle
    on id; everything JVM-side."""
    tfs = _hashed_tf(docs, model.dim, id_col, text_col)
    tfw = F.lit(1.0) + F.log(F.col("tf")) if sublinear else F.col("tf")
    idf = (
        F.log(
            (F.lit(model.n_docs) + 1.0)
            / (F.coalesce(F.col("dfc"), F.lit(0.0)) + 1.0)
        )
        + F.lit(1.0)
    )
    nested = (
        tfs.join(F.broadcast(model.dfs), "idx", "left")
        .select(id_col, "idx", (tfw * idf).alias("val"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("idx", "val"))).alias("__p"))
    )
    out = nested.withColumns(
        {
            indices_col: F.expr("transform(__p, p -> p.idx)"),
            values_col: F.expr("transform(__p, p -> p.val)"),
        }
    ).drop("__p")
    if normalize:
        out = (
            out.withColumn("__n", _norm_expr(values_col))
            .withColumn(
                values_col,
                F.transform(F.col(values_col), lambda v: v / F.col("__n")),
            )
            .drop("__n")
        )
    return out


def tfidf_vectors(
    docs: DataFrame,
    dim: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    indices_col: str = "indices",
    values_col: str = "values",
    sublinear: bool = True,
    normalize: bool = True,
) -> DataFrame:
    """Hashed TF-IDF vectorizer, fit-and-transform on one frame:
    (id, indices, values) sparse vectors straight from text — the bridge
    from raw documents to :func:`sparse_topk_search` (learned-sparse
    models like SPLADE slot into the same (indices, values) shape; this
    is the classical baseline — the HashingVectorizer/HashingTF design,
    feature hashing per Weinberger et al. 2009). For query frames, fit
    on the corpus once (:func:`tfidf_fit`) and :func:`tfidf_transform`
    the queries with that model.

    Frozen spec (engine-replayable): tokens = lowercase single-space
    split (the bm25 tokenizer); feature index = md5-bucket mod ``dim``
    (colliding terms merge — the standard hashing-trick trade,
    negligible at dim >> distinct terms); tf weight = 1 + ln(tf) when
    ``sublinear``; idf = ln((N + 1) / (df + 1)) + 1 (smooth-idf), df
    counted on hashed buckets; values L2-normalized per doc when
    ``normalize``, norm computed by the index-ordered fold
    (deterministic under layout).
    """
    model = tfidf_fit(docs, dim, id_col, text_col)
    return tfidf_transform(
        docs, model, id_col, text_col, indices_col, values_col,
        sublinear, normalize,
    )
