"""End-to-end pipelines — the reference's two entry points, Spark-shaped.

EP1 (scripts/01_pdf_to_vector.sql): documents → extract text → chunk →
embed → doc_chunks. The reference chains UTL_TO_TEXT → UTL_TO_CHUNKS →
UTL_TO_EMBEDDINGS in one statement ("official recommended pattern",
01_pdf_to_vector.sql:121-128); here it's one lazy DataFrame — chunking is a
row-local generator and embedding is a column expression (hashing) or an
Arrow-batched stage (ONNX), so the whole pipeline is **shuffle-free** from
scan to sink.

EP3 (models/README.md:40 + the vector index): embed query text → top-k
similarity search, exact or IVF-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_words
from oracle_vectorsearch_example_spark.functions.embedding import HashingEmbedder
from oracle_vectorsearch_example_spark.operators.search import topk_search


def ingest_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 100,
    overlap: int = 10,
    embedder: HashingEmbedder | None = None,
) -> DataFrame:
    """documents → doc_chunks (chunked + embedded), the EP1 pipeline.

    Output: (doc_id, chunk_id, chunk_offset, chunk_length, chunk_text,
    embedding) — the doc_chunks shape of 01_pdf_to_vector.sql:67-77 minus
    audit columns (add created_at at write time, the DEFAULT SYSTIMESTAMP
    analog).
    """
    embedder = embedder or HashingEmbedder(dim=64)
    chunks = chunk_by_words(docs, text_col=text_col, id_cols=[id_col], max_words=max_words, overlap=overlap)
    return embedder.embed_df(chunks, "chunk_text", "embedding")


def search_text(
    doc_chunks: DataFrame,
    query_texts: list[str],
    k: int = 10,
    metric: str = "cosine",
    embedder: HashingEmbedder | None = None,
) -> DataFrame:
    """EP3: embed query strings, top-k nearest chunks per query.

    Returns (qid, rank, doc_id, chunk_id, distance); qid is the 0-based
    position of the query string.
    """
    embedder = embedder or HashingEmbedder(dim=64)
    spark = doc_chunks.sparkSession
    q = spark.createDataFrame([(i, t) for i, t in enumerate(query_texts)], "qid long, qtext string")
    q = q.withColumn("qvec", embedder.embed_col(F.col("qtext")))
    # numeric composite key (doc_id · 2^20 + chunk_id): distance ties break on
    # (doc_id, chunk_id) numerically — reproducible in plain SQL oracles,
    # unlike a string key whose lexicographic order differs ("10:2" < "2:1").
    base = doc_chunks.withColumn(
        "__chunk_key",
        (F.col("doc_id") * F.lit(1 << 20) + F.col("chunk_id")).cast("long"),
    )
    hits = topk_search(
        base, q, k=k, metric=metric, base_id="__chunk_key", base_vec="embedding",
        query_id="qid", query_vec="qvec",
    )
    key = F.col("__chunk_key")
    return hits.select(
        "qid",
        "rank",
        F.shiftright(key, 20).cast("long").alias("doc_id"),
        (key % F.lit(1 << 20)).cast("int").alias("chunk_id"),
        "distance",
    )


def write_doc_chunks(df: DataFrame, path: str) -> None:
    """Sink with the created_at default (01_pdf_to_vector.sql:73)."""
    df.withColumn("created_at", F.current_timestamp()).write.mode("overwrite").parquet(path)
