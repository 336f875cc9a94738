"""Runtime guards on the EP1/EP3 pipeline: chunk-key packing range and
embedding dimension enforcement (the VECTOR(384, FLOAT32) analog,
01_pdf_to_vector.sql:72)."""

from __future__ import annotations

import pytest
from pyspark.errors import PySparkRuntimeError
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.embedding import HashingEmbedder
from oracle_vectorsearch_example_spark.plans.pipeline import (
    MAX_CHUNK_ID,
    search_text,
    write_doc_chunks,
)

EMBEDDER = HashingEmbedder(dim=4)


def _chunks_df(spark, chunk_id, doc_id=1):
    return spark.createDataFrame(
        [(doc_id, chunk_id, "text words here", [1.0, 0.0, 0.0, 0.0])],
        "doc_id long, chunk_id int, chunk_text string, embedding array<double>",
    )


def test_search_text_ok_within_range(spark):
    df = _chunks_df(spark, chunk_id=5)
    out = search_text(df, ["text words"], k=1, embedder=EMBEDDER).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1 and out[0]["chunk_id"] == 5


def test_search_text_raises_on_chunk_id_overflow(spark):
    df = _chunks_df(spark, chunk_id=MAX_CHUNK_ID)  # == 2^20, first bad value
    with pytest.raises(Exception, match="chunk key packing out of range"):
        search_text(df, ["text words"], k=1, embedder=EMBEDDER).collect()


def test_search_text_raises_on_negative_chunk_id(spark):
    df = _chunks_df(spark, chunk_id=-1)
    with pytest.raises(Exception, match="chunk key packing out of range"):
        search_text(df, ["text words"], k=1, embedder=EMBEDDER).collect()


def test_write_doc_chunks_dim_ok(spark, tmp_path):
    df = _chunks_df(spark, chunk_id=1)
    write_doc_chunks(df, str(tmp_path / "ok"), dim=4)
    back = spark.read.parquet(str(tmp_path / "ok"))
    assert back.count() == 1 and "created_at" in back.columns


def test_write_doc_chunks_dim_violation_raises(spark, tmp_path):
    df = _chunks_df(spark, chunk_id=1)
    with pytest.raises(Exception, match="embedding dimension violation"):
        write_doc_chunks(df, str(tmp_path / "bad"), dim=384)


def test_write_doc_chunks_null_embedding_raises(spark, tmp_path):
    df = _chunks_df(spark, chunk_id=1).withColumn(
        "embedding", F.lit(None).cast("array<double>")
    )
    with pytest.raises(Exception, match="embedding dimension violation"):
        write_doc_chunks(df, str(tmp_path / "bad2"), dim=4)


def test_search_text_ivf_matches_exact(spark):
    """EP3 ivf mode (r4): build_chunk_index + search_text_ivf at
    nprobe = n_clusters returns exactly search_text's (qid, rank,
    doc_id, chunk_id) over the same chunks — the mode switch SURVEY §3
    sketches, closed over the packed chunk key."""
    from oracle_vectorsearch_example_spark.plans.pipeline import (
        build_chunk_index,
        ingest_documents,
        search_text_ivf,
    )
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    dc = ingest_documents(docs, max_words=20, overlap=5).cache()
    queries = ["fast key order sort", "alpha beta gamma"]
    exact = search_text(dc, queries, k=5)
    idx = build_chunk_index(dc, n_clusters=8, seed=42)
    approx = search_text_ivf(idx, queries, k=5, nprobe=8)
    key = lambda df: sorted(
        (r.qid, r.rank, r.doc_id, r.chunk_id) for r in df.collect()
    )
    assert key(approx) == key(exact) and len(key(exact)) == 10
    # output schema parity with search_text
    assert approx.columns == exact.columns
    dc.unpersist()


def test_search_text_ivf_materialized(spark, tmp_path):
    """IVF mode against a materialized chunk index (pruned probes)."""
    from oracle_vectorsearch_example_spark.plans.pipeline import (
        build_chunk_index,
        ingest_documents,
        search_text_ivf,
    )
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    dc = ingest_documents(docs, max_words=20, overlap=5)
    idx = build_chunk_index(dc, n_clusters=8, seed=42, path=str(tmp_path / "ci"))
    out = search_text_ivf(idx, ["fast key order sort"], k=3, nprobe=4).collect()
    assert len(out) == 3
    assert all(r.rank in (1, 2, 3) and r.doc_id >= 0 and r.chunk_id >= 1 for r in out)


def test_search_text_filtered_returns_k_qualifying(spark):
    """Filtered EP3 (r5): predicate over doc_chunks columns runs BEFORE
    the top-k on both the exact and the IVF path, so k qualifying chunks
    return and both paths agree at exhaustive nprobe."""
    from oracle_vectorsearch_example_spark.plans.pipeline import (
        build_chunk_index,
        ingest_documents,
        search_text,
        search_text_ivf,
    )
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    dc = ingest_documents(docs, max_words=40, overlap=5).localCheckpoint()
    pred = F.col("doc_id") % 2 == 0
    exact = search_text(dc, ["fast key order sort"], k=5, predicate=pred)
    rows = exact.collect()
    assert len(rows) == 5 and all(r.doc_id % 2 == 0 for r in rows)
    # equals prefiltering by hand
    pre = search_text(dc.filter(pred), ["fast key order sort"], k=5).collect()
    assert [(r.qid, r.rank, r.doc_id, r.chunk_id) for r in rows] == [
        (r.qid, r.rank, r.doc_id, r.chunk_id) for r in pre
    ]
    # IVF path with a stored payload column, exhaustive probe
    idx = build_chunk_index(dc, n_clusters=8, seed=42, payload_cols=["doc_id"])
    ivf = search_text_ivf(
        idx, ["fast key order sort"], k=5, nprobe=8, predicate=pred
    ).collect()
    assert [(r.qid, r.rank, r.doc_id, r.chunk_id) for r in ivf] == [
        (r.qid, r.rank, r.doc_id, r.chunk_id) for r in rows
    ]
