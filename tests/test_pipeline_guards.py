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
