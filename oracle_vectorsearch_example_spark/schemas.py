"""Explicit StructType schemas — never inferred (SURVEY.md §1.3).

Mirrors the reference's DDL:
- ``pdf_documents`` (01_pdf_to_vector.sql:49-54): doc_id identity, file_name,
  BLOB content, created_at.
- ``doc_chunks`` (01_pdf_to_vector.sql:67-77): (doc_id, chunk_id) composite
  key, CLOB chunk_text, VECTOR(384, FLOAT32) embedding, created_at.

Type mapping convention (SURVEY.md §1.2): NUMBER→Long, VARCHAR2/CLOB→String,
BLOB→Binary, TIMESTAMP→Timestamp, VECTOR(d,FLOAT32)→array<float> with the
dimension enforced by pipeline + validators, not by the type system.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Embedding dim: 384 in the reference (all-MiniLM-L12-v2,
# 01_pdf_to_vector.sql:72); 64 for the deterministic hashing test double
# (FIXTURES.md embeddings table).
REFERENCE_EMBED_DIM = 384
TEST_EMBED_DIM = 64

PDF_DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("file_name", T.StringType(), False),
        T.StructField("pdf_content", T.BinaryType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

DOC_CHUNKS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("file_name", T.StringType(), True),
        T.StructField("chunk_offset", T.LongType(), True),
        T.StructField("chunk_length", T.IntegerType(), True),
        T.StructField("chunk_text", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# Chunk record emitted by the chunker — the typed analog of the reference's
# VECTOR_ARRAY_T JSON element {"chunk_id","chunk_offset","chunk_length",
# "chunk_data"} (01_pdf_to_vector.sql:192).
CHUNK_RECORD = T.StructType(
    [
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("chunk_offset", T.LongType(), False),
        T.StructField("chunk_length", T.IntegerType(), False),
        T.StructField("chunk_data", T.StringType(), False),
    ]
)

# Embedding record — analog of {"embed_id","embed_data","embed_vector"}
# (01_pdf_to_vector.sql:152).
EMBED_RECORD = T.StructType(
    [
        T.StructField("embed_id", T.IntegerType(), False),
        T.StructField("embed_data", T.StringType(), False),
        T.StructField("embed_vector", T.ArrayType(T.FloatType()), False),
    ]
)

# Model registry manifest — analog of USER_MINING_MODELS + models.json
# (load_models.py:55-59, models.json:2-11).
MODEL_MANIFEST = T.StructType(
    [
        T.StructField("model_name", T.StringType(), False),
        T.StructField("model_id", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("dim", T.IntegerType(), True),
        T.StructField("loaded_at", T.TimestampType(), True),
    ]
)

# Canonical dtypes for the driver test tables (TESTDATA.md), AFTER the
# normalization pass in sources.io.read_table. The physical parquet encoding
# has drifted between test-data generations (round 1: events.ts was
# TIMESTAMP(NANOS), readable only as bigint; round 2: all timestamp columns
# became tz-less µs, which Spark 4 reads as TIMESTAMP_NTZ) — the engine's
# contract is this logical schema, and read_table coerces every known
# physical variant to it or fails loudly naming the drifted column.
CANONICAL_TEST_TABLES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

# Multimodal media table: opaque binary payload + typed metadata
# (extension surface; binary column shape mirrors pdf_documents.pdf_content).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)
