"""PySpark-native analytics engine with the capabilities of
``JiseonLee-jul/oracle_vectorsearch_example`` (Oracle 26ai AI Vector Search
usage example), re-expressed Spark-first.

The reference (read-only at /root/reference) exercises a document → chunk →
embed → vector-index → similarity-search pipeline on Oracle. This package
provides the same surface on Spark DataFrames:

- ``sources``    — parquet/binary-file readers, writers, constraint checks,
                   model registry (EP2: models/load_models.py semantics)
- ``functions``  — vector distances, chunkers (UTL_TO_CHUNKS analog),
                   embedders (VECTOR_EMBEDDING analog), text analytics
- ``operators``  — similarity search (exact + IVF), dedup family, range /
                   as-of joins, sessionization, multimodal column plumbing
- ``plans``      — end-to-end pipelines (EP1 ingest, EP3 search) and
                   physical-plan inspection helpers
- ``streaming``  — Structured Streaming ingestion (watermarked windows)

Design stance (SURVEY.md §7): DataFrame-only, no custom Catalyst rules, no
RDDs; UDFs only where math can't be a column expression. Everything here is
derived from public Apache Spark APIs and the reference's documented
semantics only.
"""

from oracle_vectorsearch_example_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
