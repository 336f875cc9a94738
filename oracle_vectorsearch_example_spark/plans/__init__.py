from oracle_vectorsearch_example_spark.plans.corpus import build_training_corpus
from oracle_vectorsearch_example_spark.plans.pipeline import (
    ingest_documents,
    search_text,
)
from oracle_vectorsearch_example_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
)

__all__ = [
    "build_training_corpus",
    "ingest_documents",
    "search_text",
    "explain_str",
    "pushed_filters",
    "has_broadcast_join",
]
