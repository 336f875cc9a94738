from oracle_vectorsearch_example_spark.streaming.cdc import (
    apply_changes_sink,
    latest_change_per_key,
)
from oracle_vectorsearch_example_spark.streaming.media import (
    media_dedup_sink,
)
from oracle_vectorsearch_example_spark.streaming.text import (
    corpus_ingest_sink,
    text_dedup_sink,
)
from oracle_vectorsearch_example_spark.streaming.ingest import (
    dedup_events,
    dedup_stream,
    enrich_stream,
    ingest_documents_stream,
    sessionized_counts_stream,
    sliding_counts,
    tumbling_counts,
    tumbling_counts_stream,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "tumbling_counts_stream",
    "sessionized_counts_stream",
    "dedup_stream",
    "dedup_events",
    "enrich_stream",
    "ingest_documents_stream",
    "apply_changes_sink",
    "media_dedup_sink",
    "text_dedup_sink",
    "corpus_ingest_sink",
    "latest_change_per_key",
]
