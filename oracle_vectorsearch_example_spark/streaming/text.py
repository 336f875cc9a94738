"""Streaming text ingest with exactly-once incremental dedup (r11).

The text twin of :mod:`.media`: a production crawl lands document
shards as a stream, and this sink folds each micro-batch into the
warehouse-backed :class:`~..operators.incremental.IncrementalDedup`
MinHash state with the standard foreachBatch exactly-once discipline —
Structured Streaming re-delivers a batch (same ``batch_id``) after a
failure, and ``ingest(batch_id=...)`` ledgers the id in the SAME atomic
manifest swap as the band/cluster tables, so a published replay is a
no-op and an unpublished crash retries cleanly (the
idempotent-by-batchId sink pattern the Spark docs prescribe for
foreachBatch). The ledger itself lives on the shared
:class:`IncrementalDedup` base, so text and media sinks are the same
machinery with different signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def text_dedup_sink(
    docs_stream: DataFrame,
    warehouse_root: str,
    **inc_kwargs,
):
    """``foreachBatch`` ingest of a streaming (id, text) frame into
    ``IncrementalDedup(warehouse_root, **inc_kwargs)`` — pass
    ``text_col=``/``id_col=``/``num_hashes=``/``bands=``/``shingle_n=``
    as for the batch class. Long-running streams should pass
    ``compact_every=N``: per-ingest cost creeps with band-table union
    WIDTH, and the cadence folds + expires + vacuums inside the same
    ingest call. Returns the ``DataStreamWriter``; the caller sets
    ``checkpointLocation``/trigger and ``start()``s (the ingest.py sink
    convention). Survivors at any point:
    ``IncrementalDedup(spark, root, ...).survivors()``."""
    from oracle_vectorsearch_example_spark.operators.incremental import (
        IncrementalDedup,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inc = IncrementalDedup(
            batch_df.sparkSession, warehouse_root, **inc_kwargs
        )
        inc.ingest(batch_df, batch_id=batch_id)

    return docs_stream.writeStream.foreachBatch(sink)


def corpus_ingest_sink(
    docs_stream: DataFrame,
    warehouse_root: str,
    **corpus_kwargs,
):
    """``foreachBatch`` ingest of a streaming raw-document frame into
    ``IncrementalCorpus(warehouse_root, **corpus_kwargs)`` — the FULL
    corpus pipeline as a streaming sink (r11): each micro-batch stores
    its raw docs, folds the MinHash dedup state, and ledgers the batch
    id in one atomic manifest swap (exactly-once, like
    :func:`text_dedup_sink`); gates/splits stay READ-time knobs, so the
    curated corpus is ``IncrementalCorpus(spark, root, ...).documents()``
    at any point. Pass ``compact_every=`` for long streams. Returns the
    ``DataStreamWriter``; the caller sets ``checkpointLocation``/trigger
    and ``start()``s."""
    from oracle_vectorsearch_example_spark.plans.corpus import (
        IncrementalCorpus,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inc = IncrementalCorpus(
            batch_df.sparkSession, warehouse_root, **corpus_kwargs
        )
        inc.ingest(batch_df, batch_id=batch_id)

    return docs_stream.writeStream.foreachBatch(sink)
