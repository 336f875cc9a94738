"""Streaming media ingest with exactly-once incremental dedup (r10).

A production media pipeline receives images/audio as a stream (new
crawl shards landing as files); this sink folds each micro-batch into
the warehouse-backed :class:`~..operators.incremental.
IncrementalMediaDedup` state with the standard foreachBatch
exactly-once discipline: Structured Streaming re-delivers a batch
(same ``batch_id``) after a failure, and ``ingest(batch_id=...)``
ledgers the id in the SAME atomic manifest swap as the band/cluster
tables — a published replay is a no-op, an unpublished crash retries
cleanly (the idempotent-by-batchId sink pattern the Spark docs
prescribe for foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def media_dedup_sink(
    media_stream: DataFrame,
    warehouse_root: str,
    **inc_kwargs,
):
    """``foreachBatch`` ingest of a streaming (id, payload) frame into
    ``IncrementalMediaDedup(warehouse_root, **inc_kwargs)`` — pass
    ``signature='afp'`` for audio, ``'mp3_gain'`` for MP3 codec-domain
    dedup (r13), ``prefix=``/``max_hamming=`` etc. as for the batch
    class. Long-running streams should pass
    ``compact_every=N`` (r11): per-ingest cost creeps with band-table
    union WIDTH, and the cadence folds + expires + vacuums inside the
    same ingest call, keeping per-micro-batch wall flat at
    daily-crawl cadences. Returns the ``DataStreamWriter``; the
    caller sets ``checkpointLocation``/trigger and ``start()``s (the
    ingest.py sink convention). Survivors at any point:
    ``IncrementalMediaDedup(spark, root, ...).survivors()``."""
    from oracle_vectorsearch_example_spark.operators.incremental import (
        IncrementalMediaDedup,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inc = IncrementalMediaDedup(
            batch_df.sparkSession, warehouse_root, **inc_kwargs
        )
        inc.ingest(batch_df, batch_id=batch_id)

    return media_stream.writeStream.foreachBatch(sink)
