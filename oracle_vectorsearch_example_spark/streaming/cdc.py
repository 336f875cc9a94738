"""Streaming CDC apply: MERGE micro-batches into the Warehouse (S12 ×
§2.10 — the streaming sibling of ``Warehouse.merge``, the shape Delta
calls APPLY CHANGES / ``merge`` in ``foreachBatch``).

Each micro-batch of change rows upserts (or deletes) into a warehouse
table as ONE atomic manifest swap. Exactly-once falls out of two
facts, not a dedup log:

- Spark replays a failed batch with the SAME rows (checkpointed
  offsets), and
- MERGE is IDEMPOTENT for identical input: re-upserting rows that are
  already present replaces them with themselves; re-deleting absent
  rows is a no-op; re-inserting rows now matched becomes an update.
  A replayed batch therefore publishes a snapshot equal to the one the
  crash interrupted (one extra harmless version, same table bytes).

Within-batch semantics: a CDC feed can carry several changes for one
key in one batch; ANSI MERGE would reject that (ORA-30926). The
standard resolution is applied here: keep the LAST change per key by a
strictly-ordering ``sequence_col`` (change LSN / event time; (key,
seq) must be unique — ties would make "last" layout-dependent, so the
reducer orders by (seq, all remaining columns) making even the tie
case deterministic). ``op_col`` optionally splits each batch into
upserts and deletes (two merges, same manifest cadence as Delta's
CDC apply; the delete merge runs second so a key that is deleted and
re-inserted in one batch resolves by its LAST change like any other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["latest_change_per_key", "apply_changes_sink"]


def latest_change_per_key(
    changes: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    sequence_col: str,
) -> DataFrame:
    """The last change per key by ``sequence_col`` (deterministic: the
    window orders by (seq, every other column) so even duplicate
    sequence numbers cannot make the pick layout-dependent)."""
    keys = list(key_cols)
    rest = [c for c in changes.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc_nulls_last() for c in [sequence_col] + [x for x in rest if x != sequence_col]]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes_sink(
    changes_stream: DataFrame,
    warehouse_root: str,
    table: str,
    key_cols: list[str] | tuple[str, ...],
    sequence_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "D",
):
    """``foreachBatch`` MERGE of a change stream into
    ``Warehouse(warehouse_root)[table]``. Returns the
    ``DataStreamWriter`` — the caller sets ``checkpointLocation`` /
    trigger and ``start()``s (the ingest.py sink convention).

    - ``sequence_col``: reduce each batch to the last change per key
      first (required if a batch can carry >1 change per key — the
      merge's unstable-row guard rejects it otherwise).
    - ``op_col``: rows whose ``op_col == delete_op`` DELETE their key;
      everything else upserts — including rows with a NULL op (a
      malformed feed must not silently lose data; Debezium-style feeds
      encode creates/updates as non-delete ops, so NULL defaults to the
      upsert side). Without it, every row upserts. The op column is
      stripped before the table write (it describes the change, not the
      row)."""
    from oracle_vectorsearch_example_spark.sources.txn import Warehouse

    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        wh = Warehouse(batch_df.sparkSession, warehouse_root)
        batch = batch_df
        if sequence_col is not None:
            batch = latest_change_per_key(batch, keys, sequence_col)
        if op_col is not None:
            # NULL op must land somewhere: `op != 'D'` and `op == 'D'`
            # are both NULL-false, which would drop the row from BOTH
            # sides — silent data loss on a malformed feed. Treat NULL
            # as upsert.
            is_del = F.col(op_col).eqNullSafe(F.lit(delete_op))
            ups = batch.filter(~is_del).drop(op_col)
            dels = batch.filter(is_del).drop(op_col)
            # one batch, up to two manifest versions: upserts first,
            # then deletes — the per-key last-change reduction above
            # guarantees the two sets touch disjoint keys
            if not ups.isEmpty():
                wh.merge(table, ups, keys)
            if not dels.isEmpty():
                # a delete against a missing table is a no-op
                if table in (wh.tables() if wh.current_version() else []):
                    wh.merge(
                        table,
                        dels,
                        keys,
                        when_matched="delete",
                        insert_unmatched=False,
                    )
        else:
            wh.merge(table, batch, keys)

    return changes_stream.writeStream.foreachBatch(sink)
