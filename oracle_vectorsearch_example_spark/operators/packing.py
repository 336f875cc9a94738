"""Sequence packing for training pipelines (§2.12 extension surface).

The concat-and-chunk dataloader shape: documents are concatenated in a
deterministic order and sliced into fixed-length token sequences ("packs"),
so every training sequence is exactly ``max_tokens`` long and no token is
dropped — the standard GPT-style pre-training layout. A doc whose tokens
straddle a pack boundary contributes rows to both packs.

Distributed shape: a single global order would serialize the cumulative
sum, so packing runs per SHARD — docs are hash-bucketed into ``n_shards``
independent packing streams (deterministic, same md5-bucket spec as
``operators.sampling``), each stream packs in doc-id order with one window
cumsum. One shuffle total, keyed by (shard); shards scale the parallelism
the way distributed dataloaders shard their input. Every pack except the
trailing one per shard is exactly full — an invariant the tests pin.

Token counts default to the frozen whitespace-token spec
(``functions.textstats.ws_token_count``) so the DuckDB oracle can recompute
the packing arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Assign every document its slice positions in fixed-length packs.

    Returns one row per (doc, pack) segment:
    ``(shard, pack_id, id, pack_offset, n_tokens)`` — ``pack_offset`` is
    where the doc's tokens start inside pack ``pack_id`` of ``shard``;
    docs spanning a boundary emit one row per pack touched. Zero-token
    docs are dropped (nothing to pack).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if token_count_col is None:
        from oracle_vectorsearch_example_spark.functions.textstats import ws_token_count

        tok = ws_token_count(F.col(text_col))
    else:
        tok = F.col(token_count_col).cast("long")

    shard = (hash_bucket(F.col(id_col), seed) % n_shards).alias("shard")
    base = df.select(shard, F.col(id_col), tok.alias("__tok")).filter(
        F.col("__tok") > 0
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = base.withColumn("__cb", F.sum("__tok").over(w) - F.col("__tok"))
    L = F.lit(max_tokens)
    # integer `div`, not float `/`: float division is exact only while the
    # per-shard cumulative token count stays under 2^53; the frozen oracle
    # spec uses integer // division, and they must agree at any scale
    # (ADVICE r3 #2)
    spans = cum.withColumn(
        "pack_id",
        F.explode(
            F.sequence(
                F.expr(f"__cb div {max_tokens}"),
                F.expr(f"(__cb + __tok - 1) div {max_tokens}"),
            )
        ),
    )
    seg_start = F.greatest(F.col("__cb"), F.col("pack_id") * L)
    seg_end = F.least(F.col("__cb") + F.col("__tok"), (F.col("pack_id") + 1) * L)
    return spans.select(
        "shard",
        F.col("pack_id"),
        F.col(id_col),
        (seg_start - F.col("pack_id") * L).cast("long").alias("pack_offset"),
        (seg_end - seg_start).cast("long").alias("n_tokens"),
    )
