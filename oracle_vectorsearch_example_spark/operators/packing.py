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

__all__ = ["pack_sequences", "pack_sequences_bfd"]


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


def pack_sequences_bfd(
    df: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_shards: int = 8,
    seed: int = 42,
    overflow: str = "error",
) -> DataFrame:
    """No-split sequence packing: Best-Fit-Decreasing bin packing of
    whole documents into ``max_tokens`` bins — the multipack/LIFO
    dataloader shape (T5-style packing, axolotl/llama-factory multipack
    samplers) for training objectives where a document must never
    straddle a sequence boundary. BFD is the classic ≤ 11/9·OPT + 1
    guarantee (Johnson 1973, public).

    Returns one row per document: ``(shard, pack_id, id, pack_offset,
    n_tokens)`` — exactly one row per doc (contrast
    :func:`pack_sequences`, which splits across boundaries). No pack
    exceeds ``max_tokens``. ``overflow`` controls docs longer than a
    pack: ``'error'`` (default — fail loudly, in-plan), ``'truncate'``
    (clamp to ``max_tokens``), ``'drop'``.

    Deterministic spec: within a shard, docs sort by (tokens desc, id
    asc); each goes to the bin with the SMALLEST sufficient remainder
    (ties → smallest pack id; none → new bin, ids count up from 0);
    ``pack_offset`` is the insertion-order cumulative within the bin.
    A pure function of (df, params) — layout-independent.

    Distributed shape: the greedy is inherently sequential, so it runs
    per SHARD as one ``applyInPandas`` task over skinny (id, n_tokens)
    rows — payloads never shuffle, and a shard's (id, tokens) pairs
    must fit one task (tune ``n_shards``; the sort + bisect loop is
    O(n log n) per shard). Same hash-shard spec as everything else."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if overflow not in ("error", "truncate", "drop"):
        raise ValueError(f"overflow must be error|truncate|drop, got {overflow!r}")
    if token_count_col is None:
        from oracle_vectorsearch_example_spark.functions.textstats import (
            ws_token_count,
        )

        tok = ws_token_count(F.col(text_col))
    else:
        tok = F.col(token_count_col).cast("long")

    shard = (hash_bucket(F.col(id_col), seed) % n_shards).alias("shard")
    base = df.select(shard, F.col(id_col), tok.alias("__tok")).filter(
        F.col("__tok") > 0
    )
    if overflow == "error":
        base = base.select(
            "shard",
            id_col,
            F.when(F.col("__tok") <= max_tokens, F.col("__tok"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"pack_sequences_bfd: document exceeds "
                            f"max_tokens={max_tokens} and overflow='error'; "
                            f"id="
                        ),
                        F.col(id_col).cast("string"),
                    )
                )
            )
            .alias("__tok"),
        )
    elif overflow == "truncate":
        base = base.withColumn("__tok", F.least("__tok", F.lit(max_tokens)))
    else:  # drop
        base = base.filter(F.col("__tok") <= max_tokens)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    id_type = base.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("shard", IntegerType(), False),
            StructField("pack_id", LongType(), False),
            StructField(id_col, id_type, True),
            StructField("pack_offset", LongType(), False),
            StructField("n_tokens", LongType(), False),
        ]
    )

    def pack(key, pdf):
        import bisect

        import pandas as pd

        shard_id = int(key[0])
        rows = sorted(
            zip(pdf["__tok"].tolist(), pdf[id_col].tolist()),
            key=lambda r: (-r[0], r[1]),
        )
        # sorted list of (remaining, pack_id): bisect on (size,) finds the
        # smallest sufficient remainder; among equal remainders the
        # smallest pack_id comes first — exactly the frozen tie-break
        bins: list[tuple[int, int]] = []
        fills: dict[int, int] = {}
        out_pack, out_id, out_off, out_tok = [], [], [], []
        for t, i in rows:
            j = bisect.bisect_left(bins, (t, -1))
            if j < len(bins):
                rem, pid = bins.pop(j)
                new_rem = rem - t
            else:
                pid = len(fills)
                new_rem = max_tokens - t
            off = fills.get(pid, 0)
            fills[pid] = off + t
            bisect.insort(bins, (new_rem, pid))
            out_pack.append(pid)
            out_id.append(i)
            out_off.append(off)
            out_tok.append(t)
        return pd.DataFrame(
            {
                "shard": [shard_id] * len(out_id),
                "pack_id": out_pack,
                id_col: out_id,
                "pack_offset": out_off,
                "n_tokens": out_tok,
            }
        )

    return base.groupBy("shard").applyInPandas(pack, schema=out_schema)
