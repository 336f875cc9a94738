"""Arrow IPC / Feather source + sink (r14) — the interchange format
of the Arrow ecosystem and the on-disk cache format of the Hugging
Face ``datasets`` library (its ``.arrow`` shards ARE Arrow IPC): a
shard is either the FILE format (``ARROW1`` magic, footer with a
record-batch index — random access) or the STREAM format (schema
message then batches). Both decode here through pyarrow itself — the
engine's Arrow layer is the blessed dependency, so unlike the
byte-level walkers (warc/wds/zips/tfrecord) this source delegates the
grammar and keeps only the DISTRIBUTION shape: ``binaryFile`` → one
Arrow ``mapInPandas`` per shard, record batches never shuffle, and
the pandas bridge is zero-copy where Arrow makes that possible.

Schema contract: Spark needs the output schema BEFORE the job runs,
so the reader resolves it on the DRIVER from the first shard's IPC
schema (one small head read — the schema message is at the front in
both formats) via Spark's own ``from_arrow_schema`` mapping; every
shard must then carry a compatible schema (a mismatched shard fails
LOUDLY inside its task, naming the shard, never silently coercing).

Reference anchor: 01_pdf_to_vector.sql:111-116 — stored payloads
become typed rows; here the payload grammar is Arrow's own.
"""

from __future__ import annotations

import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "arrow_ipc_schema",
    "read_arrow_ipc",
    "write_arrow_ipc",
]


def _open_any(data: bytes):
    """pyarrow reader for either IPC dialect: FILE (``ARROW1``) or
    STREAM; anything else raises by name."""
    import pyarrow as pa

    if bytes(data[:6]) == b"ARROW1":
        return pa.ipc.open_file(io.BytesIO(data))
    try:
        return pa.ipc.open_stream(io.BytesIO(data))
    except pa.lib.ArrowInvalid as e:
        raise ValueError(
            "not an Arrow IPC file or stream (no ARROW1 magic and "
            f"no valid stream schema): {e}"
        ) from e


def arrow_ipc_schema(data: bytes):
    """The pyarrow schema of one shard (file or stream dialect)."""
    return _open_any(bytes(data)).schema


def read_arrow_ipc(
    spark: SparkSession,
    path: str | None = None,
    files_df: DataFrame | None = None,
    on_error: str = "null",
) -> DataFrame:
    """Directory of ``.arrow`` / ``.feather`` IPC shards → rows with
    the shards' own (typed) columns plus a leading ``shard`` column.
    The Spark schema resolves on the driver from the FIRST shard
    (both IPC dialects front-load the schema message); a later shard
    whose schema disagrees fails loudly inside its task naming the
    shard — schema drift across a dataset's shards is corruption, not
    something to coerce quietly. ``on_error='null'`` turns a shard
    that cannot even OPEN into one NULL marker row (all data columns
    NULL); genuine schema mismatches always raise.

    Scale shape: one task per shard, batches stream through the Arrow
    bridge (no per-row Python), nothing shuffles."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    if (path is None) == (files_df is None):
        raise ValueError("pass exactly one of path= or files_df=")
    if files_df is None:
        from oracle_vectorsearch_example_spark.sources.io import (
            read_binary_files,
        )

        files_df = read_binary_files(spark, path).select("path", "content")

    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import from_arrow_schema

    head = files_df.select("content").first()
    if head is None:
        raise ValueError("no shards to read")
    pa_schema = arrow_ipc_schema(bytes(head["content"]))
    data_schema = from_arrow_schema(pa_schema)
    if "shard" in data_schema.fieldNames():
        raise ValueError(
            "shard schema already has a 'shard' column; rename it"
        )
    schema = T.StructType(
        [T.StructField("shard", T.StringType())] + list(data_schema)
    )
    names = [f.name for f in pa_schema]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for shard, content in zip(b["path"], b["content"]):
                try:
                    reader = _open_any(bytes(content))
                except Exception:
                    if on_error == "raise":
                        raise
                    out = pd.DataFrame(
                        [(shard,) + (None,) * len(names)],
                        columns=["shard"] + names,
                    )
                    yield out
                    continue
                got = [f.name for f in reader.schema]
                if got != names:
                    raise ValueError(
                        f"shard {shard!r} schema {got} does not match "
                        f"the dataset schema {names} resolved from "
                        "the first shard"
                    )
                tbl = reader.read_all()
                pdf = tbl.to_pandas()
                pdf.insert(0, "shard", shard)
                yield pdf

    return files_df.mapInPandas(run, schema)


def write_arrow_ipc(
    df: DataFrame,
    n_shards: int | None = None,
    stream: bool = False,
) -> DataFrame:
    """Rows → Arrow IPC shards: each task serializes its partition as
    one FILE-format shard (``stream=True`` for the stream dialect)
    and emits a ``(path, content)`` row — the same sink contract as
    ``write_wet`` / ``write_webdataset`` / ``write_tfrecord``, so the
    Warehouse or any binary sink persists it and
    :func:`read_arrow_ipc` round-trips it. Map-side encode; the only
    shuffle is the explicit ``repartition(n_shards)`` fan-in."""
    from pyspark.sql import types as T

    if n_shards is not None:
        df = df.repartition(n_shards)

    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])
    ext = "arrows" if stream else "arrow"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = [
            pa.Table.from_pandas(b, preserve_index=False)
            for b in batches
        ]
        if not tables:
            return
        tbl = pa.concat_tables(tables)
        sink = io.BytesIO()
        opener = pa.ipc.new_stream if stream else pa.ipc.new_file
        with opener(sink, tbl.schema) as w:
            w.write_table(tbl)
        yield pd.DataFrame(
            [(f"part-{pid:05d}.{ext}", sink.getvalue())],
            columns=["path", "content"],
        )

    return df.mapInPandas(run, schema)
