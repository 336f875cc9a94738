"""TFRecord source + sink (r14) — the TensorFlow ecosystem's shard
format, completing the ML interchange set (WebDataset tar, WARC, ZIP,
parquet): a TFRecord file is a sequence of length-framed protobuf
blobs, conventionally ``tf.train.Example`` messages (a string→Feature
map of bytes/float/int64 lists). Both layers are fully public:

- Framing (TensorFlow's record format): ``uint64 length (LE)``,
  ``uint32 masked_crc32c(length_bytes)``, ``length`` data bytes,
  ``uint32 masked_crc32c(data)``. CRC32C is the Castagnoli polynomial
  (reflected 0x82F63B78); the mask is
  ``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)``.
- ``Example`` proto: ``features(1) → map<string, Feature>`` where
  ``Feature`` is one of ``bytes_list(1)`` / ``float_list(2)`` /
  ``int64_list(3)``, the numeric lists packed. Decoding rides the
  same varint walk as the ONNX executor
  (functions/onnx_rt.py) — one protobuf codec in the repo.

Scale shape matches the sibling sources: ``binaryFile`` → one Arrow
``mapInPandas`` per shard, records never shuffle; each record's
``(offset, length)`` spans its complete frame, so a slice re-parses
standalone (the ranged-GET contract shared with CDX/tar/zip). CRC
mismatches are NAMED failures, never silently-corrupt features.

Reference anchor: 01_pdf_to_vector.sql:111-116 — opaque stored
payloads become typed rows; here the payload grammar is TF's.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "iter_tfrecord",
    "make_tfrecord",
    "parse_example",
    "encode_example",
    "read_tfrecord",
    "write_tfrecord",
]

_CRC_TABLE: list[int] | None = None


def _crc32c(data: bytes) -> int:
    """CRC32C (Castagnoli), reflected polynomial 0x82F63B78 — the
    checksum TFRecord frames carry; table built once per process."""
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tbl = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = _crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def iter_tfrecord(data: bytes, verify_crc: bool = True):
    """Yield ``{offset, length, record}`` per frame; ``offset`` /
    ``length`` span the COMPLETE frame (length word through data CRC)
    so a slice re-parses standalone. A CRC mismatch or truncated
    frame raises ValueError BY NAME with the failing offset —
    corrupted shards must not feed silently-garbled features."""
    data = bytes(data)
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(
                f"truncated TFRecord frame header at offset {pos}"
            )
        (length,) = struct.unpack("<Q", data[pos:pos + 8])
        (len_crc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        if verify_crc and _masked_crc(data[pos:pos + 8]) != len_crc:
            raise ValueError(
                f"TFRecord length CRC mismatch at offset {pos}"
            )
        start = pos + 12
        end = start + length
        if end + 4 > n:
            raise ValueError(
                f"truncated TFRecord data at offset {pos} "
                f"(framed length {length})"
            )
        rec = data[start:end]
        (data_crc,) = struct.unpack("<I", data[end:end + 4])
        if verify_crc and _masked_crc(rec) != data_crc:
            raise ValueError(
                f"TFRecord data CRC mismatch at offset {pos}"
            )
        yield {"offset": pos, "length": end + 4 - pos, "record": rec}
        pos = end + 4


def parse_example(
    data: bytes,
) -> dict[str, list[bytes] | list[float] | list[int]]:
    """One ``tf.train.Example`` blob → ``{name: values}`` with values
    a list of bytes, float, or int per the Feature's oneof. Packed
    AND unpacked numeric encodings decode (writers vary). Unknown
    fields skip (proto contract)."""
    from oracle_vectorsearch_example_spark.functions.onnx_rt import (
        _dec_varint,
        _walk,
    )

    out: dict[str, list] = {}
    for f, wire, v in _walk(data):  # Example
        if f != 1 or wire != 2:
            continue
        for f2, wire2, entry in _walk(v):  # Features.feature map
            if f2 != 1 or wire2 != 2:
                continue
            key = None
            vals: list = []
            for f3, wire3, v3 in _walk(entry):  # map entry
                if f3 == 1 and wire3 == 2:
                    key = v3.decode("utf-8", "replace")
                elif f3 == 2 and wire3 == 2:
                    for f4, wire4, v4 in _walk(v3):  # Feature oneof
                        if f4 == 1 and wire4 == 2:  # BytesList
                            for f5, w5, v5 in _walk(v4):
                                if f5 == 1 and w5 == 2:
                                    vals.append(bytes(v5))
                        elif f4 == 2 and wire4 == 2:  # FloatList
                            for f5, w5, v5 in _walk(v4):
                                if f5 == 1 and w5 == 2:  # packed
                                    vals.extend(
                                        struct.unpack(
                                            f"<{len(v5) // 4}f", v5
                                        )
                                    )
                                elif f5 == 1 and w5 == 5:
                                    # _walk hands fixed32 through as
                                    # its raw 4-byte chunk
                                    vals.append(
                                        struct.unpack("<f", v5)[0]
                                    )
                        elif f4 == 3 and wire4 == 2:  # Int64List
                            for f5, w5, v5 in _walk(v4):
                                if f5 == 1 and w5 == 2:  # packed
                                    pos = 0
                                    while pos < len(v5):
                                        x, pos = _dec_varint(v5, pos)
                                        vals.append(_to_i64(x))
                                elif f5 == 1 and w5 == 0:
                                    vals.append(_to_i64(v5))
            if key is not None:
                out[key] = vals
    return out


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_example(
    features: dict[str, list[bytes] | list[float] | list[int] | bytes
                   | str | float | int],
) -> bytes:
    """``{name: value(s)}`` → one ``tf.train.Example`` blob. Scalars
    wrap into one-element lists; str encodes UTF-8 into a BytesList;
    int → Int64List (packed); float → FloatList (packed). Entries
    encode in sorted key order — deterministic output for goldens."""
    from oracle_vectorsearch_example_spark.functions.onnx_rt import (
        _enc_len,
        _enc_varint,
    )

    entries = b""
    for key in sorted(features):
        vals = features[key]
        if isinstance(vals, (bytes, str, int, float)):
            vals = [vals]
        vals = list(vals)
        if not vals:
            body = b""
        elif isinstance(vals[0], (bytes, str)):
            inner = b"".join(
                _enc_len(
                    1,
                    v.encode("utf-8") if isinstance(v, str) else v,
                )
                for v in vals
            )
            body = _enc_len(1, inner)  # bytes_list = 1
        elif isinstance(vals[0], bool):
            raise TypeError("bool features are ambiguous; use int")
        elif isinstance(vals[0], int):
            packed = b"".join(
                _enc_varint(v & ((1 << 64) - 1)) for v in vals
            )
            body = _enc_len(3, _enc_len(1, packed))  # int64_list = 3
        elif isinstance(vals[0], float):
            packed = struct.pack(f"<{len(vals)}f", *vals)
            body = _enc_len(2, _enc_len(1, packed))  # float_list = 2
        else:
            raise TypeError(
                f"unsupported feature value type {type(vals[0])} "
                f"for {key!r}"
            )
        feature = body
        entry = _enc_len(1, key.encode("utf-8")) + _enc_len(2, feature)
        entries += _enc_len(1, entry)
    return _enc_len(1, entries)  # Example.features = 1


def make_tfrecord(records: list[bytes]) -> bytes:
    """Frame raw record blobs into one TFRecord shard (the masked-CRC
    framing above) — byte-deterministic."""
    out = bytearray()
    for rec in records:
        ln = struct.pack("<Q", len(rec))
        out += ln
        out += struct.pack("<I", _masked_crc(ln))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return bytes(out)


_SPEC_TYPES = {"bytes", "float", "int64"}


def read_tfrecord(
    spark: SparkSession,
    path: str | None = None,
    files_df: DataFrame | None = None,
    features: dict[str, str] | None = None,
    verify_crc: bool = True,
    on_error: str = "null",
) -> DataFrame:
    """Directory of TFRecord shards → rows. With a ``features`` spec
    (``{"image": "bytes", "label": "int64", "score": "float"}``) each
    Example becomes typed columns — ``binary`` / ``array<bigint>`` /
    ``array<float>`` (lists kept faithfully; take ``col[0]`` for
    scalars). Without a spec, rows are ``(shard, offset, length,
    record)`` with the raw Example blob — the indexing shape whose
    (offset, length) re-fetches the frame standalone. One task per
    shard, records never shuffle; a corrupt shard (CRC mismatch
    raises by name inside the walk) yields one NULL marker row under
    ``on_error='null'``. ``verify_crc=False`` skips the checksums —
    the per-byte Python CRC32C runs well under 1 MB/s per core
    (measured), so trusted re-reads of shards this engine just wrote
    may trade the check for throughput; first ingest of foreign
    shards should keep it on."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    if (path is None) == (files_df is None):
        raise ValueError("pass exactly one of path= or files_df=")
    if features is not None:
        bad = {k: t for k, t in features.items()
               if t not in _SPEC_TYPES}
        if bad:
            raise ValueError(
                f"unknown feature types {bad}; use one of "
                f"{sorted(_SPEC_TYPES)}"
            )
    if files_df is None:
        from oracle_vectorsearch_example_spark.sources.io import (
            read_binary_files,
        )

        files_df = read_binary_files(spark, path).select("path", "content")

    from pyspark.sql import types as T

    fields = [T.StructField("shard", T.StringType())]
    if features is None:
        fields += [
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("record", T.BinaryType()),
        ]
    else:
        for name, typ in features.items():
            if typ == "bytes":
                fields.append(
                    T.StructField(name, T.ArrayType(T.BinaryType()))
                )
            elif typ == "int64":
                fields.append(
                    T.StructField(name, T.ArrayType(T.LongType()))
                )
            else:
                fields.append(
                    T.StructField(name, T.ArrayType(T.FloatType()))
                )
    schema = T.StructType(fields)
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for shard, content in zip(b["path"], b["content"]):
                out = []
                try:
                    for m in iter_tfrecord(
                        bytes(content), verify_crc=verify_crc
                    ):
                        if features is None:
                            out.append((
                                shard, m["offset"], m["length"],
                                m["record"],
                            ))
                        else:
                            ex = parse_example(m["record"])
                            out.append((shard,) + tuple(
                                ex.get(name) for name in features
                            ))
                except Exception:
                    if on_error == "raise":
                        raise
                    out.append((shard,) + (None,) * (len(cols) - 1))
                yield pd.DataFrame(out, columns=cols)

    return files_df.mapInPandas(run, schema)


def write_tfrecord(
    df: DataFrame,
    feature_cols: dict[str, str],
    n_shards: int | None = None,
) -> DataFrame:
    """Rows → TFRecord shards: ``feature_cols`` maps DataFrame
    columns to feature types (``bytes`` / ``float`` / ``int64``;
    string columns encode UTF-8 under ``bytes``, scalars wrap to
    one-element lists), each row one Example, each task one shard as
    a ``(path, content)`` row. Map-side encode; the only shuffle is
    the explicit ``repartition(n_shards)`` fan-in — the same sink
    contract as ``write_wet`` / ``write_webdataset``."""
    bad = {k: t for k, t in feature_cols.items()
           if t not in _SPEC_TYPES}
    if bad:
        raise ValueError(
            f"unknown feature types {bad}; use one of "
            f"{sorted(_SPEC_TYPES)}"
        )
    from pyspark.sql import types as T

    if n_shards is not None:
        df = df.repartition(n_shards)
    src = df.select(*feature_cols)

    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[bytes] = []
        for b in batches:
            for row in b.itertuples(index=False):
                feats = {}
                for col, typ in feature_cols.items():
                    v = getattr(row, col)
                    if v is None:
                        continue
                    if typ == "int64":
                        v = (
                            [int(x) for x in v]
                            if hasattr(v, "__len__")
                            and not isinstance(v, (str, bytes))
                            else int(v)
                        )
                    elif typ == "float":
                        v = (
                            [float(x) for x in v]
                            if hasattr(v, "__len__")
                            and not isinstance(v, (str, bytes))
                            else float(v)
                        )
                    elif isinstance(v, (list, tuple)):
                        v = [
                            x.encode("utf-8") if isinstance(x, str)
                            else bytes(x) for x in v
                        ]
                    elif isinstance(v, str):
                        v = v.encode("utf-8")
                    else:
                        v = bytes(v)
                    feats[col] = v
                recs.append(encode_example(feats))
        if recs:
            yield pd.DataFrame(
                [(f"part-{pid:05d}.tfrecord",
                  make_tfrecord(recs))],
                columns=["path", "content"],
            )

    return src.mapInPandas(run, schema)
