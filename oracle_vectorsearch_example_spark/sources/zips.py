"""ZIP archive source (r14) — the third archive family next to WARC
(sources/warc.py) and tar/WebDataset (sources/wds.py): document dumps
and image collections routinely ship as ``.zip``, and unlike tar the
format carries its OWN index — the central directory at the archive's
end lists every member with its local-header offset and compressed
size, so random access is native and "index the archive" is a
header-walk that never touches member bytes.

Format facts used (the public PKWARE APPNOTE / ISO 21320 subset):

- Local file header (``PK\\x03\\x04``): fixed 30 bytes + name + extra,
  then the compressed data; with general-purpose flag bit 3 a data
  descriptor (optionally ``PK\\x07\\x08`` + crc/sizes) FOLLOWS the
  data (streamed writers).
- Central directory (``PK\\x01\\x02`` entries, located via the end
  record ``PK\\x05\\x06``): authoritative sizes + each member's local
  header offset. stdlib ``zipfile`` parses it; spans for ranged
  fetches re-derive from the LOCAL header (its name/extra lengths can
  legally differ from the central entry's).
- Compression: stored (0) and deflate (8) decode here — the only
  methods the ISO subset requires; anything else rejects BY NAME.

The reference's own scenario is exactly this source: a directory
object of PDFs becomes rows (01_pdf_to_vector.sql:111-116) — a zip of
those PDFs is that directory in one file, and members flow into the
same D1 extract dispatch.
"""

from __future__ import annotations

import io
import struct
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "iter_zip",
    "make_zip",
    "read_zip_members",
    "read_zip_ranges",
]


def iter_zip(data: bytes, with_content: bool = True):
    """Yield ``{name, offset, length, method, content}`` per file
    member, driven by the central directory (the format's own index).
    ``offset``/``length`` span the member's COMPLETE local record —
    local header through compressed data and any data descriptor — so
    a ``[offset, offset+length)`` slice is self-contained and
    :func:`read_zip_ranges` re-decodes it without the central
    directory (the ranged-GET contract shared with the WARC CDX and
    tar layers). ``with_content=False`` walks headers only.
    Unsupported compression methods reject BY NAME; zip64 rides on
    stdlib ``zipfile``'s central-directory support."""
    data = bytes(data)
    zf = zipfile.ZipFile(io.BytesIO(data))
    for info in zf.infolist():
        if info.is_dir():
            continue
        off = info.header_offset
        if data[off:off + 4] != b"PK\x03\x04":
            raise ValueError(
                f"central directory points at offset {off} but no "
                f"local header is there (member {info.filename!r})"
            )
        flags, method = struct.unpack("<HH", data[off + 6:off + 10])
        nlen, elen = struct.unpack("<HH", data[off + 26:off + 30])
        end = off + 30 + nlen + elen + info.compress_size
        if flags & 0x08:  # streamed: data descriptor follows the data
            if data[end:end + 4] == b"PK\x07\x08":
                end += 16
            else:
                end += 12
        if method not in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
            raise NotImplementedError(
                f"zip compression method {method} (member "
                f"{info.filename!r}): only stored/deflate decode here"
            )
        rec = {
            "name": info.filename,
            "offset": off,
            "length": end - off,
            "method": int(method),
        }
        if with_content:
            rec["content"] = zf.read(info.filename)
        yield rec


def _read_local_record(blob: bytes) -> tuple[str, bytes]:
    """(name, decompressed content) from one sliced local record —
    the standalone decode behind :func:`read_zip_ranges`."""
    if blob[:4] != b"PK\x03\x04":
        raise ValueError("slice does not start with a zip local header")
    flags, method = struct.unpack("<HH", blob[6:10])
    csize = struct.unpack("<I", blob[18:22])[0]
    nlen, elen = struct.unpack("<HH", blob[26:30])
    name = blob[30:30 + nlen].decode("utf-8", "replace")
    start = 30 + nlen + elen
    if flags & 0x08 and csize == 0:
        # streamed member: sizes live in the trailing descriptor; the
        # compressed data is everything up to it
        tail = blob.rfind(b"PK\x07\x08")
        payload = blob[start:tail if tail > start else len(blob) - 12]
    else:
        payload = blob[start:start + csize]
    if method == zipfile.ZIP_STORED:
        return name, bytes(payload)
    if method == zipfile.ZIP_DEFLATED:
        import zlib

        return name, zlib.decompressobj(-zlib.MAX_WBITS).decompress(
            bytes(payload)
        )
    raise NotImplementedError(
        f"zip compression method {method} (member {name!r})"
    )


def read_zip_members(
    spark: SparkSession,
    path: str | None = None,
    files_df: DataFrame | None = None,
    with_content: bool = True,
    on_error: str = "null",
) -> DataFrame:
    """Directory of ``.zip`` archives → one row per member: ``(shard,
    name, offset, length, content)`` — the same shape as
    :func:`~.wds.read_tar_members`, so downstream compositions (D1
    extraction, image/audio dedup) are source-agnostic. One task per
    archive, members never shuffle; ``with_content=False`` walks the
    central directory + local headers only. Corrupt archives yield a
    NULL-name marker row (or raise)."""
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

    fields = [
        T.StructField("shard", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
    if with_content:
        fields.append(T.StructField("content", T.BinaryType()))
    schema = T.StructType(fields)
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for shard, content in zip(b["path"], b["content"]):
                out = []
                try:
                    for m in iter_zip(
                        bytes(content), with_content=with_content
                    ):
                        row = (shard, m["name"], m["offset"],
                               m["length"])
                        if with_content:
                            row += (m["content"],)
                        out.append(row)
                except Exception:
                    if on_error == "raise":
                        raise
                    out.append((shard,) + (None,) * (len(cols) - 1))
                yield pd.DataFrame(out, columns=cols)

    return files_df.mapInPandas(run, schema)


def read_zip_ranges(
    spark: SparkSession,
    ranges_df: DataFrame,
    path: str | None = None,
    files_df: DataFrame | None = None,
) -> DataFrame:
    """Selective member fetch by zip address: ``(shard, name, offset,
    length)`` selection rows come back as ``(shard, name, content)``
    with each sliced local record decoded standalone — no central
    directory read, no other members touched. Same broadcast shape as
    :func:`~.warc.read_warc_ranges`: the aggregated selection builds
    the broadcast side, archive payloads never shuffle, unselected
    archives prune out."""
    if (path is None) == (files_df is None):
        raise ValueError("pass exactly one of path= or files_df=")
    if files_df is None:
        from oracle_vectorsearch_example_spark.sources.io import (
            read_binary_files,
        )

        files_df = read_binary_files(spark, path).select("path", "content")

    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    sel = (
        ranges_df
        .select("shard", "name", "offset", "length")
        .groupBy("shard")
        .agg(
            F.collect_list(F.struct("name", "offset", "length"))
            .alias("wants")
        )
    )
    joined = (
        files_df
        .join(F.broadcast(sel), files_df["path"] == sel["shard"], "inner")
        .select("path", "content", "wants")
    )
    schema = T.StructType([
        T.StructField("shard", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for shard, content, wants in zip(
                b["path"], b["content"], b["wants"]
            ):
                data = bytes(content)
                out = []
                for w in wants:
                    off, ln = int(w["offset"]), int(w["length"])
                    name, payload = _read_local_record(
                        data[off:off + ln]
                    )
                    out.append((shard, name, payload))
                yield pd.DataFrame(
                    out, columns=["shard", "name", "content"]
                )

    return joined.mapInPandas(run, schema)


def make_zip(
    members: list[tuple[str, bytes]],
    compress: bool = True,
) -> bytes:
    """Deterministic zip writer for fixtures: fixed DOS timestamp,
    stored or deflate members, stdlib-readable."""
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = (
                zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
            )
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return bio.getvalue()
