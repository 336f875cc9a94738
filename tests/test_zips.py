"""ZIP archive source (r14): central-directory walk, standalone
local-record decode (incl. streamed data descriptors), the
distributed reader, ranged fetch, and the D1 extraction composition
(the reference's directory-of-documents scenario)."""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.zips import (
    _read_local_record,
    iter_zip,
    make_zip,
    read_zip_members,
    read_zip_ranges,
)

_MEMBERS = [
    ("a/doc1.txt", b"hello world " * 20),
    ("doc2.bin", bytes(range(256))),
    ("empty.txt", b""),
]


@pytest.mark.parametrize("compress", [True, False])
def test_iter_zip_spans_decode_standalone(compress):
    blob = make_zip(_MEMBERS, compress=compress)
    ms = list(iter_zip(blob))
    assert [(m["name"], m["content"]) for m in ms] == _MEMBERS
    for m in ms:
        name, payload = _read_local_record(
            blob[m["offset"]:m["offset"] + m["length"]]
        )
        assert (name, payload) == (m["name"], m["content"])
    meta = list(iter_zip(blob, with_content=False))
    assert all("content" not in m for m in meta)
    assert [(m["name"], m["offset"], m["length"]) for m in meta] == \
        [(m["name"], m["offset"], m["length"]) for m in ms]


def test_iter_zip_streamed_descriptors():
    """Non-seekable writers emit flag-bit-3 data descriptors; spans
    include them and the sliced record still decodes standalone."""
    class NoSeek(io.RawIOBase):
        def __init__(self):
            self.buf = bytearray()

        def writable(self):
            return True

        def write(self, b):
            self.buf += b
            return len(b)

    ns = NoSeek()
    zf = zipfile.ZipFile(ns, "w", zipfile.ZIP_DEFLATED)
    for n, d in _MEMBERS:
        zf.writestr(n, d)
    zf.close()
    blob = bytes(ns.buf)
    ms = list(iter_zip(blob))
    assert [(m["name"], m["content"]) for m in ms] == _MEMBERS
    for m in ms:
        name, payload = _read_local_record(
            blob[m["offset"]:m["offset"] + m["length"]]
        )
        assert (name, payload) == (m["name"], m["content"])


def test_unsupported_method_rejects_by_name():
    blob = bytearray(make_zip([("x.bin", b"data")], compress=False))
    # forge method 12 (bzip2) into local header + central entry
    off = blob.find(b"PK\x03\x04")
    blob[off + 8:off + 10] = (12).to_bytes(2, "little")
    cen = blob.find(b"PK\x01\x02")
    blob[cen + 10:cen + 12] = (12).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="method 12"):
        list(iter_zip(bytes(blob)))


def test_read_zip_members_and_ranges(spark, tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    for s in range(3):
        members = [(f"{s:02d}{i:02d}.txt",
                    f"body {s}/{i} ".encode() * (i + 1))
                   for i in range(8)]
        (d / f"a{s}.zip").write_bytes(make_zip(members))
    (d / "bad.zip").write_bytes(b"PK\x03\x04 not really")

    df = read_zip_members(spark, str(d))
    rows = df.collect()
    good = [r for r in rows if r.name is not None]
    bad = [r for r in rows if r.name is None]
    assert len(good) == 24 and len(bad) == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0]

    idx = read_zip_members(spark, str(d), with_content=False)
    sel = idx.filter(
        F.regexp_extract("name", r"(\d+)\.txt", 1).cast("int") % 4 == 1
    )
    got = read_zip_ranges(spark, sel, path=str(d))
    rows = got.collect()
    assert len(rows) == sel.count() == 6
    for r in rows:
        v = int(r.name[:4])
        s, i = v // 100, v % 100
        assert bytes(r.content) == f"body {s}/{i} ".encode() * (i + 1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_zip_members_feed_extract(spark):
    """The reference scenario end-to-end: an archive of DOCX documents
    → member rows → the D1 extract dispatch."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        extract_text,
        make_simple_docx,
    )

    members = [
        (f"docs/{i:03d}.docx",
         make_simple_docx(f"Document {i} says {i * 7 % 100}."))
        for i in range(6)
    ]
    files = spark.createDataFrame(
        [("mem://corpus.zip", bytearray(make_zip(members)))],
        "path string, content binary",
    )
    rows = (
        read_zip_members(spark, files_df=files)
        .select("name", extract_text(F.col("content")).alias("text"))
        .collect()
    )
    assert len(rows) == 6
    by_name = {r.name: r.text for r in rows}
    assert by_name["docs/003.docx"] == "Document 3 says 21."


def test_streaming_zip_ingest_matches_batch(spark, tmp_path):
    """binaryFile readStream + foreachBatch through
    read_zip_members(files_df=) — availableNow equals batch."""
    d = tmp_path / "zip_stream"
    d.mkdir()
    for s in range(3):
        (d / f"a{s}.zip").write_bytes(make_zip(
            [(f"{s:02d}{i:02d}.txt", f"m {s}/{i}".encode())
             for i in range(5)]
        ))
    batch = sorted(
        (r.name, bytes(r.content))
        for r in read_zip_members(spark, str(d)).collect()
    )
    got = []

    def sink(b, _bid):
        got.extend(
            (r.name, bytes(r.content))
            for r in read_zip_members(
                b.sparkSession, files_df=b.select("path", "content")
            ).collect()
        )

    q = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .load(str(d))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == batch and len(batch) == 15
