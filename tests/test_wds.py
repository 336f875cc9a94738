"""WebDataset tar-shard source/sink (r14): tar grammar against the
stdlib writer (ustar prefix split, pax path override, GNU longname),
sample grouping, the distributed reader, write→read roundtrip, and
composition into the image-dedup operators."""

from __future__ import annotations

import io
import tarfile
import zlib

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.sources.wds import (
    iter_tar,
    make_tar,
    read_tar_members,
    read_webdataset,
    wds_samples,
    write_webdataset,
)


@pytest.mark.parametrize("fmt,longname", [
    (tarfile.USTAR_FORMAT, "b" * 80 + "/" + "c" * 60 + ".txt"),
    (tarfile.PAX_FORMAT, "b" * 140 + ".txt"),
    (tarfile.GNU_FORMAT, "b" * 140 + ".txt"),
])
def test_iter_tar_reads_stdlib_dialects(fmt, longname):
    """Our walker reads all three tar dialects the stdlib writes —
    ustar prefix splitting, pax `path=` overrides, GNU L longnames —
    and (offset, length) address member data exactly."""
    bio = io.BytesIO()
    tf = tarfile.open(fileobj=bio, mode="w", format=fmt)
    for n, d in [("a/0001.jpg", b"IMG"), ("a/0001.txt", b"TXT"),
                 (longname, b"LONG")]:
        ti = tarfile.TarInfo(n)
        ti.size = len(d)
        tf.addfile(ti, io.BytesIO(d))
    tf.close()
    raw = bio.getvalue()
    ms = list(iter_tar(raw))
    assert [m["name"] for m in ms] == ["a/0001.jpg", "a/0001.txt",
                                       longname]
    assert [m["content"] for m in ms] == [b"IMG", b"TXT", b"LONG"]
    for m in ms:
        assert raw[m["offset"]:m["offset"] + m["length"]] == m["content"]
    # header-only walk yields the same addresses without the bytes
    meta = list(iter_tar(raw, with_content=False))
    assert [(m["name"], m["offset"], m["length"]) for m in meta] == \
        [(m["name"], m["offset"], m["length"]) for m in ms]
    assert all("content" not in m for m in meta)


def test_make_tar_stdlib_readable_and_deterministic():
    members = [("000000.jpg", b"\xff\xd8JPEG"), ("000000.txt", b"cap"),
               ("x" * 150 + ".txt", b"long")]
    blob = make_tar(members)
    assert blob == make_tar(members)  # byte-deterministic
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_wds_sample_grouping_rules():
    """First-dot key rule (multi-part extensions stay whole, directory
    part rides the key), contiguous-run grouping, recurring key starts
    a NEW sample, gzip whole-shard transparency, zstd named reject."""
    blob = make_tar([
        ("d/000.jpg", b"i0"), ("d/000.txt", b"t0"),
        ("d/000.seg.png", b"s0"),
        ("d/001.jpg", b"i1"), ("d/001.txt", b"t1"),
        ("d/000.jpg", b"i0b"),
    ])
    samples = wds_samples(blob)
    assert [k for k, _ in samples] == ["d/000", "d/001", "d/000"]
    assert samples[0][1] == {"jpg": b"i0", "txt": b"t0",
                             "seg.png": b"s0"}
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    gz = co.compress(blob) + co.flush()
    assert wds_samples(gz) == samples
    with pytest.raises(NotImplementedError, match="zstd"):
        wds_samples(b"\x28\xb5\x2f\xfd" + b"\0" * 64)
    with pytest.raises(NotImplementedError, match="sparse"):
        bad = bytearray(make_tar([("s.bin", b"x")]))
        bad[156] = ord("S")  # forge a GNU sparse typeflag
        list(iter_tar(bytes(bad)))


def test_read_webdataset_distributed(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    for s in range(3):
        members = []
        for i in range(4):
            k = f"{s:03d}{i:03d}"
            members += [(f"{k}.txt", f"caption {s}-{i}".encode()),
                        (f"{k}.cls", str(i % 2).encode())]
        (d / f"shard-{s}.tar").write_bytes(make_tar(members))
    (d / "broken.tar").write_bytes(b"\x1f\x8bnot gzip at all")

    df = read_webdataset(spark, str(d))
    rows = df.collect()
    good = [r for r in rows if r.key is not None]
    bad = [r for r in rows if r.key is None]
    assert len(good) == 12 and len(bad) == 1
    r = next(r for r in good if r.key == "001002")
    assert bytes(r.exts["txt"]) == b"caption 1-2"
    assert set(r.exts) == {"txt", "cls"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("MapInPandas")[0]
    with pytest.raises(Exception):
        read_webdataset(spark, str(d), on_error="raise").collect()


def test_read_tar_members_header_only(spark, tmp_path):
    """with_content=False walks headers alone; addresses slice the
    shard file to the exact member bytes (the tar twin of the CDX
    random-access contract)."""
    d = tmp_path / "t"
    d.mkdir()
    members = [(f"{i:04d}.bin", bytes([i]) * (100 + i))
               for i in range(20)]
    (d / "s.tar").write_bytes(make_tar(members))
    idx = read_tar_members(spark, str(d), with_content=False)
    rows = idx.collect()
    assert len(rows) == 20 and "content" not in idx.columns
    raw = (d / "s.tar").read_bytes()
    for r in rows:
        i = int(r.name.split(".")[0])
        assert raw[r.offset:r.offset + r.length] == bytes([i]) * (100 + i)


def test_write_read_roundtrip(spark):
    """write_webdataset(ext_cols) → read_webdataset reproduces every
    sample; the exts_col path re-publishes a read dataset verbatim."""
    docs = spark.range(37).select(
        F.format_string("%06d", F.col("id")).alias("key"),
        F.concat(F.lit("caption "), F.col("id")).alias("caption"),
        F.to_json(F.struct(F.col("id"))).alias("meta"),
    )
    shards = write_webdataset(
        docs, key_col="key",
        ext_cols={"caption": "txt", "meta": "json"}, n_shards=4,
    ).localCheckpoint()
    assert shards.count() <= 4
    back = read_webdataset(spark, files_df=shards)
    got = {
        r.key: (bytes(r.exts["txt"]), bytes(r.exts["json"]))
        for r in back.collect()
    }
    assert len(got) == 37
    assert got["000011"][0] == b"caption 11"
    # republish from the read shape (exts_col) and read again
    shards2 = write_webdataset(
        back, key_col="key", exts_col="exts", n_shards=2,
    )
    back2 = read_webdataset(spark, files_df=shards2)
    got2 = {
        r.key: (bytes(r.exts["txt"]), bytes(r.exts["json"]))
        for r in back2.collect()
    }
    assert got2 == got


def test_wds_feeds_image_dedup(spark):
    """Composition: a WebDataset of BMP images flows into dedup_images
    — mirrored pixels collapse, the shard/key identity survives."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.phash import (
        dedup_images,
    )
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    patterns = [
        rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        for _ in range(4)
    ]
    members = []
    for i in range(8):  # 4 distinct textured images, each twice
        members.append((f"{i:03d}.bmp", encode_bmp(patterns[i % 4])))
        members.append((f"{i:03d}.txt", f"img {i}".encode()))
    files = spark.createDataFrame(
        [("mem://s0.tar", bytearray(make_tar(members)))],
        "path string, content binary",
    )
    ds = read_webdataset(spark, files_df=files)
    imgs = ds.select(
        F.regexp_extract("key", r"(\d+)", 1).cast("long").alias("doc_id"),
        F.col("exts")["bmp"].alias("payload"),
    )
    kept = dedup_images(imgs, payload_col="payload", id_col="doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 2, 3]


def test_curate_webdataset_composition(spark):
    """WDS shards → curate_webdataset: duplicate images drop via the
    pHash gate FIRST, duplicate captions via the text dedup gate, the
    surviving `samples` keep their binary members, and re-publishing
    them through write_webdataset → read_webdataset yields the same
    sample set (ingest → curate → re-publish is one composition)."""
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
    )
    from oracle_vectorsearch_example_spark.plans.corpus import (
        curate_webdataset,
    )

    vocab = (
        "amber basalt cedar dynamo ember fjord garnet harbor iris "
        "jasper kestrel lumen marble nectar onyx prism quartz rustle "
        "sonnet tundra"
    ).split()

    def cap_words(seed):
        # per-doc seeded words: distinct captions are GENUINELY
        # distinct (formulaic one-token differences would legitimately
        # collapse under the minhash near-dup gate); mirrors
        # reproduce exactly via the seed
        r = np.random.default_rng(1000 + seed)
        return " ".join(
            vocab[r.integers(len(vocab))] + str(r.integers(10000))
            for _ in range(25)
        )

    rng = np.random.default_rng(11)
    imgs = [
        encode_bmp(rng.integers(0, 255, (16, 16, 3)).astype(np.uint8))
        for _ in range(14)  # 14 distinct noise patterns
    ]
    members = []
    for i in range(16):
        # docs 12-13 mirror the IMAGES of docs 0-1 (fresh captions);
        # docs 14-15 mirror the CAPTIONS of docs 0-1 (fresh images)
        img = imgs[i] if i < 12 else (
            imgs[i - 12] if i < 14 else imgs[i - 2]
        )
        cap = cap_words(i if i < 14 else i - 14)
        members.append((f"{i:04d}.bmp", img))
        members.append((f"{i:04d}.txt", cap.encode()))
    files = spark.createDataFrame(
        [("mem://c0.tar", bytearray(make_tar(members)))],
        "path string, content binary",
    )
    out = curate_webdataset(
        spark, files_df=files, caption_ext="txt", image_ext="bmp",
        split_weights=None,
    )
    kept_keys = sorted(
        int(r.key) for r in out["samples"].select("key").collect()
    )
    # winners are keep-min over the 62-bit (shard, key) hash ids, so
    # replay the gate cascade over the same ids: image mirrors
    # {0,12}/{1,13} resolve first, then caption mirrors {0,14}/{1,15}
    # among the image survivors
    ids = {
        int(r.key): r.doc_id
        for r in spark.createDataFrame(
            [("mem://c0.tar", f"{i:04d}") for i in range(16)],
            "shard string, key string",
        ).select(
            "key",
            F.pmod(
                F.xxhash64("shard", "key"), F.lit(1 << 62)
            ).alias("doc_id"),
        ).collect()
    }
    alive = set(range(16))
    for grp in ({0, 12}, {1, 13}):  # image gate first
        alive -= grp - {min(grp, key=ids.get)}
    for grp in ({0, 14}, {1, 15}):  # then the text dedup gate
        g = grp & alive
        if len(g) > 1:
            alive -= g - {min(g, key=ids.get)}
    assert kept_keys == sorted(alive)
    assert set(range(2, 12)) <= set(kept_keys)
    # every surviving sample still carries both members
    r = out["samples"].filter(F.col("key") == "0003").first()
    assert set(r.exts) == {"bmp", "txt"}
    # re-publish and read back: identical sample set
    shards2 = write_webdataset(
        out["samples"], key_col="key", exts_col="exts", n_shards=2,
    )
    back = read_webdataset(spark, files_df=shards2)
    assert sorted(int(r.key) for r in back.collect()) == kept_keys


def test_streaming_wds_ingest_matches_batch(spark, tmp_path):
    """Streaming shard arrival: binaryFile readStream + foreachBatch
    through read_webdataset(files_df=) — availableNow equals batch."""
    d = tmp_path / "wds_stream"
    d.mkdir()
    for s in range(3):
        members = []
        for i in range(5):
            k = f"{s:02d}{i:02d}"
            members += [(f"{k}.txt", f"cap {s}/{i}".encode())]
        (d / f"shard-{s}.tar").write_bytes(make_tar(members))

    batch = sorted(
        (r.key, bytes(r.exts["txt"]))
        for r in read_webdataset(spark, str(d)).collect()
    )
    got = []

    def sink(b, _bid):
        got.extend(
            (r.key, bytes(r.exts["txt"]))
            for r in read_webdataset(
                b.sparkSession, files_df=b.select("path", "content")
            ).collect()
        )

    q = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(str(d))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == batch and len(batch) == 15


def test_read_tar_ranges_selective(spark, tmp_path):
    """Index (header-only) → filter → ranged fetch: only the selected
    members come back, byte-exact, shard payloads never shuffle
    (broadcast build side)."""
    from oracle_vectorsearch_example_spark.sources.wds import (
        read_tar_members,
        read_tar_ranges,
    )

    d = tmp_path / "t"
    d.mkdir()
    for s in range(3):
        members = [(f"{s:02d}{i:02d}.bin", bytes([s * 16 + i]) * (64 + i))
                   for i in range(10)]
        (d / f"s{s}.tar").write_bytes(make_tar(members))
    idx = read_tar_members(spark, str(d), with_content=False)
    sel = idx.filter(
        F.regexp_extract("name", r"(\d+)\.bin", 1).cast("int") % 4 == 0
    )
    got = read_tar_ranges(spark, sel, path=str(d))
    rows = got.collect()
    assert len(rows) == sel.count()
    for r in rows:
        v = int(r.name[:4], 10)
        s, i = v // 100, v % 100
        assert bytes(r.content) == bytes([s * 16 + i]) * (64 + i)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
