"""MP3 structural walk + codec-domain dedup (r13): writer↔parser
roundtrips over every supported layout, named gates for what real
decode would need, the gain-envelope code's robustness boundary, and
real-world conformance against a LAME-era MPEG-2 LSF file."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.mp3 import (
    dedup_mp3,
    make_simple_mp3,
    mp3_frame_table,
    mp3_gain_code,
    mp3_gain_code_df,
    mp3_gain_envelope,
    mp3_side_info,
)

_REAL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/"
    "test.mp3"
)


def _gains(n=128, seed=0):
    return ((np.arange(n) * 37 + seed * 11) % 256).astype(np.int64)


def _ham(a, b):
    return bin(a ^ b).count("1")


@pytest.mark.parametrize(
    "rate,version,gpf",
    [(44100, "1", 2), (48000, "1", 2), (32000, "1", 2),
     (22050, "2", 1), (16000, "2", 1), (8000, "2.5", 1)],
)
def test_roundtrip_all_rates(rate, version, gpf):
    g = _gains()
    blob = make_simple_mp3(g, sample_rate=rate)
    meta, frames = mp3_frame_table(blob)
    assert meta["version"] == version
    assert meta["sample_rate"] == rate and meta["nch"] == 1
    assert meta["n_frames"] == len(g) // gpf
    assert not meta["vbr"] and not meta["has_xing"]
    assert np.array_equal(mp3_gain_envelope(blob), g)
    # frame table offsets tile the stream exactly
    assert frames[0][0] == 0
    for (o1, l1), (o2, _) in zip(frames, frames[1:]):
        assert o1 + l1 == o2


def test_stereo_and_side_info_fields():
    g = np.stack([_gains(), (_gains() + 5) % 256], axis=1)
    blob = make_simple_mp3(g, nch=2)
    meta, si = mp3_side_info(blob)
    assert meta["nch"] == 2 and meta["side_len"] == 32
    first = si[0][0]  # frame 0, granule 0
    assert [ch["global_gain"] for ch in first] == [int(g[0, 0]), int(g[0, 1])]
    assert all(
        ch["big_values"] == 0 and ch["part2_3_length"] == 0
        and ch["block_type"] == 0
        for fr in si for gr in fr for ch in gr
    )
    # envelope = per-granule max over channels
    assert np.array_equal(
        mp3_gain_envelope(blob), np.maximum(g[:, 0], g[:, 1])
    )


def test_id3_and_xing_are_transparent():
    g = _gains()
    plain = make_simple_mp3(g)
    tagged = make_simple_mp3(g, id3_bytes=200, xing=True)
    m, _ = mp3_frame_table(tagged)
    assert m["has_xing"]
    assert np.array_equal(mp3_gain_envelope(tagged), g)
    assert mp3_gain_code(tagged) == mp3_gain_code(plain)


def _gated_stream(layer: int, n_frames: int = 8) -> bytes:
    """A structurally honest MPEG-1 Layer I/II stream (32 kbps,
    44.1 kHz, mono): headers whose PUBLIC-table frame length tiles the
    stream exactly, zero payloads — the shape a real gated file has,
    which the sync scan must confirm and then reject by name."""
    if layer == 2:  # Layer II: 144*32000//44100 = 104-byte frames
        hdr, flen = bytes([0xFF, 0xFD, 0x10, 0xC0]), 104
    else:  # Layer I: (12*32000//44100)*4 = 32-byte frames
        hdr, flen = bytes([0xFF, 0xFF, 0x10, 0xC0]), 32
    return (hdr + bytes(flen - 4)) * n_frames


def test_named_gates_and_no_evidence():
    g = _gains()
    # honest full gated streams raise BY NAME (confirmed first frame
    # is Layer I/II — the ADVICE r13 contract)
    with pytest.raises(NotImplementedError, match="Layer II"):
        mp3_frame_table(_gated_stream(2))
    with pytest.raises(NotImplementedError, match="Layer I"):
        mp3_frame_table(_gated_stream(1))
    # free format: every header's bitrate index zeroed (a real
    # free-format file is free-format throughout)
    blob = bytearray(make_simple_mp3(g))
    _, frames = mp3_frame_table(bytes(blob))
    for off, _ in frames:
        blob[off + 2] &= 0x0F
    with pytest.raises(NotImplementedError, match="free-format"):
        mp3_frame_table(bytes(blob))
    with pytest.raises(ValueError, match="no MPEG"):
        mp3_frame_table(b"not audio at all" * 10)
    # < 64 granules carries no evidence → NULL code, like afp's rule
    assert mp3_gain_code(make_simple_mp3(_gains(32))) is None


def test_sync_scan_survives_gated_false_syncs():
    """ADVICE r13 regression: leading junk containing false 0xFF-Ex
    syncs with Layer I/II or free-format bit patterns must not abort
    the scan (the documented 'tolerates leading junk' contract); same
    for trailing garbage landing on a frame boundary."""
    g = _gains()
    blob = make_simple_mp3(g)
    junk = (
        b"\x00\x12\xff\xf4\x00\x07"  # the ADVICE repro: Layer II bits
        + b"\x99" * 40
        + b"\xff\xe2\x00\x00"  # free-format Layer III bits
        + b"\xff\xfd\x10\xc0"  # a REAL-shaped Layer II header mid-junk
    )
    meta, frames = mp3_frame_table(junk + blob)
    assert meta["n_frames"] == len(g) // 2
    assert frames[0][0] == len(junk)
    assert np.array_equal(mp3_gain_envelope(junk + blob), g)
    # trailing gated-pattern garbage ends the walk, never raises
    tail = blob + b"\xff\xf4\x10\xc0" + b"\x00" * 100
    meta2, _ = mp3_frame_table(tail)
    assert meta2["n_frames"] == meta["n_frames"]


def test_gain_code_robustness_boundary():
    """Retag/re-mux copies hash identically; a few silence pad frames
    move few bits on a SMOOTH (realistic) loudness envelope — boundary
    shifts only flip bits where the envelope direction flips within a
    frame; a different signal is far."""
    i = np.arange(256)
    smooth = (128 + 80 * np.sin(2 * np.pi * i / 48)).astype(np.int64)
    base = mp3_gain_code(make_simple_mp3(smooth))
    padded = np.concatenate(
        [np.zeros(4, np.int64), smooth, np.zeros(4, np.int64)]
    )
    assert _ham(base, mp3_gain_code(make_simple_mp3(padded))) <= 8
    other = (128 + 80 * np.sin(2 * np.pi * (i * 3 + 17) / 80)).astype(
        np.int64
    )
    assert _ham(base, mp3_gain_code(make_simple_mp3(other))) > 8


def test_pcm_paths_reject_mp3_by_name():
    """dedup_audio's PCM decode names the gate and points at the
    codec-domain path; MP3 rows pass through as undecodable."""
    from oracle_vectorsearch_example_spark.functions.afp import _decode_pcm

    blob = make_simple_mp3(_gains())
    with pytest.raises(NotImplementedError, match="dedup_mp3"):
        _decode_pcm(blob)
    with pytest.raises(NotImplementedError, match="dedup_mp3"):
        _decode_pcm(b"ID3\x04\x00\x00\x00\x00\x00\x00" + blob)


def test_dedup_mp3_end_to_end(spark):
    """Retagged + Xing-prefixed copies of the same encode collapse;
    a different encode and a non-MP3 payload survive."""
    g = _gains()
    rows = [
        (1, bytearray(make_simple_mp3(g))),
        (2, bytearray(make_simple_mp3(g, id3_bytes=64))),       # retag
        (3, bytearray(make_simple_mp3(g, xing=True))),          # re-mux
        (4, bytearray(make_simple_mp3(_gains(seed=9) ^ 170))),  # distinct
        (5, bytearray(b"not audio")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(
        r.media_id for r in dedup_mp3(media, max_hamming=4).collect()
    )
    assert kept == [1, 4, 5]
    # codes: NULL only for the non-MP3 row
    codes = {
        r.media_id: r.mp3_gain_code
        for r in mp3_gain_code_df(media).collect()
    }
    assert codes[5] is None and all(
        codes[i] is not None for i in (1, 2, 3, 4)
    )
    # layout independence
    a = sorted(codes.items())
    b = sorted(
        (r.media_id, r.mp3_gain_code)
        for r in mp3_gain_code_df(media.repartition(4)).collect()
    )
    assert a == b


def test_multimodal_real_features_mp3(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        _real_decode,
    )

    blob = make_simple_mp3(_gains(), sample_rate=44100)
    w, h, feats = _real_decode(blob)
    assert w is None and h is None
    assert feats[0] == 1.0                      # mono
    assert feats[1] == round(44100 / 48000, 6)  # rate
    assert feats[2] > 1.0                       # duration ~1.67 s
    with pytest.raises(NotImplementedError, match="H.264|ffmpeg"):
        _real_decode(b"\x00\x00\x00\x01gibberish-annexb")


@pytest.mark.skipif(
    not os.path.exists(_REAL_MP3), reason="real-world fixture absent"
)
def test_real_world_lsf_file_conformance():
    """A real (non-repo-written) MPEG-2 LSF mono file: the frame walk
    holds sync across the whole stream and the side-info field widths
    land on a coherent gain read — any misalignment would scatter the
    per-granule gains to noise."""
    data = open(_REAL_MP3, "rb").read()
    meta, frames = mp3_frame_table(data)
    assert meta["version"] == "2" and meta["lsf"]
    assert meta["sample_rate"] == 22050 and meta["nch"] == 1
    assert meta["n_frames"] >= 40
    env = mp3_gain_envelope(data)
    assert len(env) == meta["n_frames"] * meta["granules"]
    # a constant-tone test file: every granule's gain is identical —
    # the strongest possible sync/width check over 45 frames
    assert env.min() == env.max()


def test_id3_tags_all_versions():
    """ID3v2.4 writer↔parser roundtrip (UTF-8 frames), hand-built
    v2.3 (plain BE sizes, UTF-16 BOM text) and v2.2 (3-char ids,
    3-byte sizes), ID3v1 trailer fallback filling only the gaps."""
    import struct as _s

    from oracle_vectorsearch_example_spark.functions.mp3 import (
        mp3_tag_text,
        mp3_tags,
    )

    g = _gains(8)
    b0 = make_simple_mp3(g)
    tagged = make_simple_mp3(
        g, tags={"title": "Héllo Wörld", "artist": "A B", "year": "2024"}
    )
    assert mp3_tags(tagged) == {
        "title": "Héllo Wörld", "artist": "A B", "year": "2024",
    }
    assert mp3_tag_text(tagged) == "Héllo Wörld A B 2024"
    # the tag rides transparently: audio walk unaffected
    assert np.array_equal(mp3_gain_envelope(tagged), g)

    fr = (b"TIT2" + _s.pack(">I", 1 + len("Song".encode("utf-16")))
          + b"\x00\x00" + b"\x01" + "Song".encode("utf-16"))
    fr += b"TPE1" + _s.pack(">I", 5) + b"\x00\x00" + b"\x00Band"
    n = len(fr)
    v23 = (b"ID3\x03\x00\x00"
           + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F]) + fr + b0)
    assert mp3_tags(v23) == {"title": "Song", "artist": "Band"}

    fr2 = (b"TT2" + bytes([0, 0, 5]) + b"\x00Tiny"
           + b"TP1" + bytes([0, 0, 3]) + b"\x00Me")
    n = len(fr2)
    v22 = (b"ID3\x02\x00\x00"
           + bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F, n & 0x7F]) + fr2)
    assert mp3_tags(v22) == {"title": "Tiny", "artist": "Me"}

    v1 = (v23 + b"TAG" + b"V1 Title".ljust(30, b"\x00")
          + b"V1 Artist".ljust(30, b"\x00") + b"Alb".ljust(30, b"\x00")
          + b"1999" + b"\x00" * 31)
    t = mp3_tags(v1)
    # v2 wins where present; v1 fills the rest
    assert t["title"] == "Song" and t["album"] == "Alb"
    assert t["year"] == "1999"


def test_extract_text_dispatches_mp3():
    """D1 over audio: detect_format sniffs MP3 before the text
    fallback (an ID3 header is valid UTF-8), extract_text_bytes
    returns the normalized tag line, and a tagless MP3 yields ''
    (recognized format, no text) rather than NULL."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        detect_format,
        extract_text_bytes,
    )

    g = _gains(8)
    tagged = make_simple_mp3(g, tags={"title": "Doc  Title", "track": "7"})
    assert detect_format(tagged) == "mp3"
    assert extract_text_bytes(tagged) == "Doc Title 7"  # ws-normalized
    bare = make_simple_mp3(g)
    assert detect_format(bare) == "mp3"
    assert extract_text_bytes(bare) == ""
    # a text document that merely STARTS with "ID3" stays text
    doc = b"ID3 tags are a metadata container for MP3 files." * 4
    assert detect_format(doc) == "text"
    # ADVICE r13: the raw-sync sniff mirrors _parse_header's accept
    # set — Layer I/II and reserved-sample-rate headers must NOT
    # classify as 'mp3' (they would then be swallowed as unparseable)
    assert detect_format(b"\xff\xf4\x10\xc0" + bytes(100)) == "binary"
    assert detect_format(b"\xff\xfe\x10\xc0" + bytes(100)) == "binary"
    assert detect_format(b"\xff\xfb\x1c\xc0" + bytes(100)) == "binary"
    assert detect_format(bare[:2] + bare[2:]) == "mp3"  # L III intact


def test_incremental_mp3_dedup_matches_full(spark, tmp_path):
    """signature='mp3_gain' (r13): two warehouse ingests of tagged /
    remuxed MP3 copies equal the full dedup_mp3 recompute over the
    union; the signature NAME pins the warehouse so gain codes can
    never band-join a PCM-afp state dir."""
    from oracle_vectorsearch_example_spark.operators.incremental import (
        IncrementalMediaDedup,
    )

    def blob(cls, var):
        g = ((np.arange(128) * (3 + cls * 7)) + cls) % 256
        return bytearray(make_simple_mp3(
            g, xing=(var % 2 == 1), id3_bytes=(var * 13) % 48
        ))

    rows = [(cls * 10 + var, blob(cls, var))
            for cls in range(4) for var in range(4)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    inc = IncrementalMediaDedup(
        spark, str(tmp_path / "wh"), signature="mp3_gain", max_hamming=4
    )
    inc.ingest(media.filter(F.col("media_id") % 2 == 0))
    inc.ingest(media.filter(F.col("media_id") % 2 == 1))
    got = sorted(r["id"] for r in inc.survivors().collect())
    want = sorted(
        r.media_id for r in dedup_mp3(media, max_hamming=4).collect()
    )
    assert got == want
    # a PCM-afp handle refuses the mp3_gain state
    bad = IncrementalMediaDedup(
        spark, str(tmp_path / "wh"), signature="afp", max_hamming=4
    )
    with pytest.raises(ValueError, match="parameters"):
        bad.ingest(media.limit(1))


def test_crc_frames_offset_side_info():
    """protection_bit=0 frames carry a 2-byte CRC between header and
    side info; the walk skips it structurally (no CRC verification —
    implementing the checksum from memory with only our own writer to
    check against would be the mirrored-quirk hazard; offsets are the
    spec-certain part). Rebuild each written frame with the CRC slot
    inserted and 2 pad bytes dropped, keeping frame lengths intact."""
    g = _gains(16)
    blob = bytearray(make_simple_mp3(g))
    meta, frames = mp3_frame_table(bytes(blob))
    out = bytearray()
    for off, ln in frames:
        fr = bytearray(blob[off:off + ln])
        fr[1] &= ~1  # protection bit 0 = CRC present
        rebuilt = fr[:4] + b"\xAB\xCD" + fr[4:-2]  # dummy CRC, keep len
        assert len(rebuilt) == ln
        out += rebuilt
    m2, f2 = mp3_frame_table(bytes(out))
    assert m2["crc"] and m2["n_frames"] == meta["n_frames"]
    assert np.array_equal(mp3_gain_envelope(bytes(out)), g)


def test_album_art_feeds_image_dedup(spark):
    """APIC/PIC extraction composes into the X55 image path: the SAME
    cover in differently-tagged MP3s collapses under dedup_images over
    the extracted art; a different cover survives. Art extraction is
    structural — the audio walk and gain code are unaffected."""
    from pyspark.sql import types as T

    from oracle_vectorsearch_example_spark.functions.mp3 import (
        mp3_album_art,
    )
    from oracle_vectorsearch_example_spark.functions.phash import (
        dedup_images,
    )
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
    )

    def cover(seed):
        px = ((np.arange(32)[:, None] * 13 + np.arange(32)[None, :] * 7
               + seed * 40) % 256).astype(np.uint8)
        return encode_bmp(np.stack([px, px, px], axis=-1))

    g = _gains()
    rows = [
        (1, bytearray(make_simple_mp3(
            g, tags={"title": "A"}, picture=("image/bmp", cover(0))))),
        (2, bytearray(make_simple_mp3(
            g, tags={"title": "B (retag)"},
            picture=("image/bmp", cover(0))))),
        (3, bytearray(make_simple_mp3(
            g, picture=("image/bmp", cover(5))))),
        (4, bytearray(make_simple_mp3(g))),  # no art
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def art(batches):
        import pandas as pd

        for b in batches:
            out = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                got = mp3_album_art(bytes(payload))
                if got is not None:
                    out.append((int(mid), got[1]))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    arts = media.mapInPandas(art, schema)
    kept = sorted(
        r.media_id for r in dedup_images(arts, max_hamming=2).collect()
    )
    assert kept == [1, 3]
    # the envelope still reads through the APIC-carrying tag
    assert np.array_equal(
        mp3_gain_envelope(bytes(rows[0][1])), g
    )


def test_gain_code_exact_in_mixed_null_batch(spark):
    """A batch mixing a failing payload with 63-bit codes must keep the
    codes EXACT: the old tuple-list pd.DataFrame let pandas infer
    float64 for the column (53-bit mantissa), so the value a row hashed
    to depended on which rows shared its Arrow batch — layout-dependent
    silent corruption. repartition(1) forces every row into ONE batch."""
    g = _gains()
    blob = bytes(make_simple_mp3(g))
    want = mp3_gain_code(blob)
    assert want > (1 << 53)  # only then does float64 rounding bite
    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not audio"))],
        "media_id long, payload binary",
    ).repartition(1)
    got = {r.media_id: r.mp3_gain_code for r in mp3_gain_code_df(media).collect()}
    assert got == {1: want, 2: None}
