"""Multimodal column plumbing (X4): schema, Arrow batch shape, stub gating."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark import schemas
from oracle_vectorsearch_example_spark.operators.multimodal import (
    FEATURE_DIM,
    binary_stats,
    extract_media_features,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"payload-one", ("image/png", 10, 10, None)),
        (2, "audio", b"", ("audio/wav", None, None, 1200)),
        (3, "video", None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, schemas.MEDIA)


def test_feature_extraction_plumbing(media):
    out = {r.media_id: r for r in extract_media_features(media, decode="fake").collect()}
    assert set(out) == {1, 2, 3}
    r = out[1]
    assert r.byte_len == len(b"payload-one")
    assert r.digest == hashlib.sha256(b"payload-one").hexdigest()[:16]
    assert 16 <= r.width < 256 and 16 <= r.height < 256
    assert len(r.features) == FEATURE_DIM
    # null payload treated as empty bytes
    assert out[3].byte_len == 0


def test_fake_decode_deterministic(media):
    a = sorted(map(tuple, extract_media_features(media, decode="fake").collect()))
    b = sorted(map(tuple, extract_media_features(media, decode="fake").collect()))
    assert a == b


def test_real_decode_gated(media):
    """Real decode works for uncompressed formats (BMP/WAV, see below);
    codec payloads raise AT DECODE TIME with the boundary named."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)) as e:
        extract_media_features(media, decode="real").collect()
    assert "compressed" in str(e.value) or "BMP" in str(e.value)
    with pytest.raises(ValueError):
        extract_media_features(media, decode="maybe")


def test_binary_stats_jvm_side(media):
    out = {r.media_id: r for r in binary_stats(media).collect()}
    assert out[1].byte_len == len(b"payload-one")
    assert out[1].digest == hashlib.md5(b"payload-one").hexdigest()
    plan = binary_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan  # stays JVM-side


def test_resize_plumbing(media):
    from oracle_vectorsearch_example_spark.operators.multimodal import resize_media

    out = resize_media(media, 64, 48).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (64, 48)
        assert len(r.payload) == max(16, 64 * 48 // 64)
    # deterministic: same inputs -> same payload bytes
    again = resize_media(media, 64, 48).collect()
    assert sorted(r.payload for r in out) == sorted(r.payload for r in again)
    # different target -> different payload
    other = resize_media(media, 32, 32).collect()
    assert sorted(r.payload for r in out) != sorted(r.payload for r in other)


def test_frame_sampling_generator_shape(media):
    from oracle_vectorsearch_example_spark.operators.multimodal import sample_frames

    out = sample_frames(media, fps=2.0, max_frames=8).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {1, 2, 3}
    for mid, frames in by_id.items():
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(len(frames)))  # contiguous 0-based
        assert 1 <= len(frames) <= 8
        for f in frames:
            assert f.ts_sec == f.frame_idx / 2.0
            assert len(f.payload) == 32  # sha256 frame stand-in


def test_resize_gates_real_decode(media):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        resize_media,
        sample_frames,
    )

    # real resize decodes BMP; the non-BMP fixture payloads fail inside the
    # executor with the format boundary named
    with pytest.raises(Exception, match="BMP|ValueError"):
        resize_media(media, 8, 8, decode="real").collect()
    # real frame sampling is built-in for GIF (r7, tests/test_gif.py);
    # non-GIF payloads still gate by name at execution
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(media, decode="real").collect()


# ------------------------------------------- real decode (stdlib formats)
def test_bmp_roundtrip_exact():
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 5), (16, 9), (33, 2)]:  # odd widths hit row padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp_pixels(encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert (back == px).all(), (w, h)


def test_bmp_solid_color_means():
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_bmp_bytes,
        make_simple_bmp,
    )

    w, h, mr, mg, mb = decode_bmp_bytes(make_simple_bmp(13, 7, (200, 100, 50)))
    assert (w, h) == (13, 7)
    assert (mr, mg, mb) == (200.0, 100.0, 50.0)


def test_wav_square_wave_stats():
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_wav_bytes,
        make_simple_wav,
    )

    nch, rate, n, rms, zcr = decode_wav_bytes(
        make_simple_wav(4000, 1500, sample_rate=16000, n_channels=2)
    )
    assert (nch, rate, n) == (2, 16000, 4000)
    assert rms == 1500.0
    assert zcr == 1.0


def test_real_resize_bmp():
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_bmp_pixels,
        resize_bmp_bytes,
    )

    # top half red, bottom half blue: nearest-neighbor resize keeps halves
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :, 0] = 255
    px[4:, :, 2] = 255
    from oracle_vectorsearch_example_spark.operators.multimodal import encode_bmp

    small = decode_bmp_pixels(resize_bmp_bytes(encode_bmp(px), 4, 4))
    assert small.shape == (4, 4, 3)
    assert (small[:2, :, 0] == 255).all() and (small[2:, :, 2] == 255).all()


def test_real_decode_rejects_compressed():
    import pytest as _pytest

    from oracle_vectorsearch_example_spark.operators.multimodal import _real_decode

    # r13: MP3 yields STRUCTURAL features (frame/side-info walk —
    # tested in test_mp3); an ID3-tagged payload with no MPEG frames
    # inside fails the sync walk loudly (undecodable → null under the
    # Spark path's on_error). PCM decode itself stays gated (named
    # rejection lives in afp._decode_pcm, pinned in test_mp3).
    with _pytest.raises(ValueError, match="no MPEG"):
        _real_decode(b"ID3\x04\x00 fake mp3 bytes")
    # H.264 Annex-B remains the named codec gate
    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        _real_decode(b"\x00\x00\x00\x01\x67compressed-bitstream")


def test_image_audio_features_spark(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        audio_features,
        image_features,
        make_simple_bmp,
        make_simple_wav,
    )

    img_rows = [(i, make_simple_bmp(4 + i, 3, (i * 40 % 256, 0, 255))) for i in range(3)]
    imgs = spark.createDataFrame(img_rows, "media_id long, payload binary")
    got = {r.media_id: r for r in image_features(imgs).collect()}
    assert got[2].width == 6 and got[2].mean_r == 80.0 and got[2].mean_b == 255.0

    wav_rows = [(i, make_simple_wav(1000, 500 + i, sample_rate=8000)) for i in range(3)]
    wavs = spark.createDataFrame(wav_rows, "media_id long, payload binary")
    agot = {r.media_id: r for r in audio_features(wavs).collect()}
    assert agot[1].rms == 501.0 and agot[1].n_samples == 1000
    assert agot[0].zero_cross_rate == 1.0


def test_extract_media_features_real_mode(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        extract_media_features,
        make_simple_bmp,
        make_simple_wav,
    )

    rows = [
        (1, "image", make_simple_bmp(10, 5, (255, 0, 0)), None),
        (2, "audio", make_simple_wav(800, 1000), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )
    got = {r.media_id: r for r in extract_media_features(media, decode="real").collect()}
    assert got[1].width == 10 and got[1].height == 5
    assert got[1].features[0] == 1.0  # mean_r / 255
    assert got[2].width is None and got[2].height is None
    assert abs(got[2].features[3] - 1000 / 32768) < 1e-6  # rms / 32768


# ------------------------------------------------------- PNG decode (r5)
def test_png_all_filters_roundtrip():
    """encode applies each scanline filter for real; decode must invert
    all five (None/Sub/Up/Average/Paeth) bit-exactly."""
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    px = np.random.default_rng(7).integers(0, 256, (23, 17, 3), dtype=np.uint8)
    for ft in range(5):
        assert (decode_png_pixels(encode_png(px, filter_type=ft)) == px).all(), ft


def test_png_color_types_normalize_to_rgb():
    import struct
    import zlib

    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_png_pixels,
    )

    magic = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    def png(w, h, ctype, raw, plte=b""):
        out = magic + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    gray = png(2, 2, 0, b"\x00" + bytes([1, 2]) + b"\x00" + bytes([3, 4]))
    assert (decode_png_pixels(gray)[..., 0] == np.array([[1, 2], [3, 4]])).all()
    pal = png(2, 1, 3, b"\x00" + bytes([1, 0]), plte=bytes([255, 0, 0, 0, 255, 0]))
    assert (decode_png_pixels(pal) == np.array([[[0, 255, 0], [255, 0, 0]]])).all()
    rgba = png(1, 1, 6, b"\x00" + bytes([9, 8, 7, 128]))
    assert (decode_png_pixels(rgba) == np.array([[[9, 8, 7]]])).all()


def test_png_gates_named():
    import struct
    import zlib

    import pytest as _pytest

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        decode_png_pixels,
    )

    magic = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    deep = magic + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
    with _pytest.raises(NotImplementedError, match="16"):
        decode_png_pixels(deep)
    # progressive JPEG decodes for real since r7 (see test_jpeg.py); the
    # remaining named JPEG rejection is arithmetic coding (SOF9)
    import numpy as _np2

    from oracle_vectorsearch_example_spark.functions.jpeg import (
        encode_jpeg as _ej,
    )

    arith = bytearray(_ej(_np2.zeros((8, 8, 3), _np2.uint8)))
    arith[arith.index(b"\xff\xc0")+1] = 0xC9  # rewrite SOF0 → SOF9
    with _pytest.raises(NotImplementedError, match="SOF9"):
        decode_image_pixels(bytes(arith))


def test_image_features_mixed_bmp_png(spark):
    """One image_features pass over a mixed BMP/PNG column — the dispatch
    the golden relies on."""
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        image_features,
        make_simple_bmp,
        make_simple_png,
    )

    rows = [
        (1, bytearray(make_simple_bmp(4, 3, (10, 20, 30)))),
        (2, bytearray(make_simple_png(5, 2, (40, 50, 60)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_r) == (4, 3, 10.0)
    assert (got[2].width, got[2].height, got[2].mean_b) == (5, 2, 60.0)


def test_extract_media_features_real_png(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        extract_media_features,
        make_simple_png,
    )

    df = spark.createDataFrame(
        [(1, "image", bytearray(make_simple_png(6, 4, (255, 0, 128))), None)],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    r = extract_media_features(df, decode="real").collect()[0]
    assert (r.width, r.height) == (6, 4)
    assert r.features[0] == 1.0 and abs(r.features[2] - 128 / 255) < 1e-5


def test_resize_image_bytes_png_and_bmp():
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        make_simple_bmp,
        make_simple_png,
        resize_image_bytes,
    )

    for mk, magic in ((make_simple_bmp, b"BM"), (make_simple_png, b"\x89PNG")):
        out = resize_image_bytes(mk(8, 6, (1, 2, 3)), 4, 3)
        assert out[: len(magic)] == magic  # stays in its own container
        px = decode_image_pixels(out)
        assert px.shape == (3, 4, 3) and (px == np.array([1, 2, 3])).all()


def test_features_on_error_null(spark):
    """r7: on_error='null' — a corrupt payload in the column yields a
    null-feature row instead of killing the job (the 100 TB posture);
    default stays loud."""
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        audio_features,
        image_features,
        make_simple_bmp,
        make_simple_wav,
    )

    rows = [
        (1, bytearray(make_simple_bmp(4, 3, (10, 20, 30)))),
        (2, bytearray(b"\x89PNG\r\n\x1a\n garbage")),
        (3, bytearray(b"totally not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in image_features(df, on_error="null").collect()}
    assert got[1].width == 4 and got[1].mean_r == 10.0
    assert got[2].width is None and got[3].mean_b is None
    with pytest.raises(Exception):
        image_features(df).collect()  # default raises

    wavs = [
        (1, bytearray(make_simple_wav(100, 1000))),
        (2, bytearray(b"RIFFbroken")),
    ]
    wdf = spark.createDataFrame(wavs, "media_id long, payload binary")
    agot = {r.media_id: r for r in audio_features(wdf, on_error="null").collect()}
    assert agot[1].n_samples == 100 and agot[2].rms is None
    with pytest.raises(Exception):
        audio_features(wdf).collect()


def test_new_image_formats_decode():
    """r12 format breadth: netpbm (P6/P5/P3/P2), TGA (raw + RLE, origin
    bit), ICO (DIB and PNG payloads) all decode to exact pixels; 16-bit
    netpbm and color-mapped TGA reject by name."""
    import struct

    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        decode_tga_pixels,
        encode_png,
        make_simple_ico,
        make_simple_ppm,
        make_simple_tga,
    )

    # non-solid pattern through hand-built P6 and raw TGA
    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    p6 = b"P6\n# comment\n6 4\n255\n" + px.tobytes()
    assert np.array_equal(decode_image_pixels(p6), px)

    # TGA type 2, TOP-DOWN origin (descriptor bit 5 set), BGR order
    tga = (
        bytes([0, 0, 2]) + b"\x00" * 9
        + struct.pack("<HH", 6, 4) + bytes([24, 0x20])
        + px[:, :, ::-1].tobytes()
        + struct.pack("<II", 0, 0) + b"TRUEVISION-XFILE.\x00"
    )
    assert np.array_equal(decode_tga_pixels(tga), px)
    # bottom-up (writer default) roundtrip
    assert np.array_equal(
        decode_image_pixels(make_simple_tga(6, 4, (9, 8, 7)))[0, 0],
        np.array([9, 8, 7]),
    )

    # ICO with an embedded PNG payload (Vista+ convention)
    png = encode_png(px)
    entry = struct.pack("<BBBBHHII", 6, 4, 0, 0, 1, 32, len(png), 22)
    ico_png = struct.pack("<HHH", 0, 1, 1) + entry + png
    assert np.array_equal(decode_image_pixels(ico_png), px)
    # DIB form
    assert np.array_equal(
        decode_image_pixels(make_simple_ico(5, 3, (1, 2, 3)))[0, 0],
        np.array([1, 2, 3]),
    )

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="65535"):
        decode_image_pixels(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    bad_tga = bytearray(make_simple_tga(4, 4, (0, 0, 0)))
    bad_tga[2] = 1  # color-mapped type
    bad_tga[1] = 1
    with _pytest.raises(NotImplementedError, match="type 1"):
        decode_tga_pixels(bytes(bad_tga))


def test_pcx_decode():
    """r12: truecolor PCX — RLE runs + literal bytes, plane-sequential
    scanlines with even padding; paletted depths reject by name."""
    import struct

    import numpy as np
    import pytest as _pytest

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_image_pixels,
        decode_pcx_pixels,
        make_simple_pcx,
    )

    assert np.all(
        decode_image_pixels(make_simple_pcx(13, 9, (10, 20, 30)))
        == (10, 20, 30)
    )
    # literal scanline with padding: w=3, bpl=4
    hdr = bytearray(128)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0x0A, 5, 1, 8
    struct.pack_into("<4H", hdr, 4, 0, 0, 2, 0)
    hdr[65] = 3
    struct.pack_into("<H", hdr, 66, 4)
    body = bytes([1, 2, 3, 0, 4, 5, 6, 0, 7, 8, 9, 0])
    got = decode_pcx_pixels(bytes(hdr) + body)
    assert got.tolist() == [[[1, 4, 7], [2, 5, 8], [3, 6, 9]]]
    bad = bytearray(make_simple_pcx(4, 4, (0, 0, 0)))
    bad[65] = 1  # one plane (paletted)
    with _pytest.raises(NotImplementedError, match="planes"):
        decode_pcx_pixels(bytes(bad))
