"""Ogg/Opus/Vorbis structural walk + VorbisComment tags (r13): page
layer roundtrips, stream identity, tag extraction across Ogg and bare
FLAC, named gates for codec payloads, D1 extract dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.ogg import (
    flac_tag_text,
    flac_tags,
    make_simple_ogg,
    ogg_meta,
    ogg_page_table,
    ogg_tag_text,
    ogg_tags,
    parse_vorbis_comments,
)

_TAGS = {"title": "Süß & Salzig", "artist": "The Bäck", "year": "2023"}


def test_page_walk_and_identity_opus():
    blob = make_simple_ogg("opus", tags=_TAGS, n_audio_pages=4,
                           granules_per_page=960)
    pages = ogg_page_table(blob)
    assert len(pages) == 6  # BOS + tags + 4 audio
    assert pages[0]["flags"] & 0x02 and pages[-1]["flags"] & 0x04
    assert [p["seq"] for p in pages] == list(range(6))
    m = ogg_meta(blob)
    assert m["codec"] == "opus" and m["rate"] == 48000 and m["nch"] == 1
    # duration: 4*960 granules minus 312 pre-skip @ 48 kHz
    assert m["duration_sec"] == (4 * 960 - 312) / 48000.0
    assert ogg_tags(blob) == _TAGS
    assert ogg_tag_text(blob) == "Süß & Salzig The Bäck 2023"


def test_page_walk_and_identity_vorbis():
    blob = make_simple_ogg("vorbis", tags=_TAGS, rate=44100,
                           nch=2, n_audio_pages=2,
                           granules_per_page=44100)
    m = ogg_meta(blob)
    assert m["codec"] == "vorbis" and m["rate"] == 44100 and m["nch"] == 2
    assert m["duration_sec"] == 2.0
    assert ogg_tags(blob) == _TAGS


def test_named_gates_and_malformed():
    blob = bytearray(make_simple_ogg("opus"))
    with pytest.raises(NotImplementedError, match="Theora"):
        ogg_meta(bytes(blob).replace(b"OpusHead", b"\x80theora\x00"[:8]))
    with pytest.raises(NotImplementedError, match="FLAC-in-Ogg"):
        ogg_meta(bytes(blob).replace(b"OpusHead", b"\x7fFLAC\x00\x00\x00"))
    with pytest.raises(ValueError, match="OggS"):
        ogg_page_table(b"not an ogg file at all")
    # comment parser ignores malformed/unknown items
    assert parse_vorbis_comments(b"\x00") == {}
    vc = (b"\x02\x00\x00\x00vn" + b"\x02\x00\x00\x00"
          + b"\x09\x00\x00\x00TITLE=abc"
          + b"\x08\x00\x00\x00WEIRD=xx")
    assert parse_vorbis_comments(vc) == {"title": "abc"}


def test_flac_vorbis_comment_block():
    """make_simple_flac(tags=) writes a real VORBIS_COMMENT block;
    flac_tags reads it back; the audio still decodes losslessly and
    the fingerprint path is unaffected by the extra metadata block."""
    from oracle_vectorsearch_example_spark.functions.afp import (
        afp_from_samples,
    )
    from oracle_vectorsearch_example_spark.functions.flac import (
        decode_flac,
        make_simple_flac,
    )

    sig = (np.sin(np.arange(600) * 0.05) * 9000).astype(np.int16)
    plain = make_simple_flac(sig, sample_rate=16000)
    tagged = make_simple_flac(sig, sample_rate=16000, tags=_TAGS)
    assert flac_tags(tagged) == _TAGS and flac_tags(plain) == {}
    _, pcm = decode_flac(tagged)
    assert np.array_equal(pcm[:, 0], sig)
    assert afp_from_samples(pcm) == afp_from_samples(sig)
    assert flac_tag_text(tagged) == "Süß & Salzig The Bäck 2023"


def test_extract_text_dispatches_ogg_and_flac():
    from oracle_vectorsearch_example_spark.functions.extract import (
        detect_format,
        extract_text_bytes,
    )
    from oracle_vectorsearch_example_spark.functions.flac import (
        make_simple_flac,
    )

    ogg = make_simple_ogg("opus", tags={"title": "A  B", "track": "2"})
    assert detect_format(ogg) == "ogg"
    assert extract_text_bytes(ogg) == "A B 2"
    assert extract_text_bytes(make_simple_ogg("vorbis")) == ""

    sig = (np.arange(100) % 50).astype(np.int16)
    fl = make_simple_flac(sig, tags={"artist": "Me"})
    assert detect_format(fl) == "flac"
    assert extract_text_bytes(fl) == "Me"
    assert extract_text_bytes(make_simple_flac(sig)) == ""


def test_video_container_tags_and_extract():
    """RIFF LIST-INFO (AVI + WAV) and moov/udta (QuickTime text atoms
    + MP4 meta/ilst) read back through the shared tag contract; the
    metadata rides transparently past the frame/audio walks; the D1
    extract path dispatches all four (r13)."""
    import io
    import struct
    import wave

    from oracle_vectorsearch_example_spark.functions.avi import (
        avi_frame_table,
        make_simple_avi,
        riff_info_tags,
    )
    from oracle_vectorsearch_example_spark.functions.extract import (
        detect_format,
        extract_text_bytes,
    )
    from oracle_vectorsearch_example_spark.functions.mov import (
        make_simple_mov,
        mov_frame_table,
        mov_tags,
    )
    from oracle_vectorsearch_example_spark.functions.mp4 import (
        make_simple_mp4,
    )

    T = {"title": "Vid Töne", "artist": "Cam 1", "year": "2022"}
    frames = [np.full((16, 16, 3), 30 * s, np.uint8) for s in (1, 2)]

    avi = make_simple_avi(frames, fps=5.0, info=T)
    assert riff_info_tags(avi) == T
    assert len(avi_frame_table(avi)[1]) == 2  # INFO transparent
    assert detect_format(avi) == "avi"
    assert extract_text_bytes(avi) == "Vid Töne Cam 1 2022"

    mov = make_simple_mov(frames, fps=5.0, tags=T)
    mp4 = make_simple_mp4(frames, fps=5.0, tags=T)
    assert mov_tags(mov) == T and mov_tags(mp4) == T
    assert len(mov_frame_table(mov)[1]) == 2
    assert (detect_format(mov), detect_format(mp4)) == ("mov", "mp4")
    assert extract_text_bytes(mov) == extract_text_bytes(mp4) \
        == "Vid Töne Cam 1 2022"

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 100)
    wav = bytearray(buf.getvalue())
    items = b"INAM" + struct.pack("<I", 6) + b"Sound\x00"
    wav += b"LIST" + struct.pack("<I", 4 + len(items)) + b"INFO" + items
    struct.pack_into("<I", wav, 4, len(wav) - 8)
    assert detect_format(bytes(wav)) == "wav"
    assert riff_info_tags(bytes(wav)) == {"title": "Sound"}
    assert extract_text_bytes(bytes(wav)) == "Sound"

    # untagged containers: recognized format, no text → ""
    assert extract_text_bytes(make_simple_avi(frames, fps=5.0)) == ""
    assert extract_text_bytes(make_simple_mp4(frames, fps=5.0)) == ""


def test_mkv_element_walk_and_tags():
    """WebM/Matroska (r13): EBML varint coding, Info/Tracks/Tags
    walk, duration from TimestampScale x Duration, named codec gate
    at the frame-decode consumer, D1 extract dispatch."""
    from oracle_vectorsearch_example_spark.functions.avi import (
        decode_video_frames,
    )
    from oracle_vectorsearch_example_spark.functions.ebml import (
        make_simple_mkv,
        mkv_meta,
        mkv_tag_text,
        mkv_tags,
    )
    from oracle_vectorsearch_example_spark.functions.extract import (
        detect_format,
        extract_text_bytes,
    )

    T = {"title": "Clip Ä", "artist": "Cam", "year": "2021"}
    blob = make_simple_mkv(
        tags=T, audio=("A_OPUS", 48000, 2), duration_sec=3.5,
        codec_id="V_VP9", width=640, height=360,
    )
    m = mkv_meta(blob)
    assert m["doc_type"] == "webm"
    assert abs(m["duration_sec"] - 3.5) < 1e-9
    assert m["tracks"][0] == {
        "type": "video", "codec_id": "V_VP9", "width": 640, "height": 360,
    }
    assert m["tracks"][1] == {
        "type": "audio", "codec_id": "A_OPUS", "rate": 48000.0, "nch": 2,
    }
    assert mkv_tags(blob) == T
    assert mkv_tag_text(blob) == "Clip Ä Cam 2021"
    assert detect_format(blob) == "mkv"
    assert extract_text_bytes(blob) == "Clip Ä Cam 2021"
    assert extract_text_bytes(make_simple_mkv()) == ""

    # the frame-decode consumer names the actual codecs in its gate
    with pytest.raises(NotImplementedError, match="V_VP9.*A_OPUS|A_OPUS.*V_VP9"):
        decode_video_frames(blob)
    with pytest.raises(ValueError, match="EBML"):
        mkv_meta(b"RIFF not ebml at all")
    # matroska doctype reads identically
    assert mkv_meta(make_simple_mkv(doc_type="matroska"))["doc_type"] \
        == "matroska"
