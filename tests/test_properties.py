"""Property-based tests (hypothesis) for the frozen operator specs.

Driver-side property checks run the *same* algorithms the Spark plans
declare (the chunker spec's arithmetic, the distance identities) over
adversarial inputs that fixtures can't cover: unicode whitespace runs,
empty/degenerate text, near-zero vectors. One Spark cross-check per
property keeps the column-expression implementations honest.
"""

from __future__ import annotations

import math

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from oracle_vectorsearch_example_spark.operators.dedup import _MERSENNE_P

WORDS = st.lists(
    st.text(alphabet="abcdefghij.!?", min_size=1, max_size=8), min_size=0, max_size=60
)


def _expected_chunks(n_words: int, max_words: int, overlap: int) -> int:
    stride = max_words - overlap
    if n_words <= 0:
        return 0
    return max(1, -(-(n_words - overlap) // stride))


@given(WORDS, st.integers(2, 20), st.integers(0, 10))
@settings(max_examples=200, deadline=None)
def test_chunk_count_formula_invariants(words, max_words, overlap):
    """The chunk-count formula (frozen spec, SURVEY.md DQ-20/36): every
    word is covered, ids are 1-based contiguous, every chunk ≤ max_words,
    consecutive chunks share exactly `overlap` words (except a short tail)."""
    if overlap >= max_words:
        return
    n = len(words)
    k = _expected_chunks(n, max_words, overlap)
    stride = max_words - overlap
    # coverage: the last chunk's window reaches the final word
    if k > 0:
        assert (k - 1) * stride + max_words >= n
        # minimality: one fewer chunk would leave words uncovered (k>1)
        if k > 1:
            assert (k - 2) * stride + max_words < n
    else:
        assert n == 0


@given(
    st.lists(st.floats(-1e3, 1e3), min_size=2, max_size=16),
    st.lists(st.floats(-1e3, 1e3), min_size=2, max_size=16),
)
@settings(max_examples=200, deadline=None)
def test_distance_identities_driver(a, b):
    """l2² == |a|² + |b|² − 2·dot; l1 ≥ l2; cosine distance ∈ [0, 2]."""
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    dot = sum(x * y for x, y in zip(a, b))
    aa = sum(x * x for x in a)
    bb = sum(y * y for y in b)
    l2sq = sum((x - y) ** 2 for x, y in zip(a, b))
    l1 = sum(abs(x - y) for x, y in zip(a, b))
    assert math.isclose(l2sq, aa + bb - 2 * dot, rel_tol=1e-6, abs_tol=1e-6)
    assert l1 + 1e-9 >= math.sqrt(max(l2sq, 0.0))
    den = math.sqrt(aa) * math.sqrt(bb)
    if den > 0:
        cosd = 1.0 - dot / den
        assert -1e-9 <= cosd <= 2.0 + 1e-9


@given(st.integers(0, 2**32), st.integers(0, 63))
@settings(max_examples=500, deadline=None)
def test_minhash_universal_hash_stays_in_long(x, seed):
    """The MinHash hash h_s(x) = (x·(2s+3) + 1009·s) mod p never overflows
    a signed 64-bit long at any (shingle, seed) the pipeline can produce —
    the no-overflow claim in operators/dedup.py's docstring."""
    prod = x * (2 * seed + 3) + 1009 * seed
    assert prod < 2**63
    assert 0 <= prod % _MERSENNE_P < _MERSENNE_P


def test_chunker_spark_agrees_with_formula(spark):
    """Spark chunker row counts equal the driver-side formula on a grid of
    (n_words, max, overlap) including the degenerate edges."""
    from pyspark.sql import functions as F

    from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_words

    rows, expected = [], {}
    rid = 0
    for n_words in (0, 1, 5, 19, 20, 21, 45):
        for max_words, overlap in ((20, 5), (10, 0), (7, 3)):
            text = " ".join(f"w{i}" for i in range(n_words))
            rows.append((rid, text, max_words, overlap))
            expected[rid] = _expected_chunks(n_words, max_words, overlap)
            rid += 1
    for r_id, text, mw, ov in rows:
        df = spark.createDataFrame([(r_id, text)], "doc_id long, text string")
        got = chunk_by_words(df, max_words=mw, overlap=ov).count()
        assert got == expected[r_id], (r_id, text[:30], mw, ov, got, expected[r_id])


# ---------------------------------------------------- component closure
def _union_find_components(n_nodes, edges):
    """Driver-side ground truth: textbook union-find, min-id labels."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {}
    for v in {v for e in edges for v in e}:
        r = find(v)
        while parent[r] != r:
            r = parent[r]
        labels[v] = r
    # canonicalize to min member per root
    roots = {}
    for v, r in labels.items():
        roots.setdefault(r, v if v < r else r)
        roots[r] = min(roots[r], v)
    return {v: roots[r] for v, r in labels.items()}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_components_match_union_find_on_random_graphs(spark, seed):
    """The distributed min-propagation fixed point equals textbook
    union-find on random graphs (sparse chains through denser blobs)."""
    import random

    from oracle_vectorsearch_example_spark.operators.dedup import neardup_components

    rng = random.Random(seed)
    n = 40
    n_edges = rng.choice([15, 40, 90])
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(n_edges)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    want = _union_find_components(n, edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component_id for r in neardup_components(pairs).collect()}
    assert got == want


# ---------------------------------------------------- sequence packing
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=40),
    st.integers(1, 256),
)
@settings(max_examples=200, deadline=None)
def test_packing_segment_arithmetic(tokens, L):
    """The span formula (operators/packing.py): driver-side re-derivation
    over random doc-length streams — segments tile the token stream with
    no loss, overlap, or over-full pack."""
    cb = 0
    packs: dict[int, int] = {}
    covered = 0
    for tok in tokens:
        first, last = cb // L, (cb + tok - 1) // L
        for p in range(first, last + 1):
            seg_start = max(cb, p * L)
            seg_end = min(cb + tok, (p + 1) * L)
            n = seg_end - seg_start
            assert n > 0
            off = seg_start - p * L
            assert 0 <= off < L and off + n <= L
            assert packs.get(p, 0) == off  # contiguous tiling per pack
            packs[p] = off + n
            covered += n
        cb += tok
    assert covered == sum(tokens)
    assert set(packs) == set(range(len(packs)))  # pack ids are dense
    assert all(v == L for p, v in packs.items() if p < len(packs) - 1)


# --------------------------------------------------- D1 roundtrip property
# the whitespace-normalized extraction contract over adversarial text:
# every fixture writer must invert through extract for any printable text
_DOC_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "S", "Zs"),
        include_characters=" \t\n",
    ),
    max_size=400,
)


@given(_DOC_TEXT, st.sampled_from(
    ["pdf", "html", "docx", "rtf", "xlsx", "pptx", "doc", "xls", "ppt",
     "pdf_cid", "pdf_lzw", "text"]
))
@settings(max_examples=150, deadline=None)
def test_render_extract_roundtrip_property(text, fmt):
    """extract(render(t, fmt)) == normalize_ws(t) for every format in the
    golden rotation — the exact contract the extract_text oracle hashes,
    here under adversarial unicode instead of fixture prose."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        _normalize_ws,
        extract_text_bytes,
        render_document,
    )

    payload = render_document(text, fmt)
    got = extract_text_bytes(payload, engine="builtin")
    assert got == _normalize_ws(text), (fmt, repr(text)[:80])


@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(0, 4),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_filter_roundtrip_property(w, h, ftype, seed):
    """decode(encode(px, filter)) == px for every scanline filter over
    random pixel content and odd shapes — the bit-exact inverse property
    each filter's decoder branch must satisfy."""
    import numpy as np

    from oracle_vectorsearch_example_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_png_pixels(encode_png(px, filter_type=ftype)) == px).all()


@given(st.text(max_size=300), st.integers(12, 64))
@settings(max_examples=80, deadline=None)
def test_xls_sst_continue_splits_property(text, max_record):
    """The SST writer splits character data at ARBITRARY record budgets;
    the reader must reassemble across every boundary placement (each
    continuation restating the option byte). Roundtrip under adversarial
    unicode (incl. astral chars -> UTF-16 code-unit counting) and tiny
    max_record values that force mid-string splits."""
    from oracle_vectorsearch_example_spark.functions.extract import _normalize_ws
    from oracle_vectorsearch_example_spark.functions.legacy_office import (
        make_simple_xls,
        xls_extract_text,
    )

    got = xls_extract_text(make_simple_xls(text, max_record=max_record))
    assert _normalize_ws(got) == _normalize_ws(text)


# ------------------------------------------------ r6 codec inverses (exact)


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=20))
@settings(max_examples=300, deadline=None)
def test_protobuf_varint_int64_roundtrip(vals):
    """ONNX wire codec: packed int64 encode → decode is the identity,
    including negative values (10-byte two's-complement varints)."""
    from oracle_vectorsearch_example_spark.functions.onnx_rt import (
        _WIRE_LEN,
        _enc_varint,
        _packed_ints,
    )

    packed = b"".join(_enc_varint(v) for v in vals)
    assert _packed_ints(packed, _WIRE_LEN) == vals


@given(st.lists(st.integers(0, 2**16 - 1), min_size=1, max_size=64),
       st.integers(1, 16))
@settings(max_examples=200, deadline=None)
def test_jpeg_bitstream_roundtrip(values, width):
    """JPEG bit writer → reader is the identity for any (value, width)
    sequence, across byte-stuffing boundaries."""
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        _BitReader,
        _BitWriter,
    )

    pairs = [(v & ((1 << width) - 1), width) for v in values]
    w = _BitWriter()
    for v, n in pairs:
        w.write(v, n)
    w.flush()
    # terminate with a marker so the reader never walks off the end
    data = bytes(w.out) + b"\xff\xd9"
    r = _BitReader(data, 0)
    for v, n in pairs:
        assert r.read_bits(n) == v


@given(st.integers(-32767, 32767))
@settings(max_examples=500, deadline=None)
def test_jpeg_magnitude_extend_inverse(v):
    """T.81 F.1.2.1 (encode) and F.2.2.1 EXTEND (decode) are inverses."""
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        _extend,
        _magnitude,
    )

    s, code = _magnitude(v)
    assert _extend(code, s) == v


@given(st.sampled_from(["dc_lum", "dc_chrom", "ac_lum", "ac_chrom"]))
@settings(max_examples=20, deadline=None)
def test_jpeg_huffman_tables_roundtrip(which):
    """Every symbol of the standard Annex K tables encodes to a code the
    decoder maps back to the same symbol."""
    from oracle_vectorsearch_example_spark.functions.jpeg import (
        STD_AC_CHROM,
        STD_AC_LUM,
        STD_DC_CHROM,
        STD_DC_LUM,
        _build_huffman,
        _enc_huff_codes,
    )

    bits, vals = {
        "dc_lum": STD_DC_LUM, "dc_chrom": STD_DC_CHROM,
        "ac_lum": STD_AC_LUM, "ac_chrom": STD_AC_CHROM,
    }[which]
    enc = _enc_huff_codes(bits, vals)
    dec = _build_huffman(bits, vals)
    for sym, (code, length) in enc.items():
        assert dec[(length, code)] == sym


@given(
    st.integers(1, 14),
    st.integers(1, 14),
    st.integers(2, 6),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_property(w, h, ncolors, seed):
    """encode→decode is pixel-exact for any ≤256-color image, any dims —
    the lossless contract the image_decode oracle relies on (r7)."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.gif import (
        decode_gif_pixels,
        make_animated_gif,
    )

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ncolors, 3))
    f = palette[rng.randint(0, ncolors, (h, w))].astype(np.uint8)
    assert np.array_equal(decode_gif_pixels(make_animated_gif([f])), f)


@given(
    st.integers(1, 14),
    st.integers(1, 14),
    st.sampled_from(["none", "lzw", "packbits"]),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(w, h, comp, pred, seed):
    """TIFF encode→decode pixel-exact across compressions/predictor for
    arbitrary truecolor content, any dims (r7)."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.tiff import (
        decode_tiff_pixels,
        make_simple_tiff,
    )

    if pred and comp != "lzw":
        pred = False
    rng = np.random.RandomState(seed)
    f = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    d = make_simple_tiff(f, compression=comp, predictor=pred)
    assert np.array_equal(decode_tiff_pixels(d), f)


@given(st.integers(8, 40), st.integers(8, 40), st.integers(0, 2**32 - 1))
@settings(max_examples=15, deadline=None)
def test_progressive_jpeg_equals_baseline_property(w, h, seed):
    """Progressive and baseline encodings of the SAME image decode to
    identical pixels for arbitrary content and dims — the r7 contract
    that catches any scan-accumulation slip."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    f = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg_pixels(encode_jpeg(f, quality=85))
    prog = decode_jpeg_pixels(encode_jpeg_progressive(f, quality=85))
    assert np.array_equal(base, prog)


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcdefg", min_size=1, max_size=6),
                  st.integers(1, 9)),
        min_size=1, max_size=12,
    ),
    st.integers(1, 25),
)
@settings(max_examples=60, deadline=None)
def test_bpe_tokens_reassemble_property(hist, n_merges):
    """BPE-encoded tokens always reassemble the word exactly, for any
    trained merge set and any word — including words absent from the
    training histogram (r7)."""
    from oracle_vectorsearch_example_spark.functions.bpe import (
        EOW,
        bpe_encode_word,
        train_bpe_from_histogram,
    )

    merges = train_bpe_from_histogram(hist, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    for word, _f in hist + [("zgx", 1), ("aaaaaaaaaa", 1)]:
        assert "".join(bpe_encode_word(word, ranks)) == word + EOW


@given(
    st.lists(st.integers(0, 255), min_size=2, max_size=64).filter(
        lambda g: len(g) % 2 == 0
    ),
    st.sampled_from([44100, 48000, 32000, 22050, 16000, 8000]),
    st.integers(0, 60),
    st.booleans(),
)
@settings(max_examples=120, deadline=None)
def test_mp3_gain_roundtrip_property(gains, rate, id3_pad, xing):
    """r13 MP3 writer↔parser: ANY gain sequence in the 8-bit field
    roundtrips exactly through real Layer III side info, regardless of
    sample-rate family (MPEG-1/LSF/2.5), ID3 padding, or a Xing
    header frame."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.mp3 import (
        make_simple_mp3,
        mp3_frame_table,
        mp3_gain_envelope,
    )

    g = np.asarray(gains, dtype=np.int64)
    blob = make_simple_mp3(
        g, sample_rate=rate, id3_bytes=id3_pad, xing=xing
    )
    meta, frames = mp3_frame_table(blob)
    assert meta["sample_rate"] == rate and meta["has_xing"] == xing
    assert np.array_equal(mp3_gain_envelope(blob), g)
    # frame table tiles the audio region exactly
    for (o1, l1), (o2, _) in zip(frames, frames[1:]):
        assert o1 + l1 == o2


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "conversion"]),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FF
                ),
                min_size=0,
                max_size=80,
            ),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_warc_record_roundtrip_property(recs, gz):
    """r13 WARC writer↔parser: arbitrary unicode text bodies (incl.
    CRLF-bearing ones — Content-Length framing, not sentinel scanning)
    survive the record walk byte-exactly, gzip members transparent."""
    from oracle_vectorsearch_example_spark.sources.warc import (
        make_simple_warc,
        parse_warc,
    )

    records = [
        {"warc_type": t, "target_uri": f"http://p.test/{i}", "text": txt}
        for i, (t, txt) in enumerate(recs)
    ]
    blob = make_simple_warc(records, gzip_members=gz)
    back = parse_warc(blob)
    assert len(back) == len(records)
    for rec, got in zip(records, back):
        assert got["warc_type"] == rec["warc_type"]
        assert got["body"] == rec["text"].encode("utf-8")


@given(st.lists(st.integers(0, (1 << 40) - 1), min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_ebml_vint_roundtrip_property(vals):
    """r13 EBML varints: the writer's shortest-form size coding decodes
    to the same value at every width the reader supports (the
    all-ones/unknown-size reservation honored)."""
    from oracle_vectorsearch_example_spark.functions.ebml import (
        _enc_size,
        _read_vint,
    )

    blob = b"".join(_enc_size(v) for v in vals)
    pos = 0
    out = []
    while pos < len(blob):
        v, n = _read_vint(blob, pos, keep_marker=False)
        out.append(v)
        pos += n
    assert out == vals


@given(
    st.binary(min_size=0, max_size=5000),
    st.lists(st.integers(1, 200), min_size=1, max_size=20),
)
@settings(max_examples=150, deadline=None)
def test_http_dechunk_roundtrip_property(payload, cuts):
    """r14 chunked framing: any payload split into arbitrary chunk
    sizes (chunk extensions included on some) de-frames back to the
    exact payload bytes."""
    from oracle_vectorsearch_example_spark.sources.warc import _dechunk

    framed = bytearray()
    pos = 0
    i = 0
    while pos < len(payload):
        size = min(cuts[i % len(cuts)], len(payload) - pos)
        ext = b";q=fuzz" if i % 3 == 0 else b""
        framed += b"%x" % size + ext + b"\r\n"
        framed += payload[pos:pos + size] + b"\r\n"
        pos += size
        i += 1
    framed += b"0\r\n\r\ntrailer: ignored\r\n"
    assert _dechunk(bytes(framed)) == payload


@given(
    st.text(min_size=0, max_size=2000),
    st.sampled_from(["gzip", "deflate", "deflate-raw", None]),
    st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_http_coded_response_roundtrip_property(text, ce, chunked):
    """r14 content codings: any text through any supported coding x
    framing combination comes back byte-identical from _http_split."""
    from oracle_vectorsearch_example_spark.sources.warc import (
        _http_split,
        make_simple_warc,
        parse_warc,
    )

    rec = {"warc_type": "response", "target_uri": "http://p.test/x",
           "html": text}
    if ce:
        rec["content_encoding"] = ce
    if chunked:
        rec["transfer_encoding"] = "chunked"
    body = parse_warc(make_simple_warc([rec]))[0]["body"]
    status, payload, charset, mime = _http_split(body)
    assert status == 200
    assert payload == text.encode("utf-8")
    assert mime == "text/html"
