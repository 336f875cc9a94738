"""Text extraction (D1 — UTL_TO_TEXT, 01_pdf_to_vector.sql:196-205).

Roundtrip contract: extract(render(text)) == whitespace-normalized text,
for each of the three built-in formats, plus dispatch/edge behavior.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.extract import (
    _content_strings,
    detect_format,
    extract_text_bytes,
    make_simple_docx,
    make_simple_html,
    make_simple_pdf,
    with_extracted_text,
)
from oracle_vectorsearch_example_spark.plans.pipeline import (
    ingest_binary_documents,
    ingest_documents,
)


def norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


CASES = [
    "hello world this is a test",
    "parens (like this) and backslash \\ and )stray( chars",
    "unicode: café 문서 über naïve",
    "  multi   space\tand\nnewlines  ",
    "x" * 500 + " tail words here",
    "",
]


@pytest.mark.parametrize("text", CASES)
@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip(text, compress):
    pdf = make_simple_pdf(text, compress=compress)
    assert detect_format(pdf) == "pdf"
    assert extract_text_bytes(pdf, engine="builtin") == norm(text)


@pytest.mark.parametrize("text", CASES)
def test_html_roundtrip(text):
    h = make_simple_html(text)
    assert detect_format(h) == "html"
    assert extract_text_bytes(h) == norm(text)


@pytest.mark.parametrize("text", CASES)
def test_docx_roundtrip(text):
    d = make_simple_docx(text)
    assert detect_format(d) == "docx"
    assert extract_text_bytes(d) == norm(text)


@pytest.mark.parametrize("text", CASES)
def test_xlsx_roundtrip(text):
    from oracle_vectorsearch_example_spark.functions.extract import make_simple_xlsx

    x = make_simple_xlsx(text)
    assert detect_format(x) == "xlsx"
    assert extract_text_bytes(x) == norm(text)


@pytest.mark.parametrize("text", CASES)
def test_pptx_roundtrip(text):
    from oracle_vectorsearch_example_spark.functions.extract import make_simple_pptx

    p = make_simple_pptx(text)
    assert detect_format(p) == "pptx"
    assert extract_text_bytes(p) == norm(text)


def test_xlsx_cell_types_and_sheet_order():
    """Shared-string, inline-string, and numeric cells all extract; sheets
    read in numeric order (sheet2 before sheet10)."""
    import io
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst = f'<sst {ns}><si><t>shared</t></si></sst>'
    sheet2 = (
        f'<worksheet {ns}><sheetData><row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1"><v>42</v></c>'
        '<c r="C1" t="inlineStr"><is><t>inline</t></is></c>'
        "</row></sheetData></worksheet>"
    )
    sheet10 = f'<worksheet {ns}><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData></worksheet>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", f"<workbook {ns}/>")
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet10.xml", sheet10)
        zf.writestr("xl/worksheets/sheet2.xml", sheet2)
    assert extract_text_bytes(buf.getvalue()) == "shared 42 inline shared"


def test_pptx_runs_concatenate_within_paragraph():
    import io
    import zipfile

    slide = (
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
        "<p:cSld><p:spTree><p:sp><p:txBody>"
        "<a:p><a:r><a:t>con</a:t></a:r><a:r><a:t>catenated</a:t></a:r></a:p>"
        "<a:p><a:r><a:t>next</a:t></a:r></a:p>"
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/presentation.xml", "<p/>")
        zf.writestr("ppt/slides/slide1.xml", slide)
    assert extract_text_bytes(buf.getvalue()) == "concatenated next"


def test_rtf_astral_surrogate_pairs():
    """Astral-plane chars (> U+FFFF) roundtrip through RTF as \\u
    surrogate pairs — RTF's \\u carries one signed 16-bit UTF-16 code
    unit (found by the hypothesis roundtrip property, r4)."""
    from oracle_vectorsearch_example_spark.functions.extract import make_simple_rtf

    text = "music \U0001d11e clef and \U00010000 linear-b"
    payload = make_simple_rtf(text)
    assert b"\\u" in payload
    assert extract_text_bytes(payload) == norm(text)
    # a lone high surrogate unit (malformed input) must not crash
    lone = b"{\\rtf1\\ansi \\u-10179 ?x}"
    assert extract_text_bytes(lone) is not None


def test_cfb_detected_and_named():
    """Legacy Office compound files (D0 CF 11 E0) are a NAMED unsupported
    format: NULL by default, an attributable error with on_error='raise' —
    never anonymous 'binary' (VERDICT r3 next-round #3)."""
    cfb = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 512
    assert detect_format(cfb) == "cfb"
    assert extract_text_bytes(cfb) is None
    with pytest.raises(ValueError, match="legacy Office"):
        extract_text_bytes(cfb, on_error="raise")


def test_ooxml_fixtures_are_deterministic():
    from oracle_vectorsearch_example_spark.functions.extract import (
        make_simple_pptx,
        make_simple_xlsx,
    )

    assert make_simple_xlsx("same text here") == make_simple_xlsx("same text here")
    assert make_simple_pptx("same text here") == make_simple_pptx("same text here")


def test_docx_fixture_is_deterministic():
    assert make_simple_docx("same text") == make_simple_docx("same text")


def test_docx_run_concatenation_and_breaks():
    """Runs within a paragraph concatenate with no implicit space; w:tab and
    w:br contribute whitespace; paragraphs separate words."""
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>con</w:t></w:r><w:r><w:t>catenated</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert extract_text_bytes(buf.getvalue()) == "concatenated a b c"


def test_zip_without_document_xml_is_binary():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "not a docx")
    assert detect_format(buf.getvalue()) == "binary"
    assert extract_text_bytes(buf.getvalue()) is None


def test_plain_text_and_charsets():
    assert extract_text_bytes("plain  text\nhere".encode()) == "plain text here"
    # latin-1 fallback when the payload is not valid UTF-8
    assert extract_text_bytes("café".encode("latin-1")) == "café"
    # explicit charset
    assert extract_text_bytes("café".encode("latin-1"), fmt="text", charset="latin-1") == "café"


def test_dispatch_edges():
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"") == ""
    binary = bytes([0, 159, 146, 150])
    assert detect_format(binary) == "binary"
    assert extract_text_bytes(binary) is None
    with pytest.raises(ValueError, match="unsupported document format"):
        extract_text_bytes(binary, on_error="raise")


def test_pypdf_engine_gated():
    try:
        import pypdf  # noqa: F401

        pytest.skip("pypdf installed; gating not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pypdf"):
        extract_text_bytes(make_simple_pdf("x"), engine="pypdf")


def test_content_stream_parser_units():
    # literal + hex strings; << dict >> must not parse as hex string
    assert _content_strings(b"BT (lit) Tj <68656c6c6f> Tj ET") == ["lit", "hello"]
    assert _content_strings(b"<< /x 1 >> BT (a) Tj ET") == ["a"]
    # octal escapes, named escapes, balanced nesting
    assert _content_strings(rb"(\110\151\)\n) Tj") == ["Hi)\n"]
    assert _content_strings(b"(a (nested) b) Tj") == ["a (nested) b"]
    # % comment swallowed to EOL
    assert _content_strings(b"% (not a string)\n(real) Tj") == ["real"]


def test_with_extracted_text_df(spark):
    rows = [(i, make_simple_pdf(t) if t is not None else None) for i, t in enumerate(CASES + [None])]
    df = spark.createDataFrame(rows, "doc_id int, content binary")
    out = {
        r["doc_id"]: r["text"]
        for r in with_extracted_text(df, engine="builtin").select("doc_id", "text").collect()
    }
    for i, t in enumerate(CASES):
        assert out[i] == norm(t)
    assert out[len(CASES)] is None


def test_ingest_binary_matches_text_pipeline(spark):
    """Binary EP1 == text EP1 on the same corpus (PDF rendering is
    lossless under the chunker's own whitespace handling)."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three. four five six! seven eight nine ten eleven twelve",
    ]
    docs_txt = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    docs_bin = spark.createDataFrame(
        [(i, make_simple_pdf(t)) for i, t in enumerate(texts)], "doc_id long, content binary"
    )
    a = ingest_documents(docs_txt, max_words=5, overlap=2).select(
        "doc_id", "chunk_id", "chunk_text"
    )
    b = ingest_binary_documents(docs_bin, engine="builtin", max_words=5, overlap=2).select(
        "doc_id", "chunk_id", "chunk_text"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ingest_binary_drops_unextractable(spark):
    df = spark.createDataFrame(
        [(0, make_simple_pdf("good words here")), (1, bytes([0, 159, 146, 150]))],
        "doc_id long, content binary",
    )
    out = ingest_binary_documents(df, engine="builtin", max_words=5, overlap=0)
    assert {r["doc_id"] for r in out.select("doc_id").distinct().collect()} == {0}
    kept = ingest_binary_documents(
        df.select("doc_id", "content"), engine="builtin", drop_unextractable=False,
        max_words=5, overlap=0,
    )
    # unextractable doc yields no chunks either way (chunker emits nothing
    # for NULL text) but the flag controls the explicit filter stage
    assert {r["doc_id"] for r in kept.select("doc_id").distinct().collect()} == {0}


@pytest.mark.parametrize("text", CASES)
def test_rtf_roundtrip(text):
    from oracle_vectorsearch_example_spark.functions.extract import make_simple_rtf

    r = make_simple_rtf(text)
    assert detect_format(r) == "rtf"
    assert extract_text_bytes(r) == norm(text)


def test_rtf_skips_destination_groups_and_decodes_escapes():
    rtf = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Courier;}}{\stylesheet{\s1 Body;}}"
        rb"{\info{\title secret meta}}"
        rb"Hello \'e9t\'e9 \u8364? brace \{x\} end\par}"
    )
    got = extract_text_bytes(rtf)
    assert got is not None
    assert "Courier" not in got and "secret" not in got and "Body" not in got
    # code point 8364 is the euro sign; its '?' ANSI fallback must be skipped
    assert got == "Hello \u00e9t\u00e9 \u20ac brace {x} end"


# --------------------------------------- legacy Word .doc (CFB; r5, D1)
def test_doc_roundtrip_simple():
    from oracle_vectorsearch_example_spark.functions.cfb import make_simple_doc

    text = "Legacy Word ninety-seven format. Second paragraph here."
    out = extract_text_bytes(make_simple_doc(text))
    assert out == text


def test_doc_roundtrip_unicode_and_large():
    from oracle_vectorsearch_example_spark.functions.cfb import make_simple_doc

    uni = "naïve café — ünïcödé über"
    assert extract_text_bytes(make_simple_doc(uni)) == uni
    # > 4096 bytes: WordDocument leaves the mini stream for regular sectors
    big = " ".join(f"word{i}" for i in range(2000))
    assert extract_text_bytes(make_simple_doc(big)) == big


def test_doc_detected_as_cfb_and_dispatched():
    from oracle_vectorsearch_example_spark.functions.cfb import make_simple_doc

    b = make_simple_doc("dispatch me")
    assert detect_format(b) == "cfb"
    assert extract_text_bytes(b, fmt="auto") == "dispatch me"


def test_xls_roundtrip_and_forced_continue_splits():
    from oracle_vectorsearch_example_spark.functions.legacy_office import (
        make_simple_xls,
        xls_extract_text,
    )

    text = "shared string table cells row major order with répéàted wörds"
    assert extract_text_bytes(make_simple_xls(text)) == norm(text)
    # max_record=24 forces mid-string Continue splits (each restating the
    # option byte, switching latin-1/UTF-16 segments) — reader must agree
    assert norm(xls_extract_text(make_simple_xls(text, max_record=24))) == norm(text)


def test_xls_numeric_cells():
    from oracle_vectorsearch_example_spark.functions.legacy_office import (
        make_simple_xls,
    )

    out = extract_text_bytes(make_simple_xls("a b", with_numbers=True))
    assert out == "a b 2.5 42"  # NUMBER double + RK 30-bit int


def test_ppt_roundtrip_both_atom_kinds():
    from oracle_vectorsearch_example_spark.functions.legacy_office import (
        make_simple_ppt,
    )

    text = "Legacy slides alternate UTF-16 and byte atoms across lines. " * 3
    assert extract_text_bytes(make_simple_ppt(text)) == norm(text)


def test_unknown_cfb_still_named_rejection():
    from oracle_vectorsearch_example_spark.functions.cfb import build_cfb

    odd = build_cfb([("SomeOtherApp", b"\x00" * 16)])
    assert extract_text_bytes(odd) is None
    with pytest.raises(ValueError, match="no recognized content stream"):
        extract_text_bytes(odd, on_error="raise")


def test_doc_ansi_fallback_without_piece_table():
    """A FIB with lcbClx=0 must fall back to the contiguous fcMin..fcMac
    ANSI range — the pre-piece-table file shape."""
    import struct

    from oracle_vectorsearch_example_spark.functions.cfb import (
        build_cfb,
        doc_extract_text,
    )

    txt = b"plain ansi fallback text\r"
    wd = bytearray(1024)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)
    struct.pack_into("<I", wd, 24, 1024)
    struct.pack_into("<I", wd, 28, 1024 + len(txt))
    b = build_cfb([("WordDocument", bytes(wd) + txt)])
    assert doc_extract_text(b).strip() == "plain ansi fallback text"


def test_doc_truncated_payload_is_null_not_crash():
    from oracle_vectorsearch_example_spark.functions.cfb import make_simple_doc

    whole = make_simple_doc("will be truncated")
    for cut in (8, 100, 512, 700, len(whole) - 64):
        assert extract_text_bytes(whole[:cut]) is None


def test_doc_in_render_rotation(spark):
    """render_document('doc') → extract roundtrip through the Arrow-batched
    column path, like every other D1 format."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        extract_text as extract_col,
        render_document_col,
    )

    df = spark.createDataFrame(
        [(1, "alpha bravo charlie"), (2, "delta echo foxtrot")],
        "doc_id long, text string",
    )
    out = (
        df.select(
            "doc_id",
            "text",
            render_document_col(F.col("text"), F.lit("doc")).alias("payload"),
        )
        .withColumn("xtext", extract_col(F.col("payload")))
        .collect()
    )
    for r in out:
        assert r.xtext == r.text


def test_doc_reads_1table_stream():
    """fWhichTblStm=1 selects the 1Table stream — the reader must honor
    the flag (our writer emits 0Table; real Word files use either)."""
    import struct

    from oracle_vectorsearch_example_spark.functions.cfb import (
        CfbFile,
        build_cfb,
        doc_extract_text,
        make_simple_doc,
    )

    base = make_simple_doc("one table flag honored")
    cfb = CfbFile(base)
    wd = bytearray(cfb.read("WordDocument"))
    clx = cfb.read("0Table")
    struct.pack_into("<H", wd, 0x0A, 0x0200)  # set fWhichTblStm
    rebuilt = build_cfb([("WordDocument", bytes(wd)), ("1Table", clx)])
    assert doc_extract_text(rebuilt).strip() == "one table flag honored"


def test_cfb_oversized_payload_fails_loudly():
    """The CFB writer emits no chained DIFAT sectors; payloads needing
    >109 FAT sectors (~7 MB) must raise at write time, not emit a
    silently malformed file."""
    from oracle_vectorsearch_example_spark.functions.cfb import make_simple_doc

    with pytest.raises(ValueError, match="FAT sectors"):
        make_simple_doc("word " * 2_000_000)  # ~20 MB of UTF-16 payload


# --------------------------------------------------- r7: filters + CID fonts


@pytest.mark.parametrize(
    "chain",
    [
        ["LZWDecode"],
        ["ASCIIHexDecode"],
        ["ASCII85Decode"],
        ["ASCII85Decode", "FlateDecode"],
        ["ASCIIHexDecode", "LZWDecode"],
    ],
)
def test_pdf_filter_chains_roundtrip(chain):
    """r7 filter support: LZW (TIFF variant, early change), ASCIIHex,
    ASCII85, and multi-filter chains applied in declared decode order."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        make_filtered_pdf,
    )

    t = "filter chain fidelity check 0123456789 with words enough to wrap " * 3
    got = extract_text_bytes(make_filtered_pdf(t, chain))
    assert got == norm(t)


def test_pdf_lzw_codec_self_consistent():
    from oracle_vectorsearch_example_spark.functions.extract import (
        _lzw_decode,
        _lzw_encode,
    )

    for payload in (b"", b"a", b"abababababab" * 50, bytes(range(256)) * 9):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_pdf_cid_tounicode_roundtrip():
    """r7 CID/Type0 support: content bytes are 2-byte CIDs that are
    MEANINGLESS without the /ToUnicode CMap (what Word/LaTeX/Chrome
    emit); the fixture spreads its mapping across bfchar, bfrange
    increment, and bfrange array forms, and shows text through both Tj
    hex strings and TJ arrays (whose kerning numbers must not become
    spaces)."""
    from oracle_vectorsearch_example_spark.functions.extract import make_cid_pdf

    t = (
        "The Quick Brown Fox jumps over the lazy dog 0123456789, with "
        "punctuation! And unicode: café naïve."
    )
    assert extract_text_bytes(make_cid_pdf(t)) == norm(t)
    # deterministic fixture
    assert make_cid_pdf(t) == make_cid_pdf(t)


def test_pdf_cid_without_cmap_not_mojibake():
    """A Type0 string with NO usable ToUnicode falls back to plain-bytes
    decoding — the historic behavior — rather than crashing."""
    from oracle_vectorsearch_example_spark.functions.extract import make_cid_pdf

    data = make_cid_pdf("hello world")
    # strip the ToUnicode reference: extractor must still return *something*
    broken = data.replace(b"/ToUnicode 6 0 R", b"/ToUnicod_ 6 0 R")
    out = extract_text_bytes(broken)
    assert out is not None


def test_pdf_structured_path_multi_page_ordering():
    """Pages extract in object order via the structured (page-graph)
    path; a second page's fonts don't leak into the first."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        _pdf_objects,
        make_simple_pdf,
    )

    data = make_simple_pdf("single page text body")
    objs = _pdf_objects(data)
    assert any(b"/Type /Page" in d for d, _ in objs.values())
    assert extract_text_bytes(data) == "single page text body"


def test_odf_roundtrip_all_kinds():
    """r12: odt/ods/odp render→sniff→extract roundtrip under the
    whitespace-normalized contract; the text:s and text:tab whitespace
    elements normalize back to single spaces; a mimetype-less ODF zip
    still dispatches through the generic handler."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        _normalize_ws,
        _write_fixture_zip,
        detect_format,
        extract_text_bytes,
        make_simple_odf,
    )

    text = (
        "Alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi."
    )
    want = _normalize_ws(text)
    for kind in ("odt", "ods", "odp"):
        blob = make_simple_odf(text, kind, wrap=30)
        assert detect_format(blob) == kind
        assert extract_text_bytes(blob, on_error="raise") == want
    with pytest.raises(ValueError, match="odt/ods/odp"):
        make_simple_odf(text, "odg")

    # mimetype-less ODF (some zippers drop the first member): the
    # content.xml presence still routes to the generic ODF handler
    import io
    import zipfile

    src = make_simple_odf(text, "odt")
    with zipfile.ZipFile(io.BytesIO(src)) as zf:
        members = [
            (n, zf.read(n).decode("utf-8"))
            for n in zf.namelist()
            if n != "mimetype"
        ]
    stripped = _write_fixture_zip(members)
    assert detect_format(stripped) == "odt"
    assert extract_text_bytes(stripped, on_error="raise") == want


def test_epub_roundtrip_and_spine_order():
    """r12: EPUB extraction follows the OPF spine (reading order), not
    zip member order — chapters shuffled in the archive still come out
    in spine sequence."""
    from oracle_vectorsearch_example_spark.functions.extract import (
        _normalize_ws,
        detect_format,
        extract_text_bytes,
        make_simple_epub,
    )

    text = " ".join(f"word{i:03d}" for i in range(60))
    want = _normalize_ws(text)
    blob = make_simple_epub(text, wrap=40, chapters=4)
    assert detect_format(blob) == "epub"
    assert extract_text_bytes(blob, on_error="raise") == want

    # shuffle member order (rewrite the zip reversed); spine must win
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        members = [(n, zf.read(n)) for n in zf.namelist()]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for n, payload in reversed(members):
            zf.writestr(zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0)), payload)
    assert extract_text_bytes(buf.getvalue(), on_error="raise") == want
