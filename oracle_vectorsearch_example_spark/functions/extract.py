"""Text extraction — the ``UTL_TO_TEXT`` analog (D1).

The reference's pipeline starts from raw document bytes and extracts plain
text server-side: ``DBMS_VECTOR_CHAIN.UTL_TO_TEXT(p.pdf_content,
JSON('{"plaintext": true, "charset": "UTF8"}'))`` — scripts/
01_pdf_to_vector.sql:196-205 — covering ~150 formats inside Oracle's
closed engine. This module is the Spark-side equivalent: format dispatch
on magic bytes, executed as an Arrow-batched pandas UDF so extraction
stays executor-local and shuffle-free (same plan position as the
reference's in-DB call).

Formats (the dispatch is extensible; these cover what this environment
can exercise honestly):

- **PDF** — ``pypdf`` when installed (the full-fidelity path for
  real-world files); otherwise a built-in minimal parser (stdlib only):
  Flate/uncompressed content streams, literal + hex string payloads of
  ``Tj``/``TJ``/``'``/``"`` show operators. That covers digitally-born
  single-byte-font documents — in particular everything this engine's own
  fixture writer (:func:`make_simple_pdf`) produces. Scanned/CID-font
  PDFs need ``pypdf`` (or OCR, out of scope).
- **DOCX** — stdlib ``zipfile`` + XML parse of ``word/document.xml``:
  runs (``w:t``) concatenate within a paragraph, tabs/breaks and paragraph
  boundaries become whitespace (collapsed by the output contract). The
  most-requested format after PDF; no external deps.
- **RTF** — control-word tokenizer: destination groups (fonttbl,
  stylesheet, pict, ...) are skipped whole, ``\\'hh`` hex and ``\\uN``
  unicode escapes decode, ``\\par``/``\\tab``/``\\line`` become
  whitespace, ``{}\\`` literals unescape.
- **XLSX** — stdlib ``zipfile`` + XML parse: ``xl/sharedStrings.xml``
  resolves ``t="s"`` cell indirections; worksheets
  (``xl/worksheets/sheet*.xml``, numeric name order) emit cell values in
  row-major order. Inline strings and numeric cells pass through.
- **PPTX** — stdlib ``zipfile`` + XML parse of ``ppt/slides/slide*.xml``
  (numeric order): DrawingML text runs (``a:t``) concatenate within a
  paragraph (``a:p``), paragraphs and slides join with whitespace.
- **HTML/XML** — script/style blocks dropped, tags stripped, entities
  unescaped.
- **plain text** — charset decode, default UTF-8 (the reference's
  ``charset: UTF8``), latin-1 fallback.
- **legacy Office (.doc/.xls/.ppt)** — the ``D0 CF 11 E0`` compound-file
  container is parsed for real (r5): [MS-CFB] sectors/FAT/mini-stream
  (``functions.cfb``), then ``WordDocument`` FIB → piece table for .doc,
  BIFF8 SST/cell records for .xls, text atoms for .ppt
  (``functions.legacy_office``). A compound file with no recognized
  content stream remains a *detected and NAMED* rejection
  (NULL-with-reason, or a named error with ``on_error='raise'``) rather
  than anonymous binary noise — a real corpus ingest meets these
  constantly and the failure must be attributable.

Frozen output contract (the ``plaintext: true`` analog, which makes the
DuckDB oracle expressible in SQL): every path returns **whitespace-
normalized text** — runs of whitespace collapse to single spaces, ends
trimmed — so ``extract_text_bytes(make_simple_pdf(t)) ==
normalize_ws(t)`` exactly.
"""

from __future__ import annotations

import html as _html
import re
import textwrap
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "detect_format",
    "extract_text_bytes",
    "extract_text",
    "with_extracted_text",
    "make_simple_pdf",
    "make_simple_html",
    "make_simple_docx",
    "make_simple_rtf",
    "make_simple_xlsx",
    "make_simple_pptx",
]

_WS = re.compile(r"\s+")


def _normalize_ws(s: str) -> str:
    return _WS.sub(" ", s).strip()


# ------------------------------------------------------------------ dispatch
def detect_format(data: bytes) -> str:
    """Sniff the payload format from magic bytes: ``pdf`` / ``docx`` /
    ``xlsx`` / ``pptx`` / ``odt`` / ``ods`` / ``odp`` / ``epub`` (r12:
    ODF + EPUB via the stored ``mimetype`` first member) / ``rtf`` /
    ``mp3`` (r13: ID3v2 header or MPEG frame sync — before the text
    fallback, since "ID3" is valid UTF-8) / ``html`` / ``text`` /
    ``empty`` / ``cfb`` (legacy .doc/.xls/.ppt compound file) /
    ``binary``."""
    if not data:
        return "empty"
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        # OLE2/CFB compound file: legacy Office (.doc/.xls/.ppt). Detected
        # by NAME so callers can report "unsupported legacy Office", not
        # "unknown binary" (VERDICT r3 Missing #2).
        return "cfb"
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        # OOXML container — dispatch on the marker part each type must hold
        import io
        import zipfile

        try:
            with zipfile.ZipFile(io.BytesIO(bytes(data))) as zf:
                names = set(zf.namelist())
                if "word/document.xml" in names:
                    return "docx"
                if "xl/workbook.xml" in names:
                    return "xlsx"
                if "ppt/presentation.xml" in names:
                    return "pptx"
                if "mimetype" in names:
                    # ODF and EPUB both pin their type in a stored
                    # 'mimetype' first member (ODF 1.2 §3.3 / OCF 3.0)
                    mt = zf.read("mimetype")[:64]
                    if mt.startswith(b"application/epub+zip"):
                        return "epub"
                    odf = b"application/vnd.oasis.opendocument."
                    if mt.startswith(odf + b"text"):
                        return "odt"
                    if mt.startswith(odf + b"spreadsheet"):
                        return "ods"
                    if mt.startswith(odf + b"presentation"):
                        return "odp"
                if "content.xml" in names:
                    return "odt"  # mimetype-less ODF: generic handler
        except zipfile.BadZipFile:
            pass
        return "binary"
    if data[:5] == b"{\\rtf":
        return "rtf"
    if (
        data[:3] == b"ID3"
        and len(data) >= 10
        and data[3] <= 10  # plausible major version (2/3/4 in the wild)
        and (data[5] & 0x0F) == 0  # flags low nibble always clear
        and max(data[6:10]) < 0x80  # syncsafe size bytes
    ) or (
        len(data) >= 4
        and data[0] == 0xFF
        and (data[1] & 0xE0) == 0xE0
        and (data[1] >> 3) & 3 != 1  # not the reserved version id
        and (data[1] >> 1) & 3 == 1  # Layer III only — mirrors
        # _parse_header's accept set (ADVICE r13: Layer I/II headers
        # must fall through to text/binary, not classify as 'mp3' and
        # then swallow the payload as unparseable)
        and (data[2] >> 4) & 0xF not in (0, 15)  # real bitrate index
        and (data[2] >> 2) & 3 != 3  # real sample-rate index
    ):
        # MPEG audio (r13): sniffed BEFORE the text fallback — an
        # ID3v2 header is valid UTF-8 ("ID3...") and must not read as
        # a text document
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mov" if data[8:12] == b"qt  " else "mp4"
    if len(data) >= 12 and data[4:8] in (
        b"moov", b"mdat", b"wide", b"pnot",
    ):
        return "mov"  # ftyp-less QuickTime (legal leading atoms)
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv"  # EBML magic: WebM/Matroska
    head = data[:1024].lstrip()
    low = head[:64].lower()
    if low.startswith((b"<!doctype html", b"<html", b"<?xml")) or b"<html" in head[:256].lower():
        return "html"
    try:
        data[:4096].decode("utf-8")
        return "text"
    except UnicodeDecodeError:
        pass
    # not UTF-8; still text if the head is free of non-whitespace control
    # bytes (covers latin-1 and friends — decoded via the charset fallback)
    if not any(b < 0x09 or 0x0E <= b < 0x20 for b in data[:4096]):
        return "text"
    return "binary"


# ---------------------------------------------------------------- PDF parse
_ESC = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}


def _decode_pdf_bytes(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":  # UTF-16BE text string (pypdf writes these)
        return b[2:].decode("utf-16-be", errors="replace")
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _read_literal_raw(b: bytes, i: int) -> tuple[bytes, int]:
    """Read a PDF literal string starting at ``b[i] == '('``; returns the
    unescaped BYTES and the index past the closing paren. Handles balanced
    nesting, ``\\``-escapes, octal escapes, and line continuations."""
    i += 1
    depth = 1
    buf = bytearray()
    n = len(b)
    while i < n and depth:
        c = b[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = b[i]
            if e in _ESC:
                buf.append(_ESC[e])
                i += 1
            elif e in (0x28, 0x29, 0x5C):
                buf.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                val, nd = 0, 0
                while i < n and nd < 3 and 0x30 <= b[i] <= 0x37:
                    val = val * 8 + (b[i] - 0x30)
                    i += 1
                    nd += 1
                buf.append(val & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and b[i] == 0x0A:
                    i += 1
            else:
                buf.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            buf.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                buf.append(c)
            i += 1
        else:
            buf.append(c)
            i += 1
    return bytes(buf), i


def _read_literal(b: bytes, i: int) -> tuple[str, int]:
    raw, j = _read_literal_raw(b, i)
    return _decode_pdf_bytes(raw), j


def _read_hex_raw(b: bytes, i: int) -> tuple[bytes, int]:
    j = b.find(b">", i)
    if j < 0:
        j = len(b)
    hx = bytes(ch for ch in b[i + 1 : j] if not chr(ch).isspace())
    if len(hx) % 2:
        hx += b"0"
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        raw = b""
    return raw, j + 1


def _read_hex(b: bytes, i: int) -> tuple[str, int]:
    raw, j = _read_hex_raw(b, i)
    return _decode_pdf_bytes(raw), j


def _content_strings(content: bytes) -> list[str]:
    """All string payloads of a PDF content stream, in stream order.

    Frozen-spec simplification: strings in content streams appear almost
    exclusively as operands of the show operators (Tj/TJ/'/"); positioning
    is ignored because the output contract collapses whitespace anyway.
    """
    out: list[str] = []
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _read_literal(content, i)
            out.append(s)
        elif c == 0x3C:  # < hex string, but << dict start
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
            else:
                s, i = _read_hex(content, i)
                out.append(s)
        elif c == 0x25:  # % comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        else:
            i += 1
    return out


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

# ------------------------------------------------- PDF stream filters (r7)


def _lzw_decode(b: bytes) -> bytes:
    """PDF LZWDecode (TIFF LZW, EarlyChange=1): 9→12-bit variable codes,
    clear=256, EOD=257 — from the public spec, stdlib-only."""
    table = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    prev: bytes | None = None
    bitbuf = nbits = 0
    for byte in b:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            else:  # KwKwK
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            out += entry
            prev = entry
            if next_code + 1 >= (1 << width) and width < 12:  # early change
                width += 1
    return bytes(out)


def _lzw_encode(b: bytes) -> bytes:
    """Matching LZW writer (fixture generator for round-trip tests)."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code, w):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256, width)
    cur = b""
    for byte in b:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code + 1 > (1 << width) and width < 12:  # early change
            width += 1
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(257, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _png_predictor(data: bytes, columns: int) -> bytes:
    """Un-apply PNG row predictors (Predictor >= 10, 8-bit single
    component — the layout PDF writers use for Flate/LZW streams)."""
    rowlen = columns + 1
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data) - rowlen + 1, rowlen):
        ft = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        if ft == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                bb, c = prev[i], (prev[i - 1] if i else 0)
                pp = a + bb - c
                pa, pb, pc = abs(pp - a), abs(pp - bb), abs(pp - c)
                pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


_SKIP_FILTERS = {b"DCTDecode", b"JPXDecode", b"CCITTFaxDecode", b"JBIG2Decode"}


def _decode_stream_filters(dict_bytes: bytes, raw: bytes) -> bytes | None:
    """Apply the stream's /Filter chain. Returns None for image codecs
    (not text) and for filters we cannot decode."""
    import base64

    names = re.findall(rb"/(\w+)", dict_bytes)
    filters = [n for n in names if n.endswith(b"Decode")]
    if not filters:
        # no declared filter: historic behavior — try zlib, else as-is
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return raw
    pred = re.search(rb"/Predictor\s+(\d+)", dict_bytes)
    cols = re.search(rb"/Columns\s+(\d+)", dict_bytes)
    for f in filters:
        if f in _SKIP_FILTERS:
            return None
        if f == b"FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return None
        elif f == b"LZWDecode":
            try:
                raw = _lzw_decode(raw)
            except KeyError:
                return None
        elif f == b"ASCIIHexDecode":
            hx = raw.split(b">")[0]
            hx = bytes(c for c in hx if not chr(c).isspace())
            if len(hx) % 2:
                hx += b"0"
            try:
                raw = bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                return None
        elif f == b"ASCII85Decode":
            try:
                raw = base64.a85decode(raw.strip(), adobe=True)
            except ValueError:
                return None
        else:
            return None  # unknown filter: not decodable here
        if f in (b"FlateDecode", b"LZWDecode") and pred and int(pred.group(1)) >= 10:
            raw = _png_predictor(raw, int(cols.group(1)) if cols else 1)
    return raw


# --------------------------------------- PDF object graph + ToUnicode (r7)

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_STREAM_KW_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")


def _pdf_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj number → (dict/body bytes, raw stream bytes or None).

    Sequential walk, not a full xref parser: each object's stream body is
    skipped by its literal ``/Length`` when present, so compressed bytes
    that happen to contain ``endobj``/``N 0 obj`` cannot truncate or
    split objects (they did under the old one-regex scan). Indirect
    ``/Length M 0 R`` falls back to the ``endstream`` search — rare in
    practice, and the sweep fallback still runs if the walk comes up
    empty."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    n = len(data)
    while pos < n:
        m = _OBJ_HDR_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        eo = data.find(b"endobj", m.end())
        sm = _STREAM_KW_RE.search(data, m.end(), eo if eo >= 0 else n)
        if sm:
            d = data[m.end() : sm.start()]
            lm = re.search(rb"/Length\s+(\d+)(?![\s\d]*R)", d)
            if lm:
                raw = data[sm.end() : sm.end() + int(lm.group(1))]
                pos = sm.end() + int(lm.group(1))
                e = data.find(b"endobj", pos)
                pos = e + 6 if e >= 0 else pos
            else:
                e = data.find(b"endstream", sm.end())
                raw = data[sm.end() : e if e >= 0 else n].rstrip(b"\r\n")
                pos = (e + 9) if e >= 0 else n
            objs[num] = (d, raw)
        else:
            body = data[m.end() : eo if eo >= 0 else n]
            objs[num] = (body, None)
            pos = (eo + 6) if eo >= 0 else n
    return objs


def _balanced_dict(b: bytes, i: int) -> bytes:
    """The ``<< ... >>`` span starting at ``b[i:i+2] == b'<<'`` (nested)."""
    depth = 0
    j = i
    n = len(b)
    while j < n - 1:
        if b[j : j + 2] == b"<<":
            depth += 1
            j += 2
        elif b[j : j + 2] == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return b[i:j]
        else:
            j += 1
    return b[i:]


def _parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """(code byte-length, code → text) from a ToUnicode CMap: codespace
    range width + bfchar entries + bfrange (increment and array forms)."""
    nbytes = 2
    csr = re.search(
        rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", cmap
    )
    if csr:
        nbytes = max(1, len(csr.group(1)) // 2)
    out: dict[int, str] = {}

    def u16(hx: bytes) -> str:
        raw = bytes.fromhex(hx.decode("ascii"))
        return raw.decode("utf-16-be", errors="replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.DOTALL):
        for sm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)
        ):
            out[int(sm.group(1), 16)] = u16(sm.group(2))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.DOTALL):
        body = m.group(1)
        i, n = 0, len(body)
        toks: list[bytes] = []

        def flush_range(toks):
            if len(toks) == 3 and not isinstance(toks[2], list):
                lo, hi = int(toks[0], 16), int(toks[1], 16)
                base = bytes.fromhex(toks[2].decode("ascii"))
                base_cp = int.from_bytes(base, "big")
                width = len(base)
                for off in range(hi - lo + 1):
                    out[lo + off] = (base_cp + off).to_bytes(
                        width, "big"
                    ).decode("utf-16-be", errors="replace")
            elif len(toks) == 3:
                lo = int(toks[0], 16)
                for off, d in enumerate(toks[2]):
                    out[lo + off] = u16(d)

        while i < n:
            c = body[i : i + 1]
            if c == b"<":
                j = body.find(b">", i)
                toks.append(body[i + 1 : j])
                i = j + 1
                if len(toks) == 3:
                    flush_range(toks)
                    toks = []
            elif c == b"[":
                j = body.find(b"]", i)
                arr = re.findall(rb"<([0-9A-Fa-f]+)>", body[i : j + 1])
                toks.append(arr)
                i = j + 1
                if len(toks) == 3:
                    flush_range(toks)
                    toks = []
            else:
                i += 1
    return nbytes, out


def _cid_decode(raw: bytes, cmap: tuple[int, dict[int, str]]) -> str:
    nbytes, table = cmap
    out = []
    for i in range(0, len(raw) - nbytes + 1, nbytes):
        code = int.from_bytes(raw[i : i + nbytes], "big")
        ch = table.get(code)
        if ch is not None:
            out.append(ch)
    return "".join(out)


_NAME_RE = re.compile(rb"/([^\s/<>\[\]()]+)")


def _content_show_text(content: bytes, fonts: dict[bytes, object]) -> list[str]:
    """Operator-aware show-text extraction: tracks the ACTIVE FONT via
    ``/Name size Tf`` and decodes the operands of Tj / TJ / ' / \"
    through that font's ToUnicode CMap when it has one (CID/Type0 text —
    what modern PDF generators emit), else as plain PDF strings.
    ``fonts`` maps resource name → (nbytes, code→text) or None."""
    out: list[str] = []
    operands: list[object] = []  # raw bytes for strings, name bytes, etc.
    cur = None  # active font's cmap, or None
    i, n = 0, len(content)

    def show(raw: bytes):
        out.append(
            _cid_decode(raw, cur) if cur is not None else _decode_pdf_bytes(raw)
        )

    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            raw, i = _read_literal_raw(content, i)
            operands.append(("str", raw))
        elif c == 0x3C:  # < hex string / << dict
            if i + 1 < n and content[i + 1] == 0x3C:
                i += 2
                operands.clear()
            else:
                raw, i = _read_hex_raw(content, i)
                operands.append(("str", raw))
        elif c == 0x2F:  # /Name
            m = _NAME_RE.match(content, i)
            operands.append(("name", m.group(1) if m else b""))
            i = m.end() if m else i + 1
        elif c == 0x5B:  # [ array — keep collecting; strings stay in operands
            operands.append(("mark", None))
            i += 1
        elif c == 0x5D:
            i += 1
        elif c == 0x25:  # % comment
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif (
            0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A or c in (0x27, 0x22)
        ):  # operator
            j = i
            while j < n and (
                0x41 <= content[j] <= 0x5A
                or 0x61 <= content[j] <= 0x7A
                or content[j] in (0x27, 0x22, 0x2A, 0x30, 0x31)
            ):
                j += 1
            op = content[i:j]
            if op == b"Tf":
                names = [v for t, v in _typed(operands) if t == "name"]
                if names:
                    cur = fonts.get(names[-1])
            elif op in (b"Tj", b"'", b'"'):
                strs = [v for t, v in _typed(operands) if t == "str"]
                if strs:
                    show(strs[-1])
            elif op == b"TJ":
                # one shown run: kerning numbers between the array's
                # strings are NOT spaces — concatenate the segments
                segs = [
                    _cid_decode(v, cur) if cur is not None else _decode_pdf_bytes(v)
                    for t, v in _typed(operands)
                    if t == "str"
                ]
                if segs:
                    out.append("".join(segs))
            operands.clear()
            i = j
        else:
            i += 1
    return out


def _typed(operands):
    return [o for o in operands if isinstance(o, tuple) and o[0] in ("str", "name")]


def _pdf_extract_builtin(data: bytes) -> str:
    """Structured pass: pages → /Resources → /Font → ToUnicode CMaps →
    font-aware content extraction (CID/Type0 text decodes through its
    CMap; filter chains Flate/LZW/AHx/A85 + PNG predictors). Falls back
    to the historic whole-file stream sweep when no page objects parse
    (damaged or exotic files)."""
    objs = _pdf_objects(data)

    def obj_dict(num):
        o = objs.get(num)
        return o[0] if o else b""

    def resolve_dict(container: bytes, key: bytes) -> bytes:
        """The dict VALUE of /key — inline << >> or a 1-level ref."""
        m = re.search(rb"/" + key + rb"\s*", container)
        if not m:
            return b""
        at = m.end()
        if container[at : at + 2] == b"<<":
            return _balanced_dict(container, at)
        rm = _REF_RE.match(container, at)
        if rm:
            return obj_dict(int(rm.group(1)))
        return b""

    parts: list[str] = []
    pages = [
        num for num, (d, _r) in sorted(objs.items())
        if re.search(rb"/Type\s*/Page\b", d)
    ]
    for pnum in pages:
        pdict = obj_dict(pnum)
        # fonts: resource name → (nbytes, cmap) or None
        fonts: dict[bytes, object] = {}
        res = resolve_dict(pdict, b"Resources")
        fdict = resolve_dict(res, b"Font") if res else b""
        for fm in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict):
            fobj = objs.get(int(fm.group(2)))
            cmap = None
            if fobj:
                tum = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fobj[0])
                if tum:
                    tu = objs.get(int(tum.group(1)))
                    if tu and tu[1] is not None:
                        decoded = _decode_stream_filters(tu[0], tu[1])
                        if decoded:
                            cmap = _parse_tounicode(decoded)
            fonts[fm.group(1)] = cmap
        # contents: single ref or array of refs
        cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", pdict)
        if not cm:
            continue
        for rm in _REF_RE.finditer(cm.group(1)):
            co = objs.get(int(rm.group(1)))
            if not co or co[1] is None:
                continue
            decoded = _decode_stream_filters(co[0], co[1])
            if decoded:
                parts.extend(_content_show_text(decoded, fonts))
    if pages:
        return _normalize_ws(" ".join(parts))

    # fallback: the historic filter-tolerant sweep over every stream
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            raw = zlib.decompress(raw)
        except zlib.error:
            pass  # uncompressed (or a filter we don't handle — skipped below)
        if b"BT" not in raw:
            continue  # not a text content stream (image / font program / ...)
        parts.extend(_content_strings(raw))
    return _normalize_ws(" ".join(parts))


def _pdf_extract_pypdf(data: bytes) -> str:  # pragma: no cover - needs pypdf
    import io

    from pypdf import PdfReader

    reader = PdfReader(io.BytesIO(data))
    return _normalize_ws(" ".join(page.extract_text() or "" for page in reader.pages))


def _pdf_extract(data: bytes, engine: str) -> str:
    if engine == "builtin":
        return _pdf_extract_builtin(data)
    try:
        import pypdf  # noqa: F401

        have_pypdf = True
    except ImportError:
        have_pypdf = False
    if engine == "pypdf":
        if not have_pypdf:
            raise NotImplementedError(
                "engine='pypdf' requires the pypdf package, which is not "
                "installed in this environment; engine='builtin' handles "
                "Flate/uncompressed text content streams with stdlib only"
            )
        return _pdf_extract_pypdf(data)
    # auto: prefer pypdf (full fidelity), fall back to the builtin parser
    return _pdf_extract_pypdf(data) if have_pypdf else _pdf_extract_builtin(data)


# ---------------------------------------------------------------- DOCX parse
_DOCX_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _docx_extract(data: bytes) -> str:
    """Text of ``word/document.xml``: per paragraph, runs concatenate
    directly (DOCX run boundaries carry no implicit space), ``w:tab`` and
    ``w:br`` contribute whitespace; paragraphs join with whitespace. The
    whitespace-normalized output contract makes the exact separator moot."""
    import io
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = ElementTree.fromstring(zf.read("word/document.xml"))
    paras: list[str] = []
    for p in root.iter(f"{_DOCX_NS}p"):
        buf: list[str] = []
        for el in p.iter():
            if el.tag == f"{_DOCX_NS}t":
                buf.append(el.text or "")
            elif el.tag in (f"{_DOCX_NS}tab", f"{_DOCX_NS}br"):
                buf.append(" ")
        paras.append("".join(buf))
    return _normalize_ws("\n".join(paras))


# ---------------------------------------------------------------- XLSX parse
_SSML_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_SHEET_NUM = re.compile(r"(\d+)")


def _ooxml_member_order(names: list[str]) -> list[str]:
    """Order sheet/slide members by their embedded number (sheet2 before
    sheet10), name as tiebreak — the document order users expect."""

    def key(n: str) -> tuple[int, str]:
        m = _SHEET_NUM.search(n.rsplit("/", 1)[-1])
        return (int(m.group(1)) if m else 0, n)

    return sorted(names, key=key)


def _xlsx_extract(data: bytes) -> str:
    """Cell text of every worksheet in row-major order: ``t="s"`` cells
    resolve through ``xl/sharedStrings.xml``, inline/formula strings and
    numeric values pass through. Cells join with whitespace (the
    normalized-output contract makes the exact separator moot)."""
    import io
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
            # each <si> concatenates its <t> descendants (plain + rich runs)
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_SSML_NS}t"))
                for si in root.iter(f"{_SSML_NS}si")
            ]
        out: list[str] = []
        sheets = _ooxml_member_order(
            [n for n in names if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")]
        )
        for sheet in sheets:
            root = ElementTree.fromstring(zf.read(sheet))
            for c in root.iter(f"{_SSML_NS}c"):
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_SSML_NS}is")
                    if is_el is not None:
                        out.append("".join(t.text or "" for t in is_el.iter(f"{_SSML_NS}t")))
                    continue
                v = c.find(f"{_SSML_NS}v")
                if v is None or v.text is None:
                    continue
                if ctype == "s":
                    try:
                        out.append(shared[int(v.text)])
                    except (ValueError, IndexError):
                        pass
                else:  # n / str / b — emit the stored value verbatim
                    out.append(v.text)
    return _normalize_ws(" ".join(out))


# ---------------------------------------------------------------- PPTX parse
_DML_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def _pptx_extract(data: bytes) -> str:
    """Text of every slide in numeric order: DrawingML runs (``a:t``)
    concatenate within a paragraph (``a:p``); paragraphs and slides join
    with whitespace."""
    import io
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        slides = _ooxml_member_order(
            [
                n
                for n in zf.namelist()
                if n.startswith("ppt/slides/slide") and n.endswith(".xml")
            ]
        )
        paras: list[str] = []
        for slide in slides:
            root = ElementTree.fromstring(zf.read(slide))
            for p in root.iter(f"{_DML_NS}p"):
                paras.append("".join(t.text or "" for t in p.iter(f"{_DML_NS}t")))
    return _normalize_ws("\n".join(paras))


# ----------------------------------------------------------------- RTF parse
# destinations whose entire group is formatting/meta, not document text
_RTF_SKIP = frozenset(
    "fonttbl colortbl stylesheet info pict object header footer footnote "
    "generator operator themedata colorschememapping listtable listoverridetable "
    "latentstyles datastore rsidtbl xmlnstbl".split()
)
_RTF_SPACE = {"par", "line", "tab", "cell", "row", "sect", "page"}


def _rtf_extract(data: bytes) -> str:
    """Token-walk an RTF group tree: skip destination groups whole, decode
    ``\\'hh`` / ``\\uN`` escapes, map paragraph-ish control words to
    whitespace, pass plain text through."""
    out: list[str] = []
    i, n = 0, len(data)
    skip_depth = 0  # >0 while inside a skipped destination group
    depth = 0
    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            depth += 1
            i += 1
            # lookahead for a destination control word right after the brace
            j = i
            if j < n and data[j : j + 2] == b"\\*":
                j += 2
            if j < n and data[j] == 0x5C:  # backslash
                m = re.match(rb"\\([a-z]+)", data[j : j + 32])
                if m and m.group(1).decode() in _RTF_SKIP and not skip_depth:
                    skip_depth = depth
            continue
        if c == 0x7D:  # }
            if skip_depth and depth == skip_depth:
                skip_depth = 0
            depth -= 1
            i += 1
            continue
        if c == 0x5C:  # backslash
            if i + 1 < n and data[i + 1] in (0x7B, 0x7D, 0x5C):  # \{ \} \\
                if not skip_depth:
                    out.append(chr(data[i + 1]))
                i += 2
                continue
            if data[i + 1 : i + 2] == b"'":
                if i + 3 < n and not skip_depth:
                    try:
                        out.append(bytes([int(data[i + 2 : i + 4], 16)]).decode("latin-1"))
                    except ValueError:
                        pass
                i += 4
                continue
            m = re.match(rb"\\([a-z]+)(-?\d+)? ?", data[i : i + 32])
            if m:
                word = m.group(1).decode()
                if not skip_depth:
                    if word == "u" and m.group(2):
                        # RTF \u is a SIGNED 16-bit code unit; astral chars
                        # arrive as a surrogate pair of consecutive \u —
                        # combine a low surrogate with a pending high one
                        unit = int(m.group(2)) & 0xFFFF
                        if (
                            0xDC00 <= unit <= 0xDFFF
                            and out
                            and len(out[-1]) == 1
                            and 0xD800 <= ord(out[-1]) <= 0xDBFF
                        ):
                            hi = ord(out.pop())
                            out.append(
                                chr(0x10000 + ((hi - 0xD800) << 10) + (unit - 0xDC00))
                            )
                        else:
                            out.append(chr(unit))
                    elif word in _RTF_SPACE:
                        out.append(" ")
                i += m.end()
                if word == "u" and m.group(2):
                    # skip the ANSI fallback that follows \uN (\uc1 default):
                    # either a \'hh escape or one literal character
                    if data[i : i + 2] == b"\\'":
                        i += 4
                    elif i < n and data[i] not in (0x5C, 0x7B, 0x7D):
                        i += 1
                continue
            i += 2  # \~ and other symbol controls
            continue
        if c in (0x0A, 0x0D):
            i += 1
            continue
        if not skip_depth:
            out.append(chr(c) if c < 0x80 else bytes([c]).decode("latin-1"))
        i += 1
    return _normalize_ws("".join(out))


def make_simple_rtf(text: str) -> bytes:
    """RTF fixture writer with the matching roundtrip contract: a font
    table (must be skipped), escaped specials, non-ASCII as \\'hh where
    latin-1 suffices else \\uN."""
    body: list[str] = []
    for ch in text:
        if ch in "{}\\":
            body.append("\\" + ch)
        elif ch == "\n":
            body.append("\\line ")  # raw newlines are ignorable in RTF source
        elif ch == "\t":
            body.append("\\tab ")
        elif ch == "\r":
            continue
        elif ord(ch) < 0x80:
            body.append(ch)
        elif ord(ch) < 0x100:
            body.append(f"\\'{ord(ch):02x}")
        elif ord(ch) <= 0xFFFF:
            body.append(f"\\u{ord(ch)}?")
        else:
            # astral plane: RTF \u carries one UTF-16 code unit, so emit
            # the surrogate pair (signed decimal per spec)
            for byte_hi, byte_lo in zip(*[iter(ch.encode("utf-16-be"))] * 2):
                unit = (byte_hi << 8) | byte_lo
                if unit >= 0x8000:
                    unit -= 0x10000
                body.append(f"\\u{unit}?")
    return (
        r"{\rtf1\ansi\deff0{\fonttbl{\f0 Helvetica;}}{\info{\author nobody}}"
        r"\f0\fs24 " + "".join(body) + r"\par}"
    ).encode("latin-1")


# ---------------------------------------------------------------- HTML parse
_HTML_DROP = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_HTML_TAG = re.compile(r"(?s)<[^>]*>")


def _html_extract(s: str) -> str:
    s = _HTML_DROP.sub(" ", s)
    s = _HTML_TAG.sub(" ", s)
    return _normalize_ws(_html.unescape(s))


# ----------------------------------------------------------------- top level
def extract_text_bytes(
    data: bytes | None,
    *,
    fmt: str = "auto",
    charset: str = "utf-8",
    engine: str = "auto",
    on_error: str = "null",
) -> str | None:
    """Extract whitespace-normalized plain text from one document payload.

    The single-value core of the D1 operator (UTL_TO_TEXT,
    01_pdf_to_vector.sql:196-205). ``fmt='auto'`` sniffs magic bytes;
    ``engine`` selects the PDF backend (``auto``/``pypdf``/``builtin``);
    ``on_error='null'`` maps undecodable payloads to NULL (callers filter),
    ``'raise'`` mirrors the reference's hard error.
    """
    if data is None:
        return None
    f = detect_format(data) if fmt == "auto" else fmt
    if f == "empty":
        return ""
    if f == "pdf":
        return _pdf_extract(bytes(data), engine)
    if f in ("docx", "xlsx", "pptx", "odt", "ods", "odp", "epub"):
        handler = {
            "docx": _docx_extract,
            "xlsx": _xlsx_extract,
            "pptx": _pptx_extract,
            "odt": _odf_extract,
            "ods": _odf_extract,
            "odp": _odf_extract,
            "epub": _epub_extract,
        }[f]
        try:
            return handler(bytes(data))
        except Exception:
            if on_error == "raise":
                raise
            return None
    if f == "mp3":
        # D1 over audio (r13): the extractable text of an MP3 is its
        # ID3 metadata (title/artist/album/year/genre/track) — audio
        # content itself would need the gated PCM decode. Tagless
        # files yield "" (no text, honestly), not NULL (the payload
        # IS a recognized format).
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            mp3_tag_text,
        )

        try:
            return _normalize_ws(mp3_tag_text(bytes(data)))
        except Exception:
            if on_error == "raise":
                raise
            return None
    if f in ("ogg", "flac"):
        # same D1 posture as mp3 (r13): the extractable text of an
        # audio container is its VorbisComment metadata; codec
        # payloads stay gated
        from oracle_vectorsearch_example_spark.functions.ogg import (
            flac_tag_text,
            ogg_tag_text,
        )

        try:
            fn = ogg_tag_text if f == "ogg" else flac_tag_text
            return _normalize_ws(fn(bytes(data)))
        except Exception:
            if on_error == "raise":
                raise
            return None
    if f in ("avi", "wav", "mov", "mp4"):
        # same D1 posture (r13): a media container's extractable text
        # is its metadata — RIFF LIST-INFO for AVI/WAV, moov/udta
        # (QuickTime text atoms or MP4 meta/ilst) for MOV/MP4
        from oracle_vectorsearch_example_spark.functions.avi import (
            riff_tag_text,
        )
        from oracle_vectorsearch_example_spark.functions.mov import (
            mov_tag_text,
        )

        try:
            fn = riff_tag_text if f in ("avi", "wav") else mov_tag_text
            return _normalize_ws(fn(bytes(data)))
        except Exception:
            if on_error == "raise":
                raise
            return None
    if f == "mkv":
        from oracle_vectorsearch_example_spark.functions.ebml import (
            mkv_tag_text,
        )

        try:
            return _normalize_ws(mkv_tag_text(bytes(data)))
        except Exception:
            if on_error == "raise":
                raise
            return None
    if f == "cfb":
        # the full legacy trio extracts for real (r5): .doc via the piece
        # table (functions.cfb), .xls via BIFF8 SST/cells and .ppt via
        # text atoms (functions.legacy_office); an unrecognized compound
        # file remains a NAMED rejection — attributable, not noise
        from oracle_vectorsearch_example_spark.functions.legacy_office import (
            cfb_extract_text,
        )

        try:
            return _normalize_ws(cfb_extract_text(bytes(data)))
        except Exception as e:
            if on_error == "raise":
                raise ValueError(
                    f"unsupported legacy Office (CFB/OLE2 compound file): {e}"
                ) from e
            return None
    if f == "rtf":
        return _rtf_extract(bytes(data))
    if f == "html":
        try:
            return _html_extract(bytes(data).decode(charset, errors="strict"))
        except (UnicodeDecodeError, LookupError):
            return _html_extract(bytes(data).decode("latin-1"))
    if f == "text":
        try:
            return _normalize_ws(bytes(data).decode(charset, errors="strict"))
        except (UnicodeDecodeError, LookupError):
            return _normalize_ws(bytes(data).decode("latin-1"))
    if on_error == "raise":
        raise ValueError(f"unsupported document format {f!r}")
    return None


def extract_text(
    content: Column,
    *,
    fmt: str = "auto",
    charset: str = "utf-8",
    engine: str = "auto",
) -> Column:
    """Column form: binary document payload → extracted plain text.

    Arrow-batched pandas UDF — the designated Python boundary for this
    operator (per-payload byte parsing has no column-expression form);
    extraction is row-local, so the stage adds no shuffle.
    """
    fmt_, charset_, engine_ = fmt, charset, engine

    @F.pandas_udf(T.StringType())
    def _extract(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda d: extract_text_bytes(d, fmt=fmt_, charset=charset_, engine=engine_)
        )

    return _extract(content)


def with_extracted_text(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "text",
    **kwargs,
) -> DataFrame:
    """DataFrame form: add ``out_col`` with the text extracted from
    ``content_col`` (binary). The first stage of the binary-input EP1
    pipeline (see ``plans.pipeline.ingest_binary_documents``)."""
    return df.withColumn(out_col, extract_text(F.col(content_col), **kwargs))


# ------------------------------------------------------------ fixture writers
def make_simple_pdf(text: str, *, compress: bool = True, wrap: int = 80) -> bytes:
    """Write a small, valid single-page PDF containing ``text`` as Helvetica
    ``Tj`` lines (Flate-compressed content stream by default).

    Deterministic fixture generator for the D1 roundtrip contract:
    ``extract_text_bytes(make_simple_pdf(t)) == normalize_ws(t)``. Pure
    stdlib — this is how the test suite gets PDF fixtures without any PDF
    library in the environment.
    """
    norm = _normalize_ws(text)
    lines = textwrap.wrap(norm, wrap, break_long_words=False, break_on_hyphens=False) or [""]

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)").encode("utf-8")
        )

    body = b"\n".join(b"(" + esc(line) + b") Tj T*" for line in lines)
    content = b"BT /F1 12 Tf 14 TL 72 720 Td\n" + body + b"\nET"
    if compress:
        stream, filt = zlib.compress(content), b"/Filter /FlateDecode "
    else:
        stream, filt = content, b""

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _pdf_assemble(objs: list[bytes]) -> bytes:
    """Shared xref/trailer writer for the PDF fixture generators."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_filtered_pdf(text: str, filters: list[str]) -> bytes:
    """Single-page PDF whose content stream is encoded through the given
    DECODE-ORDER filter chain (any of FlateDecode / LZWDecode /
    ASCIIHexDecode / ASCII85Decode) — round-trip fixture for the r7
    filter-chain support. The writer applies the chain in reverse, as a
    real producer would."""
    import base64

    norm = _normalize_ws(text)
    lines = textwrap.wrap(norm, 80, break_long_words=False, break_on_hyphens=False) or [""]

    def esc(t: str) -> bytes:
        return (
            t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)").encode("utf-8")
        )

    body = b"\n".join(b"(" + esc(line) + b") Tj T*" for line in lines)
    stream = b"BT /F1 12 Tf 14 TL 72 720 Td\n" + body + b"\nET"
    for f in reversed(filters):
        if f == "FlateDecode":
            stream = zlib.compress(stream)
        elif f == "LZWDecode":
            stream = _lzw_encode(stream)
        elif f == "ASCIIHexDecode":
            stream = stream.hex().encode("ascii") + b">"
        elif f == "ASCII85Decode":
            stream = base64.a85encode(stream, adobe=True)
        else:
            raise ValueError(f"unknown filter {f!r}")
    filt = b"[" + b" ".join(b"/" + f.encode() for f in filters) + b"]"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Filter " + filt + b" /Length " + str(len(stream)).encode()
        + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    return _pdf_assemble(objs)


def make_cid_pdf(text: str) -> bytes:
    """Single-page PDF showing ``text`` through a TYPE0 (CID) font with
    Identity-H encoding and a /ToUnicode CMap — the structure every
    modern PDF generator (Word, LaTeX, Chrome print) emits, where the
    content-stream bytes are 2-byte CIDs meaningless without the CMap.
    The CMap deliberately uses ALL THREE mapping forms (bfchar, bfrange
    increment, bfrange array) so the parser's coverage is total.
    Round-trip contract: ``extract_text_bytes(make_cid_pdf(t)) ==
    normalize_ws(t)``."""
    norm = _normalize_ws(text)
    chars = sorted(set(norm))
    if not chars:
        chars = [" "]
    cid_of = {ch: i + 1 for i, ch in enumerate(chars)}

    def u16hex(ch: str) -> str:
        return ch.encode("utf-16-be").hex().upper()

    # split the mapping across the three CMap forms
    n = len(chars)
    third = max(1, n // 3)
    bfchars = chars[:third]
    incr = chars[third : 2 * third]
    arr = chars[2 * third :]
    cmap = [
        b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap",
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange",
    ]
    if bfchars:
        cmap.append(f"{len(bfchars)} beginbfchar".encode())
        for ch in bfchars:
            cmap.append(f"<{cid_of[ch]:04X}> <{u16hex(ch)}>".encode())
        cmap.append(b"endbfchar")
    ranges = []
    if incr:
        # contiguous cids by construction; map as one increment range only
        # when the TARGET codepoints are also contiguous — else array form
        lo, hi = cid_of[incr[0]], cid_of[incr[-1]]
        cps = [ord(c) for c in incr]
        if cps == list(range(cps[0], cps[0] + len(cps))) and all(
            len(c.encode("utf-16-be")) == 2 for c in incr
        ):
            ranges.append(f"<{lo:04X}> <{hi:04X}> <{cps[0]:04X}>".encode())
        else:
            arr = incr + arr
    if arr:
        lo, hi = cid_of[arr[0]], cid_of[arr[-1]]
        dsts = b" ".join(f"<{u16hex(c)}>".encode() for c in arr)
        ranges.append(f"<{lo:04X}> <{hi:04X}> [".encode() + dsts + b"]")
    if ranges:
        cmap.append(f"{len(ranges)} beginbfrange".encode())
        cmap.extend(ranges)
        cmap.append(b"endbfrange")
    cmap.append(b"endcmap end end")
    cmap_stream = zlib.compress(b"\n".join(cmap))

    lines = textwrap.wrap(norm, 60, break_long_words=False, break_on_hyphens=False) or [""]
    shown = []
    for i, line in enumerate(lines):
        # alternate Tj hex strings and TJ arrays so both operators decode
        hx = "".join(f"{cid_of[ch]:04X}" for ch in line)
        if i % 2 == 0:
            shown.append(f"<{hx}> Tj T*".encode())
        else:
            half = (len(hx) // 8) * 4
            shown.append(
                f"[<{hx[:half]}> -120 <{hx[half:]}>] TJ T*".encode()
            )
    content = b"BT /F1 12 Tf 14 TL 72 720 Td\n" + b"\n".join(shown) + b"\nET"
    cstream = zlib.compress(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(cstream)).encode()
        + b" >>\nstream\n" + cstream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture-Identity-H "
        b"/Encoding /Identity-H /DescendantFonts [7 0 R] /ToUnicode 6 0 R >>",
        b"<< /Filter /FlateDecode /Length " + str(len(cmap_stream)).encode()
        + b" >>\nstream\n" + cmap_stream + b"\nendstream",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture >>",
    ]
    return _pdf_assemble(objs)


# ------------------------------------------------------------ ODF / EPUB
_ODF_TEXT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"


def _odf_extract(data: bytes) -> str:
    """Text of ``content.xml`` (ODF 1.2: odt/ods/odp share the schema —
    every visible run lives in a ``text:p``/``text:h``): paragraphs in
    document order; ``text:tab``/``text:line-break`` contribute a
    space, ``text:s`` its ``text:c`` count of spaces (the ODF
    whitespace-compression elements)."""
    import io
    import zipfile
    from xml.etree import ElementTree

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = ElementTree.fromstring(zf.read("content.xml"))

    def para_text(p) -> str:
        buf: list[str] = []

        def walk(el):
            if el.text:
                buf.append(el.text)
            for ch in el:
                tag = ch.tag
                if tag in (
                    f"{_ODF_TEXT_NS}tab",
                    f"{_ODF_TEXT_NS}line-break",
                ):
                    buf.append(" ")
                elif tag == f"{_ODF_TEXT_NS}s":
                    buf.append(
                        " " * int(ch.get(f"{_ODF_TEXT_NS}c", "1"))
                    )
                walk(ch)
                if ch.tail:
                    buf.append(ch.tail)

        walk(p)
        return "".join(buf)

    paras = [
        para_text(el)
        for el in root.iter()
        if el.tag in (f"{_ODF_TEXT_NS}p", f"{_ODF_TEXT_NS}h")
    ]
    return _normalize_ws("\n".join(paras))


def _epub_extract(data: bytes) -> str:
    """Text of an EPUB (OCF zip): ``META-INF/container.xml`` names the
    OPF package file, whose manifest+spine give the reading-order
    XHTML documents; each strips through the HTML extractor."""
    import io
    import posixpath
    import zipfile
    from xml.etree import ElementTree

    cns = "{urn:oasis:names:tc:opendocument:xmlns:container}"
    ons = "{http://www.idpf.org/2007/opf}"
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        container = ElementTree.fromstring(
            zf.read("META-INF/container.xml")
        )
        rootfile = container.find(f".//{cns}rootfile")
        if rootfile is None:
            raise ValueError("EPUB container.xml without a rootfile")
        opf_path = rootfile.get("full-path")
        opf = ElementTree.fromstring(zf.read(opf_path))
        manifest = {
            item.get("id"): item.get("href")
            for item in opf.iter(f"{ons}item")
        }
        base = posixpath.dirname(opf_path)
        texts: list[str] = []
        for ref in opf.iter(f"{ons}itemref"):
            href = manifest.get(ref.get("idref"))
            if not href:
                continue
            member = posixpath.join(base, href) if base else href
            texts.append(
                _html_extract(zf.read(member).decode("utf-8", "replace"))
            )
    return _normalize_ws("\n".join(texts))


_ODF_MIMETYPES = {
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
}


def make_simple_odf(text: str, kind: str = "odt", *, wrap: int = 80) -> bytes:
    """Write a minimal valid ODF document (``odt``/``ods``/``odp``)
    containing ``text`` as wrapped paragraphs — odt as body
    paragraphs, ods as one ``text:p`` per spreadsheet cell, odp as
    text-box frames across slides. Every variant embeds a ``text:s``
    double-space and a ``text:tab`` so the whitespace-element paths
    stay exercised. Byte-deterministic (fixed zip timestamps; stored
    ``mimetype`` first member, per ODF 1.2 §3.3)."""
    from xml.sax.saxutils import escape

    if kind not in _ODF_MIMETYPES:
        raise ValueError(f"kind must be odt/ods/odp (got {kind!r})")
    norm = _normalize_ws(text)
    lines = textwrap.wrap(
        norm, wrap, break_long_words=False, break_on_hyphens=False
    ) or [""]

    def para(line: str) -> str:
        # exercise text:s / text:tab: replace ONE mid-line space with
        # each (both normalize back to a single space)
        mid = line.find(" ", len(line) // 2)
        if mid > 0:
            a, b = escape(line[:mid]), escape(line[mid + 1 :])
            return f"<text:p>{a}<text:tab/>{b}</text:p>"
        return f"<text:p>{escape(line)}</text:p>"

    office = 'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    textns = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    if kind == "odt":
        body = (
            "<office:text>"
            + "".join(para(ln) for ln in lines)
            + "</office:text>"
        )
        extra = ""
    elif kind == "ods":
        tablens = (
            'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
        )
        cells = "".join(
            f"<table:table-row><table:table-cell>{para(ln)}"
            "</table:table-cell></table:table-row>"
            for ln in lines
        )
        body = (
            "<office:spreadsheet>"
            f'<table:table table:name="Sheet1">{cells}</table:table>'
            "</office:spreadsheet>"
        )
        extra = " " + tablens
    else:  # odp
        drawns = (
            'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"'
        )
        pages = []
        for i in range(0, len(lines), 2):
            boxes = "".join(
                f"<draw:frame><draw:text-box>{para(ln)}"
                "</draw:text-box></draw:frame>"
                for ln in lines[i : i + 2]
            )
            pages.append(
                f'<draw:page draw:name="page{i // 2 + 1}">{boxes}'
                "</draw:page>"
            )
        body = (
            "<office:presentation>" + "".join(pages) + "</office:presentation>"
        )
        extra = " " + drawns
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content {office} {textns}{extra} "
        'office:version="1.2"><office:body>'
        + body
        + "</office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest xmlns:manifest='
        '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" '
        'manifest:version="1.2">'
        f'<manifest:file-entry manifest:full-path="/" '
        f'manifest:media-type="{_ODF_MIMETYPES[kind]}"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/>'
        "</manifest:manifest>"
    )
    return _write_fixture_zip(
        [
            ("mimetype", _ODF_MIMETYPES[kind]),
            ("META-INF/manifest.xml", manifest),
            ("content.xml", content),
        ]
    )


def make_simple_epub(text: str, *, wrap: int = 80, chapters: int = 2) -> bytes:
    """Write a minimal valid EPUB (OCF zip: mimetype + container.xml +
    OPF manifest/spine + XHTML chapters) containing ``text`` split
    across ``chapters`` reading-order documents. Byte-deterministic."""
    from xml.sax.saxutils import escape

    norm = _normalize_ws(text)
    lines = textwrap.wrap(
        norm, wrap, break_long_words=False, break_on_hyphens=False
    ) or [""]
    chapters = max(1, min(chapters, len(lines)))
    per = (len(lines) + chapters - 1) // chapters
    chunks = [lines[i : i + per] for i in range(0, len(lines), per)]

    members: list[tuple[str, str]] = []
    items, refs = [], []
    for i, chunk in enumerate(chunks, 1):
        body = "".join(f"<p>{escape(ln)}</p>" for ln in chunk)
        members.append(
            (
                f"OEBPS/chap{i}.xhtml",
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
                f"<title></title></head><body>{body}"
                "</body></html>",
            )
        )
        items.append(
            f'<item id="c{i}" href="chap{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
        refs.append(f'<itemref idref="c{i}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        '<dc:identifier id="uid">fixture</dc:identifier>'
        "<dc:title>fixture</dc:title><dc:language>en</dc:language>"
        "</metadata>"
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(refs)}</spine></package>"
    )
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<container version="1.0" xmlns='
        '"urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    return _write_fixture_zip(
        [("mimetype", "application/epub+zip")]
        + [("META-INF/container.xml", container), ("OEBPS/content.opf", opf)]
        + members
    )


def render_document(text: str | None, fmt: str) -> bytes | None:
    """Render plain text to ``fmt`` bytes with the matching fixture writer
    (``pdf`` / ``html`` / ``text``) — the inverse of extraction under the
    whitespace-normalized contract."""
    if text is None:
        return None
    if fmt == "pdf":
        return make_simple_pdf(text)
    if fmt == "pdf_cid":  # Type0/Identity-H + ToUnicode CMap (r7)
        return make_cid_pdf(text)
    if fmt == "pdf_lzw":  # LZW-behind-ASCII85 filter chain (r7)
        return make_filtered_pdf(text, ["ASCII85Decode", "LZWDecode"])
    if fmt == "html":
        return make_simple_html(text)
    if fmt == "docx":
        return make_simple_docx(text)
    if fmt == "rtf":
        return make_simple_rtf(text)
    if fmt == "xlsx":
        return make_simple_xlsx(text)
    if fmt == "pptx":
        return make_simple_pptx(text)
    if fmt == "doc":
        from oracle_vectorsearch_example_spark.functions.cfb import make_simple_doc

        return make_simple_doc(text)
    if fmt == "xls":
        from oracle_vectorsearch_example_spark.functions.legacy_office import (
            make_simple_xls,
        )

        return make_simple_xls(text)
    if fmt == "ppt":
        from oracle_vectorsearch_example_spark.functions.legacy_office import (
            make_simple_ppt,
        )

        return make_simple_ppt(text)
    if fmt in ("odt", "ods", "odp"):
        return make_simple_odf(text, fmt)
    if fmt == "epub":
        return make_simple_epub(text)
    return text.encode("utf-8")


def render_document_col(text: Column, fmt: Column) -> Column:
    """Column form of :func:`render_document` (Arrow-batched)."""

    @F.pandas_udf(T.BinaryType())
    def _render(texts: pd.Series, fmts: pd.Series) -> pd.Series:
        return pd.Series(
            [render_document(t, f) for t, f in zip(texts, fmts)], dtype=object
        )

    return _render(text, fmt)


def make_simple_docx(text: str, *, wrap: int = 80) -> bytes:
    """Write a minimal valid DOCX (OOXML zip) containing ``text`` as
    wrapped paragraphs, split into multiple ``w:r`` runs to exercise the
    run-concatenation path. Deterministic bytes: fixed zip timestamps, no
    compression-level variance (stored entries). Same roundtrip contract as
    :func:`make_simple_pdf`."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    norm = _normalize_ws(text)
    lines = textwrap.wrap(norm, wrap, break_long_words=False, break_on_hyphens=False) or [""]

    def para(line: str) -> str:
        # split each paragraph into two runs at a word boundary to keep the
        # extractor honest about run concatenation (no implicit space)
        mid = line.find(" ", len(line) // 2)
        runs = [line] if mid < 0 else [line[: mid + 1], line[mid + 1 :]]
        body = "".join(
            f'<w:r><w:t xml:space="preserve">{escape(r)}</w:t></w:r>' for r in runs
        )
        return f"<w:p>{body}</w:p>"

    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(para(ln) for ln in lines)
        + "</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
        'document.main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("word/document.xml", document),
        ]:
            # fixed timestamp => byte-deterministic fixtures (zipfile stamps
            # wall-clock time otherwise)
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), payload)
    return buf.getvalue()


def _write_fixture_zip(members: list[tuple[str, str]]) -> bytes:
    """Byte-deterministic OOXML zip: fixed timestamps, stored entries."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in members:
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), payload)
    return buf.getvalue()


def make_simple_xlsx(text: str, *, cols: int = 8) -> bytes:
    """Write a minimal valid XLSX containing ``text`` word-by-word as
    shared-string cells, ``cols`` per row, split across TWO worksheets —
    exercising the sharedStrings indirection (with dedup, so repeated
    words share an index), multi-sheet ordering, and one inline-string
    cell. Same roundtrip contract as :func:`make_simple_pdf`:
    ``extract_text_bytes(make_simple_xlsx(t)) == normalize_ws(t)``."""
    from xml.sax.saxutils import escape

    words = _normalize_ws(text).split(" ") if _normalize_ws(text) else []
    # last word rides an inlineStr cell; the rest go through sharedStrings
    inline_word = words[-1] if words else None
    ss_words = words[:-1] if words else []
    uniq: dict[str, int] = {}
    for w in ss_words:
        uniq.setdefault(w, len(uniq))
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(ss_words)}" uniqueCount="{len(uniq)}">'
        + "".join(
            f'<si><t xml:space="preserve">{escape(w)}</t></si>' for w in uniq
        )
        + "</sst>"
    )

    def colref(i: int) -> str:  # 0-based column index -> A, B, ... (cols <= 26)
        return chr(ord("A") + i)

    rows = [words[i : i + cols] for i in range(0, len(words), cols)] or [[]]
    half = (len(rows) + 1) // 2

    def sheet_xml(sheet_rows: list[list[str]], row0: int) -> str:
        body = []
        for ri, row in enumerate(sheet_rows):
            cells = []
            for ci, w in enumerate(row):
                ref = f"{colref(ci)}{row0 + ri + 1}"
                if w == inline_word and (row0 + ri) == len(rows) - 1 and ci == len(row) - 1:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is>'
                        f'<t xml:space="preserve">{escape(w)}</t></is></c>'
                    )
                else:
                    cells.append(f'<c r="{ref}" t="s"><v>{uniq[w]}</v></c>')
            body.append(f'<row r="{row0 + ri + 1}">' + "".join(cells) + "</row>")
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
        )

    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheets><sheet name="Sheet1" sheetId="1"/><sheet name="Sheet2" sheetId="2"/>'
        "</sheets></workbook>"
    )
    return _write_fixture_zip(
        [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("xl/workbook.xml", workbook),
            ("xl/sharedStrings.xml", sst),
            ("xl/worksheets/sheet1.xml", sheet_xml(rows[:half], 0)),
            ("xl/worksheets/sheet2.xml", sheet_xml(rows[half:], half)),
        ]
    )


def make_simple_pptx(text: str, *, wrap: int = 60, paras_per_slide: int = 2) -> bytes:
    """Write a minimal valid PPTX containing ``text`` as wrapped DrawingML
    paragraphs, two per slide, each split into two ``a:r`` runs — same
    roundtrip contract as :func:`make_simple_pdf`."""
    from xml.sax.saxutils import escape

    norm = _normalize_ws(text)
    lines = textwrap.wrap(norm, wrap, break_long_words=False, break_on_hyphens=False) or [""]

    def para(line: str) -> str:
        mid = line.find(" ", len(line) // 2)
        runs = [line] if mid < 0 else [line[: mid + 1], line[mid + 1 :]]
        return (
            "<a:p>"
            + "".join(f'<a:r><a:t>{escape(r)}</a:t></a:r>' for r in runs)
            + "</a:p>"
        )

    def slide_xml(slide_lines: list[str]) -> str:
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
            'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
            "<p:cSld><p:spTree><p:sp><p:txBody>"
            + "".join(para(ln) for ln in slide_lines)
            + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
        )

    slides = [
        lines[i : i + paras_per_slide] for i in range(0, len(lines), paras_per_slide)
    ]
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'presentation.main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
        "</Relationships>"
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main"/>'
    )
    members = [
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", rels),
        ("ppt/presentation.xml", presentation),
    ] + [
        (f"ppt/slides/slide{i + 1}.xml", slide_xml(sl)) for i, sl in enumerate(slides)
    ]
    return _write_fixture_zip(members)


def make_simple_html(text: str) -> bytes:
    """HTML fixture writer with the matching roundtrip contract."""
    return (
        "<!DOCTYPE html><html><head><title></title>"
        "<style>p { color: red; }</style></head>"
        f"<body><p>{_html.escape(text)}</p>"
        "<script>var x = '<ignored>';</script></body></html>"
    ).encode("utf-8")
