"""Legacy Excel (.xls BIFF8) and PowerPoint (.ppt) text extraction —
completing the CFB trio started by ``functions.cfb``'s ``.doc`` support
(D1 widening toward the reference's ~150-format ``UTL_TO_TEXT``,
01_pdf_to_vector.sql:196-205).

Publicly documented structures:

- **[MS-XLS]** — the ``Workbook`` stream is a sequence of BIFF records
  ``(type u16, length u16, payload)``. Strings live in the SST record
  (shared-string table) whose payload spills into Continue records; at
  every spill boundary that lands inside character data the continuation
  RESTATES the high-byte flag, so a single string can switch between
  compressed (latin-1) and UTF-16 segments. Cells reference the SST via
  LABELSST; NUMBER/RK/MULRK carry numerics (RK = 30-bit int or truncated
  float, optionally /100); LABEL carries an inline string.
- **[MS-PPT]** — the ``PowerPoint Document`` stream is a tree of records
  ``(verAndInstance u16, type u16, length u32)``; containers have
  version nibble 0xF. Document text sits in TextCharsAtom (UTF-16LE)
  and TextBytesAtom (one-byte chars) leaves, collected in stream order.

Cell/paragraph texts join with whitespace — the same whitespace-normalized
output contract as every other D1 format, which is what makes the DuckDB
roundtrip oracle expressible. Fixture writers emit deterministic bytes and
exercise the hard paths on purpose (forced SST Continue splits, UTF-16
and compressed strings, numeric cells).
"""

from __future__ import annotations

import struct

from oracle_vectorsearch_example_spark.functions.cfb import (
    CfbError,
    CfbFile,
    UnsupportedCfb,
    build_cfb,
    doc_extract_text,
)

# ------------------------------------------------------------- BIFF8 (.xls)
_SST, _CONTINUE, _LABELSST, _LABEL = 0x00FC, 0x003C, 0x00FD, 0x0204
_NUMBER, _RK, _MULRK, _BOOLERR = 0x0203, 0x027E, 0x00BD, 0x0205
_BOF, _EOF = 0x0809, 0x000A


def _records(stream: bytes):
    i = 0
    while i + 4 <= len(stream):
        rtype, rlen = struct.unpack_from("<HH", stream, i)
        yield rtype, stream[i + 4 : i + 4 + rlen]
        i += 4 + rlen


class _SstReader:
    """Cursor over the SST payload + its Continue payloads that knows
    where the record boundaries are — required because a string breaking
    at a boundary restarts with a fresh option byte."""

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.p = 0
        self.o = 0

    def _avail(self) -> int:
        return len(self.parts[self.p]) - self.o

    def _advance(self) -> None:
        while self.p < len(self.parts) and self._avail() == 0:
            if self.p + 1 >= len(self.parts):
                raise CfbError("SST truncated")
            self.p += 1
            self.o = 0

    def read_raw(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._advance()
            take = min(n, self._avail())
            out += self.parts[self.p][self.o : self.o + take]
            self.o += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        return self.read_raw(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read_raw(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.read_raw(4))[0]

    def read_string(self) -> str:
        cch = self.u16()
        grbit = self.u8()
        high = grbit & 0x01
        c_run = self.u16() if grbit & 0x08 else 0
        cb_ext = self.u32() if grbit & 0x04 else 0
        # accumulate UTF-16 code units and decode ONCE at the end: a
        # surrogate pair may split across a Continue boundary (and the
        # segments on either side may even use different widths), so
        # per-segment decoding would see lone surrogates
        units = bytearray()
        remaining = cch
        while remaining:
            if self._avail() == 0:
                self._advance()
                high = self.u8() & 0x01  # continuation restates the flag
            width = 2 if high else 1
            take = min(remaining, self._avail() // width)
            if take == 0:
                raise CfbError("SST string segment malformed")
            raw = self.parts[self.p][self.o : self.o + take * width]
            self.o += take * width
            if high:
                units += raw
            else:
                units += raw.decode("latin-1").encode("utf-16-le")
            remaining -= take
        self.read_raw(4 * c_run + cb_ext)  # rich runs + ext data: skip
        return units.decode("utf-16-le", errors="replace")


def _decode_rk(rk: int) -> float:
    if rk & 0x02:  # 30-bit signed integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:  # upper 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<I", 0) + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if rk & 0x01 else val


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def xls_extract_text(data: bytes) -> str:
    """Cell text of a BIFF8 workbook in (sheet, row, column) order —
    the same row-major contract as the XLSX extractor. Formula caches and
    chart records are ignored."""
    cfb = CfbFile(data)
    wb = cfb.read("Workbook") or cfb.read("Book")
    if wb is None:
        raise UnsupportedCfb("compound file with no Workbook stream")
    sst: list[str] = []
    sst_parts: list[bytes] | None = None
    cells: list[tuple[int, int, int, str]] = []
    sheet = -1

    def flush_sst() -> None:
        nonlocal sst_parts, sst
        if sst_parts is None:
            return
        r = _SstReader(sst_parts)
        n_unique = (r.u32(), r.u32())[1]
        sst = [r.read_string() for _ in range(n_unique)]
        sst_parts = None

    for rtype, pl in _records(wb):
        if rtype == _SST:
            sst_parts = [pl]
            continue
        if rtype == _CONTINUE and sst_parts is not None:
            sst_parts.append(pl)
            continue
        flush_sst()
        if rtype == _BOF:
            sheet += 1
        elif rtype == _LABELSST and len(pl) >= 10:
            row, col, _, isst = struct.unpack_from("<HHHI", pl)
            if isst < len(sst):
                cells.append((sheet, row, col, sst[isst]))
        elif rtype == _LABEL and len(pl) >= 9:
            row, col = struct.unpack_from("<HH", pl)
            cch, grbit = struct.unpack_from("<HB", pl, 6)
            body = pl[9:]
            txt = (
                body[: 2 * cch].decode("utf-16-le", errors="replace")
                if grbit & 1
                else body[:cch].decode("latin-1")
            )
            cells.append((sheet, row, col, txt))
        elif rtype == _NUMBER and len(pl) >= 14:
            row, col = struct.unpack_from("<HH", pl)
            (v,) = struct.unpack_from("<d", pl, 6)
            cells.append((sheet, row, col, _fmt_num(v)))
        elif rtype == _RK and len(pl) >= 10:
            row, col, _, rk = struct.unpack_from("<HHHI", pl)
            cells.append((sheet, row, col, _fmt_num(_decode_rk(rk))))
        elif rtype == _MULRK and len(pl) >= 12:
            row, col0 = struct.unpack_from("<HH", pl)
            n = (len(pl) - 6) // 6
            for k in range(n):
                (_, rk) = struct.unpack_from("<HI", pl, 4 + 6 * k)
                cells.append((sheet, row, col0 + k, _fmt_num(_decode_rk(rk))))
        elif rtype == _BOOLERR and len(pl) >= 8:
            row, col, _, val, is_err = struct.unpack_from("<HHHBB", pl)
            if not is_err:
                cells.append((sheet, row, col, "TRUE" if val else "FALSE"))
    flush_sst()
    cells.sort(key=lambda c: (c[0], c[1], c[2]))
    return " ".join(c[3] for c in cells)


def _biff_record(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def make_simple_xls(
    text: str,
    *,
    cols: int = 8,
    max_record: int = 8224,
    with_numbers: bool = False,
) -> bytes:
    """Write a minimal valid BIFF8 ``.xls``: words become deduplicated SST
    strings referenced by LABELSST cells, ``cols`` per row. Strings that
    fit latin-1 are written compressed, others UTF-16 — and the SST is
    split into Continue records whenever ``max_record`` would overflow
    (pass a small value to force mid-string splits; each split restates
    the option byte, exercising the reader's boundary logic).
    ``with_numbers`` appends one NUMBER and one RK cell row."""
    import re

    words = [w for w in re.split(r"\s+", text.strip()) if w] if text.strip() else []
    uniq: dict[str, int] = {}
    for w in words:
        uniq.setdefault(w, len(uniq))

    # SST payload split across Continue boundaries
    parts: list[bytearray] = [bytearray(struct.pack("<II", len(words), len(uniq)))]

    for w in uniq:
        high = 0 if all(ord(c) < 256 for c in w) else 1
        # cch counts UTF-16 CODE UNITS (astral chars are two), not Python
        # characters — [MS-XLS] XLUnicodeRichExtendedString
        n_units = len(w.encode("utf-16-le")) // 2 if high else len(w)
        hdr = struct.pack("<HB", n_units, high)
        if len(parts[-1]) + len(hdr) + 1 > max_record:
            parts.append(bytearray())
        parts[-1] += hdr
        units = w.encode("utf-16-le") if high else w.encode("latin-1")
        width = 2 if high else 1
        i = 0
        while i < len(units):
            avail = ((max_record - len(parts[-1])) // width) * width
            if avail == 0:
                parts.append(bytearray(struct.pack("<B", high)))
                avail = ((max_record - len(parts[-1])) // width) * width
            parts[-1] += units[i : i + avail]
            i += avail

    out = bytearray()
    out += _biff_record(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x3515, 0x07CC, 1, 1))
    out += _biff_record(_SST, bytes(parts[0]))
    for p in parts[1:]:
        out += _biff_record(_CONTINUE, bytes(p))
    out += _biff_record(_EOF, b"")
    out += _biff_record(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x3515, 0x07CC, 1, 1))
    for i, w in enumerate(words):
        row, col = divmod(i, cols)
        out += _biff_record(
            _LABELSST, struct.pack("<HHHI", row, col, 0, uniq[w])
        )
    if with_numbers:
        row = (len(words) + cols - 1) // cols + 1
        out += _biff_record(_NUMBER, struct.pack("<HHHd", row, 0, 0, 2.5))
        out += _biff_record(_RK, struct.pack("<HHHI", row, 1, 0, (42 << 2) | 0x02))
    out += _biff_record(_EOF, b"")
    return build_cfb([("Workbook", bytes(out))])


# --------------------------------------------------------------- PPT atoms
_TEXTCHARS, _TEXTBYTES = 0x0FA0, 0x0FA8
_DOCUMENT, _SLIDELIST, _TEXTHEADER = 0x03E8, 0x0FF0, 0x0F9F


def _walk_ppt(stream: bytes, lo: int, hi: int, out: list[str]) -> None:
    i = lo
    while i + 8 <= hi:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", stream, i)
        body_lo, body_hi = i + 8, min(i + 8 + rlen, hi)
        if (ver_inst & 0x0F) == 0x0F:  # container: recurse
            _walk_ppt(stream, body_lo, body_hi, out)
        elif rtype == _TEXTCHARS:
            out.append(
                stream[body_lo:body_hi].decode("utf-16-le", errors="replace")
            )
        elif rtype == _TEXTBYTES:
            out.append(stream[body_lo:body_hi].decode("latin-1"))
        i = body_lo + rlen


def ppt_extract_text(data: bytes) -> str:
    """Text atoms of a legacy PowerPoint in stream order (TextCharsAtom /
    TextBytesAtom under any container depth)."""
    cfb = CfbFile(data)
    ps = cfb.read("PowerPoint Document")
    if ps is None:
        raise UnsupportedCfb("compound file with no PowerPoint Document stream")
    out: list[str] = []
    _walk_ppt(ps, 0, len(ps), out)
    return "\n".join(out)


def _ppt_record(ver_inst: int, rtype: int, body: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(body)) + body


def make_simple_ppt(text: str, *, wrap: int = 60) -> bytes:
    """Write a minimal legacy ``.ppt``: a Document container holding a
    SlideListWithText whose TextHeaderAtom+TextCharsAtom pairs carry the
    wrapped lines (odd lines as one-byte TextBytesAtoms when they fit,
    exercising both atom decoders)."""
    import re
    import textwrap

    norm = re.sub(r"\s+", " ", text).strip()
    lines = textwrap.wrap(
        norm, wrap, break_long_words=False, break_on_hyphens=False
    ) or [""]
    body = b""
    for i, line in enumerate(lines):
        body += _ppt_record(0x0000, _TEXTHEADER, struct.pack("<I", 0))
        if i % 2 and all(ord(c) < 256 for c in line):
            body += _ppt_record(0x0000, _TEXTBYTES, line.encode("latin-1"))
        else:
            body += _ppt_record(0x0000, _TEXTCHARS, line.encode("utf-16-le"))
    doc = _ppt_record(0x000F, _DOCUMENT, _ppt_record(0x000F, _SLIDELIST, body))
    return build_cfb([("PowerPoint Document", doc)])


# ------------------------------------------------------------- dispatcher
def cfb_extract_text(data: bytes) -> str:
    """Route a CFB payload to its extractor by directory content:
    WordDocument → .doc, Workbook/Book → .xls, PowerPoint Document →
    .ppt. Raises :class:`UnsupportedCfb` (named) otherwise."""
    names = {n.lower() for n in CfbFile(data).stream_names()}
    if "worddocument" in names:
        return doc_extract_text(data)
    if {"workbook", "book"} & names:
        return xls_extract_text(data)
    if "powerpoint document" in names:
        return ppt_extract_text(data)
    raise UnsupportedCfb(
        "compound file with no recognized content stream "
        f"(streams: {sorted(names)[:8]})"
    )
