"""WebP lossless (VP8L) subset (X4 tail, r12) — a REAL decoder for the
modern lossless web format, built from the public "WebP Lossless
Bitstream Specification" in the repo's codec discipline (GIF-LZW,
FLAC, JPEG, PNG zlib: parse the real bitstream, reject the rest BY
NAME). Lossy VP8 needs a DCT codec and is rejected by name, like
MP3/H.264.

Decoded subset — the honest-offline boundary:

- container: ``RIFF <size> WEBP`` with a ``VP8L`` chunk (``VP8 `` →
  lossy, ``VP8X`` → extended container, both named rejections);
- VP8L header (0x2F signature, 14-bit dims, version 0);
- prefix codes: both forms — "simple" (1-2 symbols) and "normal"
  (code-length code over the 19-symbol order, repeat codes 16/17/18,
  canonical assignment), read MSB-first inside the LSB-first stream;
- literals (green/red/blue/alpha), color-cache references (the
  0x1e35a7bd multiplicative hash), and LZ77 backward references with
  PLAIN distances (``dist_code > 120``);
- meta-prefix (entropy image) block switching;
- inverse transforms: subtract-green, predictor (all 14 modes), and
  the color transform.

Gated BY NAME (cannot be verified offline without libwebp):

- the 120-entry short-distance neighborhood map (``dist_code ≤ 120``)
  — a from-memory table could silently corrupt pixels, so it raises;
  the fixture writer only emits plain distances;
- color-indexing transform (palette + pixel bundling);
- lossy ``VP8 `` and the ``VP8X`` extended container.

The writer/decoder pair is roundtrip-verified (decode(encode(px)) ==
px exactly) including forward+inverse subtract-green and predictor
transforms, two-symbol simple codes, 8-bit complete normal codes,
color-cache hits and plain-distance LZ77 runs — self-consistent by
construction, like the repo's other writer/decoder codec pairs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp_pixels", "make_simple_webp"]

# code-length-code symbol order (spec §"Normal Code Length Code")
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MUL = 0x1E35A7BD


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v


class _Huffman:
    """Canonical prefix code: decode bit-by-bit MSB-first."""

    __slots__ = ("single", "table")

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        # canonical assignment: sort by (length, symbol)
        nz.sort()
        code = 0
        prev_len = nz[0][0]
        table: dict[tuple[int, int], int] = {}
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        if code != (1 << prev_len):
            raise ValueError("prefix code is not complete")
        self.table = table

    @classmethod
    def simple(cls, symbols: list[int]) -> "_Huffman":
        h = cls.__new__(cls)
        if len(symbols) == 1:
            h.single = symbols[0]
            h.table = None
        else:
            h.single = None
            h.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return h

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("prefix code desynchronized")


def _read_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    """One prefix code: simple (1-2 symbols) or normal (code-length
    code + repeats 16/17/18)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _Huffman.simple(syms)
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huffman(clc_lengths)
    # optional max-symbol field
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbols = 2 + br.read(length_nbits)
    else:
        max_symbols = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size and max_symbols > 0:
        max_symbols -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_nz = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_nz
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huffman(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decode (spec: codes 0-3 literal,
    then (2 + (code & 1)) << extra with extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, is_main: bool
) -> np.ndarray:
    """One VP8L entropy-coded ARGB image → (h, w) uint32."""
    cache_bits = 0
    cache = None
    if br.read(1):  # color cache
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_main and br.read(1):  # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        # meta code index = (red << 8) | green
        meta = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_code(br, green_alpha),  # green+len+cache
                _read_code(br, 256),  # red
                _read_code(br, 256),  # blue
                _read_code(br, 256),  # alpha
                _read_code(br, 40),  # distance
            )
        )

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    n = w * h

    def cache_insert(argb: int) -> None:
        if cache is not None:
            cache[(_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        green_c, red_c, blue_c, alpha_c, dist_c = g
        s = green_c.read(br)
        if s < 256:
            red = red_c.read(br)
            blue = blue_c.read(br)
            alpha = alpha_c.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            cache_insert(argb)
            pos += 1
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dist_c.read(br), br)
            if dist_code <= 120:
                raise NotImplementedError(
                    "VP8L short-distance neighborhood map (dist_code "
                    f"{dist_code} <= 120) is not decoded offline — the "
                    "120-entry table cannot be verified without libwebp"
                )
            dist = dist_code - 120
            if dist > pos:
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                cache_insert(argb)
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache reference without a color cache")
            out[pos] = cache[s - 280]
            pos += 1
    return out.reshape(h, w)


def _avg2(a: np.uint32, b: np.uint32) -> int:
    a, b = int(a), int(b)
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) // 2)
    )


def _select(l: int, t: int, tl: int) -> int:
    p_alpha = ((l >> 24) & 0xFF) + ((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    p_red = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - ((l >> 24) & 0xFF))
        + abs(p_red - ((l >> 16) & 0xFF))
        + abs(p_green - ((l >> 8) & 0xFF))
        + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - ((t >> 24) & 0xFF))
        + abs(p_red - ((t >> 16) & 0xFF))
        + abs(p_green - ((t >> 8) & 0xFF))
        + abs(p_blue - (t & 0xFF))
    )
    return l if pl < pt else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _casf(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= _clamp(
            ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        ) << shift
    return out


def _cash(l: int, t: int, tl: int) -> int:
    ave = _avg2(np.uint32(l), np.uint32(t))
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        c = (tl >> shift) & 0xFF
        # spec's C `(a - c) / 2` truncates toward zero — Python's floor
        # division differs for negative odd deltas (ADVICE r12)
        d = a - c
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << shift
    return out


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(np.uint32(_avg2(np.uint32(l), np.uint32(tr))), np.uint32(t))
    if mode == 6:
        return _avg2(np.uint32(l), np.uint32(tl))
    if mode == 7:
        return _avg2(np.uint32(l), np.uint32(t))
    if mode == 8:
        return _avg2(np.uint32(tl), np.uint32(t))
    if mode == 9:
        return _avg2(np.uint32(t), np.uint32(tr))
    if mode == 10:
        return _avg2(
            np.uint32(_avg2(np.uint32(l), np.uint32(tl))),
            np.uint32(_avg2(np.uint32(t), np.uint32(tr))),
        )
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _casf(l, t, tl)
    return _cash(l, t, tl)


def _inv_predictor(argb: np.ndarray, pred_img: np.ndarray, bits: int) -> None:
    """In-place inverse predictor transform: add the block's predictor
    to each residual, pixel by pixel in scan order (mode forced to
    BLACK at (0,0), L on the top row, T on the left column)."""
    h, w = argb.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[0, x - 1])  # L
            elif x == 0:
                pred = int(argb[y - 1, 0])  # T
            else:
                mode = int((pred_img[y >> bits, x >> bits] >> 8) & 0xFF)
                l = int(argb[y, x - 1])
                t = int(argb[y - 1, x])
                tl = int(argb[y - 1, x - 1])
                # rightmost column: TR is the leftmost pixel of the SAME
                # row — (0, y) is already reconstructed in scan order
                # (spec rule; ADVICE r12 — was previous row's leftmost)
                tr = int(argb[y - 1, x + 1]) if x + 1 < w else int(argb[y, 0])
                pred = _predict(mode, l, t, tl, tr)
            v = int(argb[y, x])
            out = 0
            for shift in (24, 16, 8, 0):
                out |= (((v >> shift) + (pred >> shift)) & 0xFF) << shift
            argb[y, x] = out


def _ct_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 — the color-transform multiplier."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _inv_color_transform(
    argb: np.ndarray, ct_img: np.ndarray, bits: int
) -> None:
    """In-place inverse color transform (spec: green_to_red in the
    blue channel, green_to_blue in green, red_to_blue in red of each
    transform pixel)."""
    h, w = argb.shape
    for y in range(h):
        for x in range(w):
            cte = int(ct_img[y >> bits, x >> bits])
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            v = int(argb[y, x])
            green = (v >> 8) & 0xFF
            red = (v >> 16) & 0xFF
            blue = v & 0xFF
            red = (red + _ct_delta(g2r, green)) & 0xFF
            blue = (blue + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
            argb[y, x] = (v & 0xFF00FF00) | (red << 16) | blue


def decode_webp_pixels(data: bytes) -> np.ndarray:
    """WebP VP8L → (h, w, 3) uint8 RGB (alpha dropped after decode).
    Lossy ``VP8 `` / extended ``VP8X`` and the gated VP8L features
    raise by name."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (missing RIFF/WEBP signature)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if fourcc == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs a real DCT codec (absent here); "
                "only VP8L lossless decodes"
            )
        if fourcc == b"VP8X":
            raise NotImplementedError(
                "extended WebP container (VP8X: animation/EXIF/alpha "
                "chunks) is not decoded offline"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP without a VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L version {version} != 0")

    # transforms (main image only), applied inversely in reverse order
    transforms: list[tuple] = []
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        elif ttype == 0:  # predictor
            bits = br.read(3) + 2
            pw = (cur_w + (1 << bits) - 1) >> bits
            ph = (h + (1 << bits) - 1) >> bits
            pred_img = _decode_entropy_image(br, pw, ph, False)
            transforms.append(("predictor", bits, pred_img))
        elif ttype == 1:  # color transform
            bits = br.read(3) + 2
            pw = (cur_w + (1 << bits) - 1) >> bits
            ph = (h + (1 << bits) - 1) >> bits
            ct_img = _decode_entropy_image(br, pw, ph, False)
            transforms.append(("color", bits, ct_img))
        else:
            raise NotImplementedError(
                "VP8L color-indexing transform (palette + pixel "
                "bundling) is not decoded offline"
            )

    argb = _decode_entropy_image(br, cur_w, h, True)
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            green = (argb >> 8) & 0xFF
            red = (((argb >> 16) & 0xFF) + green) & 0xFF
            blue = ((argb & 0xFF) + green) & 0xFF
            argb = (argb & 0xFF00FF00) | (red << 16) | blue
        elif t[0] == "predictor":
            _inv_predictor(argb, t[2], t[1])
        else:
            _inv_color_transform(argb, t[2], t[1])

    out = np.zeros((h, w, 3), np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    return out


# ------------------------------------------------------------------ writer
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.out.append(0)
            if (v >> i) & 1:
                self.out[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, n: int) -> None:
        """Prefix-code bits: decoder consumes MSB of the code first."""
        for i in range(n - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _write_simple_code(bw: _BitWriter, symbols: list[int]) -> dict:
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    s0 = symbols[0]
    if s0 > 1:
        bw.write(1, 1)
        bw.write(s0, 8)
    else:
        bw.write(0, 1)
        bw.write(s0, 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)
        return {symbols[0]: (0, 1), symbols[1]: (1, 1)}
    return {symbols[0]: (0, 0)}


def _write_flat8_code(bw: _BitWriter, alphabet_size: int) -> dict:
    """Normal code: the 256-symbol complete code (every byte at length
    8, code == symbol); trailing alphabet symbols get length 0."""
    bw.write(0, 1)  # normal
    # code-length code: symbols {0, 8} at length 1 each. The order
    # array puts 0 at index 2 and 8 at index 11 → need 12 entries.
    bw.write(12 - 4, 4)
    clc = {0: 1, 8: 1}
    for i in range(12):
        bw.write(clc.get(_CLC_ORDER[i], 0), 3)
    bw.write(0, 1)  # no max-symbol field
    # clc canonical: symbol 0 → code 0, symbol 8 → code 1 (len 1 each)
    for sym in range(alphabet_size):
        bw.write_code(1 if sym < 256 else 0, 1)
    return {s: (s, 8) for s in range(256)}


def _emit_code(bw: _BitWriter, table: dict, sym: int) -> None:
    code, ln = table[sym]
    bw.write_code(code, ln)


def _write_1x1_entropy_image(bw: _BitWriter, argb: int) -> None:
    """A 1×1 sub-image (transform data) as five single-symbol simple
    codes + a zero-bit pixel."""
    bw.write(0, 1)  # no color cache
    _write_simple_code(bw, [(argb >> 8) & 0xFF])  # green
    _write_simple_code(bw, [(argb >> 16) & 0xFF])  # red
    _write_simple_code(bw, [argb & 0xFF])  # blue
    _write_simple_code(bw, [(argb >> 24) & 0xFF])  # alpha
    _write_simple_code(bw, [0])  # distance (unused)


def make_simple_webp(
    pixels: np.ndarray,
    subtract_green: bool = False,
    use_cache_bits: int = 0,
    lz77_runs: bool = False,
    predictor_mode: int | None = None,
    color_cte: tuple[int, int, int] | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → VP8L lossless WebP. Channels with ≤ 2
    distinct values use two-symbol simple codes, others the flat
    complete 8-bit normal code; ``subtract_green`` applies the forward
    transform (decoder inverts it), ``use_cache_bits`` enables the
    color cache and emits cache references for repeated colors,
    ``lz77_runs`` emits plain-distance backward references for
    horizontal runs. ``predictor_mode`` (0-13) writes a whole-image
    single-block predictor transform (residuals against the decoder's
    reconstruction scan, border rules included); ``color_cte`` =
    (green_to_red, green_to_blue, red_to_blue) writes a single-block
    color transform. Exact roundtrip: decode(encode(px)) == px."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    r = px[..., 0].astype(np.int32)
    g = px[..., 1].astype(np.int32)
    b = px[..., 2].astype(np.int32)
    a = np.full((h, w), 255, dtype=np.int32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    if color_cte is not None:
        g2r, g2b, r2b = color_cte
        orig_r = r.copy()
        r = (r - np.vectorize(_ct_delta)(g2r, g)) & 0xFF
        b = (
            b
            - np.vectorize(_ct_delta)(g2b, g)
            - np.vectorize(_ct_delta)(r2b, orig_r)
        ) & 0xFF
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor_mode must be 0..13")
        # residuals against the decoder's reconstruction: neighbors are
        # the RECONSTRUCTED (= original post-prior-transform) pixels
        recon = (
            (a.astype(np.uint32) << 24)
            | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8)
            | b.astype(np.uint32)
        )
        res = np.zeros_like(recon)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(recon[0, x - 1])
                elif x == 0:
                    pred = int(recon[y - 1, 0])
                else:
                    l_ = int(recon[y, x - 1])
                    t_ = int(recon[y - 1, x])
                    tl = int(recon[y - 1, x - 1])
                    # mirror of the decoder's rightmost-column TR rule:
                    # leftmost pixel of the SAME row (ADVICE r12)
                    tr = (
                        int(recon[y - 1, x + 1])
                        if x + 1 < w
                        else int(recon[y, 0])
                    )
                    pred = _predict(predictor_mode, l_, t_, tl, tr)
                v = int(recon[y, x])
                out = 0
                for shift in (24, 16, 8, 0):
                    out |= (((v >> shift) - (pred >> shift)) & 0xFF) << shift
                res[y, x] = out
        a = ((res >> 24) & 0xFF).astype(np.int32)
        r = ((res >> 16) & 0xFF).astype(np.int32)
        g = ((res >> 8) & 0xFF).astype(np.int32)
        b = (res & 0xFF).astype(np.int32)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    # transforms in the order the writer APPLIED them (the decoder
    # inverts in reverse read order, undoing the last-applied first)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
    if color_cte is not None:
        g2r, g2b, r2b = color_cte
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR_TRANSFORM
        size_bits = max(2, max(w, h).bit_length())  # one block covers all
        bw.write(size_bits - 2, 3)
        _write_1x1_entropy_image(
            bw, (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        )
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR_TRANSFORM
        size_bits = max(2, max(w, h).bit_length())
        bw.write(size_bits - 2, 3)
        _write_1x1_entropy_image(
            bw, (0xFF << 24) | (predictor_mode << 8)
        )
    bw.write(0, 1)  # no more transforms

    cache = None
    if use_cache_bits:
        bw.write(1, 1)
        bw.write(use_cache_bits, 4)
        cache = [None] * (1 << use_cache_bits)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix codes

    cache_syms = (1 << use_cache_bits) if use_cache_bits else 0
    green_alpha = 256 + 24 + cache_syms

    if use_cache_bits > 7:
        raise ValueError(
            "use_cache_bits > 7 overflows the writer's two-length "
            "green code (decoder supports up to 11)"
        )
    flat = np.stack([g, r, b, a], axis=0).reshape(4, -1)
    tables = []
    # green code carries literals + length codes + cache refs; use a
    # complete two-length normal code whenever any non-literal symbol
    # is needed: x symbols at 8 bits + y at 9 with x = 512 − A,
    # y = 2A − 512 (Kraft sum x/256 + y/512 = 1 for 256 ≤ A ≤ 512)
    g_vals = sorted(set(int(v) for v in flat[0]))
    needs_big_green = lz77_runs or use_cache_bits or len(g_vals) > 2
    if needs_big_green:
        A = green_alpha
        x = 512 - A
        bw.write(0, 1)  # normal
        # clc must reach symbol 9 → order index 12 → 13 entries
        bw.write(13 - 4, 4)
        clc = {8: 1, 9: 1}
        for i in range(13):
            bw.write(clc.get(_CLC_ORDER[i], 0), 3)
        bw.write(0, 1)  # no max-symbol field
        # clc canonical over {8:1, 9:1}: 8→'0', 9→'1'
        gtable = {}
        for sym in range(A):
            if sym < x:
                bw.write_code(0, 1)  # length 8
                gtable[sym] = (sym, 8)
            else:
                bw.write_code(1, 1)  # length 9
                gtable[sym] = (2 * x + (sym - x), 9)
        tables.append(gtable)
    else:
        tables.append(_write_simple_code(bw, g_vals))
    for ch in (1, 2, 3):  # red, blue, alpha
        vals = sorted(set(int(v) for v in flat[ch]))
        if len(vals) <= 2:
            tables.append(_write_simple_code(bw, vals))
        else:
            tables.append(_write_flat8_code(bw, 256))
    # distance code: prefix SYMBOL 13 maps to dist_code 121 (= plain
    # distance 1) with 5 extra bits of value 24 — the only distance
    # the run emitter uses; unused otherwise but a code must exist
    tables.append(_write_simple_code(bw, [13]))
    gtab, rtab, btab, atab, dtab = tables

    argb_flat = (
        (a.reshape(-1) << 24)
        | (r.reshape(-1) << 16)
        | (g.reshape(-1) << 8)
        | b.reshape(-1)
    )
    n = w * h
    i = 0
    while i < n:
        argb = int(argb_flat[i])
        if cache is not None:
            key = (_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - use_cache_bits)
            if cache[key] == argb:
                _emit_code(bw, gtab, 280 + key)
                i += 1
                continue
        if lz77_runs and i > 0 and argb == int(argb_flat[i - 1]):
            # length prefix codes 0-3 mean lengths 1-4, no extra bits;
            # distance prefix symbol 13: extra=(13-2)>>1=5,
            # offset=(2+1)<<5=96, value=96+extra_bits+1 → 121 at
            # extra_bits=24 → plain distance 121-120 = 1
            run = 1
            while i + run < n and int(argb_flat[i + run]) == argb and run < 4:
                run += 1
            _emit_code(bw, gtab, 256 + (run - 1))
            _emit_code(bw, dtab, 13)
            bw.write(24, 5)  # → dist_code 121 → dist 1
            if cache is not None:
                key = (_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - use_cache_bits)
                cache[key] = argb
            i += run
            continue
        green = (argb >> 8) & 0xFF
        _emit_code(bw, gtab, green)
        _emit_code(bw, rtab, (argb >> 16) & 0xFF)
        _emit_code(bw, btab, argb & 0xFF)
        _emit_code(bw, atab, (argb >> 24) & 0xFF)
        if cache is not None:
            key = (_HASH_MUL * argb & 0xFFFFFFFF) >> (32 - use_cache_bits)
            cache[key] = argb
        i += 1

    payload = bytes([0x2F]) + bytes(bw.out)
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
