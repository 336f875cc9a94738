"""FLAC codec (subset) — pure stdlib/numpy, from the public FLAC
specification (RFC 9639; audio-format breadth of the reference's media
claims, 01_pdf_to_vector.sql:196-205).

Decode: stream marker + STREAMINFO, frame sync walk (fixed blocking),
frame-header CRC-8 and frame CRC-16 VERIFIED, UTF-8-style coded frame
numbers, block-size/sample-rate/sample-size codes, independent and
left-side/right-side/mid-side stereo decorrelation, subframe types
CONSTANT / VERBATIM / FIXED (orders 0–4) with wasted-bits shift, and
Rice-coded residuals (both 4- and 5-bit parameter methods, partition
orders, raw-bits escape), and LPC subframes (orders 1–32, quantized
coefficients + arithmetic-shift prediction, RFC 9639 §9.2.5) — the full
subframe family real encoders emit.

The matching :func:`make_simple_flac` writer (fixed predictor order
chosen per frame by residual magnitude, single Rice partition; pass
``lpc_order`` for Levinson–Durbin LPC subframes with the real mode
decision) gives EXACT lossless round-trips — `decode(encode(pcm)) ==
pcm` bit-for-bit — so the test anchor is self-contained like the
BMP/PNG/GIF/TIFF pairs.
"""

from __future__ import annotations

import struct

import numpy as np

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
# fixed-predictor coefficients per order (RFC 9639 §9.2.2)
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_coded_number(br: _Bits) -> int:
    """UTF-8-style frame/sample number (RFC 9639 §9.1.5)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _read_residual(br: _Bits, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    out: list[int] = []
    for p in range(nparts):
        count = (block_size >> part_order) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:  # raw n-bit residuals
            nbits = br.read(5)
            for _ in range(count):
                out.append(br.read_signed(nbits) if nbits else 0)
        else:
            for _ in range(count):
                q = br.read_unary()
                r = br.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # un-zigzag
    return out


def _decode_subframe(br: _Bits, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    typ = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if typ == 0:  # CONSTANT
        v = br.read_signed(eff)
        out = [v] * block_size
    elif typ == 1:  # VERBATIM
        out = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= typ <= 12:  # FIXED, order 0-4
        order = typ - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        out = list(warm)
        for i, e in enumerate(res):
            pred = sum(c * out[order + i - j - 1] for j, c in enumerate(coefs))
            out.append(pred + e)
    elif typ >= 32:  # LPC, order 1-32 (RFC 9639 §9.2.5)
        order = (typ & 31) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("FLAC invalid LPC coefficient precision 15")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        out = list(warm)
        for e in res:
            # arithmetic right shift of the signed accumulator — Python's
            # >> on negative ints is exactly that
            pred = sum(c * out[-j - 1] for j, c in enumerate(coefs)) >> shift
            out.append(pred + e)
    else:
        raise ValueError(f"FLAC reserved subframe type {typ}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def flac_bps(data: bytes) -> int:
    """Bits per sample from the STREAMINFO block (RFC 9639 §8.2) —
    the declared width (8..32), without decoding any audio frames.
    Consumers that square samples (the X57 L2 envelope) use this to
    pick a deterministic right-shift to the 16-bit range."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    while True:
        hdr = data[pos]
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if hdr & 0x7F == 0:
            return (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
        pos += 4 + ln
        if hdr & 0x80:
            raise ValueError("FLAC stream without STREAMINFO")


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, (n_samples, n_channels) int32 array) from a FLAC
    stream (fixed-predictor subset; LPC raises by name)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC marker)")
    pos = 4
    info = None
    while True:  # metadata blocks
        hdr = data[pos]
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if hdr & 0x7F == 0:  # STREAMINFO
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            nch = ((body[12] >> 1) & 0x07) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            total = ((body[13] & 0x0F) << 32) | struct.unpack(
                ">I", body[14:18]
            )[0]
            info = (sr, nch, bps, total)
        pos += 4 + ln
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream without STREAMINFO")
    sr0, nch0, bps0, total = info

    channels: list[list[int]] = [[] for _ in range(nch0)]
    while pos < len(data) - 1:
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("FLAC lost frame sync")
        frame_at = pos
        br = _Bits(data, pos)
        br.read(14)  # sync
        br.read(1)  # reserved
        if br.read(1):
            raise NotImplementedError("FLAC variable block-size streams")
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        br.read(1)  # reserved
        _read_coded_number(br)
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = bps0 if ss_code == 0 else _SAMPLE_SIZES[ss_code]
        hdr_end = br.byte
        if _crc8(data[frame_at:hdr_end]) != br.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_decode_subframe(br, block_size, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            # stereo decorrelation: the difference channel carries one
            # extra bit (RFC 9639 §9.2.1)
            a_bits = bps + (1 if ch_code == 9 else 0)
            b_bits = bps + (0 if ch_code == 9 else 1)
            a = _decode_subframe(br, block_size, a_bits)
            b = _decode_subframe(br, block_size, b_bits)
            if ch_code == 8:  # left/side
                subs = [a, [l - s for l, s in zip(a, b)]]
            elif ch_code == 9:  # right/side
                subs = [[r + s for s, r in zip(a, b)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    mm = (m << 1) | (s & 1)
                    left.append((mm + s) >> 1)
                    right.append((mm - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError(f"FLAC reserved channel assignment {ch_code}")
        br.align()
        if _crc16(data[frame_at : br.byte]) != br.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c, s in zip(channels, subs):
            c.extend(s)
        pos = br.byte
    out = np.array(channels, dtype=np.int64).T
    if total:
        out = out[:total]
    return sr0, out.astype(np.int32)


# ---------------------------------------------------------------- encoder


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.n:
            self.write(0, 1)


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(v) for v in res) / len(res) + 1
    p = 0
    while (1 << p) < mean and p < 14:
        p += 1
    return p


def _lpc_quantized(ch: list[int], order: int, prec: int = 14,
                   shift: int = 12) -> list[int] | None:
    """Levinson–Durbin LPC fit quantized to ``prec``-bit integers at
    2^shift scale; None when the signal has no energy (constant blocks —
    the fixed path handles those better anyway). Model quality only
    affects SIZE: the residual is computed with the decoder's exact
    integer arithmetic, so any coefficient set round-trips losslessly."""
    x = np.asarray(ch, dtype=np.float64)
    n = len(x)
    if n <= order:
        return None
    ac = [float(x @ x)]
    if ac[0] == 0.0:
        return None
    for k in range(1, order + 1):
        ac.append(float(x[:-k] @ x[k:]))
    err = ac[0]
    a: list[float] = []
    for i in range(order):
        if err <= 0:
            return None
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        k = acc / err
        a = [aj - k * ar for aj, ar in zip(a, reversed(a))] + [k]
        err *= 1.0 - k * k
    lim = 1 << (prec - 1)
    return [max(-lim, min(lim - 1, round(c * (1 << shift)))) for c in a]


def make_simple_flac(
    samples: np.ndarray, sample_rate: int = 16000, block_size: int = 4096,
    lpc_order: int = 0, bps: int = 16, tags: dict | None = None,
) -> bytes:
    """PCM → FLAC (fixed blocking, independent channels, per-frame
    fixed-predictor order 0–2 chosen by residual magnitude, one Rice
    partition). ``samples``: (n,) or (n, channels) ints within ``bps``
    bits (16 default; 8/12/20/24/32 allowed — the widths a frame
    header can code directly, RFC 9639 §9.1.4). Lossless:
    ``decode_flac(make_simple_flac(x))[1] == x`` exactly.

    ``lpc_order > 0`` writes LPC subframes instead (order capped by the
    block) wherever the quantized Levinson–Durbin fit beats the best
    fixed predictor's residual cost — the real codec's mode decision,
    and the encoder twin of the LPC decode path. ``tags`` (r13) adds a
    VORBIS_COMMENT metadata block (canonical keys, the
    :func:`~.ogg.flac_tags` reader's input) after STREAMINFO."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    ss_codes = {v: k for k, v in _SAMPLE_SIZES.items()}  # width -> code
    if bps not in ss_codes:
        raise ValueError(
            f"bps must be one of {sorted(ss_codes)} (got {bps})")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if n and (int(x.min()) < lo or int(x.max()) > hi):
        raise ValueError(f"samples exceed the {bps}-bit range")

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes([
        (sample_rate >> 12) & 0xFF, (sample_rate >> 4) & 0xFF,
        ((sample_rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
        (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F),
    ])
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += b"\x00" * 16  # MD5 unknown
    last_si = 0x80 if not tags else 0x00
    out += bytes([last_si]) + struct.pack(">I", len(si))[1:] + si
    if tags:
        from oracle_vectorsearch_example_spark.functions.mp3 import (
            _TAG_ORDER,
        )
        from oracle_vectorsearch_example_spark.functions.ogg import _VC_KEYS

        rev = {v: k for k, v in _VC_KEYS.items()}
        vendor = b"oves-fixture"
        vc = struct.pack("<I", len(vendor)) + vendor
        items = [
            f"{rev[k]}={tags[k]}".encode("utf-8")
            for k in _TAG_ORDER if k in tags
        ]
        vc += struct.pack("<I", len(items))
        for it in items:
            vc += struct.pack("<I", len(it)) + it
        out += bytes([0x84]) + struct.pack(">I", len(vc))[1:] + vc

    for fno, start in enumerate(range(0, n, block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        bw = _BitW()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit value follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(nch - 1, 4)  # independent channels
        bw.write(ss_codes[bps], 3)  # sample size code (4 = 16-bit)
        bw.write(0, 1)  # reserved
        # coded frame number (UTF-8 style)
        if fno < 0x80:
            bw.write(fno, 8)
        elif fno < 0x800:
            bw.write(0xC0 | (fno >> 6), 8)
            bw.write(0x80 | (fno & 0x3F), 8)
        else:
            bw.write(0xE0 | (fno >> 12), 8)
            bw.write(0x80 | ((fno >> 6) & 0x3F), 8)
            bw.write(0x80 | (fno & 0x3F), 8)
        bw.write(bs - 1, 16)
        hdr = bytes(bw.out)  # bit-aligned here by construction
        bw.write(_crc8(hdr), 8)
        for c in range(nch):
            ch = blk[:, c].tolist()
            # pick the fixed order 0-2 with the smallest |residual| sum
            best_order, best_res, best_cost = 0, ch, sum(abs(v) for v in ch)
            for order in (1, 2):
                if bs <= order:
                    break
                coefs = _FIXED_COEFS[order]
                res = [
                    ch[i] - sum(c0 * ch[i - j - 1] for j, c0 in enumerate(coefs))
                    for i in range(order, bs)
                ]
                cost = sum(abs(v) for v in res)
                if cost < best_cost:
                    best_order, best_res, best_cost = order, res, cost
            order = best_order
            res = best_res if order else ch[0:]
            if order == 0:
                res = ch
            lpc = None
            if lpc_order > 0:
                o = min(lpc_order, 32, bs - 1)
                q = _lpc_quantized(ch, o) if o >= 1 else None
                if q:
                    shift = 12
                    lres = [
                        ch[i]
                        - (sum(q[j] * ch[i - j - 1] for j in range(o)) >> shift)
                        for i in range(o, bs)
                    ]
                    if sum(abs(v) for v in lres) < best_cost:
                        lpc, res, order = (q, shift), lres, o
            bw.write(0, 1)
            if lpc:
                bw.write(32 | (order - 1), 6)  # LPC subframe, given order
            else:
                bw.write(8 + order, 6)  # FIXED subframe, given order
            bw.write(0, 1)  # no wasted bits
            for i in range(order):  # warm-up samples: bps bits each
                bw.write(ch[i] & ((1 << bps) - 1), bps)
            if lpc:
                q, shift = lpc
                prec = 14
                bw.write(prec - 1, 4)
                bw.write(shift, 5)
                for c0 in q:
                    bw.write(c0 & ((1 << prec) - 1), prec)
            bw.write(0, 2)  # rice method: 4-bit params
            bw.write(0, 4)  # partition order 0
            p = _rice_param(res)
            bw.write(p, 4)
            for e in res:
                zz = (e << 1) ^ (e >> 63)  # zigzag (arithmetic shift)
                bw.write_unary(zz >> p)
                if p:
                    bw.write(zz & ((1 << p) - 1), p)
        bw.align()
        frame = bytes(bw.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
