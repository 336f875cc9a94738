"""Audio fingerprinting + perceptual audio dedup (X57, r10) — the
audio sibling of the X55 pHash pipeline, closing the multimodal dedup
story (text: MinHash/SimHash/ExactSubstr; images: pHash; audio: this).

The fingerprint is a 63-bit energy-envelope delta-sign hash — the
band-energy-difference idea of Haitsma & Kalker 2002 ("A Highly Robust
Audio Fingerprinting System", ISMIR) collapsed to one band and frozen
as INTEGER math so the entire hash replays relationally in any SQL
engine (the image_phash discipline):

- mono signal = channel 0 of the decoded PCM (int samples);
- 64 equal frames by floor boundaries: s_k = floor(k·n/64), frame k =
  positions s_k..s_{k+1}−1 (n ≥ 64 required — shorter clips carry no
  evidence and hash NULL);
- e_k = Σ |x| over frame k (exact int64 — L1 envelope, no floats);
- bit_k = 1 iff e_{k+1} > e_k (k = 0..62) — the delta-sign code.
  Strict ``>`` makes the code invariant under positive amplitude
  scaling (volume changes preserve energy ORDER) and robust to small
  noise, while cuts/pads/re-encodes move few bits;
- afp = Σ bit_k·2^k — a non-negative 63-bit BIGINT, so hamming is one
  XOR+bit_count exactly like pHash.

Near-dup machinery is SHARED with images: the banding functions in
:mod:`..functions.phash` are hash-generic (any 63-bit signature), so
``dedup_audio`` composes ``afp_df`` → ``phash_neardup_pairs`` →
component closure, and the Manku ``n_blocks`` knob applies unchanged.

Three pinned-equal implementations, mirroring pHash: ``afp_expr``
(normative pure column exprs over an int-array column — the golden
spec), ``afp_from_samples`` (numpy), ``afp_df`` (decode WAV/FLAC via
the X4 real codecs → hash, Arrow-batched, on_error='null').
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "afp_expr",
    "afp_from_samples",
    "afp_df",
    "dual_code_pairs",
    "dedup_audio",
]

N_FRAMES = 64

# 2^k literals (k = 0..62): F.shiftleft needs a Python-int shift and
# 1 << 63 overflows a long lit, so bits pack via an element_at lookup
_POW2 = [1 << k for k in range(N_FRAMES - 1)]


def afp_expr(pcm: Column, energy: str = "l1") -> Column:
    """63-bit fingerprint of an ``array<long>`` PCM column — the
    normative frozen spec as pure column exprs (map-side, no
    UDF). NULL for arrays shorter than 64 samples.

    ``energy`` picks the frame statistic: ``'l1'`` (Σ|x|, the golden
    spec) or ``'l2'`` (Σx², r11) — the SECOND code of the dual-code
    dedup (Haitsma & Kalker's actual system hashes many bands; with
    no FFT offline, the L2 envelope is the second independent view:
    same frames, different nonlinearity, so cross-class L1-order
    collisions rarely survive in L2 order). The L2 path REQUIRES
    samples in the 16-bit range (|x| ≤ 2¹⁵ ⇒ x² ≤ 2³⁰; frames of
    < 2³³ samples cannot overflow int64) — that is a caller
    precondition, not a property of every decoder: FLAC STREAMINFO
    admits 20/24/32-bit samples (flac.py ``_SAMPLE_SIZES``), whose
    squares can wrap int64 (and would raise under ANSI-mode Spark).
    :func:`afp_df` enforces it by right-shifting wider decodes by
    ``bps − 16`` before the L2 code (deterministic, order-preserving
    up to floor); :func:`afp_from_samples` raises loudly instead of
    wrapping. The L1 path needs no shift: Σ|x| ≤ n·2³¹ stays exact
    for any real clip.

    Expression shape (the select_winnow lesson, re-learned here the
    hard way): each sub-expression embeds exactly ONCE. Frame
    boundaries are inlined arithmetic (floor(k·n/64) — no staged
    boundary array for element_at to re-expand), and the bit packing
    is one FOLD OVER THE ENERGIES ARRAY carrying (idx, prev, hash) —
    an element_at(energies, k) per bit would inline the whole O(n)
    energies transform 126×, which measured minutes-per-200-rows
    interpreted."""
    if energy not in ("l1", "l2"):
        raise ValueError("energy must be 'l1' or 'l2'")
    stat = (
        (lambda acc, x: acc + F.abs(x))
        if energy == "l1"
        else (lambda acc, x: acc + x * x)
    )
    n = F.size(pcm)
    energies = F.transform(
        F.sequence(F.lit(0), F.lit(N_FRAMES - 1)),
        lambda k: F.aggregate(
            F.slice(
                pcm,
                (F.floor(k.cast("long") * n / F.lit(64)) + 1).cast("int"),
                (
                    F.floor((k.cast("long") + 1) * n / F.lit(64))
                    - F.floor(k.cast("long") * n / F.lit(64))
                ).cast("int"),
            ),
            F.lit(0).cast("long"),
            stat,
        ),
    )
    pow2 = F.array(*[F.lit(v).cast("long") for v in _POW2])
    init = F.struct(
        F.lit(0).alias("idx"),
        F.lit(0).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("hash"),
    )
    packed = F.aggregate(
        energies,
        init,
        lambda acc, e: F.struct(
            (acc["idx"] + 1).alias("idx"),
            e.alias("prev"),
            (
                acc["hash"]
                + F.when(
                    (acc["idx"] >= 1) & (e > acc["prev"]),
                    F.element_at(pow2, acc["idx"]),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("hash"),
        ),
        lambda acc: acc["hash"],
    )
    return F.when(n >= N_FRAMES, packed)


def afp_from_samples(samples, energy: str = "l1") -> int | None:
    """numpy reference of :func:`afp_expr` (pinned equal in pytest):
    (n,) or (n, channels) int array — channel 0, same floor-boundary
    frames, L1 (or ``energy='l2'``) energies, delta-sign bits. The L2
    path raises on samples outside the 16-bit range instead of silently
    wrapping int64 (right-shift wider decodes by ``bps − 16`` first —
    :func:`afp_df` does)."""
    import numpy as np

    if energy not in ("l1", "l2"):
        raise ValueError("energy must be 'l1' or 'l2'")
    x = np.asarray(samples)
    if x.ndim == 2:
        x = x[:, 0]
    n = len(x)
    if n < N_FRAMES:
        return None
    a = np.abs(x.astype(np.int64))
    if energy == "l2":
        if n and int(a.max()) > (1 << 15):
            raise ValueError(
                "l2 energy requires samples within the 16-bit range "
                f"(max |x| = {int(a.max())}): right-shift wider decodes "
                "by bps-16 before fingerprinting (afp_df does this); "
                "x*x would otherwise wrap int64"
            )
        a = a * a
    bounds = [(k * n) // N_FRAMES for k in range(N_FRAMES + 1)]
    e = np.add.reduceat(a, bounds[:-1])
    h = 0
    for k in range(N_FRAMES - 1):
        if e[k + 1] > e[k]:
            h |= 1 << k
    return int(h)


def _decode_pcm(data: bytes):
    """((n_samples, channels) int array, bits_per_sample) from WAV
    (stdlib), FLAC (the X4 real decoder), AIFF (big-endian PCM) or
    Sun AU (PCM / G.711 µ-law / A-law), magic-dispatched — raw
    samples, not stats. ``bps`` is the container-declared width (WAV:
    PCM8 unsigned-centered / 16 / packed s24 / s32, r12; FLAC:
    STREAMINFO, 8..32; AIFF COMM 8/16/24/32; AU encodings 1-5, 27)
    so the L2 envelope can right-shift wide samples
    deterministically."""
    import io as _io
    import wave as _wave

    import numpy as np

    data = bytes(data)
    if data[:4] == b"fLaC":
        from oracle_vectorsearch_example_spark.functions.flac import (
            decode_flac,
            flac_bps,
        )

        _, pcm = decode_flac(data)
        return pcm, flac_bps(data)
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return _decode_aiff(data)
    if data[:4] == b".snd":
        return _decode_au(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        # the audio TRACK of a video container (r12): dedup_audio over
        # AVI soundtracks with no extra wiring
        from oracle_vectorsearch_example_spark.functions.avi import (
            avi_audio_pcm,
        )

        return avi_audio_pcm(data)
    if len(data) >= 12 and data[4:8] in (
        b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot",
    ):
        from oracle_vectorsearch_example_spark.functions.mov import (
            mov_audio_pcm,
        )

        return mov_audio_pcm(data)
    if data[:3] == b"ID3" or (
        len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
    ):
        # named gate (r13): Layer III PCM needs the ISO-tabulated
        # Huffman tables + 512-tap synthesis window, absent in this
        # no-egress container and not formula-derivable; the codec-
        # domain evidence path is functions.mp3.dedup_mp3 (gain
        # envelope from side info — no PCM required)
        raise NotImplementedError(
            "MPEG audio (MP3) PCM decode needs the ISO Huffman/synthesis"
            "-window tables, absent here; use functions.mp3.dedup_mp3 / "
            "mp3_gain_code_df for codec-domain dedup evidence"
        )
    with _wave.open(_io.BytesIO(data), "rb") as w:
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    if width == 2:
        return np.frombuffer(raw, dtype="<i2").reshape(-1, nch), 16
    if width == 1:  # PCM8 WAV is UNSIGNED (RIFF spec) → center at 0
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        return x.reshape(-1, nch), 8
    if width == 3:  # packed little-endian s24 → sign-extend via i32
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
        )
        return x.reshape(-1, nch), 24
    if width == 4:
        return np.frombuffer(raw, dtype="<i4").reshape(-1, nch), 32
    raise NotImplementedError(
        f"WAV sample width {width} bytes is not PCM8/16/24/32"
    )


def _decode_aiff(data: bytes):
    """AIFF/AIFC (r12): FORM chunk walk — COMM (channels, frames,
    bits, 80-bit extended sample rate) + SSND big-endian PCM. AIFC
    compression types other than 'NONE' (sowt etc.) reject by name."""
    import struct as _struct

    import numpy as np

    nch = bits = nframes = None
    ssnd = None
    pos = 12
    end = 8 + _struct.unpack(">I", data[4:8])[0]
    while pos + 8 <= min(end, len(data)):
        cid = data[pos : pos + 4]
        (ln,) = _struct.unpack(">I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"COMM":
            nch, nframes, bits = _struct.unpack(">hIh", body[:8])
            if data[8:12] == b"AIFC" and len(body) >= 22:
                ctype = body[18:22]
                if ctype not in (b"NONE", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"AIFC compression {ctype!r} needs a real codec "
                        "(only NONE/PCM decodes offline)"
                    )
        elif cid == b"SSND":
            (off, _blk) = _struct.unpack(">II", body[:8])
            ssnd = body[8 + off :]
        pos += 8 + ln + (ln & 1)  # IFF even padding
    if nch is None or ssnd is None:
        raise ValueError("AIFF without COMM/SSND chunks")
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"AIFF {bits}-bit samples unsupported")
    width = bits // 8
    n = len(ssnd) // (width * nch) * nch
    if width == 1:  # AIFF PCM8 is SIGNED (unlike WAV)
        x = np.frombuffer(ssnd[:n], dtype=np.int8).astype(np.int32)
    elif width == 2:
        x = np.frombuffer(ssnd[: 2 * n], dtype=">i2").astype(np.int32)
    elif width == 3:
        b = np.frombuffer(ssnd[: 3 * n], dtype=np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int8).astype(np.int32) << 16)
            | (b[:, 1].astype(np.int32) << 8)
            | b[:, 2].astype(np.int32)
        )
    else:
        x = np.frombuffer(ssnd[: 4 * n], dtype=">i4").astype(np.int64)
    return x.reshape(-1, nch), bits


# G.711 µ-law / A-law → linear PCM16 expansion tables (ITU-T G.711,
# the exact reference expansion — real math, not a stub)
def _g711_tables():
    import numpy as np

    u = np.arange(256, dtype=np.int32) ^ 0xFF  # µ-law stores inverted
    sign = np.where(u & 0x80, -1, 1)
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    ulaw = sign * (((mant << 3) + 0x84) << exp) - sign * 0x84

    a = np.arange(256, dtype=np.int32) ^ 0x55  # A-law even-bit inversion
    # A-law sign bit 1 = POSITIVE (opposite of mu-law)
    sign_a = np.where(a & 0x80, 1, -1)
    exp_a = (a >> 4) & 0x07
    mant_a = a & 0x0F
    mag = np.where(
        exp_a == 0,
        (mant_a << 4) + 8,
        ((mant_a << 4) + 0x108) << (exp_a - 1),
    )
    alaw = sign_a * mag
    return ulaw.astype(np.int16), alaw.astype(np.int16)


_G711: tuple | None = None


def _g711_decode(raw: bytes, mu: bool, nch: int = 1):
    """((n, nch) int array, 16) from G.711-coded bytes (µ-law or
    A-law) via the ITU expansion tables — shared by the AU and AVI
    audio paths."""
    import numpy as np

    global _G711
    if _G711 is None:
        _G711 = _g711_tables()
    table = _G711[0] if mu else _G711[1]
    x = table[np.frombuffer(raw, dtype=np.uint8)].astype(np.int32)
    n = len(x) // nch * nch
    return x[:n].reshape(-1, nch), 16


def _decode_au(data: bytes):
    """Sun AU / .snd (r12): big-endian header (magic, data offset,
    size, encoding, rate, channels) + data. Encodings: 1 = G.711
    µ-law, 2/3/4/5 = signed PCM 8/16/24/32, 27 = G.711 A-law;
    anything else (ADPCM, float) rejects by name."""
    import struct as _struct

    import numpy as np

    _, off, _size, enc, _rate, nch = _struct.unpack(">6I", data[:24])
    body = data[off:]
    if enc in (1, 27):
        return _g711_decode(body, mu=(enc == 1), nch=nch)
    if enc == 2:
        x = np.frombuffer(body, dtype=np.int8).astype(np.int32)
        n = len(x) // nch * nch
        return x[:n].reshape(-1, nch), 8
    if enc == 3:
        n = len(body) // (2 * nch) * nch
        return (
            np.frombuffer(body[: 2 * n], dtype=">i2")
            .astype(np.int32)
            .reshape(-1, nch),
            16,
        )
    if enc == 4:
        b = np.frombuffer(body, dtype=np.uint8)
        n = len(b) // (3 * nch) * nch
        b = b[: 3 * n].reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int8).astype(np.int32) << 16)
            | (b[:, 1].astype(np.int32) << 8)
            | b[:, 2].astype(np.int32)
        )
        return x.reshape(-1, nch), 24
    if enc == 5:
        n = len(body) // (4 * nch) * nch
        return (
            np.frombuffer(body[: 4 * n], dtype=">i4")
            .astype(np.int64)
            .reshape(-1, nch),
            32,
        )
    raise NotImplementedError(
        f"AU encoding {enc} needs a real codec (PCM 2-5 and G.711 "
        "mu-law/A-law 1/27 decode offline)"
    )


def afp_df(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    out_col: str = "afp",
    on_error: str = "null",
    l2_col: str | None = None,
) -> DataFrame:
    """(id, afp[, afp_l2]) — decode each binary audio payload
    (WAV/FLAC) and fingerprint it. Arrow-batched mapInPandas, map-side
    only; payloads never shuffle. ``on_error='null'`` (default) also
    covers clips shorter than 64 samples (no evidence). ``l2_col``
    (r11) additionally emits the L2-envelope second code from the SAME
    decode pass — decode dominates the cost, so the dual-code dedup
    must never decode twice. Decodes wider than 16 bits (FLAC admits
    20/24/32) are right-shifted by ``bps − 16`` for the L2 code only
    (r12, ADVICE r11: x² would wrap int64 above 2¹⁵) — deterministic
    and order-preserving up to floor, so re-encodes at the same bps
    hash identically; the L1 golden code always hashes the raw
    samples."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")
    from pyspark.sql import types as T

    fields = [
        T.StructField(id_col, media.schema[id_col].dataType),
        T.StructField(out_col, T.LongType()),
    ]
    if l2_col is not None:
        fields.append(T.StructField(l2_col, T.LongType()))
    schema = T.StructType(fields)
    cols = [f.name for f in fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        n_codes = len(cols) - 1
        for b in batches:
            codes: list[list] = [[] for _ in range(n_codes)]
            for payload in b[payload_col]:
                try:
                    pcm, bps = _decode_pcm(bytes(payload))
                    row = (afp_from_samples(pcm),)
                    if l2_col is not None:
                        wide = pcm >> (bps - 16) if bps > 16 else pcm
                        row += (afp_from_samples(wide, energy="l2"),)
                except Exception:
                    if on_error == "raise":
                        raise
                    row = (None,) * n_codes
                for j in range(n_codes):
                    codes[j].append(row[j])
            # object dtype, NOT a tuple-list frame: one None in the batch
            # (decode failure OR a sub-64-sample clip) made pandas infer
            # float64 for the whole column, silently rounding 63-bit codes
            # past float64's 53-bit mantissa — the corrupted value depended
            # on which rows shared a batch (partition layout). Object ints
            # cross Arrow exactly.
            frame = {cols[0]: b[id_col].to_numpy()}
            for j in range(n_codes):
                frame[cols[j + 1]] = pd.Series(codes[j], dtype=object)
            yield pd.DataFrame(frame)

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def dual_code_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    col1: str = "afp",
    col2: str = "afp_l2",
    max_hamming: int = 8,
    n_blocks: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs within ``max_hamming`` bits on
    BOTH 63-bit codes (``hamming`` reports the first code's distance,
    the single-code convention). Candidates stay complete from the
    FIRST code's bands alone: a pair within d on both codes is within d
    on the first, so it already shares a first-code band — the
    union-of-bands construction is redundant under AND verification.
    The second verify is two skinny hash joins + one XOR per
    first-code-verified pair; rows whose second code is NULL carry no
    dual evidence and drop out (matching the single-code NULL rule)."""
    from oracle_vectorsearch_example_spark.functions.phash import (
        phash_neardup_pairs,
    )

    pairs = phash_neardup_pairs(
        hashes,
        id_col=id_col,
        hash_col=col1,
        max_hamming=max_hamming,
        n_blocks=n_blocks,
    )
    h2 = hashes.select(id_col, col2).filter(F.col(col2).isNotNull())
    return (
        pairs.join(
            h2.select(F.col(id_col).alias("id_a"), F.col(col2).alias("__a2")),
            "id_a",
        )
        .join(
            h2.select(F.col(id_col).alias("id_b"), F.col(col2).alias("__b2")),
            "id_b",
        )
        .filter(
            F.bit_count(F.col("__a2").bitwiseXOR(F.col("__b2")))
            <= max_hamming
        )
        .select("id_a", "id_b", "hamming")
    )


def dedup_audio(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 8,
    n_blocks: int | None = None,
    keep_undecodable: bool = True,
    dual_code: bool = False,
) -> DataFrame:
    """Corpus-level perceptual AUDIO dedup — decode → fingerprint →
    banded hamming pairs → component closure → keep ONE canonical row
    (min id) per acoustic cluster; exact byte dups are hamming 0. The
    banding and closure are the SAME machinery as
    :func:`~.phash.dedup_images` (63-bit signatures are codec-agnostic);
    undecodable or sub-64-sample payloads carry no evidence and pass
    through under ``keep_undecodable``.

    ``dual_code`` (r11, Haitsma & Kalker's multi-band idea): ONE decode
    pass emits the L1 golden code AND the L2 second code; a pair is a
    duplicate iff within ``max_hamming`` on BOTH. Cross-class L1
    envelope collisions (the measured 10/400-class recovery gap)
    rarely collide in L2 order too, while true near-copies stay within
    d on both codes (measured 0/400 recall loss on the bench fixture).
    Candidates stay complete from the L1 bands alone — a pair within d
    on both codes is within d on the first, so it already shares an L1
    band (the union-of-bands construction is redundant under AND
    verification); the L2 verify is two hash lookups + XOR per
    L1-verified pair. The single-code L1 path stays the golden."""
    from oracle_vectorsearch_example_spark.functions.phash import (
        phash_neardup_pairs,
    )
    from oracle_vectorsearch_example_spark.operators.dedup import (
        dedup_by_components,
    )

    hashes = afp_df(
        media,
        payload_col=payload_col,
        id_col=id_col,
        out_col="__afp",
        l2_col="__afp2" if dual_code else None,
    )
    if dual_code:
        pairs = dual_code_pairs(
            hashes,
            id_col=id_col,
            col1="__afp",
            col2="__afp2",
            max_hamming=max_hamming,
            n_blocks=n_blocks,
        )
    else:
        pairs = phash_neardup_pairs(
            hashes,
            id_col=id_col,
            hash_col="__afp",
            max_hamming=max_hamming,
            n_blocks=n_blocks,
        )
    deduped = dedup_by_components(media, pairs, id_col=id_col)
    if keep_undecodable:
        return deduped
    bad = hashes.filter(F.col("__afp").isNull()).select(id_col)
    return deduped.join(bad, id_col, "left_anti")
