"""X55 perceptual image hashing — fixed-point spec parity (column-expr
vs numpy), real-codec round trips, planted near-dup recovery, banding
completeness vs brute force, error handling, plan/layout hygiene."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.phash import (
    PHASH_DCT_TABLE,
    phash_df,
    phash_from_gray32,
    phash_from_pixels,
    phash_gray_expr,
    phash_gray_udf_df,
    phash_neardup_pairs,
)


def _pattern_px(h, w, seed):
    """Deterministic non-trivial pixel pattern."""
    x = np.arange(h)[:, None] * 13 + np.arange(w)[None, :] * 31 + seed * 7
    px = np.stack([(x * 3) % 256, (x * 5) % 256, (x * 7) % 256], axis=-1)
    return px.astype(np.uint8)


def test_dct_table_frozen_shape():
    assert len(PHASH_DCT_TABLE) == 8 and all(len(r) == 32 for r in PHASH_DCT_TABLE)
    assert PHASH_DCT_TABLE[0] == [32768] * 32  # u=0 row: cos(0)=1


def test_expr_equals_numpy(spark):
    """The normative column-expr spec and the Arrow production path are
    the same integer function."""
    rows = []
    for d in range(4):
        g = [(d * 7 + (p // 32) * 13 + (p % 32) * 31) % 256 for p in range(1024)]
        rows.append((d, g))
    df = spark.createDataFrame(rows, "doc_id long, gray array<int>")
    via_expr = {
        r.doc_id: r.ph
        for r in df.withColumn("ph", phash_gray_expr(F.col("gray"))).collect()
    }
    via_udf = {r.doc_id: r.phash for r in phash_gray_udf_df(df).collect()}
    ref = {d: phash_from_gray32(g) for d, g in rows}
    assert via_expr == ref and via_udf == ref
    assert all(0 <= v < (1 << 63) for v in ref.values())


def test_real_codec_roundtrip_identity(spark):
    """The SAME pixels through BMP and PNG containers hash identically
    (both lossless), and a perturbed copy lands within a small hamming
    distance while a different pattern lands far — the property that
    makes pHash a dedup key."""
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )

    px = _pattern_px(48, 64, seed=1)
    near = px.copy()
    near[:2, :2, :] = 255  # small corner edit
    far = _pattern_px(48, 64, seed=9)[::-1, :, :]
    rows = [
        (1, bytearray(encode_bmp(px))),
        (2, bytearray(encode_png(px))),
        (3, bytearray(encode_bmp(near))),
        (4, bytearray(encode_bmp(far))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.phash for r in phash_df(df).collect()}
    assert got[1] == got[2] == phash_from_pixels(px)
    ham_near = bin(got[1] ^ got[3]).count("1")
    ham_far = bin(got[1] ^ got[4]).count("1")
    assert ham_near <= 10 < ham_far


@pytest.mark.parametrize("n_blocks", [None, 9, 11])
def test_neardup_pairs_match_brute_force(spark, n_blocks):
    """Banding finds EXACTLY the brute-force hamming ≤ d set
    (completeness is a theorem for EVERY valid n_blocks — the Manku
    block-combination generalization must not change the answer, only
    the candidate key width)."""
    rng = np.random.RandomState(7)
    base = int(rng.randint(0, 1 << 31)) | (int(rng.randint(0, 1 << 31)) << 31)
    hashes = {0: base}
    for i in range(1, 30):
        h = base
        for b in rng.choice(63, size=int(rng.randint(0, 12)), replace=False):
            h ^= 1 << int(b)
        hashes[i] = h
    df = spark.createDataFrame(
        [(k, v) for k, v in hashes.items()], "media_id long, phash long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_neardup_pairs(
            df, max_hamming=6, n_blocks=n_blocks
        ).collect()
    }
    want = {}
    for a in hashes:
        for b in hashes:
            if a < b:
                d = bin(hashes[a] ^ hashes[b]).count("1")
                if d <= 6:
                    want[(a, b)] = d
    assert got == want


def test_banding_expr_and_arrow_paths_pin_equal(spark, monkeypatch):
    """The Arrow key generator (taken when the combination count blows
    codegen limits) must emit EXACTLY the expr path's (band, bval)
    keys — same parameters, both paths, identical candidate frames."""
    import oracle_vectorsearch_example_spark.functions.phash as ph

    rng = np.random.RandomState(3)
    base = int(rng.randint(0, 1 << 31)) | (int(rng.randint(0, 1 << 31)) << 31)
    rows = []
    for i in range(40):  # clusters of near-dups so candidates exist
        h = base if i % 4 == 0 else rows[-1][1]
        for b in rng.choice(63, size=int(rng.randint(0, 4)), replace=False):
            h ^= 1 << int(b)
        rows.append((i, h))
    df = spark.createDataFrame(rows, "media_id long, phash long")

    def cands():
        return sorted(
            (r["id_a"], r["id_b"], r["__ha"], r["__hb"])
            for r in ph.phash_band_candidates(
                df, max_hamming=4, n_blocks=7
            ).collect()
        )

    expr_cands = cands()  # C(7,3)=35 ≤ 64 → expr path
    monkeypatch.setattr(ph, "_ARROW_COMBO_THRESHOLD", 0)
    arrow_cands = cands()  # same params forced through numpy
    assert expr_cands == arrow_cands and expr_cands


def test_neardup_n_blocks_validation(spark):
    df = spark.createDataFrame([(1, 5)], "media_id long, phash long")
    with pytest.raises(ValueError, match="n_blocks"):
        phash_neardup_pairs(df, max_hamming=6, n_blocks=6)  # needs > d
    with pytest.raises(ValueError, match="n_blocks"):
        phash_neardup_pairs(df, max_hamming=6, n_blocks=64)
    with pytest.raises(ValueError, match="combinations"):
        # C(30, 24) is astronomically past the replication guard
        phash_neardup_pairs(df, max_hamming=6, n_blocks=30)


def test_neardup_null_hashes_drop(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, None)], "media_id long, phash long"
    )
    pairs = phash_neardup_pairs(df, max_hamming=0).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_neardup_bounds(spark):
    df = spark.createDataFrame([(1, 5)], "media_id long, phash long")
    with pytest.raises(ValueError, match="max_hamming"):
        phash_neardup_pairs(df, max_hamming=63)


def test_decode_error_null_or_raise(spark):
    rows = [(1, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    assert phash_df(df).first().phash is None
    with pytest.raises(Exception):
        phash_df(df, on_error="raise").collect()


def test_string_media_ids(spark):
    """phash_df derives the id field's type from the input schema —
    string/UUID media ids must survive untouched, not be miscast by a
    hardcoded `long` output schema."""
    from oracle_vectorsearch_example_spark.operators.multimodal import encode_bmp

    px = _pattern_px(32, 32, seed=3)
    rows = [
        ("a-550e8400", bytearray(encode_bmp(px))),
        ("b-e29b41d4", bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = phash_df(df)
    assert out.schema["media_id"].dataType.simpleString() == "string"
    got = {r.media_id: r.phash for r in out.collect()}
    assert got["a-550e8400"] == phash_from_pixels(px)
    assert got["b-e29b41d4"] is None


def test_layout_determinism(spark):
    from oracle_vectorsearch_example_spark.operators.multimodal import encode_bmp

    rows = [
        (i, bytearray(encode_bmp(_pattern_px(40, 40, seed=i % 3))))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    a = sorted(map(tuple, phash_df(df).collect()))
    b = sorted(map(tuple, phash_df(df.repartition(5)).collect()))
    assert a == b


def test_dedup_images_end_to_end(spark):
    """X55 composed into the X2 dedup shape: same pixels through two
    containers + a near-dup edit collapse to ONE canonical row (min
    id); distinct images and undecodable payloads survive."""
    from oracle_vectorsearch_example_spark.functions.phash import dedup_images
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
    )

    px = _pattern_px(48, 64, seed=1)
    near = px.copy()
    near[:2, :2, :] = 255
    far = _pattern_px(48, 64, seed=9)[::-1, :, :]
    rows = [
        (1, bytearray(encode_bmp(px))),
        (2, bytearray(encode_png(px))),      # exact visual dup of 1
        (3, bytearray(encode_bmp(near))),    # near dup of 1
        (4, bytearray(encode_bmp(far))),     # distinct
        (5, bytearray(b"not an image")),     # undecodable
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(r.media_id for r in dedup_images(df, max_hamming=10).collect())
    assert kept == [1, 4, 5]
    kept2 = sorted(
        r.media_id
        for r in dedup_images(df, max_hamming=10, keep_undecodable=False).collect()
    )
    assert kept2 == [1, 4]


def test_neardup_plan_no_cartesian(spark):
    """The 100 TB posture: candidates come from band equality joins —
    the plan must contain no CartesianProduct/all-pairs fallback."""
    df = spark.createDataFrame(
        [(i, i * 37) for i in range(20)], "media_id long, phash long"
    )
    plan = (
        phash_neardup_pairs(df, max_hamming=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_format_image_dedup_r12(spark):
    """The r12 format doors integrate with the X55 dedup path for
    free (phash_df decodes via the shared dispatcher): the SAME pixels
    as BMP, lossless WebP, PCX and TGA collapse to one canonical
    image, while a different pattern survives."""
    import numpy as np

    from oracle_vectorsearch_example_spark.functions.phash import (
        dedup_images,
    )
    from oracle_vectorsearch_example_spark.functions.webp import (
        make_simple_webp,
    )
    from oracle_vectorsearch_example_spark.operators.multimodal import (
        encode_bmp,
        make_simple_pcx,
        make_simple_tga,
    )

    x = (np.arange(32)[:, None] * 5 + np.arange(32)[None, :] * 9) % 256
    px = np.stack([x, (x * 2) % 256, (x * 3) % 256], axis=-1).astype(
        np.uint8
    )
    other = px[::-1, :, :].copy()
    # PCX/TGA writers are solid-color-only; hand them the real pattern
    # through the formats that encode arbitrary pixels, and use solid
    # variants for the rest of the family sweep
    rows = [
        (1, bytearray(encode_bmp(px))),
        (2, bytearray(make_simple_webp(px, subtract_green=True))),
        (3, bytearray(make_simple_webp(px, use_cache_bits=4))),
        (4, bytearray(encode_bmp(other))),
        (5, bytearray(make_simple_pcx(32, 32, (40, 80, 120)))),
        (6, bytearray(make_simple_tga(32, 32, (40, 80, 120)))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    kept = sorted(
        r.media_id for r in dedup_images(media, max_hamming=2).collect()
    )
    # 1≡2≡3 (same pixels, three containers), 5≡6 (same solid color,
    # two containers), 4 distinct
    assert kept == [1, 4, 5]


def test_phash_exact_in_mixed_null_batch(spark):
    """One undecodable payload in a batch must not corrupt the other
    rows' 63-bit hashes: the old tuple-list pd.DataFrame inferred
    float64 (53-bit mantissa) for the column once any None appeared, so
    hashes silently rounded depending on partition layout.
    repartition(1) forces every row into one Arrow batch."""
    from oracle_vectorsearch_example_spark.functions.phash import (
        phash_from_pixels,
    )
    from oracle_vectorsearch_example_spark.operators.multimodal import encode_bmp

    px = _pattern_px(40, 40, seed=1)
    want = phash_from_pixels(px)
    assert want > (1 << 53)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(px))), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    ).repartition(1)
    got = {r.media_id: r.phash for r in phash_df(df).collect()}
    assert got == {1: want, 2: None}
