"""X42 PCA fit / rotate / whiten + truncated-dim search: numpy parity
of the distributed moment fold, orthonormality and sign pinning, EXACT
repartition equality (the canonical-fold contract), transform parity,
rotation-invariance of full-dim search, whitening decorrelation, and
the prefix-recall rescue on latent-low-rank data (X36's failure mode)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.pca import (
    PcaModel,
    pca_fit,
    pca_topk_search,
)

DIM = 8
N = 400


def _latent_lowrank(seed=7, n=N, dim=DIM):
    """Vectors whose energy lives in a 2-D latent subspace expressed in
    an arbitrary rotated basis — front-truncation is blind to it."""
    rng = np.random.RandomState(seed)
    q, _ = np.linalg.qr(rng.randn(dim, dim))
    z = np.zeros((n, dim))
    z[:, 0] = rng.randn(n) * 10.0
    z[:, 1] = rng.randn(n) * 5.0
    z[:, 2:] = rng.randn(n, dim - 2) * 0.05
    return (z @ q.T) + rng.randn(dim) * 0.5  # non-zero mean too


@pytest.fixture(scope="module")
def lowrank(spark):
    x = _latent_lowrank()
    rows = [(i, x[i].tolist()) for i in range(N)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
    )


def test_fit_matches_numpy(spark, lowrank):
    df, x = lowrank
    m = pca_fit(df)
    assert m.n == N and m.dim == DIM
    np.testing.assert_allclose(m.mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x.T, bias=True)
    lam, vec = np.linalg.eigh(cov)
    lam = lam[::-1]
    np.testing.assert_allclose(m.eigvals, np.maximum(lam, 0), atol=1e-9)
    # components span the same axes (compare |dot| to 1 per component)
    got = np.asarray(m.components)
    ref = vec[:, ::-1].T
    for i in range(DIM):
        assert abs(abs(got[i] @ ref[i]) - 1.0) < 1e-8


def test_components_orthonormal_and_sign_pinned(spark, lowrank):
    df, _ = lowrank
    m = pca_fit(df)
    w = np.asarray(m.components)
    np.testing.assert_allclose(w @ w.T, np.eye(DIM), atol=1e-9)
    assert m.eigvals == sorted(m.eigvals, reverse=True)
    for i in range(DIM):
        j = int(np.argmax(np.abs(w[i])))
        assert w[i, j] > 0


def test_repartition_exact_equality(spark, lowrank):
    """Layout independence is EXACT (bit-equal), not a tolerance — the
    canonical two-level fold's whole point."""
    df, _ = lowrank
    a = pca_fit(df)
    b = pca_fit(df.repartition(7))
    assert a.mean == b.mean
    assert a.components == b.components
    assert a.eigvals == b.eigvals


def test_transform_matches_numpy(spark, lowrank):
    df, x = lowrank
    m = pca_fit(df)
    out = m.transform(df, k=3).orderBy("vec_id").collect()
    w = np.asarray(m.components)[:3]
    ref = (x - np.asarray(m.mean)) @ w.T
    got = np.asarray([r["pca"] for r in out])
    np.testing.assert_allclose(got, ref, atol=1e-9)
    # uncentered: pure rotation
    out2 = m.transform(df, k=3, center=False).orderBy("vec_id").collect()
    np.testing.assert_allclose(
        np.asarray([r["pca"] for r in out2]), x @ w.T, atol=1e-9
    )


def test_whitening_decorrelates(spark, lowrank):
    df, _ = lowrank
    m = pca_fit(df)
    out = m.transform(df, whiten=True).collect()
    y = np.asarray([r["pca"] for r in out])
    c = np.cov(y.T, bias=True)
    np.testing.assert_allclose(c, np.eye(DIM), atol=1e-4)


def test_rotation_preserves_fulldim_search(spark, lowrank):
    """pca_topk_search with coarse_dim == dim must return EXACTLY the
    plain top-k ids/ranks (pure rotation preserves cosine)."""
    from oracle_vectorsearch_example_spark.operators.search import topk_search

    df, _ = lowrank
    m = pca_fit(df)
    q = df.limit(5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plain = topk_search(df, q, k=5).select("qid", "rank", "vec_id")
    rot = pca_topk_search(df, q, m, k=5, coarse_dim=DIM, oversample=1).select(
        "qid", "rank", "vec_id"
    )
    assert sorted(map(tuple, rot.collect())) == sorted(map(tuple, plain.collect()))


def test_prefix_recall_rescued_on_latent_lowrank(spark, lowrank):
    """X36's measured failure mode: on latent-low-rank data a RAW 2-dim
    prefix is blind (energy sits in a rotated basis) while the PCA
    2-dim prefix recovers it."""
    from oracle_vectorsearch_example_spark.operators.ivf import recall_at_k
    from oracle_vectorsearch_example_spark.operators.search import (
        mrl_topk_search,
        topk_search,
    )

    df, _ = lowrank
    m = pca_fit(df)
    assert m.explained_variance_ratio(2) > 0.95
    q = df.limit(20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = topk_search(df, q, k=5)
    # measured on this deterministic fixture: raw 0.69 / rot 0.86 at
    # oversample 2, raw 0.90 / rot 0.99 at oversample 4 (raw is not
    # fully blind here — any 2 coords of a rank-2 latent are generically
    # invertible — but PCA dominates at every budget); gates leave
    # margin for LAPACK near-tie drift only
    raw2 = mrl_topk_search(df, q, k=5, coarse_dim=2, oversample=2)
    rot2 = pca_topk_search(df, q, m, k=5, coarse_dim=2, oversample=2)
    assert recall_at_k(exact, rot2) >= 0.8
    assert recall_at_k(exact, rot2) > recall_at_k(exact, raw2) + 0.1
    rot4 = pca_topk_search(df, q, m, k=5, coarse_dim=2, oversample=4)
    assert recall_at_k(exact, rot4) >= 0.95


def test_save_load_registry_roundtrip(spark, lowrank, tmp_path):
    """save/load roundtrips exactly, and the saved file registers
    through ModelRegistry like any other model artifact (S7)."""
    from oracle_vectorsearch_example_spark.sources.registry import ModelRegistry

    df, _ = lowrank
    m = pca_fit(df)
    p = m.save(str(tmp_path / "pca.json"))
    m2 = PcaModel.load(p)
    assert m2.mean == m.mean
    assert m2.components == m.components
    assert m2.eigvals == m.eigvals and m2.n == m.n
    reg = ModelRegistry(str(tmp_path / "wh"))
    assert reg.load("pca_rot8", p, dim=m.dim)
    assert "pca_rot8" in reg.list_models()
    stored = PcaModel.load(reg.get("pca_rot8").file_path)
    assert stored.components == m.components


def test_too_few_rows_rejected(spark):
    one = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(one)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_fit(one.filter(F.lit(False)))
