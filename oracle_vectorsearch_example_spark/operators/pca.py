"""PCA fit / rotate / whiten + truncated-dimension search (X42,
training-pipeline extension surface, SURVEY.md §2.12 family).

Why this operator at 100 TB: real text embeddings are anisotropic —
their energy concentrates in a low-rank subspace whose basis is
arbitrary (Ethayarajh 2019, arXiv:1909.00512, "How contextual are
contextualized word representations?"; Raunak et al. 2019,
arXiv:1708.03629 effective-dim reduction). X36's measured negative
control showed prefix-truncated (MRL-style) search collapses when
energy is NOT front-loaded (recall@10 0.0125 on the isotropic 4M
fixture). PCA is the fix that needs no retraining: an orthonormal
rotation preserves full-dimension cosine/L2 EXACTLY (so exact search
results are unchanged), while reordering coordinates by explained
variance so a short prefix carries the most signal any linear map can
give it — `pca_topk_search` = rotate, then the existing two-stage
truncated search.

Execution shape:

- ``pca_fit`` — distributed second-moment aggregate, layout-
  independent by construction (the repo's canonical-fold discipline,
  X7/bm25): rows bucket by ``pmod(xxhash64(id), n_buckets)``; each
  bucket's partial (count, Σx, Σxxᵀ) folds in ascending-id order
  inside one Arrow task (numpy float64, deterministic given order);
  bucket partials then fold in ascending-bucket order on the driver.
  The result is a pure function of (data, n_buckets) — repartition
  cannot move a row between buckets or reorder a fold (tested with an
  exact-equality gate, not a tolerance). Driver state is
  (dim² + dim)·n_buckets doubles — metadata-sized; eigh of the dim×dim
  covariance runs on the driver like IVF's centroid step.
  Eigenvector sign is pinned (largest-|entry| coordinate positive) so
  the model is unique, not just the subspace.
- ``PcaModel.transform`` — map-side Arrow batches: (X − mean) @ Wᵀ
  (BLAS matmul; optional per-component 1/√λ whitening), the
  quantize.py vectorization discipline. No shuffle, no driver loop.
- ``pca_topk_search`` — transform base + queries with ``whiten=False``
  (whitening rescales axes and would CHANGE cosine ranking; rotation
  alone provably cannot), then delegate to
  ``search.mrl_topk_search`` on the rotated vectors: stage-1 prefix
  scan at ``coarse_dim`` of the rotated basis, stage-2 exact re-score
  of k·oversample candidates.

Determinism note: eigh itself is deterministic for a given LAPACK
build; across LAPACK builds the components may differ in the last
ulps, so PCA goldens are registered rows-only (the onnx_embed
convention) and the hard contracts live in tests (numpy parity,
orthonormality, exact repartition equality, rotation-invariance of
full-dim search results).

Reference analog: the reference's fixed-dim embedding columns
(VECTOR(384), models/README.md:40) are exactly the anisotropic inputs
this serves; Oracle 23ai exposes the same lever as vector dimension
reduction on index DDL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 64

__all__ = ["PcaModel", "pca_fit", "pca_topk_search"]


@dataclass
class PcaModel:
    """Driver-side PCA parameters (metadata-sized, like IVF centroids)."""

    mean: list[float]  # dim
    components: list[list[float]]  # dim rows (PCs), eigenvalue-descending
    eigvals: list[float]  # dim, descending
    n: int

    @property
    def dim(self) -> int:
        return len(self.mean)

    def save(self, path: str) -> str:
        """Write the model as JSON (registry-compatible: hand the path to
        ``ModelRegistry.load`` to catalog it like any other model file —
        the S7 semantics; a PCA model is metadata exactly like IVF
        centroids)."""
        import json
        import os

        tmp = path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "mean": self.mean,
                    "components": self.components,
                    "eigvals": self.eigvals,
                    "n": self.n,
                },
                fh,
            )
        os.replace(tmp, path)  # atomic, like the registry manifest
        return path

    @classmethod
    def load(cls, path: str) -> "PcaModel":
        import json

        with open(path) as fh:
            d = json.load(fh)
        return cls(
            mean=d["mean"],
            components=d["components"],
            eigvals=d["eigvals"],
            n=d["n"],
        )

    def explained_variance_ratio(self, k: int) -> float:
        tot = sum(self.eigvals)
        return sum(self.eigvals[:k]) / tot if tot > 0 else 1.0

    def transform(
        self,
        df: DataFrame,
        vec_col: str = "embedding",
        out_col: str = "pca",
        k: int | None = None,
        whiten: bool = False,
        center: bool = True,
        eps: float = 1e-9,
    ) -> DataFrame:
        """Project ``vec_col`` onto the top-k components (map-side Arrow
        matmul; all other columns pass through). ``whiten=True`` scales
        component i by 1/sqrt(λ_i + eps) — use for feature
        decorrelation, NOT before cosine search (it reranks).
        ``center=False`` applies the ROTATION only (y = Wx): translation
        changes cosine, so search paths rotate uncentered — full-dim
        cosine AND L2 are then preserved exactly."""
        import numpy as np

        kk = k if k is not None else self.dim
        mean = (
            np.asarray(self.mean, dtype=np.float64)
            if center
            else np.zeros(self.dim)
        )
        w = np.asarray(self.components, dtype=np.float64)[:kk]  # kk x dim
        if whiten:
            lam = np.asarray(self.eigvals, dtype=np.float64)[:kk]
            w = w / np.sqrt(lam + eps)[:, None]
        out_fields = [
            f for f in df.schema.fields if f.name != out_col
        ]
        schema = (
            ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
            + f", `{out_col}` array<double>"
        )
        names = [f.name for f in out_fields]

        def run(batches):
            import pandas as pd

            for pdf in batches:
                x = np.stack(
                    pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
                )
                y = (x - mean) @ w.T
                out = pdf[names].copy()
                out[out_col] = list(y)
                yield out

        return df.mapInPandas(run, schema=schema)


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_buckets: int = N_BUCKETS,
) -> PcaModel:
    """Fit PCA over a vector column with a layout-independent
    distributed moment aggregate (see module docstring). One shuffle
    (the bucket group-by); driver collects n_buckets partial rows.

    Driver bytes = n_buckets · (dim² + dim) · 8 B — ~2 MB at dim 64,
    ~75 MB at dim 384 with the default 64 buckets (the pq_train-style
    bounded-metadata contract). Lower ``n_buckets`` for very high dims
    (determinism holds at ANY bucket count — it is part of the spec,
    so pass the same value to reproduce a fit)."""
    import numpy as np

    head = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if head is None:
        raise ValueError("pca_fit needs >= 2 rows, got 0")
    dim = len(head[0])

    def fold(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("__id", kind="mergesort")
        x = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
        c = x.T @ x  # ordered deterministic BLAS reduce within bucket
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n": [len(pdf)],
                "s": [x.sum(axis=0).tolist()],
                "ss": [c.reshape(-1).tolist()],
            }
        )

    parts = (
        df.select(
            F.col(id_col).alias("__id"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("__b"),
            vec_col,
        )
        .groupBy("__b")
        .applyInPandas(
            fold, schema="bucket int, n long, s array<double>, ss array<double>"
        )
        .collect()
    )
    n = 0
    s = np.zeros(dim)
    ss = np.zeros((dim, dim))
    for r in sorted(parts, key=lambda r: r["bucket"]):  # canonical bucket order
        n += r["n"]
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(dim, dim)
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows, got {n}")
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    lam, vec = np.linalg.eigh((cov + cov.T) / 2)  # ascending
    order = np.argsort(lam)[::-1]
    lam, vec = lam[order], vec[:, order].T  # rows = components
    # pin eigenvector sign: the largest-|entry| coordinate is positive
    for i in range(dim):
        j = int(np.argmax(np.abs(vec[i])))
        if vec[i, j] < 0:
            vec[i] = -vec[i]
    return PcaModel(
        mean=mean.tolist(),
        components=vec.tolist(),
        eigvals=np.maximum(lam, 0.0).tolist(),
        n=int(n),
    )


def pca_topk_search(
    base: DataFrame,
    queries: DataFrame,
    model: PcaModel,
    k: int = 10,
    coarse_dim: int = 16,
    oversample: int = 4,
    metric: str = "cosine",
    base_id: str = "vec_id",
    base_vec: str = "embedding",
    query_id: str = "qid",
    query_vec: str = "qvec",
    exclude_self: bool = False,
) -> DataFrame:
    """Truncated-dimension search in the PCA basis: rotate base and
    queries UNCENTERED (pure rotation preserves full-dim cosine and L2
    exactly — centering would re-rank cosine), then two-stage prefix
    search where the prefix now carries the most variance any
    orthogonal map can give it. The cure for X36's measured failure
    mode (prefixes of vectors whose energy sits in an arbitrary basis);
    stage 2 re-scores candidates on full rotated vectors, so final
    scores equal the unrotated search's scores on the candidate set."""
    from oracle_vectorsearch_example_spark.operators.search import mrl_topk_search

    rb = model.transform(base, vec_col=base_vec, out_col="__rot", center=False)
    rq = model.transform(queries, vec_col=query_vec, out_col="__rotq", center=False)
    return mrl_topk_search(
        rb,
        rq,
        k=k,
        coarse_dim=coarse_dim,
        oversample=oversample,
        metric=metric,
        base_id=base_id,
        base_vec="__rot",
        query_id=query_id,
        query_vec="__rotq",
        exclude_self=exclude_self,
    )
