"""Embedding providers — the VECTOR_EMBEDDING / UTL_TO_EMBEDDINGS analog.

The reference embeds with an in-DB ONNX model (provider "database",
model ALL_MINILM_L12_V2, 384-dim; 01_pdf_to_vector.sql:241, :72) and
documents external providers (OpenAI batch 25 / Cohere batch 10,
:160-176). Real ONNX inference is not bit-reproducible across platforms,
so correctness tests use a frozen deterministic **hashing embedder**
(SURVEY.md §5.2) and the ONNX path is smoke-tested only.

Hashing embedder frozen spec (dim d, default 64 — matches the
``embeddings`` fixture):
  1. tokens = whitespace-split of lower(trim(text)), empties dropped
  2. bucket(tok) = int(first two hex chars of md5(tok)) mod d
  3. v[i] = count of tokens with bucket i
  4. embedding = v / ‖v‖₂  (zero vector stays zero)

Implemented as pure column expressions (JVM codegen, no Python in the hot
path) — DuckDB-reimplementable for the oracle harness.

Provider abstraction mirrors the reference's provider JSON configs: the
default provider runs inside executors, co-located with data ("data never
leaves the DB", 01_pdf_to_vector.sql:156-157).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _embed_batch(texts: "pd.Series", dim: int) -> "pd.Series":
    """Vectorized hashing-embed of one Arrow batch (the frozen spec above).

    Token md5s are memoized per batch — synthetic/web corpora repeat tokens
    heavily, so the md5 count is ~distinct-tokens, not total-tokens.
    """
    import hashlib

    import numpy as np

    cache: dict[str, int] = {}

    def bucket(tok: str) -> int:
        b = cache.get(tok)
        if b is None:
            b = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:2], 16) % dim
            cache[tok] = b
        return b

    def embed(text: str | None) -> list[float]:
        toks = (text or "").lower().split()
        if not toks:
            return [0.0] * dim
        counts = np.bincount([bucket(t) for t in toks], minlength=dim).astype(np.float64)
        nrm = float(np.sqrt((counts * counts).sum()))
        return (counts / nrm).tolist() if nrm > 0 else counts.tolist()

    return texts.map(embed)


def hashing_embedding(text: Column, dim: int = 64) -> Column:
    """Deterministic hashing embedding as an Arrow-batched pandas UDF.

    Returns array<double> of length ``dim``, L2-normalized.

    Why a UDF and not column expressions: the histogram needs a per-token
    fold, and Spark evaluates higher-order-function lambdas *interpreted*
    (never whole-stage codegen) — a pure-expression formulation measured
    ~0.4 s/row. Embedding is the engine's designated Python boundary anyway
    (the production provider is ONNX inside a pandas UDF, mirroring the
    reference's in-DB inference, 01_pdf_to_vector.sql:156-157); the hashing
    double rides the same Arrow-batched fast path with numpy ``bincount``.

    ``str.split()`` (any-whitespace, empties dropped) and
    ``md5(token)[:2] as int mod dim`` keep the spec reproducible in SQL:
    DuckDB ``('0x' || substr(md5(tok), 1, 2))::INT % dim``.
    """
    dim_ = int(dim)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return _embed_batch(texts, dim_)

    return _embed(text)


class HashingEmbedder:
    """Deterministic embedding provider (the test double, provider id
    ``hashing``)."""

    def __init__(self, dim: int = 64):
        self.dim = dim
        self.name = f"hashing_{dim}"

    def embed_col(self, text: Column) -> Column:
        return hashing_embedding(text, self.dim)

    def embed_df(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        return df.withColumn(out_col, self.embed_col(F.col(text_col)))


class OnnxEmbedder:
    """ONNX provider — the ``provider: database`` analog
    (01_pdf_to_vector.sql:154-158; model loaded via ModelRegistry, EP2).

    Lazily creates one onnxruntime session per Python worker (executor
    co-located inference, nothing leaves the cluster), Arrow-batched via
    ``mapInPandas``. onnxruntime is not available in this environment, so
    construction is gated behind an import-try; tests cover the gating.
    """

    def __init__(self, model_path: str, dim: int = 384, batch_size: int = 64):
        self.model_path = model_path
        self.dim = dim
        self.batch_size = batch_size

    def _require_runtime(self):
        try:
            import onnxruntime  # noqa: F401

            return onnxruntime
        except ImportError as e:  # pragma: no cover - env without onnxruntime
            raise NotImplementedError(
                "OnnxEmbedder requires onnxruntime, which is not installed in "
                "this environment. Use HashingEmbedder for deterministic "
                "tests, or install onnxruntime for real inference."
            ) from e

    def embed_df(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        ort = self._require_runtime()  # pragma: no cover
        model_path, dim, batch = self.model_path, self.dim, self.batch_size
        schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
            sess = ort.InferenceSession(model_path)
            for pdf in batches:
                texts = pdf[text_col].fillna("").tolist()
                vecs = []
                for i in range(0, len(texts), batch):
                    out = sess.run(None, {"input": texts[i : i + batch]})[0]
                    vecs.extend(out.tolist())
                pdf[out_col] = vecs
                yield pdf

        return df.mapInPandas(run, schema=schema)


def get_provider(name: str, **kwargs):
    """Provider strategy lookup, mirroring the reference's provider JSON
    (database / OpenAI / Cohere / OCI, 01_pdf_to_vector.sql:154-184).
    External API providers are intentionally unimplemented (no egress)."""
    if name == "hashing":
        return HashingEmbedder(**kwargs)
    if name in ("onnx", "database"):
        return OnnxEmbedder(**kwargs)
    if name in ("openai", "cohere", "oci"):
        raise NotImplementedError(
            f"external provider {name!r} is documented but not implemented: "
            "the default path keeps inference co-located with data"
        )
    raise ValueError(f"unknown provider {name!r}")
