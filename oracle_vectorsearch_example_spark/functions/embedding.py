"""Embedding providers — the VECTOR_EMBEDDING / UTL_TO_EMBEDDINGS analog.

The reference embeds with an in-DB ONNX model (provider "database",
model ALL_MINILM_L12_V2, 384-dim; 01_pdf_to_vector.sql:241, :72) and
documents external providers (OpenAI batch 25 / Cohere batch 10,
:160-176). Real ONNX inference is not bit-reproducible across platforms,
so oracle-hashed correctness tests use a frozen deterministic **hashing
embedder** (SURVEY.md §5.2); the ONNX path itself executes REAL graph
inference — via onnxruntime when installed, else the pure-numpy executor
in :mod:`.onnx_rt` — tolerance-tested against an independent forward
pass (tests/test_onnx_contract.py).

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

    def embed_texts(self, texts: list[str]) -> list[list[float]]:
        """Driver-side embed for small-by-contract inputs (query strings):
        the same ``_embed_batch`` the UDF runs, so vectors are identical —
        without launching a Spark job + Python worker for a handful of
        rows."""
        return _embed_batch(pd.Series(texts, dtype=object), self.dim).tolist()


class WordPieceTokenizer:
    """Minimal BERT-style tokenizer for MiniLM-family ONNX exports.

    Basic tokenization (lowercase, whitespace split, punctuation isolated)
    followed by greedy longest-match-first WordPiece with ``##``
    continuation pieces — the scheme all-MiniLM-L12-v2's bundled
    ``vocab.txt`` uses (reference ships the model via load_models.py:88-101;
    query shape models/README.md:40). Pure Python, no external deps, so the
    ONNX contract is unit-testable without onnxruntime."""

    _PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")

    def __init__(
        self,
        vocab: dict[str, int],
        unk_token: str = "[UNK]",
        cls_token: str = "[CLS]",
        sep_token: str = "[SEP]",
        pad_token: str = "[PAD]",
        max_len: int = 256,
        lowercase: bool = True,
    ):
        self.vocab = vocab
        self.unk_id = vocab[unk_token]
        self.cls_id = vocab[cls_token]
        self.sep_id = vocab[sep_token]
        self.pad_id = vocab[pad_token]
        self.max_len = max_len
        self.lowercase = lowercase

    @classmethod
    def from_vocab_file(cls, path: str, **kwargs) -> "WordPieceTokenizer":
        """Load a HuggingFace-format ``vocab.txt`` (one token per line,
        id = line number)."""
        with open(path, encoding="utf-8") as f:
            vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        return cls(vocab, **kwargs)

    def _basic_tokens(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        word: list[str] = []
        for ch in text:
            if ch.isspace():
                if word:
                    out.append("".join(word))
                    word = []
            elif ch in self._PUNCT:
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
        return out

    def _wordpiece(self, word: str) -> list[int]:
        ids: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece_id = None
            while end > start:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                pid = self.vocab.get(piece)
                if pid is not None:
                    piece_id = pid
                    break
                end -= 1
            if piece_id is None:
                return [self.unk_id]  # whole word unknown
            ids.append(piece_id)
            start = end
        return ids

    def encode(self, text: str) -> list[int]:
        """``[CLS] piece* [SEP]`` ids, truncated to ``max_len``."""
        ids = [self.cls_id]
        for word in self._basic_tokens(text):
            ids.extend(self._wordpiece(word))
            if len(ids) >= self.max_len - 1:
                ids = ids[: self.max_len - 1]
                break
        ids.append(self.sep_id)
        return ids

    def encode_pair(self, text_a: str, text_b: str) -> tuple[list[int], list[int]]:
        """``[CLS] a [SEP] b [SEP]`` ids plus segment (token_type) ids —
        the BERT sentence-pair contract cross-encoder exports expect.
        Truncation is longest-first: pieces drop from the end of
        whichever segment is currently longer until the pair fits
        ``max_len``, so a long document can't starve the query (and vice
        versa)."""
        a = [i for w in self._basic_tokens(text_a) for i in self._wordpiece(w)]
        b = [i for w in self._basic_tokens(text_b) for i in self._wordpiece(w)]
        budget = self.max_len - 3  # [CLS] + 2 × [SEP]
        while len(a) + len(b) > budget:
            if len(a) >= len(b):
                a.pop()
            else:
                b.pop()
        ids = [self.cls_id] + a + [self.sep_id] + b + [self.sep_id]
        types = [0] * (len(a) + 2) + [1] * (len(b) + 1)
        return ids, types


def encode_onnx_batch(sess, tokenizer, texts: list[str]):
    """Run one batch of texts through an ONNX session, returning a
    (len(texts), dim) L2-normalized float32 matrix.

    The session's declared inputs drive the feed shape
    (``sess.get_inputs()`` introspection):

    - a single ``tensor(string)`` input → the model bundles its own
      tokenizer (Oracle's packaged ``all_MiniLM_L12_V2.onnx`` does this;
      load_models.py:88-101) — feed raw strings;
    - otherwise the standard transformer export contract —
      ``input_ids`` / ``attention_mask`` (+ ``token_type_ids`` when
      declared), int64, right-padded to the batch max length.

    Output post-processing: a (batch, seq, hidden) last-hidden-state is
    masked-mean-pooled over real tokens; a (batch, hidden) output is taken
    as the sentence embedding. Rows are L2-normalized either way (the
    sentence-transformers recipe for all-MiniLM)."""
    import numpy as np

    inputs = {i.name: getattr(i, "type", "") for i in sess.get_inputs()}
    if len(inputs) == 1 and "string" in next(iter(inputs.values())):
        name = next(iter(inputs))
        out = sess.run(None, {name: np.asarray(texts, dtype=object)})[0]
        mask = None
    else:
        encoded = [tokenizer.encode(t) for t in texts]
        maxlen = max(len(e) for e in encoded)
        ids = np.full((len(encoded), maxlen), tokenizer.pad_id, dtype=np.int64)
        mask = np.zeros((len(encoded), maxlen), dtype=np.int64)
        for r, e in enumerate(encoded):
            ids[r, : len(e)] = e
            mask[r, : len(e)] = 1
        feeds = {}
        for name in inputs:
            if name == "input_ids":
                feeds[name] = ids
            elif name == "attention_mask":
                feeds[name] = mask
            elif name == "token_type_ids":
                feeds[name] = np.zeros_like(ids)
            else:
                raise ValueError(f"unsupported ONNX model input {name!r}")
        missing = {"input_ids", "attention_mask"} - set(feeds)
        if missing:
            raise ValueError(f"ONNX model missing expected inputs: {sorted(missing)}")
        out = sess.run(None, feeds)[0]

    out = np.asarray(out, dtype=np.float32)
    if out.ndim == 3:  # (batch, seq, hidden) last_hidden_state → masked mean-pool
        if mask is None:
            pooled = out.mean(axis=1)
        else:
            m = mask[:, :, None].astype(np.float32)
            pooled = (out * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)
    elif out.ndim == 2:
        pooled = out
    else:
        raise ValueError(f"unexpected ONNX output rank {out.ndim}")
    norms = np.linalg.norm(pooled, axis=1, keepdims=True)
    return pooled / np.maximum(norms, 1e-12)


class OnnxEmbedder:
    """ONNX provider — the ``provider: database`` analog
    (01_pdf_to_vector.sql:154-158; model loaded via ModelRegistry, EP2).

    Lazily creates one inference session per Python worker (executor
    co-located inference, nothing leaves the cluster), Arrow-batched via
    ``mapInPandas``. The per-batch contract (tokenize → input_ids/
    attention_mask → mean-pool → L2-normalize, or raw-string feed for
    tokenizer-bundling exports) lives in :func:`encode_onnx_batch`.
    The session comes from :func:`..onnx_rt.get_runtime`: onnxruntime
    when installed, else the pure-numpy ONNX graph executor
    (:class:`..onnx_rt.NumpySession`) — REAL inference either way;
    tests/test_onnx_contract.py executes a deterministic fixture encoder
    end-to-end against an independently computed forward pass.

    ``vocab_path`` defaults to ``vocab.txt`` next to the model; it is only
    read when the model declares id-tensor inputs."""

    def __init__(
        self,
        model_path: str,
        dim: int = 384,
        batch_size: int = 64,
        vocab_path: str | None = None,
        max_len: int = 256,
    ):
        self.model_path = model_path
        self.dim = dim
        self.batch_size = batch_size
        self.vocab_path = vocab_path
        self.max_len = max_len

    def _require_runtime(self):
        from oracle_vectorsearch_example_spark.functions.onnx_rt import get_runtime

        return get_runtime()

    def _load_tokenizer(self):
        import os

        path = self.vocab_path or os.path.join(
            os.path.dirname(self.model_path), "vocab.txt"
        )
        if os.path.exists(path):
            return WordPieceTokenizer.from_vocab_file(path, max_len=self.max_len)
        return None  # string-input model needs no tokenizer

    def embed_df(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        ort = self._require_runtime()
        model_path, batch = self.model_path, self.batch_size
        load_tok = self._load_tokenizer
        schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sess = ort.InferenceSession(model_path)
            tok = load_tok()
            for pdf in batches:
                texts = pdf[text_col].fillna("").tolist()
                vecs = []
                for i in range(0, len(texts), batch):
                    mat = encode_onnx_batch(sess, tok, texts[i : i + batch])
                    vecs.extend(mat.tolist())
                pdf[out_col] = vecs
                yield pdf

        return df.mapInPandas(run, schema=schema)


# Documented external-provider request batch sizes
# (01_pdf_to_vector.sql:167 OpenAI batch_size 25, :175 Cohere batch_size 10;
# the OCI GenAI block, :178-184, documents no batch size — Cohere's
# conservative 10 is used)
_EXTERNAL_BATCH_SIZES = {"openai": 25, "cohere": 10, "oci": 10}


class ExternalApiEmbedder:
    """External embed-provider strategy with the reference's batch-size
    semantics (01_pdf_to_vector.sql:160-184) and an INJECTED transport.

    The engine keeps its no-egress stance: there is no HTTP client here
    and ``get_provider`` still raises without a transport. A caller who
    does have a sanctioned client injects it as
    ``transport: Callable[[list[str]], list[list[float]]]``; this class
    owns everything around it — request batching at the provider's
    documented batch size, batch-order preservation, and the
    executor-side mapInPandas plumbing (the transport is shipped to
    executors, so it must be picklable and session-free, exactly like
    provider SDK calls made from a worker)."""

    def __init__(self, name: str, transport, batch_size: int | None = None):
        if transport is None:
            raise NotImplementedError(
                f"external provider {name!r} needs an injected transport: "
                "the default path keeps inference co-located with data "
                "(01_pdf_to_vector.sql:156-157)"
            )
        self.name = name
        self.transport = transport
        self.batch_size = batch_size or _EXTERNAL_BATCH_SIZES[name]

    def embed_texts(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = texts[i : i + self.batch_size]
            vecs = self.transport(chunk)
            if len(vecs) != len(chunk):
                raise ValueError(
                    f"transport returned {len(vecs)} vectors for "
                    f"{len(chunk)} texts"
                )
            out.extend(vecs)
        return out

    def embed_df(self, df: DataFrame, text_col: str, out_col: str = "embedding") -> DataFrame:
        # route through embed_texts so every transport chunk is checked
        # against its input length (a wrong-count chunk can misalign
        # embeddings to rows even when column totals match; ADVICE r4 #3).
        # self is picklable by contract (transport ships to executors).
        embed = self.embed_texts
        schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf[out_col] = embed(pdf[text_col].fillna("").tolist())
                yield pdf

        return df.mapInPandas(run, schema=schema)


def get_provider(name: str, transport=None, **kwargs):
    """Provider strategy lookup, mirroring the reference's provider JSON
    (database / OpenAI / Cohere / OCI, 01_pdf_to_vector.sql:154-184).
    External API providers stay unimplemented by default (no egress) but
    accept an injected ``transport`` callable, which makes their
    documented batch-size semantics (25/10) testable offline."""
    if name == "hashing":
        return HashingEmbedder(**kwargs)
    if name in ("onnx", "database"):
        return OnnxEmbedder(**kwargs)
    if name in _EXTERNAL_BATCH_SIZES:
        return ExternalApiEmbedder(name, transport, **kwargs)
    raise ValueError(f"unknown provider {name!r}")
