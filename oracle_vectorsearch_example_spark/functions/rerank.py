"""Cross-encoder reranking — the DBMS_VECTOR_CHAIN.RERANK analog.

The reference retrieves with a single-stage bi-encoder vector search
(03_vector_search.sql:20-40: VECTOR_DISTANCE order-by over MiniLM
embeddings); the DBMS_VECTOR_CHAIN package the reference already uses
for UTL_TO_TEXT/CHUNKS/EMBEDDINGS (01_pdf_to_vector.sql:219-247) also
ships RERANK — re-scoring a candidate list against the query with a
cross-encoder model for a higher-precision final ordering. This module
is that second stage, Spark-first:

- stage 1 (recall): any existing retriever — IVF/HNSW vector top-k,
  BM25, hybrid RRF — produces a small candidate set per query;
- stage 2 (precision): each (query, candidate) pair is scored by a
  BERT-style cross-encoder (``[CLS] query [SEP] doc [SEP]`` with
  segment ids, [CLS] pooler, 1-logit head) executed through the same
  ONNX runtime as VECTOR_EMBEDDING (:mod:`.onnx_rt` — onnxruntime when
  installed, else the numpy graph executor), Arrow-batched in
  ``mapInPandas``.

Scale posture: scoring is embarrassingly parallel (model ships to
executors, candidate rows never shuffle for scoring); the only shuffle
is the per-query top-k window on the candidate set — which is k·queries
rows, not corpus-sized. Cross-encoder cost is O(pairs), which is why it
runs on stage-1 candidates, never the corpus.

By default every pair is padded to the tokenizer's ``max_len`` (not the
batch max), making each row's score independent of its batch cohort —
scores are reproducible under repartition, the same discipline X7 applies
to sampling. ``pad_to_max=False`` trades that for less compute on short
text.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .embedding import WordPieceTokenizer


def score_pairs_batch(sess, tokenizer, pairs, pad_to_max: bool = True):
    """Score one batch of (text_a, text_b) pairs through a cross-encoder
    ONNX session; returns a float32 vector of logits, one per pair.

    Feed contract: ``input_ids`` / ``attention_mask`` / ``token_type_ids``
    (int64, [batch, seq]); output must be [batch, 1] or [batch] logits —
    a rank-3 output means the model is an encoder, not a cross-encoder,
    and is rejected loudly.
    """
    import numpy as np

    if not pairs:
        return np.zeros(0, dtype=np.float32)
    encoded = [tokenizer.encode_pair(a, b) for a, b in pairs]
    width = tokenizer.max_len if pad_to_max else max(len(e[0]) for e in encoded)
    ids = np.full((len(encoded), width), tokenizer.pad_id, dtype=np.int64)
    mask = np.zeros((len(encoded), width), dtype=np.int64)
    types = np.zeros((len(encoded), width), dtype=np.int64)
    for r, (e_ids, e_types) in enumerate(encoded):
        ids[r, : len(e_ids)] = e_ids
        mask[r, : len(e_ids)] = 1
        types[r, : len(e_types)] = e_types
    declared = {i.name for i in sess.get_inputs()}
    feeds = {"input_ids": ids, "attention_mask": mask}
    if "token_type_ids" in declared:
        feeds["token_type_ids"] = types
    unknown = declared - set(feeds)
    if unknown:
        raise ValueError(f"unsupported cross-encoder input(s): {sorted(unknown)}")
    out = np.asarray(sess.run(None, feeds)[0], dtype=np.float32)
    if out.ndim == 2 and out.shape[1] == 1:
        return out[:, 0]
    if out.ndim == 1:
        return out
    raise ValueError(
        f"cross-encoder output must be [batch,1] or [batch] logits, got "
        f"shape {out.shape} — this looks like an encoder export, not a "
        "reranker"
    )


class CrossEncoderReranker:
    """Distributed cross-encoder scoring + per-query top-k rerank.

    One inference session per Python worker (lazy, executor co-located —
    candidates never leave the cluster), Arrow-batched via
    ``mapInPandas``. ``vocab_path`` defaults to ``vocab.txt`` next to the
    model, as with :class:`.embedding.OnnxEmbedder`.
    """

    def __init__(
        self,
        model_path: str,
        batch_size: int = 64,
        vocab_path: str | None = None,
        max_len: int = 128,
        pad_to_max: bool = True,
    ):
        self.model_path = model_path
        self.batch_size = batch_size
        self.vocab_path = vocab_path
        self.max_len = max_len
        self.pad_to_max = pad_to_max

    def _load_tokenizer(self):
        import os

        path = self.vocab_path or os.path.join(
            os.path.dirname(self.model_path), "vocab.txt"
        )
        return WordPieceTokenizer.from_vocab_file(path, max_len=self.max_len)

    def score_df(
        self,
        df: DataFrame,
        query_col: str,
        doc_col: str,
        out_col: str = "ce_score",
    ) -> DataFrame:
        """Append a cross-encoder relevance score for each
        (``query_col``, ``doc_col``) row. No shuffle — pure map stage."""
        from oracle_vectorsearch_example_spark.functions.onnx_rt import get_runtime

        ort = get_runtime()
        model_path, batch = self.model_path, self.batch_size
        pad_to_max = self.pad_to_max
        load_tok = self._load_tokenizer
        schema = T.StructType(
            df.schema.fields + [T.StructField(out_col, T.FloatType())]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sess = ort.InferenceSession(model_path)
            tok = load_tok()
            for pdf in batches:
                pairs = list(
                    zip(pdf[query_col].fillna(""), pdf[doc_col].fillna(""))
                )
                scores = []
                for i in range(0, len(pairs), batch):
                    scores.extend(
                        score_pairs_batch(
                            sess, tok, pairs[i : i + batch], pad_to_max
                        ).tolist()
                    )
                pdf[out_col] = pd.Series(scores, index=pdf.index, dtype="float32")
                yield pdf

        return df.mapInPandas(run, schema=schema)

    def rerank_topk(
        self,
        candidates: DataFrame,
        query_id_col: str,
        query_col: str,
        doc_col: str,
        k: int,
        out_col: str = "ce_score",
        rank_col: str = "rank",
        tiebreak: str | None = None,
    ) -> DataFrame:
        """Score stage-1 candidates and keep the top ``k`` per query by
        cross-encoder score. ``tiebreak`` (e.g. a doc-id column) makes
        near-tie ordering deterministic; the per-query window is the
        only shuffle and runs on k·queries candidate rows."""
        scored = self.score_df(candidates, query_col, doc_col, out_col)
        order = [F.desc(out_col)]
        if tiebreak is not None:
            order.append(F.col(tiebreak).asc())
        win = Window.partitionBy(query_id_col).orderBy(*order)
        return (
            scored.withColumn(rank_col, F.row_number().over(win))
            .filter(F.col(rank_col) <= k)
        )
