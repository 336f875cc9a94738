"""Cross-encoder rerank (X28) — the DBMS_VECTOR_CHAIN.RERANK analog.

The numeric contract is pinned the same way as the embedder's
(test_onnx_contract.py): the fixture cross-encoder's logits are checked
against an INDEPENDENT forward pass written here with loops/einsum and
``math.erf`` — none of the executor's code paths.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.embedding import WordPieceTokenizer
from oracle_vectorsearch_example_spark.functions.onnx_rt import (
    NumpySession,
    _fixture_vocab,
    cached_tiny_cross_encoder,
    make_tiny_cross_encoder,
    tiny_cross_encoder_weights,
)
from oracle_vectorsearch_example_spark.functions.rerank import (
    CrossEncoderReranker,
    score_pairs_batch,
)


def _softmax(x, axis=-1):
    m = x - x.max(axis=axis, keepdims=True)
    e = np.exp(m)
    return e / e.sum(axis=axis, keepdims=True)


def reference_cross_forward(w, ids, mask, types, heads=2):
    """Independent cross-encoder forward pass (mirrors the GRAPH spec:
    word+pos+segment embeddings, pre-head tiny-encoder body, [CLS] Tanh
    pooler, 1-logit classifier)."""
    erf = np.vectorize(math.erf)
    B, S = ids.shape
    H = w["word_emb"].shape[1]
    hd = H // heads
    x = w["word_emb"][ids] + w["pos_emb"][:S] + w["type_emb"][types]
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    h = (x - mu) / np.sqrt(var + 1e-5) * w["ln1_g"] + w["ln1_b"]
    q = (h @ w["Wq"]).reshape(B, S, heads, hd).transpose(0, 2, 1, 3)
    k = (h @ w["Wk"]).reshape(B, S, heads, hd).transpose(0, 2, 1, 3)
    v = (h @ w["Wv"]).reshape(B, S, heads, hd).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
    scores = scores + (1.0 - mask[:, None, None, :].astype(np.float64)) * -10000.0
    ctx = (_softmax(scores) @ v).transpose(0, 2, 1, 3).reshape(B, S, H)
    x2 = x + ctx @ w["Wo"]
    a = x2 @ w["W1"] + w["b1"]
    g = 0.5 * a * (1.0 + erf(a / np.sqrt(2.0)))
    x3 = x2 + g @ w["W2"] + w["b2"]
    mu = x3.mean(-1, keepdims=True)
    var = ((x3 - mu) ** 2).mean(-1, keepdims=True)
    hid = (x3 - mu) / np.sqrt(var + 1e-5) * w["ln2_g"] + w["ln2_b"]
    pooled = np.tanh(hid[:, 0, :] @ w["pool_W"] + w["pool_b"])
    return (pooled @ w["cls_W"] + w["cls_b"])[:, 0]


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return cached_tiny_cross_encoder(str(tmp_path_factory.mktemp("xenc")))


@pytest.fixture(scope="module")
def tok():
    vocab = {t: i for i, t in enumerate(_fixture_vocab(64).splitlines())}
    return WordPieceTokenizer(vocab, max_len=64)


def test_fixture_is_deterministic():
    assert make_tiny_cross_encoder() == make_tiny_cross_encoder()
    assert len(make_tiny_cross_encoder()) > 1000


def test_session_contract(model_path):
    sess = NumpySession(model_path)
    assert [i.name for i in sess.get_inputs()] == [
        "input_ids", "attention_mask", "token_type_ids",
    ]
    assert sess.output_names == ["logits"]


def test_graph_matches_independent_forward(model_path):
    sess = NumpySession(model_path)
    rng = np.random.RandomState(7)
    ids = rng.randint(0, 64, size=(4, 9)).astype(np.int64)
    mask = np.ones((4, 9), dtype=np.int64)
    mask[2, 6:] = 0
    types = np.zeros((4, 9), dtype=np.int64)
    types[:, 5:] = 1
    got = sess.run(
        None, {"input_ids": ids, "attention_mask": mask, "token_type_ids": types}
    )[0]
    want = reference_cross_forward(tiny_cross_encoder_weights(), ids, mask, types)
    assert got.shape == (4, 1)
    np.testing.assert_allclose(got[:, 0].astype(np.float64), want, atol=2e-3)


def test_segment_embedding_matters(model_path):
    """Same tokens with different segment ids must score differently —
    proves token_type_ids actually reach the graph."""
    sess = NumpySession(model_path)
    ids = np.array([[2, 30, 31, 3, 32, 3]], dtype=np.int64)
    mask = np.ones((1, 6), dtype=np.int64)
    t0 = np.zeros((1, 6), dtype=np.int64)
    t1 = np.array([[0, 0, 0, 0, 1, 1]], dtype=np.int64)
    a = sess.run(None, {"input_ids": ids, "attention_mask": mask, "token_type_ids": t0})[0]
    b = sess.run(None, {"input_ids": ids, "attention_mask": mask, "token_type_ids": t1})[0]
    assert abs(float(a[0, 0]) - float(b[0, 0])) > 1e-6


# ------------------------------------------------------------ pair encoding


def test_encode_pair_layout(tok):
    ids, types = tok.encode_pair("the quick fox", "lazy dog")
    cls_id, sep_id = tok.cls_id, tok.sep_id
    assert ids[0] == cls_id
    sep_positions = [i for i, t in enumerate(ids) if t == sep_id]
    assert len(sep_positions) == 2 and sep_positions[1] == len(ids) - 1
    # segment 0 covers [CLS]..first [SEP]; segment 1 the rest
    first_sep = sep_positions[0]
    assert types[: first_sep + 1] == [0] * (first_sep + 1)
    assert types[first_sep + 1 :] == [1] * (len(ids) - first_sep - 1)
    assert len(ids) == len(types)


def test_encode_pair_truncates_longest_first(tok):
    long_doc = " ".join(["vector"] * 200)
    ids, types = tok.encode_pair("the quick fox", long_doc)
    assert len(ids) <= tok.max_len
    # the short query survives intact: segment 0 = [CLS] + 3 words + [SEP]
    assert types.count(0) == 5
    # symmetric: a long query is the one truncated against a short doc
    ids2, types2 = tok.encode_pair(long_doc, "lazy dog")
    assert len(ids2) <= tok.max_len
    assert types2.count(1) == 3  # doc 2 words + final [SEP]


def test_score_pairs_batch_shapes(model_path, tok):
    sess = NumpySession(model_path)
    out = score_pairs_batch(sess, tok, [("the fox", "lazy dog"), ("a", "b")])
    assert out.shape == (2,) and out.dtype == np.float32
    assert score_pairs_batch(sess, tok, []).shape == (0,)


def test_pad_to_max_makes_scores_cohort_independent(model_path, tok):
    """With fixed-length padding a pair's score does not depend on what
    else shares its batch — the property the reranker's determinism
    rests on."""
    sess = NumpySession(model_path)
    alone = score_pairs_batch(sess, tok, [("the fox", "lazy dog")])
    with_long = score_pairs_batch(
        sess, tok,
        [("the fox", "lazy dog"), ("the quick brown fox", " ".join(["dog"] * 40))],
    )
    assert alone[0] == with_long[0]  # bitwise, not just close


def test_encoder_output_rejected(model_path, tok):
    from oracle_vectorsearch_example_spark.functions.onnx_rt import cached_tiny_model

    enc_sess = NumpySession(cached_tiny_model())
    with pytest.raises(ValueError, match="encoder export"):
        score_pairs_batch(enc_sess, tok, [("a", "b")])


# ------------------------------------------------------------ Spark surface


def test_rerank_topk_spark(spark, model_path):
    docs = [
        (0, "vector search over a data base"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the lazy dog"),
        (3, "vector vector vector"),
        (4, "search the base"),
    ]
    cands = spark.createDataFrame(
        [(q, d, t) for q in ("vector search", "lazy dog") for d, t in docs],
        "query string, doc_id long, text string",
    )
    rr = CrossEncoderReranker(model_path, max_len=32)
    out = rr.rerank_topk(
        cands, query_id_col="query", query_col="query", doc_col="text",
        k=3, tiebreak="doc_id",
    )
    rows = out.collect()
    assert len(rows) == 6  # 3 per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        scores = [r.ce_score for r in rs]
        assert scores == sorted(scores, reverse=True)

    # distributed scores == local scoring of the same pairs
    tokenizer = WordPieceTokenizer(
        {t: i for i, t in enumerate(_fixture_vocab(64).splitlines())}, max_len=32
    )
    sess = NumpySession(model_path)
    for r in rows:
        pair_text = dict(docs)[r.doc_id]
        local = score_pairs_batch(sess, tokenizer, [(r.query, pair_text)])[0]
        assert abs(local - r.ce_score) < 1e-6


def test_rerank_deterministic_under_repartition(spark, model_path):
    docs = [(i, f"vector search doc {i} " + "dog " * (i % 7)) for i in range(40)]
    base = spark.createDataFrame(
        [("vector search", d, t) for d, t in docs],
        "query string, doc_id long, text string",
    )
    rr = CrossEncoderReranker(model_path, max_len=32)

    def run(df):
        return sorted(
            (r.doc_id, r.rank, r.ce_score)
            for r in rr.rerank_topk(
                df, "query", "query", "text", k=10, tiebreak="doc_id"
            ).collect()
        )

    assert run(base.repartition(7)) == run(base.coalesce(1))
