"""Structural tests for the ONNX embedding contract (no onnxruntime needed).

The reference's core feature is in-DB ONNX inference of all_MiniLM_L12_V2
(load_models.py:88-101; models/README.md:40). onnxruntime is absent here, so
these tests drive :func:`encode_onnx_batch` with fake session objects that
mimic the two real input contracts:

- standard transformer export: ``input_ids``/``attention_mask``
  (+ ``token_type_ids``) int64 tensors → (batch, seq, hidden)
  last_hidden_state, mean-pooled + L2-normalized downstream;
- tokenizer-bundling export (Oracle's packaged model): single
  ``tensor(string)`` input → (batch, dim) sentence vectors.
"""

from __future__ import annotations

import numpy as np
import pytest

from oracle_vectorsearch_example_spark.functions.embedding import (
    WordPieceTokenizer,
    encode_onnx_batch,
)

VOCAB = {
    "[PAD]": 0,
    "[UNK]": 1,
    "[CLS]": 2,
    "[SEP]": 3,
    "hello": 4,
    "world": 5,
    "un": 6,
    "##believ": 7,
    "##able": 8,
    ",": 9,
    "!": 10,
}


@pytest.fixture
def tok():
    return WordPieceTokenizer(VOCAB, max_len=8)


class _FakeInput:
    def __init__(self, name, type_):
        self.name = name
        self.type = type_


class _IdModelSession:
    """input_ids/attention_mask/token_type_ids → last_hidden_state whose
    hidden vector at position t is [input_ids[t], 1]; padded positions get
    a poison value so the test proves masked pooling excludes them."""

    def __init__(self, hidden=2, with_token_type=True):
        names = ["input_ids", "attention_mask"]
        if with_token_type:
            names.append("token_type_ids")
        self._inputs = [_FakeInput(n, "tensor(int64)") for n in names]
        self.feeds = None

    def get_inputs(self):
        return self._inputs

    def run(self, _out, feeds):
        self.feeds = feeds
        ids = feeds["input_ids"].astype(np.float32)
        mask = feeds["attention_mask"].astype(np.float32)
        b, s = ids.shape
        hid = np.stack([ids, np.ones_like(ids)], axis=2)  # (b, s, 2)
        hid[mask == 0] = 1e6  # poison padding — masked pooling must drop it
        return [hid]


class _StringModelSession:
    def __init__(self, dim=4):
        self._inputs = [_FakeInput("input", "tensor(string)")]
        self.dim = dim

    def get_inputs(self):
        return self._inputs

    def run(self, _out, feeds):
        (texts,) = feeds.values()
        out = np.array(
            [[float(len(t))] + [1.0] * (self.dim - 1) for t in texts],
            dtype=np.float32,
        )
        return [out]


def test_wordpiece_basic_and_continuation(tok):
    # greedy longest-match with ## continuation pieces
    assert tok.encode("unbelievable") == [2, 6, 7, 8, 3]
    # punctuation isolated; unknown word → [UNK]
    assert tok.encode("hello, zzz!") == [2, 4, 9, 1, 10, 3]
    # lowercasing
    assert tok.encode("HELLO WORLD") == [2, 4, 5, 3]


def test_wordpiece_truncates_to_max_len(tok):
    ids = tok.encode("hello world " * 50)
    assert len(ids) <= tok.max_len
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id


def test_wordpiece_from_vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    t = WordPieceTokenizer.from_vocab_file(str(p))
    assert t.encode("hello") == [2, 4, 3]


def test_id_model_feeds_and_padding(tok):
    sess = _IdModelSession()
    out = encode_onnx_batch(sess, tok, ["hello world", "hello"])
    assert out.shape == (2, 2) and out.dtype == np.float32
    feeds = sess.feeds
    assert set(feeds) == {"input_ids", "attention_mask", "token_type_ids"}
    # right-padded to batch max length with pad_id, mask marks real tokens
    assert feeds["input_ids"].tolist() == [[2, 4, 5, 3], [2, 4, 3, 0]]
    assert feeds["attention_mask"].tolist() == [[1, 1, 1, 1], [1, 1, 1, 0]]
    assert feeds["input_ids"].dtype == np.int64
    assert (feeds["token_type_ids"] == 0).all()


def test_masked_mean_pool_excludes_padding(tok):
    out = encode_onnx_batch(_IdModelSession(), tok, ["hello world", "hello"])
    # row 1 is padded; poison (1e6) at the pad slot must not leak into the
    # pooled value. Expected pre-norm pooled row 1 = mean of [2,1],[4,1],[3,1].
    expect = np.array([3.0, 1.0])
    expect = expect / np.linalg.norm(expect)
    assert np.allclose(out[1], expect, atol=1e-6)


def test_rows_are_l2_normalized(tok):
    out = encode_onnx_batch(_IdModelSession(), tok, ["hello world hello", "world"])
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)


def test_string_input_model_bypasses_tokenizer():
    out = encode_onnx_batch(_StringModelSession(), None, ["abc", "abcdef"])
    assert out.shape == (2, 4)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)
    # len-based fake: first component ratio reflects text lengths pre-norm
    assert out[1, 0] > out[0, 0] * 0  # sanity: well-defined floats
    assert not np.isnan(out).any()


def test_unknown_input_name_rejected(tok):
    class _Weird(_IdModelSession):
        def __init__(self):
            self._inputs = [_FakeInput("mystery_tensor", "tensor(int64)")]

    with pytest.raises(ValueError, match="unsupported ONNX model input"):
        encode_onnx_batch(_Weird(), tok, ["hello"])


def test_missing_required_input_rejected(tok):
    class _OnlyIds(_IdModelSession):
        def __init__(self):
            self._inputs = [_FakeInput("input_ids", "tensor(int64)")]

    with pytest.raises(ValueError, match="missing expected inputs"):
        encode_onnx_batch(_OnlyIds(), tok, ["hello"])


def test_pooled_2d_output_accepted(tok):
    class _Pooled(_IdModelSession):
        def run(self, _out, feeds):
            b = feeds["input_ids"].shape[0]
            return [np.arange(b * 3, dtype=np.float32).reshape(b, 3) + 1.0]

    out = encode_onnx_batch(_Pooled(), tok, ["hello", "world"])
    assert out.shape == (2, 3)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-6)
