"""Chunker spec tests — mirrors the reference's chunking contract
(01_pdf_to_vector.sql:209-238): bounded sizes, exact overlap, 1-based
contiguous ids, monotone offsets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.functions.chunker import (
    chunk_by_chars,
    chunk_by_sentences_udf,
    chunk_by_words,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "one two three four five six seven eight nine ten eleven twelve"),
        (2, "single"),
        (3, ""),
        (4, "   "),
        (5, " spaced   out   words here  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_chunks_spec(spark, docs):
    out = chunk_by_words(docs, max_words=5, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # empty/whitespace docs emit no chunks
    assert 3 not in by_doc and 4 not in by_doc
    # doc 2: one word -> one chunk
    assert [r.chunk_text for r in by_doc[2]] == ["single"]
    # doc 1: 12 words, stride 3 -> ceil((12-2)/3) = 4 chunks
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in chunks] == [1, 2, 3, 4]
    texts = [r.chunk_text.split() for r in chunks]
    assert all(len(t) <= 5 for t in texts)
    # overlap: chunk k starts 3 words after chunk k-1
    words = "one two three four five six seven eight nine ten eleven twelve".split()
    for i, t in enumerate(texts):
        assert t == words[i * 3 : i * 3 + 5]
    # offsets are char positions in the space-normalized text
    norm = " ".join(words)
    for r in chunks:
        assert norm[r.chunk_offset : r.chunk_offset + r.chunk_length] == r.chunk_text


def test_word_chunker_normalizes_whitespace(docs):
    out = chunk_by_words(docs.filter(F.col("doc_id") == 5), max_words=3, overlap=1).collect()
    assert out[0].chunk_text == "spaced out words"


def test_char_chunks_spec(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    out = sorted(chunk_by_chars(df, max_chars=4, overlap_chars=1).collect(),
                 key=lambda r: r.chunk_id)
    # stride 3: ceil((10-1)/3) = 3 chunks cover all 10 chars
    assert [r.chunk_text for r in out] == ["abcd", "defg", "ghij"]
    assert [r.chunk_offset for r in out] == [0, 3, 6]


def test_chunker_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_by_words(docs, max_words=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_by_chars(docs, max_chars=10, overlap_chars=10)


def test_sentence_chunker(spark):
    df = spark.createDataFrame(
        [(1, "Short one. A second sentence here! Third? Yes. " * 3)],
        "doc_id long, text string",
    )
    out = sorted(chunk_by_sentences_udf(df, max_words=8, overlap=2).collect(),
                 key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in out] == list(range(1, len(out) + 1))
    assert all(len(r.chunk_text.split()) <= 8 + 2 for r in out)
    # every sentence's words appear in order across chunks
    all_words = " ".join(r.chunk_text for r in out).split()
    assert "Short" in all_words and "Yes." in all_words


def test_vocabulary_tokenizer_chunks(spark):
    """by=vocabulary proxy: budgets count BPE-ish units, so punctuation
    consumes budget ("a,b" = 3 units vs 1 whitespace word)."""
    from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_words

    df = spark.createDataFrame([(1, "a,b c d e")], "doc_id long, text string")
    ws = chunk_by_words(df, max_words=4, overlap=0).collect()
    vocab = chunk_by_words(df, max_words=4, overlap=0, tokenizer="vocabulary").collect()
    assert len(ws) == 1  # 4 whitespace words fit one chunk
    assert len(vocab) == 2  # 6 vocab units (a , b c d e) need two
    assert vocab[0].chunk_text == "a , b c"


def test_custom_split_chunker(spark):
    """split=custom: segments break only at the given separators."""
    from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_custom_udf

    text = "first para words here\n\nsecond para more words\n\nthird one"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_by_custom_udf(df, ["\n\n"], max_words=5, overlap=0).collect()
    # each paragraph fits the budget -> packed greedily, never split mid-para
    assert [r.chunk_id for r in out] == list(range(1, len(out) + 1))
    joined = " ".join(r.chunk_text for r in out)
    assert "first para words here" in joined and "third one" in joined
    # a separator that never matches -> one giant segment, word-split
    one = chunk_by_custom_udf(df, ["<never>"], max_words=5, overlap=0).collect()
    assert all(len(r.chunk_text.split()) <= 5 for r in one)


def test_custom_chunker_rejects_empty_separator(spark):
    from oracle_vectorsearch_example_spark.functions.chunker import chunk_by_custom_udf

    df = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        chunk_by_custom_udf(df, [], max_words=5)
    with pytest.raises(ValueError, match="empty strings"):
        chunk_by_custom_udf(df, ["\n\n", ""], max_words=5)


def test_normalize_text_modes(spark):
    from oracle_vectorsearch_example_spark.functions.chunker import normalize_text

    messy = " “Hi…” – it’s  a\ttest "
    df = spark.createDataFrame([(messy,)], "t string")

    def run(mode):
        return df.select(normalize_text(F.col("t"), mode).alias("o")).collect()[0].o

    assert run("none") == messy
    # punctuation only: typographic -> ASCII, whitespace untouched
    assert run("punctuation") == " \"Hi...\" - it's  a\ttest "
    # whitespace only: trim + collapse (NBSP is not ASCII \s, survives)
    assert run("whitespace") == " “Hi…” – it’s a test"
    assert run("all") == '"Hi..." - it\'s a test'
    with pytest.raises(ValueError, match="normalize must be"):
        run("bogus")


def test_cjk_language_tokenization(spark):
    rows = [(1, "한국어 텍스트와 english words"), (2, "中文测试")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_by_words(df, max_words=4, overlap=0, language="korean").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: tokens = 한 국 어 | 텍 스 트 와 | english words -> 9 tokens, 3 chunks of <=4
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in c1] == ["한 국 어 텍", "스 트 와 english", "words"]
    # doc 2: no whitespace at all still splits per codepoint
    c2 = sorted(by_doc[2], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in c2] == ["中 文 测 试"]
    # english default would have treated doc 2 as one giant token
    eng = chunk_by_words(df.filter("doc_id = 2"), max_words=4, overlap=0).collect()
    assert [r.chunk_text for r in eng] == ["中文测试"]


def test_language_validation(spark, docs):
    with pytest.raises(ValueError, match="language must be"):
        chunk_by_words(docs, max_words=50, language="klingon")


def test_normalize_composes_with_chunking(spark):
    df = spark.createDataFrame(
        [(1, "“quoted”  —  words   here")], "doc_id long, text string"
    )
    out = chunk_by_words(df, max_words=3, overlap=0, normalize="all").collect()
    assert [r.chunk_text for r in out] == ['"quoted" - words', "here"]


# ----------------------------------------------------------- semantic chunks


def test_semantic_chunks_boundaries(spark):
    """Topic shifts (disjoint vocabularies → cosine 0) open chunks;
    same-vocabulary sentences stay together."""
    from oracle_vectorsearch_example_spark.functions.chunker import (
        semantic_chunks,
    )

    # sentences chosen so the md5-byte test-double embedder keeps
    # in-topic cosine high (0.75 / 0.5) and cross-topic low (0.125 / 0)
    # despite its 256-bucket birthday collisions
    text = (
        "apple banana cherry fruit melon grape orange kiwi. "
        "apple banana fruit melon grape basket cherry bowl. "
        "quantum proton neutron electron photon boson lepton field! "
        "proton neutron electron quark photon collider lab experiment? "
        "apple cherry banana grape melon snack plate orange."
    )
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = sorted(
        semantic_chunks(docs, threshold=0.15).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.n_sentences for r in out] == [2, 2, 1]
    assert out[0].chunk_text.startswith("apple banana cherry fruit")
    assert out[1].chunk_text.startswith("quantum")
    assert out[2].chunk_text.endswith("snack plate orange.")


def test_semantic_chunks_single_sentence_and_empty(spark):
    from oracle_vectorsearch_example_spark.functions.chunker import (
        semantic_chunks,
    )

    docs = spark.createDataFrame(
        [(0, "only one sentence here."), (1, "")],
        "doc_id long, text string",
    )
    rows = semantic_chunks(docs).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 0 and rows[0].chunk_id == 0
    assert rows[0].n_sentences == 1


def test_semantic_chunks_threshold_sweep(spark):
    """threshold 0 → nothing splits (cos >= 0 always); threshold > 1 →
    every sentence its own chunk."""
    from oracle_vectorsearch_example_spark.functions.chunker import (
        semantic_chunks,
    )

    text = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    none = semantic_chunks(docs, threshold=0.0).collect()
    assert len(none) == 1 and none[0].n_sentences == 3
    every = semantic_chunks(docs, threshold=1.5).collect()
    assert len(every) == 3 and all(r.n_sentences == 1 for r in every)


def test_semantic_chunks_deterministic(spark):
    from oracle_vectorsearch_example_spark.functions.chunker import (
        semantic_chunks,
    )
    from oracle_vectorsearch_example_spark.sources.io import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")

    def run(d):
        return sorted(map(tuple, semantic_chunks(d).collect()))

    assert run(docs.repartition(7)) == run(docs.coalesce(1))
