"""Synthetic text-corpus fixture at dedup-bench scale (r5).

The sf0.1 documents table (5k rows) exercises dedup correctness; this
generator exists to MEASURE the dedup pipeline's scaling shape — the
banded MinHash join's cost should grow with corpus size and bucket
co-occupancy, never quadratically. Like ``ann_fixture``:

- deterministic per doc id (splitmix64 counter hashes — content is a pure
  function of (seed, doc_id), independent of partitioning or rebuilds);
- a controlled duplication structure: ``dup_rate`` of docs are near-copies
  of an earlier doc (same words, one word substituted) — so the expected
  candidate-pair count is known and recall is checkable;
- generated distributed (mapInPandas over ``spark.range``), written once,
  parameter-keyed cache dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_DOCS = 200_000
DEFAULT_WORDS = 60
DEFAULT_VOCAB = 200_000
DEFAULT_DUP_RATE = 0.10
DEFAULT_SEED = 11


def _mix(z: int) -> int:
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
    return (z ^ (z >> 31)) % (1 << 64)


def _doc_words(doc_id: int, words: int, vocab: int, seed: int) -> list[str]:
    base = _mix(seed * 0x9E3779B97F4A7C15 + doc_id)
    return [f"w{_mix(base + j) % vocab}" for j in range(words)]


def doc_text(
    doc_id: int,
    words: int = DEFAULT_WORDS,
    vocab: int = DEFAULT_VOCAB,
    dup_rate: float = DEFAULT_DUP_RATE,
    seed: int = DEFAULT_SEED,
) -> str:
    """Deterministic text of one doc. Docs whose hash falls under
    ``dup_rate`` (and id ≥ 16) are near-copies of an earlier ORIGINAL doc
    (one word substituted), so duplication never chains and the true
    near-dup pair structure is a union of stars around originals."""
    h = _mix(seed + doc_id * 3)
    is_dup = doc_id >= 16 and (h % 10_000) < int(dup_rate * 10_000)
    if not is_dup:
        return " ".join(_doc_words(doc_id, words, vocab, seed))
    # copy an earlier ORIGINAL (re-test the dup predicate for the base;
    # walk back until an original is found — bounded, dup_rate < 1)
    b = doc_id - 1 - (_mix(h) % min(doc_id - 8, 4096))
    while b >= 16 and (_mix(seed + b * 3) % 10_000) < int(dup_rate * 10_000):
        b -= 1
    w = _doc_words(b, words, vocab, seed)
    w[_mix(h + 1) % len(w)] = f"w{_mix(h + 2) % vocab}"
    return " ".join(w)


def generate_corpus(
    spark: SparkSession,
    n_docs: int = DEFAULT_DOCS,
    words: int = DEFAULT_WORDS,
    vocab: int = DEFAULT_VOCAB,
    dup_rate: float = DEFAULT_DUP_RATE,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": [
                        doc_text(int(i), words, vocab, dup_rate, seed) for i in ids
                    ],
                }
            )

    return spark.range(0, n_docs, 1, 32).mapInPandas(
        run, schema="doc_id long, text string"
    )


def ensure_corpus_fixture(
    spark: SparkSession,
    base_dir: str,
    n_docs: int = DEFAULT_DOCS,
    words: int = DEFAULT_WORDS,
    vocab: int = DEFAULT_VOCAB,
    dup_rate: float = DEFAULT_DUP_RATE,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Idempotent build-once parquet cache, parameter-keyed dir."""
    tag = f"docs{n_docs}_w{words}_v{vocab}_d{dup_rate:g}_s{seed}"
    path = f"{base_dir.rstrip('/')}/{tag}"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = marker.getFileSystem(conf)
    if not fs.exists(marker):
        generate_corpus(spark, n_docs, words, vocab, dup_rate, seed).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)
