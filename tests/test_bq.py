"""Binary vector quantization (operators/bq.py, X24) — frozen-spec
packing vs a numpy reference, hamming parity with brute force, the
pure-JVM encode plan, and edge shapes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.bq import (
    bq_encode_df,
    bq_topk_search,
)


def _pack_ref(v, dim):
    out = []
    for j in range((dim + 63) // 64):
        w = 0
        for i, b in enumerate(v[j * 64 : (j + 1) * 64] > 0):
            if b:
                w |= 1 << i
        out.append(w - (1 << 64) if w >= (1 << 63) else w)  # signed i64
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(4)
    n, d = 400, 70  # non-multiple of 64 → a partial second word
    vecs = rng.normal(size=(n, d))
    vecs[0, :7] = 0.0  # exact zeros must pack as 0 bits
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()
    return df, vecs


def test_encode_matches_reference_and_stays_jvm(spark, corpus):
    df, vecs = corpus
    d = vecs.shape[1]
    codes = bq_encode_df(df, dim=d)
    got = {r["vec_id"]: list(r["words"]) for r in codes.collect()}
    assert all(got[i] == _pack_ref(vecs[i], d) for i in range(len(vecs)))
    # the encode must be whole-stage JVM — no Python eval in the plan
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hamming_topk_matches_brute_force(spark, corpus):
    df, vecs = corpus
    codes = bq_encode_df(df, dim=vecs.shape[1])
    q = df.filter("vec_id < 6").selectExpr(
        "vec_id as qid", "embedding as qvec"
    )
    hits = bq_topk_search(codes, q, k=7, exclude_self=True).collect()
    signs = vecs > 0
    ids = np.arange(len(vecs))
    for qid in range(6):
        ham = (signs != signs[qid]).sum(axis=1)
        keep = ids != qid
        order = np.lexsort((ids[keep], ham[keep]))[:7]
        expect = [(int(ids[keep][o]), int(ham[keep][o])) for o in order]
        mine = [
            (r["vec_id"], r["hamming"])
            for r in sorted(hits, key=lambda r: r["rank"])
            if r["qid"] == qid
        ]
        assert mine == expect


def test_dim_inference_and_keep_cols(spark, corpus):
    df, vecs = corpus
    withtag = df.withColumn("tag", F.col("vec_id") % 3)
    codes = bq_encode_df(withtag, keep_cols=["tag"])  # dim inferred
    row = codes.filter("vec_id = 5").collect()[0]
    assert list(row["words"]) == _pack_ref(vecs[5], vecs.shape[1])
    assert row["tag"] == 5 % 3
    with pytest.raises(ValueError, match="empty"):
        bq_encode_df(df.filter(F.lit(False)))


def test_exact_64_dim_single_word(spark):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(50, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    codes = bq_encode_df(df, dim=64)
    got = {r["vec_id"]: list(r["words"]) for r in codes.collect()}
    assert all(len(w) == 1 for w in got.values())
    assert all(got[i] == _pack_ref(vecs[i], 64) for i in range(50))
