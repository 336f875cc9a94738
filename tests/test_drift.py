"""X43 PSI drift monitoring: identity reads ~0, planted shifts read
high exactly on the shifted dims, numpy reference parity on the frozen
spec, outlier clamping, degenerate dims, layout determinism."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.drift import (
    psi_drifted_dims,
    psi_report,
)

DIM, N = 4, 600


def _frame(spark, x):
    return spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def ref_cur(spark):
    rng = np.random.RandomState(11)
    ref = rng.randn(N, DIM)
    cur = rng.randn(N, DIM)
    cur[:, 1] += 2.0   # mean shift on dim 1
    cur[:, 3] *= 3.0   # variance blowup on dim 3
    return _frame(spark, ref), _frame(spark, cur), ref, cur


def _py_psi(ref, cur, d, n_buckets=10, alpha=0.5):
    """Independent reference of the frozen spec."""
    lo, hi = ref[:, d].min(), ref[:, d].max()

    def bucket(x):
        if hi == lo:
            return 1
        b = math.floor((x - lo) / (hi - lo) * float(n_buckets)) + 1
        return min(max(b, 1), n_buckets)

    rc, cc = {}, {}
    for x in ref[:, d]:
        rc[bucket(x)] = rc.get(bucket(x), 0) + 1
    for x in cur[:, d]:
        cc[bucket(x)] = cc.get(bucket(x), 0) + 1
    rn, cn = len(ref), len(cur)
    psi = 0.0
    # fixed-B convention: sum over the FULL bucket grid — when rn != cn,
    # add-alpha gives buckets empty in both frames a nonzero term
    for b in range(1, n_buckets + 1):
        p = (rc.get(b, 0) + alpha) / (rn + alpha * n_buckets)
        q = (cc.get(b, 0) + alpha) / (cn + alpha * n_buckets)
        psi += (q - p) * math.log(q / p)
    return round(psi, 6)


def test_identity_reads_stable(spark, ref_cur):
    r, _, _, _ = ref_cur
    out = {row["dim"]: row["psi"] for row in psi_report(r, r).collect()}
    assert set(out) == set(range(DIM))
    for d, v in out.items():
        assert v == 0.0, (d, v)


def test_planted_shifts_flag_exactly_their_dims(spark, ref_cur):
    r, c, _, _ = ref_cur
    out = {row["dim"]: row["psi"] for row in psi_report(r, c).collect()}
    assert out[1] > 0.25 and out[3] > 0.25
    assert out[0] < 0.1 and out[2] < 0.1
    flagged = sorted(
        row["dim"] for row in psi_drifted_dims(r, c, threshold=0.25).collect()
    )
    assert flagged == [1, 3]


def test_matches_python_reference(spark, ref_cur):
    r, c, ref, cur = ref_cur
    out = {row["dim"]: row["psi"] for row in psi_report(r, c).collect()}
    for d in range(DIM):
        assert abs(out[d] - _py_psi(ref, cur, d)) <= 1e-6, d


def test_outliers_clamp_into_edge_buckets(spark):
    ref = _frame(__import__("pyspark").sql.SparkSession.getActiveSession(),
                 np.linspace(0, 1, 50).reshape(50, 1))
    cur = _frame(ref.sparkSession, np.array([[-100.0]] * 25 + [[100.0]] * 25))
    out = psi_report(ref, cur).collect()
    assert len(out) == 1 and math.isfinite(out[0]["psi"]) and out[0]["psi"] > 0.25


def test_degenerate_constant_dim(spark):
    ref = _frame(spark, np.ones((40, 2)) * 7.0)
    cur = _frame(spark, np.ones((40, 2)) * 7.0)
    out = psi_report(ref, cur).collect()
    assert all(r["psi"] == 0.0 for r in out)


def test_unequal_counts_full_grid(spark):
    """Fixed-B PSI (ADVICE r7): with n_ref != n_cur, buckets empty in
    BOTH frames still carry a nonzero smoothed term. Ref occupies only
    bucket 1 and bucket 10 (two point masses); cur is half the size in
    bucket 1 — buckets 2-9 are empty in both, and the Spark result must
    match the full-grid python reference, not the observed-cells sum."""
    ref = np.array([[0.0]] * 30 + [[1.0]] * 30)
    cur = np.array([[0.0]] * 30)
    out = psi_report(_frame(spark, ref), _frame(spark, cur)).collect()
    assert len(out) == 1
    assert out[0]["psi"] == _py_psi(ref, cur, 0)
    # the observed-cells-only sum would differ: check the grid matters
    alpha, B, rn, cn = 0.5, 10, 60, 30
    observed = sum(
        (q - p) * math.log(q / p)
        for p, q in [
            ((30 + alpha) / (rn + alpha * B), (30 + alpha) / (cn + alpha * B)),
            ((30 + alpha) / (rn + alpha * B), (0 + alpha) / (cn + alpha * B)),
        ]
    )
    assert abs(out[0]["psi"] - round(observed, 6)) > 1e-6


def test_repartition_determinism(spark, ref_cur):
    r, c, _, _ = ref_cur
    a = sorted(map(tuple, psi_report(r, c).collect()))
    b = sorted(map(tuple, psi_report(r.repartition(7), c.repartition(5)).collect()))
    assert a == b
