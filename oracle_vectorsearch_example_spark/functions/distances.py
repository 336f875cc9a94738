"""Vector distance metrics as pure column expressions — no UDFs.

The reference documents four metrics for VECTOR_DISTANCE and its index
choice (01_pdf_to_vector.sql:86-92): COSINE, EUCLIDEAN (L2), DOT_PRODUCT,
MANHATTAN (L1). Expressed here with ``zip_with`` + ``aggregate`` so the
whole computation stays inside Catalyst codegen — the JVM fast path; a
Python UDF here would put Arrow serialization on every pair at 100 TB.

All math is done in double (float32 inputs widen exactly), accumulation is
a sequential left fold — deterministic for the correctness harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ (metric DOT_PRODUCT, 01_pdf_to_vector.sql:90)."""
    return _fold_sum(F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (metric EUCLIDEAN, 01_pdf_to_vector.sql:89)."""
    return F.sqrt(
        _fold_sum(F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)))
    )


def l1_distance(a: Column, b: Column) -> Column:
    """Manhattan distance (metric MANHATTAN, 01_pdf_to_vector.sql:91)."""
    return _fold_sum(F.zip_with(_as_double(a), _as_double(b), lambda x, y: F.abs(x - y)))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); 0 when either vector is zero."""
    num = dot_product(a, b)
    den = F.sqrt(dot_product(a, a)) * F.sqrt(dot_product(b, b))
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 − cosine similarity (metric COSINE — the reference's index metric,
    01_pdf_to_vector.sql:88, :96)."""
    return F.lit(1.0) - cosine_similarity(a, b)


_METRICS = {
    "cosine": cosine_distance,
    "euclidean": l2_distance,
    "l2": l2_distance,
    "dot": lambda a, b: -dot_product(a, b),  # higher dot = closer → negate for "distance"
    "dot_product": lambda a, b: -dot_product(a, b),
    "manhattan": l1_distance,
    "l1": l1_distance,
}


def vector_distance(a: Column, b: Column, metric: str = "cosine") -> Column:
    """VECTOR_DISTANCE(a, b, metric) analog. Lower is always closer
    (dot product is negated, matching Oracle's DOT metric ordering)."""
    try:
        return _METRICS[metric.lower()](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}") from None
