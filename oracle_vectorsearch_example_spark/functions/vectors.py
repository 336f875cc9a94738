"""Vector column utilities.

- ``parse_vector``: TO_VECTOR analog (01_pdf_to_vector.sql:141-144) — parse
  a JSON array string '[0.1, ...]' into array<double>.
- ``normalize_l2``: unit-normalize an array column.
- ``dim_check``: validation filter for the fixed-dimension contract
  (VECTOR(384, FLOAT32) → dim enforced by pipeline, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_vector(s: Column) -> Column:
    """Parse '[1.5, 2.5]'-style strings to array<double> (F1/TO_VECTOR)."""
    return F.from_json(s, T.ArrayType(T.DoubleType()))


def normalize_l2(v: Column) -> Column:
    d = F.transform(v, lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(nrm > 0, F.transform(d, lambda x: x / nrm)).otherwise(d)


def dim_violations(df: DataFrame, vec_col: str, dim: int) -> int:
    """Rows whose vector is null or not exactly ``dim`` long (the pipeline
    enforcement of the fixed-dim vector type)."""
    c = F.col(vec_col)
    return df.filter(c.isNull() | (F.size(c) != dim)).count()


def arrow_list_matrix(arr, dtype="float64"):
    """(n, d) numpy matrix from an Arrow ``list<numeric>`` /
    ``fixed_size_list`` column — a zero-copy reshape of the child values
    buffer when rows are uniform-length (the fixed-dim vector contract),
    instead of the per-row ``np.array(list(...))`` stack that measured
    ~3× slower per batch (r14 opt note; applied r15, guide §4.2: an
    Arrow list column is one contiguous values buffer + offsets).
    Ragged or null-bearing input falls back to the per-row copy so
    error behavior matches the old path (object array → the same
    downstream error, never a silent NaN)."""
    import numpy as np
    import pyarrow as pa

    if arr.null_count or arr.values.null_count:
        return np.array([np.asarray(v) for v in arr.to_pylist()], dtype=dtype)
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(flat.reshape(-1, d), dtype=dtype)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
        flat = arr.values.to_numpy(zero_copy_only=False)
        mat = flat[offsets[0] : offsets[-1]].reshape(len(arr), int(widths[0]))
        return np.ascontiguousarray(mat, dtype=dtype)
    return np.array([np.asarray(v) for v in arr.to_pylist()], dtype=dtype)


def arrow_topk_per_group(qids, bids, dists, k):
    """Top-k rows per qid from parallel numpy arrays, ordered by
    (qid, dist, id): ONE stable lexsort + a rank-within-group mask —
    the numpy replacement for the per-partition pandas
    sort_values/groupby-head reduce in the Arrow search paths. Returns
    the three arrays sorted and truncated."""
    import numpy as np

    order = np.lexsort((bids, dists, qids))
    q, b, d = qids[order], bids[order], dists[order]
    starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
    group_start = np.repeat(starts, np.diff(np.r_[starts, len(q)]))
    keep = (np.arange(len(q)) - group_start) < k
    return q[keep], b[keep], d[keep]
