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
