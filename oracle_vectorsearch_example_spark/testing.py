"""Shared helpers for the correctness harness (tests + scripts).

``normalize`` mirrors the driver's order-insensitive value hash: columns
sorted by name, rows sorted, values tagged by type with exact float repr.
"""

from __future__ import annotations

import math


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, bool):
            return f"b:{v}"
        if isinstance(v, float):
            if math.isnan(v):
                return "f:nan"
            return f"f:{v!r}"
        if isinstance(v, int):
            return f"i:{v}"
        return f"s:{v}"

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def duckdb_connect_views(sf_dir: str):
    """DuckDB connection with the driver's table views registered."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
