"""Side-by-side Spark vs DuckDB oracle comparison — mirrors the driver's
correctness gate (row count + schema + order-insensitive value hash).

Usage: python scripts/compare_oracle.py [sf_dir] [query ...]
Prints one line per query: PASS / FAIL with a diff sample.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_vectorsearch_example_spark.testing import normalize  # noqa: E402


def main():
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import duckdb

    import __spark_entry__ as e
    from oracle_vectorsearch_example_spark.session import get_spark

    spark = get_spark("compare_oracle")
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    from oracle_vectorsearch_example_spark.golden import COUNT_ORACLE as count_only
    names = only or sorted(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: no oracle (rows-only) — {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            n_fail += 1
            continue
        if name in count_only:
            # COUNT-shaped oracle (r12 verdict #2): rows + columns only;
            # value columns are sentinels, hash intentionally incomparable
            if len(srows) != len(drows):
                print(f"FAIL {name}: rows spark={len(srows)} duckdb={len(drows)}")
                n_fail += 1
            else:
                n_pass += 1
                print(f"PASS {name}: {len(srows)} rows (count-shaped oracle) "
                      f"[{time.time()-t0:.1f}s]")
            continue
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        if len(sn) != len(dn):
            print(f"FAIL {name}: rows spark={len(sn)} duckdb={len(dn)}")
            n_fail += 1
            continue
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(sn)} rows differ; first:")
            for a, b in diffs[:3]:
                print(f"   spark : {a}")
                print(f"   duckdb: {b}")
            n_fail += 1
            continue
        n_pass += 1
        print(f"PASS {name}: {len(sn)} rows [{time.time()-t0:.1f}s]")
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
