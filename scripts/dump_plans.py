"""Dump .explain("formatted") for declared golden queries.

Usage: python scripts/dump_plans.py <suffix> [query ...]
  suffix: "before" or "after" — filename becomes
  plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (round dir defaults
  to r15). Defaults to the frozen-12 bench queries when no names given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FROZEN = [
    "filter_agg", "join_agg", "range_join", "vector_topk_exact",
    "tpch_q1", "window_funcs", "chunker_conformance", "sessionize",
    "exact_dedup", "flagship_search",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or FROZEN
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from oracle_vectorsearch_example_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = e.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
