"""Corpus-ingestion CLI — the ops face of the production-cadence corpus
build (plans.IncrementalCorpus): fold parquet batches of documents into a
warehouse-backed corpus (incremental dedup against everything seen,
atomic per-batch commits), inspect it, export the current survivor set.

    python scripts/corpus_cli.py -w WAREHOUSE ingest BATCH.parquet
    python scripts/corpus_cli.py -w WAREHOUSE stats
    python scripts/corpus_cli.py -w WAREHOUSE export OUT_DIR [--split train]

Gates/split knobs apply at READ time (stats/export), so re-tuning them
never needs a re-ingest — the stored state is raw batches + dedup bands
+ the skinny cluster table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(spark, args):
    from oracle_vectorsearch_example_spark.plans.corpus import IncrementalCorpus

    weights = None
    if args.split_weights:
        parts = [kv.split("=") for kv in args.split_weights.split(",")]
        weights = {k: float(v) for k, v in parts}
    import json

    return IncrementalCorpus(
        spark,
        args.warehouse,
        quality_min=args.quality_min,
        langs=args.langs.split(",") if args.langs else None,
        gopher_kwargs=json.loads(args.gopher) if args.gopher else None,
        gopher_rep_kwargs=(
            json.loads(args.gopher_rep) if args.gopher_rep else None
        ),
        split_weights=weights,
        compact_every=args.compact_every,
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-w", "--warehouse", required=True)
    p.add_argument("--quality-min", type=float, default=0.0)
    p.add_argument("--langs", default=None, help="comma-separated lang codes")
    p.add_argument(
        "--gopher", default=None,
        help="apply the Gopher rule gate at read time: '{}' for the "
             "paper's thresholds, or a JSON dict of overrides "
             "(e.g. '{\"min_words\": 20}')",
    )
    p.add_argument(
        "--gopher-rep", default=None,
        help="apply the Gopher §A1.2 repetition suite at read time: '{}' "
             "for the paper's Table A1 thresholds, or a JSON dict of "
             "overrides (e.g. '{\"max_dup_line_frac\": 0.5}')",
    )
    p.add_argument(
        "--split-weights", default=None, help="e.g. train=0.9,val=0.05,test=0.05"
    )
    p.add_argument(
        "--compact-every", type=int, default=None,
        help="auto-maintenance cadence: compact dedup band tables + expire "
             "old manifests + vacuum once the band-table count reaches N",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    ing = sub.add_parser("ingest")
    ing.add_argument("batch", help="parquet path with (doc_id, text, ...)")
    sub.add_parser("stats")
    sub.add_parser("compact")
    exp = sub.add_parser("export")
    exp.add_argument("out")
    exp.add_argument("--split", default=None)
    args = p.parse_args(argv)

    from oracle_vectorsearch_example_spark.session import get_spark

    spark = get_spark("corpus-cli")
    try:
        corpus = _corpus(spark, args)
        if args.cmd == "ingest":
            batch = spark.read.parquet(args.batch)
            version = corpus.ingest(batch)
            print(f"committed version {version} ({batch.count()} docs in batch)")
        elif args.cmd == "compact":
            v = corpus.compact_dedup_state()
            corpus.wh.expire(keep_last=corpus.expire_keep_last)
            removed = corpus.wh.vacuum()
            print(f"compacted to version {v}; vacuumed {len(removed)} dirs")
        elif args.cmd == "stats":
            docs = corpus.documents()
            from pyspark.sql import functions as F

            for r in (
                docs.groupBy("split")
                .agg(F.count("*").alias("n_docs"))
                .orderBy("split")
                .collect()
            ):
                print(f"{r['split']}\t{r['n_docs']}")
            print(f"total\t{docs.count()}")
        elif args.cmd == "export":
            docs = corpus.documents()
            if args.split:
                from pyspark.sql import functions as F

                docs = docs.filter(F.col("split") == args.split)
            docs.write.mode("overwrite").parquet(args.out)
            print(f"exported {docs.count()} docs to {args.out}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
