"""Model-management CLI — the reference's EP2 command-line workflow
(models/load_models.py:117-121 `[model_id] [--force]`,
models/drop_models.py:229-241 drop + orphan detection,
models/models.json registry shape) over the Spark-side ModelRegistry.

Config file mirrors models.json: a list of entries with
``id, name, description, file, db_model_name, dim``; ``file`` is the
model path to copy into the warehouse.

    python scripts/models_cli.py -w WAREHOUSE list
    python scripts/models_cli.py -w WAREHOUSE load -c models.json [ID] [--force]
    python scripts/models_cli.py -w WAREHOUSE drop NAME [--force]
    python scripts/models_cli.py -w WAREHOUSE orphans -c models.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_vectorsearch_example_spark.sources.registry import ModelRegistry


def _read_config(path: str) -> list[dict]:
    with open(path) as f:
        cfg = json.load(f)
    return cfg["models"] if isinstance(cfg, dict) else cfg


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-w", "--warehouse", required=True)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list")

    p_load = sub.add_parser("load")
    p_load.add_argument("-c", "--config", required=True)
    p_load.add_argument("model_id", nargs="?", help="load only this config id")
    p_load.add_argument("--force", action="store_true")

    p_drop = sub.add_parser("drop")
    p_drop.add_argument("name")
    p_drop.add_argument("--force", action="store_true")

    p_orph = sub.add_parser("orphans")
    p_orph.add_argument("-c", "--config", required=True)

    args = p.parse_args(argv)
    reg = ModelRegistry(args.warehouse)

    if args.cmd == "list":
        for name in reg.list_models():
            print(name)
        return 0

    if args.cmd == "load":
        models = _read_config(args.config)
        if args.model_id:  # the load_models.py:143 id filter
            models = [m for m in models if m.get("id") == args.model_id]
            if not models:
                print(f"no config entry with id {args.model_id!r}", file=sys.stderr)
                return 1
        loaded = skipped = 0  # the load_models.py:154-176 summary counters
        for m in models:
            ok = reg.load(
                model_name=m.get("db_model_name") or m["name"],
                file_path=m["file"],
                model_id=m.get("id"),
                description=m.get("description"),
                dim=m.get("dim"),
                force=args.force,
            )
            if ok:
                loaded += 1
                print(f"loaded {m.get('db_model_name') or m['name']}")
            else:
                skipped += 1
                print(f"skipped {m.get('db_model_name') or m['name']} (already loaded)")
        print(f"done: {loaded} loaded, {skipped} skipped")
        return 0

    if args.cmd == "drop":
        if reg.drop(args.name, force=args.force):
            print(f"dropped {args.name}")
            return 0
        print(f"not loaded: {args.name}", file=sys.stderr)
        return 1

    if args.cmd == "orphans":
        configured = {
            m.get("db_model_name") or m["name"] for m in _read_config(args.config)
        }
        for name in reg.orphans(configured):
            print(name)
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
