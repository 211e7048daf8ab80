#!/usr/bin/env python
"""Generate TPC-H data + manifest + answer files.

Usage: python benchmark/tpch/generate.py [--sf 0.01] [--out benchmark/tpch/data]

The reference ships pre-generated TPC-H data + stored answers
(`benchmark/tpch/manifest.json`, `benchmark/tpch/answers/`); we generate
both from the deterministic generator and the engine's liquid mode,
after the 22 queries are verified against the independent pandas oracle
(tests/test_tpch.py).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=float, default=0.01)
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "data"))
    p.add_argument("--answers", action="store_true",
                   help="also materialize answer parquet files")
    args = p.parse_args()

    from liquid_tpu.bench import tpch_data, tpch_queries
    tables = tpch_data.generate(args.sf)
    paths = tpch_data.write_parquet(tables, args.out)
    base = os.path.dirname(os.path.abspath(__file__))
    manifest = {
        "name": f"TPC-H sf{args.sf}",
        "tables": {k: os.path.relpath(v, base) for k, v in paths.items()},
        "queries": [q if isinstance(q, str) else list(q)
                    for q in tpch_queries.QUERIES.values()],
    }
    mpath = os.path.join(base, "manifest.json")
    if args.answers:
        manifest["answers"] = "answers"
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {mpath} ({sum(t.num_rows for t in tables.values())} rows)")

    if args.answers:
        from liquid_tpu.bench.manifest import Manifest
        from liquid_tpu.bench.runner import save_answers
        save_answers(Manifest.load(mpath), os.path.join(base, "answers"))
        print("wrote answers/")


if __name__ == "__main__":
    main()
