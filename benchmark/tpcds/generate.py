#!/usr/bin/env python
"""Generate TPC-DS data + manifest (+ answers).

Usage: python benchmark/tpcds/generate.py [--sf 0.01] [--answers]
Equivalent of liquid-cache benchmark/tpcds/tpcds_gen.py (which shells
out to duckdb dsdgen) + its manifest.json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=float, default=0.01)
    p.add_argument("--answers", action="store_true")
    args = p.parse_args()
    from liquid_tpu.bench import tpcds_data, tpcds_queries
    base = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(base, "data")
    tables = tpcds_data.generate(args.sf)
    paths = tpcds_data.write_parquet(tables, out)
    manifest = {
        "name": f"TPC-DS sf{args.sf} (incl. window queries)",
        "tables": {k: os.path.relpath(v, base) for k, v in paths.items()},
        "queries": list(tpcds_queries.QUERIES.values()),
    }
    if args.answers:
        manifest["answers"] = "answers"
    mp = os.path.join(base, "manifest.json")
    with open(mp, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {mp}")
    if args.answers:
        from liquid_tpu.bench.manifest import Manifest
        from liquid_tpu.bench.runner import save_answers
        save_answers(Manifest.load(mp), os.path.join(base, "answers"))
        print("wrote answers/")


if __name__ == "__main__":
    main()
