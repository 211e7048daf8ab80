#!/usr/bin/env python
"""Generate the StackOverflow-DBA benchmark (data + manifest + answers).

Equivalent of liquid-cache benchmark/stackoverflow/setup_stackoverflow.py
+ manifest.dba.json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=2000)
    p.add_argument("--posts", type=int, default=20_000)
    p.add_argument("--answers", action="store_true")
    args = p.parse_args()
    from liquid_tpu.bench import stackoverflow_data as so
    base = os.path.dirname(os.path.abspath(__file__))
    tables = so.generate(args.users, args.posts)
    paths = so.write_parquet(tables, os.path.join(base, "data"))
    manifest = {
        "name": "StackOverflow-DBA",
        "tables": {k: os.path.relpath(v, base) for k, v in paths.items()},
        "queries": so.QUERIES,
    }
    if args.answers:
        manifest["answers"] = "answers"
    mp = os.path.join(base, "manifest.dba.json")
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
