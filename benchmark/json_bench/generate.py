#!/usr/bin/env python
"""Generate the JSON/variant benchmark (bluesky-events-like).

Equivalent of liquid-cache benchmark/json_bench (manifest.bluesky.json):
semi-structured JSON event rows queried through variant_get, exercising
the variant shredding + squeezed zero-IO path.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=100_000)
    p.add_argument("--answers", action="store_true")
    args = p.parse_args()
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(8)
    kinds = ["commit", "identity", "account"]
    ops = ["create", "update", "delete"]
    colls = ["app.bsky.feed.post", "app.bsky.feed.like",
             "app.bsky.graph.follow", "app.bsky.actor.profile"]
    rows = []
    for i in range(args.rows):
        doc = {"kind": kinds[int(rng.integers(0, 3))],
               "did": f"did:plc:{rng.integers(0, 5000):08x}",
               "time_us": int(1_700_000_000_000_000 + i * 1000)}
        if doc["kind"] == "commit":
            doc["commit"] = {"operation": ops[int(rng.integers(0, 3))],
                             "collection": colls[int(rng.integers(0, 4))]}
        rows.append(json.dumps(doc, separators=(",", ":")))
    base = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(os.path.join(base, "data"), exist_ok=True)
    pq.write_table(pa.table({"event": pa.array(rows, pa.string())}),
                   os.path.join(base, "data", "events.parquet"))
    queries = [
        "select variant_get(event, 'kind', 'utf8') as kind, count(*) as c "
        "from events group by kind order by c desc",
        "select variant_get(event, 'commit.collection', 'utf8') as coll, "
        "count(*) as c from events "
        "where variant_get(event, 'kind', 'utf8') = 'commit' "
        "group by coll order by c desc",
        "select count(distinct variant_get(event, 'did', 'utf8')) as dids "
        "from events",
        "select variant_get(event, 'commit.operation', 'utf8') as op, "
        "count(*) as c from events "
        "where variant_get(event, 'commit.collection', 'utf8') = "
        "'app.bsky.feed.post' group by op order by op",
        "select min(variant_get(event, 'time_us', 'int64')) as lo, "
        "max(variant_get(event, 'time_us', 'int64')) as hi from events",
    ]
    manifest = {"name": "json_bench (bluesky-like)",
                "tables": {"events": "data/events.parquet"},
                "queries": queries}
    if args.answers:
        manifest["answers"] = "answers"
    mp = os.path.join(base, "manifest.json")
    with open(mp, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {mp} ({args.rows} rows)")
    if args.answers:
        from liquid_tpu.bench.manifest import Manifest
        from liquid_tpu.bench.runner import save_answers
        save_answers(Manifest.load(mp), os.path.join(base, "answers"))
        print("wrote answers/")


if __name__ == "__main__":
    main()
