#!/usr/bin/env python
"""Projection + selection pushdown: only the queried columns enter the
cache, and predicates evaluate on encoded data.

Equivalent of liquid-cache examples/example_projection_pushdown.rs.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin

from liquid_tpu.sql.session import LiquidCacheLocalBuilder  # noqa: E402

NANO = str(__import__("pathlib").Path(__file__).resolve().parents[1] / "benchmark/data/nano_hits.parquet")


def main():
    with tempfile.TemporaryDirectory() as d:
        ctx, cache = (LiquidCacheLocalBuilder()
                      .with_max_memory_bytes(1 << 30)
                      .with_cache_dir(d)
                      .build())
        ctx.register_parquet("hits", NANO)
        out = ctx.sql('SELECT "RegionID", COUNT(*) AS c FROM hits '
                      'WHERE "AdvEngineID" <> 0 '
                      'GROUP BY "RegionID" ORDER BY c DESC LIMIT 5')
        out.show()
        st = cache.stats()
        # only the two referenced columns were inserted (x #batches)
        print("cached entries:", st["entries"],
              "encoded predicate evals:", st["predicate_evals_on_encoded"])


if __name__ == "__main__":
    main()
