#!/usr/bin/env python
"""Local (in-process) mode: register parquet, run SQL.

Equivalent of liquid-cache examples/example_local.rs.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin

from liquid_tpu.cache import LiquidPolicy, TranscodeSqueezeEvict  # noqa: E402
from liquid_tpu.sql.session import LiquidCacheLocalBuilder  # noqa: E402

NANO = str(__import__("pathlib").Path(__file__).resolve().parents[1] / "benchmark/data/nano_hits.parquet")


def main():
    with tempfile.TemporaryDirectory() as d:
        ctx, _cache = (LiquidCacheLocalBuilder()
                       .with_max_memory_bytes(1 << 30)
                       .with_cache_dir(d)
                       .with_squeeze_policy(TranscodeSqueezeEvict())
                       .with_cache_policy(LiquidPolicy())
                       .build())
        ctx.register_parquet("hits", NANO)
        ctx.sql("SELECT COUNT(*) FROM hits").show()


if __name__ == "__main__":
    main()
