#!/usr/bin/env python
"""Fill a 1MB cache until the squeeze/evict pipeline engages; show the
state distribution.

Equivalent of liquid-cache examples/example_inprocess_cache_eviction.rs.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

from liquid_tpu.cache import LiquidCacheBuilder  # noqa: E402


def main():
    with tempfile.TemporaryDirectory() as d:
        storage = (LiquidCacheBuilder()
                   .with_max_memory_bytes(1 << 20)  # 1MB
                   .with_disk_path(os.path.join(d, "store.bin"))
                   .build())
        arr = pa.array(np.arange(1000, dtype=np.uint64))
        for i in range(1, 725):
            storage.insert(i, arr)
        st = storage.stats()
        print("entries:", st["entries"], "by_state:", st["by_state"])
        print("squeezes:", st["squeezes"], "disk_writes:", st["disk_writes"])
        # every surviving entry still reads back exactly
        got = storage.get(1)
        assert got is None or got.to_pylist() == arr.to_pylist()


if __name__ == "__main__":
    main()
