#!/usr/bin/env python
"""Direct cache API under a small budget: the replacement loop decides
placement (memory -> squeezed -> disk).

Equivalent of liquid-cache examples/example_inprocess_insertion.rs.
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
        storage.insert(42, arr)
        got = storage.get(42)
        assert got.to_pylist() == arr.to_pylist()
        print("state:", storage.entry_state(42))
        print(storage.stats())


if __name__ == "__main__":
    main()
