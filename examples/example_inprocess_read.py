#!/usr/bin/env python
"""Direct cache API: insert, flush to disk, read back.

Equivalent of liquid-cache examples/example_inprocess_read.rs.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin

import pyarrow as pa  # noqa: E402

from liquid_tpu.cache import LiquidCacheBuilder  # noqa: E402


def main():
    with tempfile.TemporaryDirectory() as d:
        storage = (LiquidCacheBuilder()
                   .with_disk_path(os.path.join(d, "store.bin"))
                   .build())
        entry_id = 7
        arr = pa.array(range(16), pa.uint64())
        storage.insert(entry_id, arr)

        # move data to disk so the read demonstrates backing IO
        storage.flush_all_to_disk()
        assert storage.entry_state(entry_id).startswith("disk")

        retrieved = storage.get(entry_id)
        assert retrieved.to_pylist() == arr.to_pylist()
        print("read-after-flush OK:", storage.stats()["disk_reads"], "disk reads")


if __name__ == "__main__":
    main()
