#!/usr/bin/env python
"""Compute-node client: ship a query to the cache server, stream results.

Equivalent of liquid-cache examples/example_client.rs (self-contained:
starts an in-process server if --port is not given).
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin

NANO = str(__import__("pathlib").Path(__file__).resolve().parents[1] / "benchmark/data/nano_hits.parquet")


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--host", default=None)
    p.add_argument("--port", type=int, default=None)
    args = p.parse_args()

    from liquid_tpu.server import LiquidCacheClientBuilder
    srv = None
    if args.port is None:
        from liquid_tpu.bench.clients import serve
        srv, admin = serve(port=0, admin_port=0, block=False,
                           disk_cache_dir=tempfile.mkdtemp())
        host, port = srv.addr
    else:
        host, port = args.host or "127.0.0.1", args.port

    client = (LiquidCacheClientBuilder(host, port)
              .with_parquet_table("hits", NANO)
              .build())
    out = client.sql('SELECT COUNT(*) AS c, COUNT(DISTINCT "UserID") AS u '
                     "FROM hits")
    print(out)
    m = client.last_metrics
    print(f"{m.rows} rows in {m.batches} batches, "
          f"first batch after {m.time_to_first_batch_ms:.1f} ms")
    if srv is not None:
        srv.stop()
        admin.stop()


if __name__ == "__main__":
    main()
