#!/usr/bin/env python
"""Start a cache server + admin server.

Equivalent of liquid-cache examples/example_server.rs.
Usage: python examples/example_server.py [--port 50051] [--admin-port 8080]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin

from liquid_tpu.bench.clients import serve  # noqa: E402


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=50051)
    p.add_argument("--admin-port", type=int, default=8080)
    p.add_argument("--max-memory-mb", type=int, default=1024)
    args = p.parse_args()
    serve(cache_mode="liquid", max_memory_mb=args.max_memory_mb,
          port=args.port, admin_port=args.admin_port)


if __name__ == "__main__":
    main()
