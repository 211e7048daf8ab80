#!/usr/bin/env python
"""Open-ended differential fuzz loop for encoded comparisons.

Equivalent of the reference's nightly libFuzzer job (liquid-cache
`.github/workflows/fuzz.yml` running `fuzz/fuzz_targets/fsst_view.rs`
with a 240-minute budget): random seeds forever, stop on first
divergence and print the reproducing seed.

Usage: python fuzz/fuzz_byteview.py [--minutes 5] [--start-seed 0]
Reproduce: python -c "from tests.test_fuzz_differential import check_case;
           check_case(SEED)"
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")  # the env var is ignored under the axon plugin


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=5.0)
    p.add_argument("--start-seed", type=int, default=1_000_000)
    args = p.parse_args()

    from tests.test_fuzz_differential import check_case, check_primitive_case
    deadline = time.time() + args.minutes * 60
    seed = args.start_seed
    n = 0
    while time.time() < deadline:
        try:
            check_case(seed)
            check_primitive_case(seed)
        except AssertionError as ex:
            print(f"DIVERGENCE at seed {seed}: {ex}")
            return 1
        seed += 1
        n += 1
        if n % 50 == 0:
            print(f"{n} cases OK (seed {seed})", flush=True)
    print(f"done: {n} cases, no divergence")
    return 0


if __name__ == "__main__":
    sys.exit(main())
