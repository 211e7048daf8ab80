"""liquid-tpu headline benchmark (driver contract: ONE JSON line).

Measures the engine's hot loop -- fused encoded-predicate evaluation on
bit-plane columns (the ClickBench `WHERE col <> c` / `> c` shape,
reference hot path liquid_cache_reader.rs:296-339) -- in rows/s on one
chip.  `vs_baseline` compares against the decode-then-compare approach
on the SAME chip (materialize int values, vector compare): the
reference's thesis is that decode dominates; our packed compare skips
it entirely.
"""
import json
import time

import numpy as np


def _bench(fn, args, warmup=3, iters=20):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp
    import liquid_tpu  # noqa: F401
    from liquid_tpu.ops import bitpack as bp

    n = 1 << 24  # 16.7M rows
    width = 10
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << width, n).astype(np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), width)
    raw = jnp.asarray(vals.astype(np.int32))  # decoded form, same chip
    c = jnp.uint64(700)

    @jax.jit
    def fused(planes, c):
        lt, eq = bp.cmp_const(planes, c)
        gt = ~(lt | eq)
        return jax.lax.population_count(gt).astype(jnp.int32).sum()

    @jax.jit
    def naive(raw, c):
        return (raw > c.astype(jnp.int32)).sum()

    # correctness gate before timing
    expected = int((vals > 700).sum())
    assert int(fused(planes, c)) == expected, "fused result wrong"
    assert int(naive(raw, c)) == expected, "naive result wrong"

    t_fused = _bench(fused, (planes, c))
    t_naive = _bench(naive, (raw, c))
    rows_per_s = n / t_fused
    vs = t_naive / t_fused  # >1: packed compare beats decode+compare

    print(json.dumps({
        "metric": "fused_encoded_filter_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s/chip",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
