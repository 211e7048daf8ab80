"""liquid-tpu headline benchmark (driver contract: ONE JSON line).

Measures the engine's hot loop -- fused encoded-predicate evaluation on
bit-plane columns (the ClickBench `WHERE col > c` shape, reference hot
path liquid_cache_reader.rs:296-339) -- in rows/s on one chip, using
the Pallas TPU kernel (ops/bitpack_pallas.py) on prepared plane tiles.
`vs_baseline` compares against decode-then-compare on the SAME chip
(materialized int32 values, vector compare -- which XLA runs AT the HBM
roofline, so the ratio is the real bytes-ratio win of the encoding).
The reference's thesis is that decode dominates filter CPU; here the
fused kernel reads width/32 of the decoded bytes and never materializes.

Measurement notes: the axon tunnel adds a flat ~28 ms dispatch floor per
call and block_until_ready is unreliable through it (PERF_NOTES.md), so
each timed call runs ITERS evaluations inside ONE jit via fori_loop over
distinct constants (no CSE) and the result is fetched to host; the floor
is measured with ITERS=0 and subtracted.
"""
import json
import time

import numpy as np

ITERS = 256


def _time_call(fn, args, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        int(fn(*args))  # host fetch forces completion
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import liquid_tpu  # noqa: F401
    from liquid_tpu.ops import bitpack as bp
    from liquid_tpu.ops import bitpack_pallas as bpp

    on_tpu = jax.default_backend() == "tpu"
    n = 1 << 27 if on_tpu else 1 << 22
    width = 10
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << width, n).astype(np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), width)
    tiles = bpp.prep(planes)
    raw = jnp.asarray(vals.astype(np.int32))  # decoded form, same chip
    cs = jnp.asarray(rng.integers(1, 1 << width, ITERS).astype(np.uint32))

    @jax.jit
    def fused(tiles, cs):
        def body(i, acc):
            return (acc + bpp.count_gt(tiles, cs[i])).astype(jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    @jax.jit
    def naive(raw, cs):
        def body(i, acc):
            return acc + (raw > cs[i].astype(jnp.int32)).sum(dtype=jnp.int32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    @jax.jit
    def floor_probe(cs):
        return cs.sum(dtype=jnp.uint32)

    # correctness gate before timing (spot-check a few constants)
    spot = np.asarray(cs[:4])
    expected = sum(int((vals > int(c)).sum()) for c in spot)
    got = sum(int(bpp.count_gt(tiles, jnp.uint32(int(c)))) for c in spot)
    assert got == expected, f"fused {got} != {expected}"

    int(fused(tiles, cs))
    int(naive(raw, cs))
    int(floor_probe(cs))
    floor = _time_call(floor_probe, (cs,))
    t_fused = max(_time_call(fused, (tiles, cs)) - floor, 1e-9) / ITERS
    t_naive = max(_time_call(naive, (raw, cs)) - floor, 1e-9) / ITERS
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
