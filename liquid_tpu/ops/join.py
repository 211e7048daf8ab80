"""Device equi-join kernels: sort-merge build/probe on int64 key codes.

The reference gets joins from DataFusion's HashJoinExec; a hash table
with data-dependent chaining is the wrong shape for the TPU, so the
device idiom here is sort + binary search (the same generalization the
distributed layer uses in `parallel/dist.dist_lookup_join`, extended to
non-unique build keys):

  1. `sort_build`    — XLA comparator sort of build keys with row perm.
  2. `probe_bounds`  — per probe row, [lo, hi) range of equal build keys
                       via vectorized `searchsorted` (static shapes).
  3. `expand_matches`— flatten the variable-fanout ranges into (probe
                       row, build position) pairs with prefix-sum index
                       math into a static-capacity output (the caller
                       sizes capacity from the host-visible total).
  4. `matched_flags` — which build rows were hit by any probe range
                       (right/full outer joins), computed as a +1/-1
                       difference array + cumsum, no scatter conflicts.

All kernels are jit/static-shape safe.  The SQL layer (sql/device_join)
encodes arbitrary key tuples to int64 codes and does the final arrow
`take`s on host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def sort_build(keys: jax.Array):
    """(sorted keys, permutation): stable XLA sort with row indices."""
    n = keys.shape[0]
    return jax.lax.sort((keys, jnp.arange(n, dtype=jnp.int32)),
                        dimension=0, num_keys=1)


@jax.jit
def probe_bounds(sorted_keys: jax.Array, probe: jax.Array):
    """Per probe key: [lo, hi) bounds of equal keys in sorted build."""
    lo = jnp.searchsorted(sorted_keys, probe, side="left")
    hi = jnp.searchsorted(sorted_keys, probe, side="right")
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def expand_matches(lo: jax.Array, counts: jax.Array, capacity: int):
    """Flatten per-probe match ranges into flat (probe_row, build_pos)
    pairs.  `capacity` >= total matches (host computes the sum); slots
    past the total are marked invalid."""
    n = lo.shape[0]
    ends = jnp.cumsum(counts)
    out_pos = jnp.arange(capacity, dtype=jnp.int32)
    probe_of = jnp.searchsorted(ends, out_pos, side="right").astype(jnp.int32)
    pclip = jnp.clip(probe_of, 0, n - 1)
    starts = ends - counts
    build_pos = lo[pclip] + (out_pos - starts[pclip])
    valid = out_pos < ends[n - 1]
    return pclip, build_pos.astype(jnp.int32), valid


@jax.jit
def matched_flags(sorted_keys: jax.Array, lo: jax.Array, hi: jax.Array):
    """Boolean per sorted-build position: covered by any probe range."""
    n = sorted_keys.shape[0]
    diff = (jnp.zeros(n + 1, jnp.int32).at[lo].add(1).at[hi].add(-1))
    return jnp.cumsum(diff[:n]) > 0
