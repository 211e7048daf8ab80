"""Device sort kernels: radix sort, sort-pairs, top-k.

The north-star operator set (SURVEY.md section 7) includes radix sort;
the reference gets sorting from DataFusion's SortExec.  On TPU the
canonical answer is XLA's `sort` (bitonic-style network, O(n log^2 n)
but fully vectorized); an LSD radix sort built from stable
rank-computations is provided for integer keys -- it does O(n * w/8)
work over 8-bit digits and wins on wide inputs where comparisons are
expensive.  Both are static-shape and jit/vmap/shard_map-safe; the
distributed layer (parallel/dist.py) composes them shard-locally after
the all-to-all repartition.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

RADIX_BITS = 8
RADIX = 1 << RADIX_BITS


@jax.jit
def sort_pairs(keys: jax.Array, values: jax.Array):
    """(keys, values) sorted by keys ascending (XLA comparator sort)."""
    return jax.lax.sort((keys, values), dimension=0, num_keys=1)


@partial(jax.jit, static_argnums=(2,))
def radix_sort_pairs(keys: jax.Array, values: jax.Array,
                     key_bits: int | None = None):
    """LSD radix sort of unsigned integer keys with payload permutation.

    Stable per pass: rank(row) = exclusive-prefix-count of rows with the
    same digit + number of earlier rows in lower digit buckets -- all
    prefix sums, the canonical TPU scatter-free idiom.
    """
    assert jnp.issubdtype(keys.dtype, jnp.unsignedinteger), keys.dtype
    total_bits = key_bits or jnp.iinfo(keys.dtype).bits
    n = keys.shape[0]

    def one_pass(carry, shift):
        k, v = carry
        digit = ((k >> shift.astype(k.dtype)) & (RADIX - 1)).astype(jnp.int32)
        onehot = jax.nn.one_hot(digit, RADIX, dtype=jnp.int32)   # [n, R]
        within = jnp.cumsum(onehot, axis=0) - onehot             # earlier, same digit
        totals = onehot.sum(axis=0)                              # per-bucket counts
        starts = jnp.cumsum(totals) - totals                     # bucket offsets
        pos = starts[digit] + (within * onehot).sum(axis=1)
        out_k = jnp.zeros_like(k).at[pos].set(k)
        out_v = jnp.zeros_like(v).at[pos].set(v)
        return (out_k, out_v), None

    passes = (total_bits + RADIX_BITS - 1) // RADIX_BITS
    shifts = jnp.arange(passes, dtype=jnp.uint32) * RADIX_BITS
    (k, v), _ = jax.lax.scan(one_pass, (keys, values), shifts)
    return k, v


def _reversed_key(keys: jax.Array) -> jax.Array:
    """Order-reversing bijection: bitwise complement for integers (no
    overflow/modular-wrap pitfalls of negation: ~x = -x-1 is monotone
    decreasing for signed AND unsigned); negation for floats."""
    if jnp.issubdtype(keys.dtype, jnp.integer):
        return ~keys
    return -keys


@partial(jax.jit, static_argnums=(1, 2))
def top_k_rows(keys: jax.Array, k: int, descending: bool = True):
    """(top-k keys, their row indices) -- ORDER BY key LIMIT k."""
    if descending:
        return jax.lax.top_k(keys, k)
    rev, idx = jax.lax.top_k(_reversed_key(keys), k)
    return keys[idx], idx


@partial(jax.jit, static_argnums=(1,))
def argsort_selected(keys: jax.Array, descending: bool = False):
    """Stable argsort (ties keep row order), matching SQL sort stability
    expectations for secondary keys applied in reverse order."""
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    if descending:
        order = jnp.lexsort((idx, _reversed_key(keys)))
    else:
        order = jnp.lexsort((idx, keys))
    return order.astype(jnp.int32)
