"""Device group-by kernels: sort-based grouping + segment reductions.

The reference gets GROUP BY from DataFusion's row-hash aggregation
(`GroupedHashAggregateStream`); a hash table with dynamic growth is the
wrong shape for XLA, so the TPU-native design is the classic sort-based
group-by, which is all static-shape primitives:

    lexsort(key columns) -> adjacent-difference segment boundaries
    -> cumsum for dense group ids -> scatter-reduce payloads by group id

Everything compiles to one fused XLA program per (n_keys, n_slots,
kinds, padded N) signature; N is padded to power-of-two buckets so the
compile universe stays bounded.  NULL group keys form their own group
(SQL semantics) via a per-key null flag that participates in the sort;
rows marked invalid (padding / filtered) route to group id N and are
dropped by out-of-bounds scatters.

Replaces the pyarrow `Table.group_by` partial aggregation that the
round-1 engine used (VERDICT.md "What's missing" #1); the reference
hot loop being matched is `liquid_cache_reader.rs:118-161` feeding
DataFusion's aggregate.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_pow2(n: int, floor: int = 1024) -> int:
    """Next power-of-two >= n (>= floor): bounds the jit-shape universe."""
    m = floor
    while m < n:
        m <<= 1
    return m


@partial(jax.jit, static_argnames=("kinds",))
def group_reduce(codes: Tuple[jax.Array, ...],
                 knulls: Tuple[jax.Array, ...],
                 valid: jax.Array,
                 vals: Tuple[jax.Array, ...],
                 vnulls: Tuple[jax.Array, ...],
                 kinds: Tuple[str, ...]):
    """One-shot grouped reduction.

    codes:  per-key [N] integer code arrays (bit-images of the key values)
    knulls: per-key [N] bool null flags (True = SQL NULL; its own group)
    valid:  [N] bool row mask (False = padding / filtered row: dropped)
    vals:   per-slot [N] payload arrays (dtype = accumulation dtype)
    vnulls: per-slot [N] bool null flags (null inputs don't contribute)
    kinds:  per-slot 'sum' | 'min' | 'max' (count = sum of ones)

    Returns (n_groups, ukeys, uknulls, outs, vcounts):
      n_groups: int32 scalar, number of distinct (valid-row) key tuples
      ukeys/uknulls: per-key [N] arrays, group keys packed at [0, n_groups)
      outs: per-slot [N] reduced values (neutral element where no
            non-null input contributed)
      vcounts: per-slot [N] int64 count of non-null contributions
               (0 -> the SQL result is NULL for sum/min/max/avg)
    """
    n = valid.shape[0]
    inv = ~valid
    # lexsort: last key is primary; invalid rows sort to the end
    sort_keys = []
    for c, nl in zip(codes, knulls):
        sort_keys.append(c)
        sort_keys.append(nl)
    sort_keys.append(inv)
    perm = jnp.lexsort(tuple(sort_keys))

    sc = [c[perm] for c in codes]
    snl = [nl[perm] for nl in knulls]
    sv = valid[perm]

    if codes:
        diff = jnp.zeros((n - 1,), jnp.bool_) if n > 1 else jnp.zeros((0,), jnp.bool_)
        for c, nl in zip(sc, snl):
            diff = diff | (c[1:] != c[:-1]) | (nl[1:] != nl[:-1])
        first = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
    else:
        # no keys: a single global group
        first = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    first = first & sv
    # a valid row whose predecessor is invalid cannot happen (invalid
    # rows sort last), so `first` marks exactly the group leaders
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_groups = first.sum(dtype=jnp.int32)

    # scatter group id back to original row order; invalid rows -> n
    gid_sorted = jnp.where(sv, seg, n)
    gid = jnp.zeros((n,), jnp.int32).at[perm].set(gid_sorted)

    # unique keys: scatter the group-leader rows into the packed prefix
    lead_pos = jnp.where(first, seg, n)
    ukeys = tuple(jnp.zeros((n,), c.dtype).at[lead_pos].set(c, mode="drop")
                  for c in sc)
    uknulls = tuple(jnp.zeros((n,), jnp.bool_).at[lead_pos].set(nl, mode="drop")
                    for nl in snl)

    outs = []
    vcounts = []
    for v, vn, kind in zip(vals, vnulls, kinds):
        contrib = valid & ~vn
        ones = contrib.astype(jnp.int64)
        vcounts.append(jnp.zeros((n,), jnp.int64).at[gid].add(ones, mode="drop"))
        if kind == "sum":
            z = jnp.zeros((), v.dtype)
            out = jnp.zeros((n,), v.dtype).at[gid].add(
                jnp.where(contrib, v, z), mode="drop")
        elif kind == "min":
            neutral = _neutral(v.dtype, "min")
            out = jnp.full((n,), neutral, v.dtype).at[gid].min(
                jnp.where(contrib, v, neutral), mode="drop")
        elif kind == "max":
            neutral = _neutral(v.dtype, "max")
            out = jnp.full((n,), neutral, v.dtype).at[gid].max(
                jnp.where(contrib, v, neutral), mode="drop")
        else:
            raise ValueError(f"kind {kind}")
        outs.append(out)
    return n_groups, ukeys, uknulls, tuple(outs), tuple(vcounts)


def _neutral(dtype, kind: str):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf if kind == "min" else -jnp.inf, dtype)
    info = jnp.iinfo(dtype)
    return jnp.asarray(info.max if kind == "min" else info.min, dtype)


@partial(jax.jit, static_argnames=("kinds",))
def scalar_reduce(valid: jax.Array,
                  vals: Tuple[jax.Array, ...],
                  vnulls: Tuple[jax.Array, ...],
                  kinds: Tuple[str, ...]):
    """Global (no GROUP BY) reductions over one chunk: per slot returns
    (reduced value, non-null contribution count).  Used by the scalar
    aggregator; states merge across chunks with the same kind op."""
    outs = []
    counts = []
    for v, vn, kind in zip(vals, vnulls, kinds):
        contrib = valid & ~vn
        counts.append(contrib.sum(dtype=jnp.int64))
        if kind == "sum":
            outs.append(jnp.where(contrib, v, jnp.zeros((), v.dtype)).sum())
        elif kind == "min":
            neutral = _neutral(v.dtype, "min")
            outs.append(jnp.where(contrib, v, neutral).min())
        elif kind == "max":
            neutral = _neutral(v.dtype, "max")
            outs.append(jnp.where(contrib, v, neutral).max())
        else:
            raise ValueError(f"kind {kind}")
    return tuple(outs), tuple(counts)
