"""Multi-chip execution: mesh, sharded scans, and all-to-all shuffle.

The reference is a single-node cache with a gRPC client/server split
(SURVEY.md section 2.10); the TPU-native scale-out replaces that with a
`jax.sharding.Mesh` over the pod slice: tables are row-sharded across
devices ("data" axis), encoded predicate kernels run shard-local, and
distributed aggregation/join repartitions rows by key hash with
`jax.lax.all_to_all` over ICI -- this is the Flight-stream equivalent
boundary, but riding the interconnect instead of TCP.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as mops

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def shard_rows(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Row-shard a [N, ...] array over the data axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(DATA_AXIS)))


def replicate(mesh: Mesh, arr: jax.Array) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, P()))


# -- distributed fused filter + aggregate ----------------------------------

def dist_filter_count(mesh: Mesh):
    """Distributed ClickBench-q1 shape: packed compare + global popcount.

    planes are sharded on the WORDS axis (axis 1: each device holds the
    bit-planes of its own rows); returns the global count.
    """

    @partial(shard_map, mesh=mesh, in_specs=(P(None, DATA_AXIS), P()),
             out_specs=P())
    def step(planes, c):
        lt, eq = bp.cmp_const(planes, c)
        local = jax.lax.population_count(~eq).astype(jnp.int32).sum()
        return jax.lax.psum(local[None], DATA_AXIS)

    return step


def dist_filter_agg(mesh: Mesh, num_groups: int):
    """Distributed fused decode+filter+group-count+group-sum.

    Per shard: packed predicate -> selection -> segment add into a dense
    group table; psum merges group tables across devices (the TPU
    equivalent of the reference's partition-parallel aggregation with a
    final merge).
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
             out_specs=(P(), P()))
    def step(planes, codes, values, c):
        lt, eq = bp.cmp_const(planes, c)
        sel = ~(lt | eq)  # values > c
        selb = mops.unpack_bits(sel)
        ones = selb.astype(jnp.int32)
        counts = jnp.zeros((num_groups,), jnp.int32).at[codes].add(ones)
        sums = jnp.zeros((num_groups,), jnp.int64).at[codes].add(
            jnp.where(selb, values, 0))
        return (jax.lax.psum(counts, DATA_AXIS),
                jax.lax.psum(sums, DATA_AXIS))

    return step


# -- hash-partitioned shuffle (joins / high-cardinality aggregation) -------

def _hash64(x: jax.Array) -> jax.Array:
    """splitmix64 finalizer: uniform device-side key hash."""
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> jnp.uint64(31))


def dist_shuffle_by_key(mesh: Mesh, rows_per_device: int):
    """All-to-all repartition of (key, value) rows by key hash.

    Each device buckets its rows by target device (hash % n), pads each
    bucket to a fixed capacity (2x fair share -- skew headroom; rows
    beyond capacity would need a second round, counted in `overflow`),
    then `all_to_all` exchanges buckets over ICI.  Returns (keys, values,
    valid_mask, overflow) per device.  This is the building block for
    distributed hash join / high-cardinality aggregation.
    """
    n = mesh.shape[DATA_AXIS]
    cap = max(1, (2 * rows_per_device) // n)  # per-destination capacity

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
    def step(keys, values):
        dest = (_hash64(keys) % jnp.uint64(n)).astype(jnp.int32)
        # rank of each row within its destination bucket
        onehot = jax.nn.one_hot(dest, n, dtype=jnp.int32)      # [R, n]
        rank = jnp.cumsum(onehot, axis=0) - onehot              # before me
        my_rank = (rank * onehot).sum(axis=1)
        slot = dest * cap + my_rank
        ok = my_rank < cap
        send_k = jnp.zeros((n * cap,), keys.dtype).at[
            jnp.where(ok, slot, n * cap)].set(keys, mode="drop")
        send_v = jnp.zeros((n * cap,), values.dtype).at[
            jnp.where(ok, slot, n * cap)].set(values, mode="drop")
        send_m = jnp.zeros((n * cap,), jnp.bool_).at[
            jnp.where(ok, slot, n * cap)].set(True, mode="drop")
        overflow = (~ok).sum()[None]
        # [n, cap] -> exchange over the data axis
        rk = jax.lax.all_to_all(send_k.reshape(n, cap), DATA_AXIS, 0, 0,
                                tiled=False)
        rv = jax.lax.all_to_all(send_v.reshape(n, cap), DATA_AXIS, 0, 0,
                                tiled=False)
        rm = jax.lax.all_to_all(send_m.reshape(n, cap), DATA_AXIS, 0, 0,
                                tiled=False)
        return (rk.reshape(-1), rv.reshape(-1), rm.reshape(-1), overflow)

    return step
