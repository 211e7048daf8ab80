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

#: structural scaling diagnostics (VERDICT r3 item 7): collective op
#: count + bytes are recorded at TRACE time (static shapes), so they
#: reflect the compiled program's structure; exchange rows/balance are
#: measured from the histogram pass at run time.  reset per query by
#: DistributedSession.sql.
DIAG = {"collectives": 0, "collective_bytes": 0, "exchanges": 0,
        "exchange_rows": 0, "exchange_bytes": 0, "exchange_balance": 1.0}


def reset_diag() -> None:
    DIAG.update(collectives=0, collective_bytes=0, exchanges=0,
                exchange_rows=0, exchange_bytes=0, exchange_balance=1.0)


def _diag_count(x) -> None:
    DIAG["collectives"] += 1
    try:
        DIAG["collective_bytes"] += (
            int(np.prod(x.shape)) * x.dtype.itemsize)
    except Exception:
        pass


def psum(x, axis):
    _diag_count(x)
    return jax.lax.psum(x, axis)


def pmin(x, axis):
    _diag_count(x)
    return jax.lax.pmin(x, axis)


def pmax(x, axis):
    _diag_count(x)
    return jax.lax.pmax(x, axis)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            # user-facing configuration check: must survive python -O
            # (a bare assert would be stripped and silently build a
            # wrong-sized mesh -- ADVICE round 2)
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) visible; for CPU dry-runs set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} and jax.config.update('jax_platforms', "
                f"'cpu') before first jax use")
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
    bit-planes of its own rows); `valid` is the packed validity mask in
    the same sharding (padding rows added for divisibility MUST be
    masked out -- a zero-decoded padding row satisfies `<> c` for any
    c != 0).  Returns the global count of valid rows with value != c.
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, DATA_AXIS), P(DATA_AXIS), P()),
             out_specs=P())
    def step(planes, valid, c):
        lt, eq = bp.cmp_const(planes, c)
        local = jax.lax.population_count(
            ~eq & valid).astype(jnp.int32).sum(dtype=jnp.int32)
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



def _exchange_by_dest(n: int, cap: int, keys, payloads, valid=None):
    """Shared shuffle core: hash keys to destinations, rank-pack each
    destination bucket to `cap` slots, all_to_all-exchange.  `payloads`
    is a tuple of row-aligned arrays shipped with the keys; invalid rows
    (valid=False) are not sent.  -> (keys, payloads..., mask, overflow).
    Used by dist_shuffle_by_key / dist_lookup_join / dist_agg_by_key so
    capacity/ranking fixes land in one place."""
    dest = (_hash64(keys) % jnp.uint64(n)).astype(jnp.int32)
    if valid is not None:
        dest = jnp.where(valid, dest, n)
    onehot = jax.nn.one_hot(dest, n, dtype=jnp.int32)
    rank = jnp.cumsum(onehot, axis=0) - onehot
    my_rank = (rank * onehot).sum(axis=1)
    slot = dest * cap + my_rank
    ok = my_rank < cap
    if valid is not None:
        ok = ok & valid
    tgt = jnp.where(ok, slot, n * cap)
    sent = (valid if valid is not None
            else jnp.ones(keys.shape, jnp.bool_))
    ovf = (sent & ~ok).sum()[None]

    def ship(x):
        buf = jnp.zeros((n * cap,), x.dtype).at[tgt].set(x, mode="drop")
        return jax.lax.all_to_all(buf.reshape(n, cap), DATA_AXIS, 0, 0,
                                  tiled=False).reshape(-1)

    mask = jnp.zeros((n * cap,), jnp.bool_).at[tgt].set(True, mode="drop")
    rmask = jax.lax.all_to_all(mask.reshape(n, cap), DATA_AXIS, 0, 0,
                               tiled=False).reshape(-1)
    return (ship(keys),) + tuple(ship(p) for p in payloads) + (rmask, ovf)


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
        rk, rv, rm, overflow = _exchange_by_dest(n, cap, keys, (values,))
        return rk, rv, rm, overflow

    return step


# -- distributed hash join ---------------------------------------------------

def dist_lookup_join(mesh: Mesh, probe_rows_per_device: int,
                     build_rows_per_device: int):
    """Distributed equi-join: probe side (large, e.g. lineitem) against a
    build side with UNIQUE keys (dimension table) -- the dominant join
    shape of the star-schema suites.

    Both sides are hash-repartitioned by key over ICI so matching keys
    land on the same device (the all-to-all shuffle replacing the
    reference's single-node join, SURVEY.md section 2.10); the local
    probe is a sort + searchsorted (static shapes, no dynamic hash table
    growth under jit).  Returns per device:
    (probe_keys, probe_vals, joined_build_vals, valid_mask, overflow).

    Precondition: build keys must be < iinfo(dtype).max (in-band
    invalid-slot sentinel).
    """
    n = mesh.shape[DATA_AXIS]
    pcap = max(1, (2 * probe_rows_per_device) // n)
    bcap = max(1, (2 * build_rows_per_device) // n)

    def _bucketize(keys, values, cap):
        return _exchange_by_dest(n, cap, keys, (values,))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                        P(DATA_AXIS), P(DATA_AXIS)))
    def step(probe_keys, probe_vals, build_keys, build_vals):
        pk, pv, pm, povf = _bucketize(probe_keys, probe_vals, pcap)
        bk, bv, bm, bovf = _bucketize(build_keys, build_vals, bcap)
        # local lookup: sort build side, binary-search the probes
        sentinel = jnp.asarray(jnp.iinfo(bk.dtype).max, bk.dtype)
        bk_s = jnp.where(bm, bk, sentinel)
        order = jnp.argsort(bk_s)
        bk_sorted = bk_s[order]
        bv_sorted = bv[order]
        pos = jnp.searchsorted(bk_sorted, pk)
        pos = jnp.clip(pos, 0, bk_sorted.shape[0] - 1)
        hit = (bk_sorted[pos] == pk) & pm
        joined = jnp.where(hit, bv_sorted[pos], 0)
        return pk, pv, joined, hit, povf + bovf

    return step


def dist_agg_by_key(mesh: Mesh, rows_per_device: int):
    """Distributed high-cardinality SUM-by-key, skew-resistant: each
    device pre-aggregates ITS OWN rows into (key, partial) pairs via
    sort + segment-sum BEFORE the shuffle, so a heavy key contributes at
    most ONE row per source device to the exchange (the "salted
    repartition of heavy keys" design of SURVEY.md section 7 -- local
    combining is the salt); the shuffle then routes partials to key
    owners which reduce them the same way.

    Returns per device (keys, sums, valid_mask, overflow).

    Precondition: keys must be < iinfo(dtype).max (the max value is the
    in-band invalid sentinel of the exchange).
    """
    n = mesh.shape[DATA_AXIS]
    cap = max(1, (2 * rows_per_device) // n)

    def _local_combine(keys, values, valid):
        """Sort + segment-reduce to (unique key, partial sum) pairs packed
        at the front; rows past the unique count carry sentinel/0."""
        sentinel = jnp.asarray(jnp.iinfo(keys.dtype).max, keys.dtype)
        k = jnp.where(valid, keys, sentinel)
        order = jnp.argsort(k)
        ks, vs = k[order], jnp.where(valid, values, 0)[order]
        first = jnp.concatenate([jnp.ones((1,), jnp.bool_), ks[1:] != ks[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        m = ks.shape[0]
        uk = jnp.full((m,), sentinel, ks.dtype).at[seg].min(ks)
        us = jnp.zeros((m,), vs.dtype).at[seg].add(vs)
        uvalid = uk != sentinel
        return uk, us, uvalid

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                        P(DATA_AXIS)))
    def step(keys, values):
        uk, us, uvalid = _local_combine(
            keys, values, jnp.ones(keys.shape, jnp.bool_))
        rk, rv, rm, ovf = _exchange_by_dest(n, cap, uk, (us,), valid=uvalid)
        fk, fs, fvalid = _local_combine(rk, rv, rm)
        return fk, fs, fvalid, ovf

    return step
