"""Bit-plane packing and packed-domain comparisons.

Reference behavior: `raw::BitPackedArray` over the `fastlanes` crate
(liquid-cache `src/core/src/liquid_array/raw/bit_pack_array.rs`) --
values stored at minimal bit-width, decoded with SIMD unpacking, then
compared.

TPU-native design: values are stored as **bit-planes**: for bit-width w
over N rows, `planes[b]` is a uint32[N/32] vector whose word j packs bit
b of rows 32j..32j+31 (LSB-first within a word).  Two consequences:

1. Decode is a fully vectorized shift/accumulate (no cross-lane ops).
2. Comparisons never decode at all: a magnitude comparison against a
   constant runs MSB-to-LSB over the planes with 3 word-ops per plane,
   each uint32 element deciding 32 rows at once.  For a 10-bit column
   that is ~30 word-ops per 32 rows versus 32 full decodes -- this is
   the engine's answer to "decode dominates filter CPU" (VLDB paper).

Width bucketing: physical plane counts are quantized to WIDTH_BUCKETS
(zero-padded above the logical width).  XLA compiles one kernel per
*shape*; bucketing caps the universe of shapes at ~20 regardless of how
many distinct column widths a workload has, which keeps first-query
compile latency bounded.  Zero planes are semantically transparent: a
zero bit compared against the constant's bit is exactly the right
comparison for values that simply lack those bits.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

WORD_BITS = 32
_U32 = jnp.uint32
_U64 = jnp.uint64
_FULL = jnp.uint32(0xFFFFFFFF)

#: Physical plane-count buckets.  Dense at low widths (where real columns
#: live after reference-value offsetting), sparse above.
WIDTH_BUCKETS = (0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32,
                 40, 48, 56, 64)


def bucket_for(width: int) -> int:
    for b in WIDTH_BUCKETS:
        if b >= width:
            return b
    raise ValueError(f"width {width} > 64")


def bit_width_for(max_value: int) -> int:
    """Minimal bit-width to represent values in [0, max_value]."""
    if max_value <= 0:
        return 0
    return int(max_value).bit_length()


@partial(jax.jit, static_argnums=(1,))
def _pack(values: jax.Array, bucket: int) -> jax.Array:
    n = values.shape[0]
    v = values.astype(_U64).reshape(n // WORD_BITS, WORD_BITS)
    b = jnp.arange(bucket, dtype=_U64)[:, None, None]
    bits = (v[None, :, :] >> b) & jnp.uint64(1)
    lane = jnp.uint64(1) << jnp.arange(WORD_BITS, dtype=_U64)[None, None, :]
    return (bits * lane).sum(axis=-1, dtype=_U64).astype(_U32)


def pack_bitplanes(values: jax.Array, width: int) -> jax.Array:
    """Unsigned values[N] (N % 32 == 0) -> planes uint32[bucket(width), N/32].

    Bits at or above `width` must be zero in `values` (width comes from
    `bit_width_for(max)`); planes above `width` come out zero.
    """
    n = values.shape[0]
    assert n % WORD_BITS == 0, n
    bucket = bucket_for(width)
    if bucket == 0:
        return jnp.zeros((0, n // WORD_BITS), dtype=_U32)
    return _pack(values, bucket)


def pack_bitplanes_host(values, width: int):
    """Host (numpy) twin of pack_bitplanes: unsigned values[N]
    (N % 32 == 0) -> uint32[bucket(width), N/32], bit-identical layout.

    Transcode runs entirely on the host with this (no per-block device
    dispatch -- the round-2 liquid warm-up was dominated by per-block
    uploads/dispatches through the remote-TPU tunnel); the device copy
    uploads lazily on first predicate/decode use.
    """
    import numpy as _np
    v = _np.asarray(values, dtype=_np.uint64)
    n = v.shape[0]
    assert n % WORD_BITS == 0, n
    bucket = bucket_for(width)
    w = n // WORD_BITS
    if bucket == 0:
        return _np.zeros((0, w), dtype=_np.uint32)
    vw = v.reshape(w, WORD_BITS)
    lane = _np.uint32(1) << _np.arange(WORD_BITS, dtype=_np.uint32)
    out = _np.empty((bucket, w), dtype=_np.uint32)
    for b in range(bucket):
        bits = ((vw >> _np.uint64(b)) & _np.uint64(1)).astype(_np.uint32)
        out[b] = (bits * lane).sum(axis=1, dtype=_np.uint32)
    return out


def unpack_bitplanes_host(planes, out_dtype=None):
    """Host (numpy) twin of unpack_bitplanes: uint32[bucket, W] ->
    uint64[W*32] (or out_dtype)."""
    import numpy as _np
    p = _np.asarray(planes, dtype=_np.uint32)
    bucket, w = p.shape
    n = w * WORD_BITS
    if bucket == 0:
        return _np.zeros(n, dtype=out_dtype or _np.uint64)
    shifts = _np.arange(WORD_BITS, dtype=_np.uint32)
    bits = (p[:, :, None] >> shifts[None, None, :]) & 1  # [b, W, 32]
    acc = _np.zeros((w, WORD_BITS), dtype=_np.uint64)
    for b in range(bucket):
        acc |= bits[b].astype(_np.uint64) << _np.uint64(b)
    out = acc.reshape(n)
    return out.astype(out_dtype) if out_dtype is not None else out


@partial(jax.jit, static_argnums=(1,))
def unpack_bitplanes(planes: jax.Array, out_dtype=jnp.uint32) -> jax.Array:
    """planes uint32[bucket, W] -> values out_dtype[W*32]."""
    bucket, w_words = planes.shape
    n = w_words * WORD_BITS
    if bucket == 0:
        return jnp.zeros((n,), dtype=out_dtype)
    acc_dtype = _U64 if jnp.dtype(out_dtype).itemsize > 4 else _U32
    shifts = jnp.arange(WORD_BITS, dtype=_U32)
    bits = (planes[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)  # [b, W, 32]
    b = jnp.arange(bucket, dtype=acc_dtype)[:, None, None]
    vals = (bits.astype(acc_dtype) << b).sum(axis=0, dtype=acc_dtype)
    return vals.reshape(n).astype(out_dtype)


@jax.jit
def cmp_const(planes: jax.Array, c):
    """Compare packed column against a (possibly traced) unsigned scalar.

    Returns packed masks `(lt, eq)`: lt[word] bit i set iff row value < c,
    eq likewise for equality.  gt = ~(lt|eq).  MSB-first bitwise compare:
      lt |= eq_so_far & ~plane_b & c_b ;  eq &= ~(plane_b ^ c_b)
    """
    bucket, n_words = planes.shape
    c = jnp.asarray(c).astype(_U64)
    if bucket > 0:
        # derive from planes so carries inherit shard_map varying axes
        lt = jnp.zeros_like(planes[0])
        eq = planes[0] | _FULL
    else:
        lt = jnp.zeros((n_words,), dtype=_U32)
        eq = jnp.full((n_words,), _FULL)

    def body(i, carry):
        lt, eq = carry
        b = bucket - 1 - i  # MSB-first
        pb = jax.lax.dynamic_index_in_dim(planes, b, axis=0, keepdims=False)
        cb = jnp.where(
            (c >> b.astype(_U64)) & jnp.uint64(1) != 0, _FULL, jnp.uint32(0)
        )
        lt = lt | (eq & ~pb & cb)
        eq = eq & ~(pb ^ cb)
        return lt, eq

    if bucket > 0:
        lt, eq = jax.lax.fori_loop(0, bucket, body, (lt, eq))
    # c bits above the physical bucket: every stored value is smaller
    if bucket < 64:
        c_over = jnp.where(c >> jnp.uint64(bucket) != 0, _FULL, jnp.uint32(0))
        lt = lt | c_over
        eq = eq & ~c_over
    return lt, eq


@partial(jax.jit, static_argnums=(2,))
def cmp_const_op(planes: jax.Array, c, op: str) -> jax.Array:
    """Packed comparison returning a single packed uint32 mask.

    op in {eq, ne, lt, lt_eq, gt, gt_eq}. `c` unsigned in the packed domain
    (caller applies reference_value offsetting and handles out-of-range).
    """
    lt, eq = cmp_const(planes, c)
    if op == "eq":
        return eq
    if op == "ne":
        return ~eq
    if op == "lt":
        return lt
    if op == "lt_eq":
        return lt | eq
    if op == "gt":
        return ~(lt | eq)
    if op == "gt_eq":
        return ~lt
    raise ValueError(f"unknown op {op}")


@jax.jit
def in_range(planes: jax.Array, lo_hi) -> jax.Array:
    """Packed mask for lo <= value <= hi (both traced unsigned scalars)."""
    lo, hi = lo_hi
    lt_lo, _ = cmp_const(planes, lo)
    lt_hi, eq_hi = cmp_const(planes, hi)
    return ~lt_lo & (lt_hi | eq_hi)


def _combine_op(lt: jax.Array, eq: jax.Array, op: str) -> jax.Array:
    if op == "eq":
        return eq
    if op == "ne":
        return ~eq
    if op == "lt":
        return lt
    if op == "lt_eq":
        return lt | eq
    if op == "gt":
        return ~(lt | eq)
    if op == "gt_eq":
        return ~lt
    raise ValueError(f"unknown op {op}")


@partial(jax.jit, static_argnums=(2,))
def cmp_const_op_many(planes_stack: jax.Array, cs: jax.Array,
                      op: str) -> jax.Array:
    """Batched packed compare: planes_stack uint32[B, bucket, W] (same
    width bucket), cs uint64[B] per-block constants (reference-value
    offsets differ per block) -> packed masks uint32[B, W].

    ONE dispatch for a whole row group's blocks -- the per-block
    dispatch overhead (and per-block host syncs) dominated the scan loop
    before this (PERF_NOTES.md).  On real TPUs the per-block-constant
    Pallas kernel runs the compare at memory speed (424 GB/s measured);
    elsewhere it lowers to the vmapped XLA chain.
    """
    bsz, bucket, w_words = planes_stack.shape
    # SMEM holds the per-block constants: ~2k blocks is the ceiling
    # (SF10 row groups overflow it and Mosaic refuses to compile)
    if (jax.default_backend() == "tpu" and bucket > 0 and bsz > 1
            and bsz <= 2048 and w_words == 256):
        from liquid_tpu.ops import bitpack_pallas as bpp
        lt, eq = bpp.cmp_const_many_pallas(planes_stack, cs,
                                           interpret=False)
        return _combine_op(lt, eq, op)
    return jax.vmap(lambda p, c: cmp_const_op(p, c, op))(planes_stack, cs)


@partial(jax.jit, static_argnums=(1,))
def unpack_bitplanes_many(planes_stack: jax.Array, out_dtype=jnp.uint32
                          ) -> jax.Array:
    """Batched decode: uint32[B, bucket, W] -> out_dtype[B, W*32] in one
    dispatch + one host transfer for a whole row group's blocks."""
    return jax.vmap(lambda p: unpack_bitplanes(p, out_dtype))(planes_stack)
