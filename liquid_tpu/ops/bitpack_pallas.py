"""Pallas TPU kernels for the packed-compare hot path.

The XLA lowering of the bit-plane compare chain is fragile on TPU (the
carried-dependency graph defeats fusion and runs ~400x below roofline);
these kernels pin the loop in VMEM explicitly: one grid step loads a
[width, TW, 128] block of planes, runs the MSB-first compare entirely
in registers/VMEM, and writes packed lt/eq words (or just a partial
popcount for the fused count path).

Layout: planes uint32[width, W] reshaped to [width, W/128, 128]
(lanes = last dim).  The comparison constant arrives as a prepared
uint32[width] vector `cb` (0x0 / 0xFFFFFFFF per bit) -- computed once
at trace time from the scalar, so the kernel does no 64-bit math.

Fallback: interpret mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8
# words per grid step (per-plane): 64KB/plane tile
TILE_WORDS = 16384


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cb_vector(c, width: int) -> jax.Array:
    """uint64 scalar -> uint32[width] of all-ones/all-zeros per bit."""
    c = jnp.asarray(c).astype(jnp.uint64)
    bits = (c >> jnp.arange(width, dtype=jnp.uint64)) & jnp.uint64(1)
    return jnp.where(bits != 0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))



def prep(planes: jax.Array) -> jax.Array:
    """[width, W] planes -> pallas-ready [width, Wp/LANES, LANES] tiles
    (padded to TILE_WORDS).  Do this ONCE per stored column: reshaping a
    2D operand at every pallas_call costs a relayout copy across the
    Mosaic boundary (measured 8x off roofline; see count_gt)."""
    width, w_words = planes.shape
    pad = (-w_words) % TILE_WORDS
    p = planes if pad == 0 else jnp.pad(planes, ((0, 0), (0, pad)))
    return p.reshape(width, (w_words + pad) // LANES, LANES)


def _as_tiles(planes):
    """-> (p3, w_words): accept either flat [w, W] or prepared tiles."""
    if planes.ndim == 3:
        return planes, planes.shape[1] * LANES
    return prep(planes), planes.shape[1]


def _cmp_kernel(cb_ref, planes_ref, lt_ref, eq_ref):
    width = planes_ref.shape[0]
    lt = jnp.zeros_like(planes_ref[0])
    eq = jnp.full_like(planes_ref[0], jnp.uint32(0xFFFFFFFF))
    for b in range(width - 1, -1, -1):
        pb = planes_ref[b]
        cb = cb_ref[b, 0]
        lt = lt | (eq & ~pb & cb)
        eq = eq & ~(pb ^ cb)
    lt_ref[:] = lt
    eq_ref[:] = eq


@functools.partial(jax.jit, static_argnames=("interpret",))
def cmp_const_planes(planes: jax.Array, c, interpret: bool | None = None):
    """planes uint32[width, W] (W % TILE_WORDS == 0 after padding), traced
    scalar c -> (lt, eq) packed uint32[W]."""
    width = planes.shape[0]
    if width == 0:
        n = planes.shape[1] if planes.ndim == 2 else planes.shape[1] * LANES
        full = jnp.full((n,), jnp.uint32(0xFFFFFFFF))
        zero = jnp.zeros((n,), jnp.uint32)
        c64 = jnp.asarray(c).astype(jnp.uint64)
        over = jnp.where(c64 != 0, full, zero)
        return over, jnp.where(c64 != 0, zero, full)
    interp = _interpret() if interpret is None else interpret
    p3, w_words = _as_tiles(planes)
    wpad = p3.shape[1] * LANES
    cb = _cb_vector(c, width)
    grid = (wpad // TILE_WORDS,)
    tw = TILE_WORDS // LANES
    with jax.enable_x64(False):
        # Mosaic cannot legalize the i64 scalars x64 mode gives the
        # BlockSpec index maps (PERF_NOTES.md); the kernel is 32-bit pure
        lt, eq = pl.pallas_call(
            _cmp_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((width, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((width, tw, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tw, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tw, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((wpad // LANES, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((wpad // LANES, LANES), jnp.uint32),
            ],
            interpret=interp,
        )(cb.reshape(width, 1), p3)
    lt = lt.reshape(-1)[:w_words]
    eq = eq.reshape(-1)[:w_words]
    # constant bits above the stored width
    c64 = jnp.asarray(c).astype(jnp.uint64)
    if width < 64:
        over = jnp.where((c64 >> jnp.uint64(width)) != 0,
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        lt = lt | over
        eq = eq & ~over
    return lt, eq


def _cmp_count_kernel(cb_ref, planes_ref, out_ref):
    """Fused compare + popcount, accumulated across grid steps into one
    (8, 128) block (TPU grid steps run sequentially -> safe)."""
    width = planes_ref.shape[0]
    lt = jnp.zeros_like(planes_ref[0])
    eq = jnp.full_like(planes_ref[0], jnp.uint32(0xFFFFFFFF))
    for b in range(width - 1, -1, -1):
        pb = planes_ref[b]
        cb = cb_ref[b, 0]
        lt = lt | (eq & ~pb & cb)
        eq = eq & ~(pb ^ cb)
    gt = ~(lt | eq)
    counts = jax.lax.population_count(gt).astype(jnp.int32)
    partial = counts.reshape(-1, SUBL, LANES).sum(axis=0, dtype=jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial


@functools.partial(jax.jit, static_argnames=("interpret",))
def count_gt(planes: jax.Array, c, interpret: bool | None = None) -> jax.Array:
    """Fused: number of rows with value > c (packed domain)."""
    width = planes.shape[0]
    if width == 0:
        return jnp.int32(0)
    interp = _interpret() if interpret is None else interpret
    p3, w_words = _as_tiles(planes)
    wpad = p3.shape[1] * LANES
    cb = _cb_vector(c, width)
    grid = (wpad // TILE_WORDS,)
    tw = TILE_WORDS // LANES
    with jax.enable_x64(False):
        partials = pl.pallas_call(
            _cmp_count_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((width, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((width, tw, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUBL, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUBL, LANES), jnp.int32),
            interpret=interp,
        )(cb.reshape(width, 1), p3)
    total = partials.sum(dtype=jnp.int32)
    if width < 64:
        # c has bits above the stored width: no value can exceed it
        c64 = jnp.asarray(c).astype(jnp.uint64)
        total = jnp.where((c64 >> jnp.uint64(width)) != 0, jnp.int32(0), total)
    return total.astype(jnp.int32)



# -- batched per-block compare (the SQL engine's row-group hot path) ---------

#: words per block in the batched kernel (one 8192-row block = 256 words)
BLOCK_WORDS = 256


def _cmp_many_kernel(cb_ref, planes_ref, lt_ref, eq_ref):
    """One grid step = one 8192-row block: planes_ref [1, w, 2, 128];
    cb_ref holds the FULL [B, w] constant table in SMEM (block-indexed
    SMEM specs are over-constrained), indexed by program_id."""
    width = planes_ref.shape[1]
    i = pl.program_id(0)
    lt = jnp.zeros_like(planes_ref[0, 0])
    eq = jnp.full_like(planes_ref[0, 0], jnp.uint32(0xFFFFFFFF))
    for b in range(width - 1, -1, -1):
        pb = planes_ref[0, b]
        cb = cb_ref[i, b]
        lt = lt | (eq & ~pb & cb)
        eq = eq & ~(pb ^ cb)
    lt_ref[0] = lt
    eq_ref[0] = eq


@functools.partial(jax.jit, static_argnames=("interpret",))
def cmp_const_many_pallas(planes_stack: jax.Array, cs: jax.Array,
                          interpret: bool | None = None):
    """Batched packed compare with PER-BLOCK constants: planes_stack
    uint32[B, width, BLOCK_WORDS], cs uint64[B] -> (lt, eq)
    uint32[B, BLOCK_WORDS].  One pallas dispatch for a whole row group
    of blocks (each grid step owns one block and its own constant,
    mirroring per-block reference_value offsets)."""
    bsz, width, w_words = planes_stack.shape
    assert w_words == BLOCK_WORDS, w_words
    interp = _interpret() if interpret is None else interpret
    cbs = jax.vmap(lambda c: _cb_vector(c, width))(cs)      # [B, width] u32
    p4 = planes_stack.reshape(bsz, width, w_words // LANES, LANES)
    tw = w_words // LANES
    with jax.enable_x64(False):
        lt, eq = pl.pallas_call(
            _cmp_many_kernel,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((bsz, width), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, width, tw, LANES), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tw, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tw, LANES), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, tw, LANES), jnp.uint32),
                jax.ShapeDtypeStruct((bsz, tw, LANES), jnp.uint32),
            ],
            interpret=interp,
        )(cbs, p4)
    lt = lt.reshape(bsz, w_words)
    eq = eq.reshape(bsz, w_words)
    # constant bits above the stored width: every value is smaller
    if width < 64:
        over = jnp.where((cs.astype(jnp.uint64) >> jnp.uint64(width)) != 0,
                         jnp.uint32(0xFFFFFFFF), jnp.uint32(0))[:, None]
        lt = lt | over
        eq = eq & ~over
    return lt, eq
