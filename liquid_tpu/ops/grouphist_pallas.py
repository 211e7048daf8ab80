"""Pallas grouped scatter-add: VMEM-resident accumulation tables.

An XLA TPU scatter-add is latency-bound at ~100ns/row PER PASS and
dropped rows still cost ~67ns (measured, PERF_NOTES.md round 4).  This
kernel accumulates ALL payload columns per row into a VMEM-resident
[slots, C] table in ONE pass over the data using the two classic
histogram tricks:

- T accumulator tables rotate across rows, breaking the VMEM
  read-modify-write dependency chain.  Measured on v5e at m=8890, c=7
  over 4M rows (round 5): T=2 127ms (32ns/row), T=4 83ms (21ns/row),
  T=8 57ms (14ns/row).  T is chosen by VMEM budget: 8 tables while the
  tables fit, degrading to 4 / 2 as `m` grows (m<=64k works at T=2).
- accumulation is i32 (the VPU's native width) with a SEGMENTED output
  flush: every `seg` grid tiles the i32 partial table spills to HBM
  and the partials tree-sum in i64 OUTSIDE the kernel, so results are
  EXACT for any value bounds the planner proves fit
  (max|v| * seg * TILE < 2^31).

Wide values (e.g. scaled-integer decimal sums with |v| up to ~2^31+)
ride a HI/LO SPLIT planned by `plan_hilo`: v = hi*2^SPLIT + lo with
lo in [0, 2^SPLIT); both halves are narrow i32 columns, the i64
recombination happens outside the kernel.  This keeps grouped decimal
sums in the one-pass histogram instead of the ~100ns/row XLA scatter.

Constraints (the caller falls back to the XLA scatter path otherwise):
- sum-kind aggregates only (counts are sums of ones); min/max keep the
  scatter path;
- integer payloads with planner-proven bounds; unbounded floats keep
  scatter (no f64 vector hardware -- f32 accumulation would break the
  bit-exactness gate);
- slot count <= MAX_SLOTS (VMEM: T tables + the out block, lane
  padding included).

Reference behavior: DataFusion's row-hash GroupedHashAggregateStream
update loop (the reference's grouped hot path); this is its
TPU-resident form.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imports fail on some backends; callers gate on TPU
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE = 1 << 11
#: max slot rows (two m x 128-lane x 4B tables + out block fit the
#: raised VMEM scoped limit; m=64k verified on v5e at 32ns/row r5)
MAX_SLOTS = 64 * 1024
#: max payload columns per kernel call (one VMEM lane tile)
MAX_COLS = 16
#: max output segments (HBM partials cost nseg x M x 512B -- the C
#: lanes pad to 128; callers with large M must also bound the product)
MAX_SEGS = 512
#: hi/lo split point for wide values (lo in [0, 2^SPLIT))
SPLIT = 15


def plan_tables(m: int) -> int:
    """Accumulator-table count by VMEM footprint (each table row costs
    128 lanes x 4B = 512B regardless of c<=128; T tables + the out
    block must fit VMEM alongside the input stream buffers).  v5e
    measurements (4M rows, c=7): T=8 14ns/row (m<=~19k), T=4 21ns/row
    (m<=~36k), T=2 32ns/row (m<=~64k, verified at m=64000)."""
    mp = ((m + 1 + 7) // 8) * 8
    per = mp * 128 * 4
    if 9 * per <= 88 * 1024 * 1024:
        return 8
    if 5 * per <= 88 * 1024 * 1024:
        return 4
    if 3 * per <= 100 * 1024 * 1024:
        return 2
    return 0


def plan_segments(n_rows: int, max_abs: int):
    """-> (n_tiles, seg) or None when the bounds defeat the i32 window
    (the caller keeps the scatter path or splits hi/lo first)."""
    if n_rows % TILE != 0:
        return None
    n_tiles = n_rows // TILE
    per_tile = max(int(max_abs), 1) * TILE
    if per_tile > (1 << 30):
        # even ONE tile can overflow the i32 window: no segment
        # cadence is safe (callers split hi/lo or keep scatter)
        return None
    seg = max(1, (1 << 30) // per_tile)
    nseg = -(-n_tiles // seg)
    if nseg > MAX_SEGS:
        return None
    return n_tiles, seg


def plan_hilo(n_rows: int, max_abs: int):
    """Plan for wide-value accumulation: -> (seg, split) where split=0
    means plain narrow columns and split=SPLIT means each wide column
    rides as (hi, lo) halves; None when even the split can't fit."""
    direct = plan_segments(n_rows, max_abs)
    if direct is not None:
        return direct[1], 0
    hi_abs = (int(max_abs) >> SPLIT) + 1
    sp = plan_segments(n_rows, hi_abs)
    if sp is None:
        return None
    # the LO half's window constrains seg too: lo in [0, 2^SPLIT)
    seg_lo = max(1, (1 << 30) // ((1 << SPLIT) * TILE))
    seg = min(sp[1], seg_lo)
    if -(-(n_rows // TILE) // seg) > MAX_SEGS:
        return None
    return seg, SPLIT


def split_hilo(v: jax.Array):
    """v i64 -> (hi, lo) i32 with v == hi*2^SPLIT + lo, lo in
    [0, 2^SPLIT) (arithmetic shift keeps negatives exact)."""
    lo = (v & jnp.int64((1 << SPLIT) - 1)).astype(jnp.int32)
    hi = (v >> SPLIT).astype(jnp.int32)
    return hi, lo


def _kernel(seg, ntab, codes_ref, vals_ref, out_ref, *tbls):
    i = pl.program_id(0)

    @pl.when(i % seg == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])
        for t in tbls:
            t[:, :] = jnp.zeros_like(t)

    def body(k, carry):
        base = k * ntab
        c0 = codes_ref[base, 0]
        out_ref[0, pl.ds(c0, 1), :] += vals_ref[pl.ds(base, 1), :]
        for j, t in enumerate(tbls):
            cj = codes_ref[base + 1 + j, 0]
            t[pl.ds(cj, 1), :] += vals_ref[pl.ds(base + 1 + j, 1), :]
        return carry

    jax.lax.fori_loop(0, TILE // ntab, body, 0)

    @pl.when((i % seg == seg - 1) | (i == pl.num_programs(0) - 1))
    def _():
        for t in tbls:
            out_ref[0, :, :] += t[:, :]
            t[:, :] = jnp.zeros_like(t)


@partial(jax.jit, static_argnames=("m", "seg", "ntab"))
def group_accumulate(slot: jax.Array, vals: jax.Array, m: int,
                     seg: int, ntab: int = 2) -> jax.Array:
    """slot i32[n] in [0, m] (m = trash row), vals i32[n, C] -> exact
    i64[m+1, C] per-slot sums (row m collects the trash)."""
    n, c = vals.shape
    n_tiles = n // TILE
    nseg = -(-n_tiles // seg)
    mp = ((m + 1 + 7) // 8) * 8  # sublane-rounded table rows
    # clip BOTH sides: planner invariants prove slots in [0, m], but a
    # bound bug must degrade to wrong trash-row accounting, never an
    # out-of-bounds VMEM write (negatives route to the trash row m)
    slot = jnp.clip(jnp.where(slot < 0, jnp.int32(m), slot),
                    0, jnp.int32(mp - 1))
    with jax.enable_x64(False):
        segs = pl.pallas_call(
            partial(_kernel, seg, ntab),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
                      pl.BlockSpec((TILE, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, mp, c), lambda i: (i // seg, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nseg, mp, c), jnp.int32),
            scratch_shapes=[pltpu.VMEM((mp, c), jnp.int32)
                            for _ in range(ntab - 1)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(slot.reshape(-1, 1), vals)
    return segs.astype(jnp.int64).sum(axis=0)[: m + 1]
