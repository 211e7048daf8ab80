"""Pallas grouped scatter-add: VMEM-resident accumulation tables.

An XLA TPU scatter-add is latency-bound at ~100ns/row PER PASS and
dropped rows still cost ~67ns (measured, PERF_NOTES.md round 4).  This
kernel accumulates ALL payload columns per row into a VMEM-resident
[slots, C] table in ONE pass over the data -- measured 35-47 ns/row
for 8 columns on v5e -- using the two classic histogram tricks:

- TWO accumulator tables alternate between even/odd rows, breaking the
  VMEM read-modify-write dependency chain (58 -> 35 ns/row measured);
- accumulation is i32 (the VPU's native width) with a SEGMENTED output
  flush: every `seg` grid tiles the i32 partial table spills to HBM
  and the partials tree-sum in i64 OUTSIDE the kernel, so results are
  EXACT for any value bounds the planner proves fit
  (max|v| * seg * TILE < 2^31).

Constraints (the caller falls back to the XLA scatter path otherwise):
- sum-kind aggregates only (counts are sums of ones); min/max keep the
  scatter path;
- integer payloads with planner-proven bounds; floats keep scatter
  (no f64 vector hardware -- f32 accumulation would break the
  bit-exactness gate);
- slot count <= MAX_SLOTS (VMEM: two tables + the out block, lane
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
#: max slot rows (VMEM: two M x 128-lane x 4B tables under the raised
#: scoped limit; M=16.4k verified exact at 45ns/row on v5e)
MAX_SLOTS = 24 * 1024
#: max payload columns per kernel call (one VMEM lane tile)
MAX_COLS = 16
#: max output segments (HBM partials: nseg x M x C x 4B)
MAX_SEGS = 64


def plan_segments(n_rows: int, max_abs: int):
    """-> (n_tiles, seg) or None when the bounds defeat the i32 window
    (the caller keeps the scatter path)."""
    if n_rows % TILE != 0:
        return None
    n_tiles = n_rows // TILE
    per_tile = max(int(max_abs), 1) * TILE
    seg = max(1, (1 << 30) // per_tile)
    nseg = -(-n_tiles // seg)
    if nseg > MAX_SEGS:
        return None
    return n_tiles, seg


def _kernel(seg, codes_ref, vals_ref, out_ref, tbl):
    i = pl.program_id(0)

    @pl.when(i % seg == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])
        tbl[:, :] = jnp.zeros_like(tbl)

    def body(k, carry):
        base = k * 2
        c0 = codes_ref[base, 0]
        out_ref[0, pl.ds(c0, 1), :] += vals_ref[pl.ds(base, 1), :]
        c1 = codes_ref[base + 1, 0]
        tbl[pl.ds(c1, 1), :] += vals_ref[pl.ds(base + 1, 1), :]
        return carry

    jax.lax.fori_loop(0, TILE // 2, body, 0)

    @pl.when((i % seg == seg - 1) | (i == pl.num_programs(0) - 1))
    def _():
        out_ref[0, :, :] += tbl[:, :]
        tbl[:, :] = jnp.zeros_like(tbl)


@partial(jax.jit, static_argnames=("m", "seg"))
def group_accumulate(slot: jax.Array, vals: jax.Array, m: int,
                     seg: int) -> jax.Array:
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
            partial(_kernel, seg),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
                      pl.BlockSpec((TILE, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, mp, c), lambda i: (i // seg, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nseg, mp, c), jnp.int32),
            scratch_shapes=[pltpu.VMEM((mp, c), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(slot.reshape(-1, 1), vals)
    return segs.astype(jnp.int64).sum(axis=0)[: m + 1]
