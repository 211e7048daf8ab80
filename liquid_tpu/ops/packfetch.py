"""Bit-packed device->host result fetch.

The remote-TPU tunnel moves ~8 MB/s with a ~35 ms dispatch floor
(PERF_NOTES.md), so a million-group result matrix fetched as raw i64
columns costs tens of seconds.  This module fetches a set of
same-width device columns in TWO bounded transfers instead of
one-per-column:

1. a tiny per-column [min, max] header (one jitted reduction), from
   which the host derives each column's minimal bit-width;
2. ONE concatenated bit-plane buffer holding every narrow column as
   ``pack_bitplanes(v - min, width)`` planes, plus one stacked raw
   i64 matrix for the incompressible columns (f64 bit images).

The host decodes with the bit-identical numpy twins from
:mod:`liquid_tpu.ops.bitpack` -- no device round-trip.

Reference behavior: the liquid-cache Flight server streams *encoded*
Arrow IPC with dictionary resend instead of raw materialized batches
(reference ``src/datafusion-server/src/lib.rs:200-235``); this module
applies the same idea at this build's network boundary, the
device->host tunnel.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from liquid_tpu.ops import bitpack as bp

#: below this raw-byte estimate the per-column fetch is already inside
#: the dispatch floor; packing would only add compile variants
MIN_PACK_BYTES = 1 << 21

#: a column whose bucketed width reaches this rides the raw i64 stack
#: (packing 56+ planes moves as many bytes as the raw fetch)
RAW_WIDTH = 56


def _as_i64_image(x):
    """Reversible i64 bit-image of a device column (+ its tag)."""
    if x.dtype == jnp.float64:
        from liquid_tpu.ops import floatbits
        return floatbits.f64_bits(x), "f64"
    if x.dtype == jnp.bool_:
        return x.astype(jnp.int64), "bool"
    if x.dtype != jnp.int64:
        return x.astype(jnp.int64), "i64"
    return x, "i64"


def _from_i64_image(v: np.ndarray, tag: str) -> np.ndarray:
    if tag == "f64":
        return v.view(np.float64)
    if tag == "bool":
        return v.astype(bool)
    return v


@jax.jit
def _minmax(mat, g):
    idx = jnp.arange(mat.shape[1], dtype=jnp.int32)
    m = idx[None, :] < g
    big = jnp.int64(1) << jnp.int64(62)
    mn = jnp.min(jnp.where(m, mat, big), axis=1)
    mx = jnp.max(jnp.where(m, mat, -big), axis=1)
    return jnp.stack([mn, mx], axis=1)


@partial(jax.jit, static_argnums=(1,))
def _pack_planes(mat, widths, mins, g):
    """mat [c, w2] i64 -> concatenated u32 planes for the non-raw
    columns (static `widths`: 0 entries contribute no planes)."""
    idx = jnp.arange(mat.shape[1], dtype=jnp.int32)
    live = idx < g
    planes = []
    for i, w in enumerate(widths):
        if w == 0 or w >= RAW_WIDTH:
            continue
        v = jnp.where(live, mat[i], mins[i]) - mins[i]
        planes.append(bp.pack_bitplanes(v.astype(jnp.uint64), w))
    if not planes:
        return jnp.zeros((0, mat.shape[1] // 32), jnp.uint32)
    return jnp.concatenate(planes, axis=0)


#: observability: bytes a raw fetch would have moved vs what crossed
STATS = {"fetches": 0, "packed_fetches": 0, "raw_bytes": 0,
         "wire_bytes": 0}


def fetch_columns(cols: Sequence, g: int) -> List[np.ndarray]:
    """Fetch same-width device columns bit-packed; returns full-width
    numpy arrays in each column's original dtype (caller slices [:g]).

    Falls back to the plain per-column fetch when the raw payload is
    already small or the width is not 32-aligned.
    """
    cols = list(cols)
    if not cols:
        return []
    w2 = int(cols[0].shape[0])
    raw_bytes = len(cols) * w2 * 8
    STATS["fetches"] += 1
    STATS["raw_bytes"] += raw_bytes
    if raw_bytes < MIN_PACK_BYTES or w2 % 32 or g <= 0:
        STATS["wire_bytes"] += raw_bytes
        return [np.asarray(c) for c in cols]
    imgs, tags = zip(*[_as_i64_image(c) for c in cols])
    mat = jnp.stack(imgs)
    hdr = np.asarray(_minmax(mat, jnp.int32(g)))
    mins = hdr[:, 0]
    widths = []
    for i in range(len(cols)):
        span = int(hdr[i, 1]) - int(mins[i])
        if span < 0 or span >= (1 << (RAW_WIDTH - 1)):
            # no live rows, or a full-entropy span (f64 bit images):
            # plane-packing would move as many bytes as the raw stack
            widths.append(RAW_WIDTH)
            continue
        widths.append(bp.bucket_for(bp.bit_width_for(span)))
    raw_ix = [i for i, w in enumerate(widths) if w >= RAW_WIDTH]
    packed = np.asarray(_pack_planes(
        mat, tuple(widths), jnp.asarray(mins), jnp.int32(g)))
    raws = np.asarray(mat[jnp.asarray(raw_ix, jnp.int32)]) if raw_ix \
        else np.zeros((0, w2), np.int64)
    STATS["packed_fetches"] += 1
    STATS["wire_bytes"] += (hdr.nbytes + packed.nbytes + raws.nbytes)
    out: List[np.ndarray] = []
    row = 0
    ri = 0
    for i, w in enumerate(widths):
        if w >= RAW_WIDTH:
            v = raws[ri]
            ri += 1
        elif w == 0:
            v = np.full(w2, mins[i], np.int64)
        else:
            u = bp.unpack_bitplanes_host(packed[row:row + w])
            row += w
            v = u.astype(np.int64) + mins[i]
        out.append(_from_i64_image(np.ascontiguousarray(v), tags[i]))
    return out
