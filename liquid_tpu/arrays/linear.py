"""Linear-model and delta integer encodings.

Reference behavior: `LiquidLinearArray<T>` (liquid-cache
`src/core/src/liquid_array/linear_integer_array.rs:37`,
design `dev/design/02-linear-integer.md`):
  value[i] = intercept + round(slope * i) + residual[i]
with an L-infinity fit and residuals bit-packed; and
`LiquidPrimitiveDeltaArray<T>` (`primitive_array.rs:132-135`):
delta-encoded then bit-packed.

TPU-native: residuals/deltas live as bit-planes; decode is
`iota*slope + unpack` (a fused multiply-add over lanes) resp. a device
`cumsum` -- both stay on-chip, and predicate evaluation compares the
reconstructed lane values without ever materializing to host.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidArray, Predicate, validity_mask_or_full,
)
from liquid_tpu.arrays.primitive import LiquidPrimitiveArray, _np_dtype_for
from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as mops


def _values_and_validity(arr: pa.Array):
    np_dtype = _np_dtype_for(arr.type)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        vals = np.asarray(arr.fill_null(0)).astype(np.int64, copy=False)
    else:
        valid = None
        vals = np.asarray(arr).astype(np.int64, copy=False)
    del np_dtype
    return vals, valid


def _cmp_device(vals: jax.Array, op: str, lit) -> jax.Array:
    lit = jnp.asarray(lit, dtype=vals.dtype)
    if op == "eq":
        return vals == lit
    if op == "ne":
        return vals != lit
    if op == "lt":
        return vals < lit
    if op == "lt_eq":
        return vals <= lit
    if op == "gt":
        return vals > lit
    return vals >= lit


def _int_literal(pred: Predicate):
    """Normalize a numeric literal for integer compare -> (op, int) or
    ("const", bool) or None."""
    import math
    lit, op = pred.literal, pred.op
    if isinstance(lit, bool) or not isinstance(
            lit, (int, float, np.integer, np.floating)):
        return None
    if isinstance(lit, (float, np.floating)):
        f = float(lit)
        if math.isnan(f):
            return ("const", op == "ne")
        if math.isinf(f):
            pos = f > 0
            return ("const", {
                "eq": False, "ne": True,
                "lt": pos, "lt_eq": pos,
                "gt": not pos, "gt_eq": not pos,
            }[op])
        if f != int(f):
            if op == "eq":
                return ("const", False)
            if op == "ne":
                return ("const", True)
            if op in ("lt", "lt_eq"):
                return ("lt_eq", math.floor(f))
            return ("gt_eq", math.ceil(f))
        lit = int(f)
    return (op, int(lit))


class LiquidLinearArray(LiquidArray):
    """value[i] = round(slope*i) + residual[i]; residuals bit-packed.

    The intercept is folded into the residual array's reference_value.
    Only worthwhile for near-monotonic columns (offsets, timestamps) --
    the transcoder does not pick it automatically, matching the
    reference's "only use when you know the array is monotonic" stance.
    """

    def __init__(self, residuals: LiquidPrimitiveArray, slope: float,
                 length: int, arrow_type: pa.DataType):
        self.residuals = residuals   # int64-typed primitive block
        self.slope = float(slope)
        self.length = length
        self._arrow_type = arrow_type

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "LiquidLinearArray":
        assert len(arr) <= BLOCK_ROWS
        vals, valid = _values_and_validity(arr)
        length = len(arr)
        live = vals[valid] if valid is not None else vals
        if live.size >= 2:
            # least-squares slope (cheap, near the L-inf optimum for the
            # monotonic columns this encoding targets)
            idx = (np.flatnonzero(valid).astype(np.float64)
                   if valid is not None else np.arange(length, dtype=np.float64))
            lf = live.astype(np.float64)
            denom = ((idx - idx.mean()) ** 2).sum()
            slope = float(((idx - idx.mean()) * (lf - lf.mean())).sum() / denom) \
                if denom > 0 else 0.0
        else:
            slope = 0.0
        pred = np.round(slope * np.arange(length, dtype=np.float64)).astype(np.int64)
        resid = vals[:length] - pred
        residuals = LiquidPrimitiveArray.from_numpy(resid, valid, pa.int64(),
                                                    length)
        return cls(residuals, slope, length, arr.type)

    # -- LiquidArray -------------------------------------------------------

    @property
    def arrow_type(self) -> pa.DataType:
        return self._arrow_type

    @property
    def validity(self):
        return self.residuals.validity

    def memory_bytes(self) -> int:
        return self.residuals.memory_bytes() + 16

    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        resid, validity = self.residuals.to_device()
        # the linear term rounds HOST-side with the same numpy rounding
        # the encoder used: the device's emulated-f64 multiply+round can
        # flip by 1 at some i, corrupting decoded values
        pred = jnp.asarray(np.round(
            self.slope * np.arange(BLOCK_ROWS, dtype=np.float64)
        ).astype(np.int64))
        return resid + pred, validity

    def _decode_host(self) -> np.ndarray:
        """Host decode from the residual planes twins: a per-block
        device decode + tunnel fetch costs ~140 ms/block through axon
        (measured: 130 s of TPC-H q7's classic scan was linear
        to_arrow)."""
        r = self.residuals
        off = bp.unpack_bitplanes_host(r._planes) \
            if isinstance(r._planes, np.ndarray) \
            else np.asarray(bp.unpack_bitplanes(
                r.planes,
                jnp.uint64 if r.planes.shape[0] > 32 else jnp.uint32))
        resid = off.astype(np.int64) + r.reference_value
        pred = np.round(self.slope
                        * np.arange(BLOCK_ROWS, dtype=np.float64)
                        ).astype(np.int64)
        return resid + pred

    def to_arrow(self) -> pa.Array:
        host = self._decode_host()[: self.length]
        np_dtype = _np_dtype_for(self._arrow_type)
        if self.validity is not None:
            valid = mops.unpack_bits_host(
                np.asarray(self.validity))[: self.length]
            return pa.array(host.astype(np_dtype), type=self._arrow_type,
                            mask=~valid)
        return pa.array(host.astype(np_dtype), type=self._arrow_type)

    def try_eval_predicate(self, pred: Predicate, selection=None):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        r = _int_literal(pred)
        if r is None:
            return None
        op, lit = r
        validity = validity_mask_or_full(self.validity, self.length)
        if op == "const":
            bits = mops.all_set(BLOCK_ROWS) if lit else mops.none_set(BLOCK_ROWS)
            return mops.BoolMask(bits, validity)
        vals, _ = self.to_device()
        bits = mops.pack_bools(_cmp_device(vals, op, lit))
        return mops.BoolMask(bits, validity)

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_linear(self)


class LiquidPrimitiveDeltaArray(LiquidArray):
    """Delta-encoded + bit-packed primitive (ref primitive_array.rs:132).

    deltas[0] = 0 (first value is the reference); decode is a device
    cumulative sum over the unpacked delta lanes.
    """

    def __init__(self, deltas: LiquidPrimitiveArray, first_value: int,
                 validity, length: int, arrow_type: pa.DataType):
        # deltas is stored fully-valid: zeroing its null slots would
        # corrupt the cumsum for every later valid row, so row validity
        # lives here, not in the inner bit-pack
        self.deltas = deltas        # int64-typed primitive block of d[i]
        self.first_value = int(first_value)
        self._validity = validity   # packed uint32 | None
        self.length = length
        self._arrow_type = arrow_type

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "LiquidPrimitiveDeltaArray":
        from liquid_tpu.arrays.base import pack_validity
        assert len(arr) <= BLOCK_ROWS
        vals, valid = _values_and_validity(arr)
        length = len(arr)
        v = vals[:length]
        first = int(v[0]) if length else 0
        d = np.zeros(length, dtype=np.int64)
        if length > 1:
            d[1:] = v[1:] - v[:-1]
        deltas = LiquidPrimitiveArray.from_numpy(d, None, pa.int64(), length)
        return cls(deltas, first, pack_validity(valid, length), length,
                   arr.type)

    @property
    def arrow_type(self) -> pa.DataType:
        return self._arrow_type

    @property
    def validity(self):
        return self._validity

    def memory_bytes(self) -> int:
        return self.deltas.memory_bytes() + 16

    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        d, _ = self.deltas.to_device()
        # padding slots decode to reference_value; force them to 0 so the
        # cumsum reconstructs live rows exactly (null slots keep their
        # fill-derived deltas -- they reconstruct the fill values, and the
        # validity mask hides them)
        rows = jnp.arange(BLOCK_ROWS)
        d = jnp.where(rows < self.length, d, 0)
        return jnp.cumsum(d) + jnp.int64(self.first_value), self._validity

    def to_arrow(self) -> pa.Array:
        # host decode (see LiquidLinearArray._decode_host): cumsum of
        # the host-unpacked deltas + first value
        d0 = self.deltas
        if isinstance(d0._planes, np.ndarray):
            off = bp.unpack_bitplanes_host(d0._planes)
            d = (off.astype(np.int64) + d0.reference_value)
            d[self.length:] = 0
            d[0] = 0
            host = (np.cumsum(d) + self.first_value)[: self.length]
        else:
            vals, _ = self.to_device()
            host = np.asarray(vals)[: self.length]
        np_dtype = _np_dtype_for(self._arrow_type)
        if self.validity is not None:
            valid = mops.unpack_bits_host(
                np.asarray(self.validity))[: self.length]
            return pa.array(host.astype(np_dtype), type=self._arrow_type,
                            mask=~valid)
        return pa.array(host.astype(np_dtype), type=self._arrow_type)

    def try_eval_predicate(self, pred: Predicate, selection=None):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        r = _int_literal(pred)
        if r is None:
            return None
        op, lit = r
        validity = validity_mask_or_full(self.validity, self.length)
        if op == "const":
            bits = mops.all_set(BLOCK_ROWS) if lit else mops.none_set(BLOCK_ROWS)
            return mops.BoolMask(bits, validity)
        vals, _ = self.to_device()
        bits = mops.pack_bools(_cmp_device(vals, op, lit))
        return mops.BoolMask(bits, validity)

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_delta(self)
