"""Bit-packed primitive arrays (ints, dates, timestamps).

Reference behavior: `LiquidPrimitiveArray<T>` (liquid-cache
`src/core/src/liquid_array/primitive_array.rs:124-128`): values stored
as unsigned offsets from a per-block `reference_value`, bit-packed at
minimal width; predicates are translated into the packed domain.

TPU-native: offsets live as bit-planes (liquid_tpu.ops.bitpack) so
predicate evaluation is a packed bitwise compare -- no decode.  Literal
range-analysis happens host-side at plan time (SQL literals are static),
so out-of-domain comparisons compile to constant masks.
"""
from __future__ import annotations

import math
import struct
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidArray, Predicate, pack_validity, validity_mask_or_full,
)
from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as mops

_SUPPORTED = {}  # pa type id -> numpy dtype


def _np_dtype_for(t: pa.DataType) -> np.dtype:
    if pa.types.is_boolean(t):
        return np.dtype(np.bool_)
    if pa.types.is_date32(t):
        return np.dtype(np.int32)
    if pa.types.is_timestamp(t) or pa.types.is_date64(t):
        return np.dtype(np.int64)
    return np.dtype(t.to_pandas_dtype())


def is_supported_type(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_date(t)
            or pa.types.is_timestamp(t))


class LiquidPrimitiveArray(LiquidArray):
    """One 8192-row block of a primitive column in bit-plane form."""

    def __init__(self, planes, width: int, reference_value: int,
                 validity, length: int, arrow_type: pa.DataType):
        # planes/validity may be HOST numpy (fresh transcode: no device
        # work) or device arrays (tests/legacy); the device copy uploads
        # lazily on first use and is cached
        self._planes = planes             # uint32[width, BLOCK_ROWS/32]
        self._planes_dev = None if isinstance(planes, np.ndarray) else planes
        self.width = width
        self.reference_value = reference_value
        self._validity = validity         # packed uint32[BLOCK_ROWS/32] | None
        self._validity_dev = (None if isinstance(validity, np.ndarray)
                              else validity)
        self.length = length
        self._arrow_type = arrow_type

    @property
    def planes(self) -> jax.Array:
        if self._planes_dev is None:
            self._planes_dev = jnp.asarray(self._planes)
        return self._planes_dev

    @property
    def planes_np(self) -> np.ndarray:
        if isinstance(self._planes, np.ndarray):
            return self._planes
        return np.asarray(self._planes)

    @property
    def validity(self):
        if self._validity is None:
            return None
        if self._validity_dev is None:
            self._validity_dev = jnp.asarray(self._validity)
        return self._validity_dev

    @property
    def validity_np(self):
        if self._validity is None:
            return None
        if isinstance(self._validity, np.ndarray):
            return self._validity
        return np.asarray(self._validity)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "LiquidPrimitiveArray":
        assert len(arr) <= BLOCK_ROWS, len(arr)
        t = arr.type
        assert is_supported_type(t), t
        np_dtype = _np_dtype_for(t)
        length = len(arr)
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals = np.asarray(arr.fill_null(0)).astype(np_dtype, copy=False)
        else:
            valid = None
            vals = np.asarray(arr).astype(np_dtype, copy=False)
        return cls.from_numpy(vals, valid, t, length)

    @classmethod
    def from_numpy(cls, vals: np.ndarray, valid: Optional[np.ndarray],
                   arrow_type: pa.DataType, length: int) -> "LiquidPrimitiveArray":
        assert length <= BLOCK_ROWS
        v = np.zeros(BLOCK_ROWS, dtype=np.int64)
        v[:length] = vals[:length].astype(np.int64, copy=False)
        if valid is not None:
            sub = v[:length]
            live = sub[valid[:length]]
        else:
            live = v[:length]
        if live.size:
            ref = int(live.min())
            max_off = int(live.max()) - ref
        else:
            ref, max_off = 0, 0
        width = bp.bit_width_for(max_off)
        # padding + null slots get offset 0 (decode to reference_value)
        off = np.where(np.arange(BLOCK_ROWS) < length, v - ref, 0)
        if valid is not None:
            vv = np.zeros(BLOCK_ROWS, dtype=bool)
            vv[:length] = valid[:length]
            off = np.where(vv, off, 0)
        off = off.astype(np.uint64)
        planes = bp.pack_bitplanes_host(off, width)
        validity = pack_validity(valid, length)
        return cls(planes, width, ref, validity, length, arrow_type)

    def _with_logical(self, t: pa.DataType) -> "LiquidPrimitiveArray":
        """Re-tag the logical arrow type (bool stored as uint8 etc.)."""
        self._arrow_type = t
        return self

    # -- LiquidArray -------------------------------------------------------

    @property
    def arrow_type(self) -> pa.DataType:
        return self._arrow_type

    def memory_bytes(self) -> int:
        n = self._planes.size * 4
        if self._validity is not None:
            n += self._validity.size * 4
        return n + 64

    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        out_dtype = jnp.uint64 if self.planes.shape[0] > 32 else jnp.uint32
        off = bp.unpack_bitplanes(self.planes, out_dtype)
        vals = off.astype(jnp.int64) + jnp.int64(self.reference_value)
        return vals, self.validity

    def to_arrow(self) -> pa.Array:
        if isinstance(self._planes, np.ndarray):
            # host-resident planes decode without any device round trip
            return self.decode_from_offsets(
                bp.unpack_bitplanes_host(self._planes))
        out_dtype = jnp.uint64 if self.planes.shape[0] > 32 else jnp.uint32
        off = np.asarray(bp.unpack_bitplanes(self.planes, out_dtype))
        return self.decode_from_offsets(off)

    def decode_from_offsets(self, off: np.ndarray) -> pa.Array:
        """Finish decoding from already-unpacked offsets (host array) --
        the batched row-group decode path (cache.get_arrow_many) unpacks
        many blocks in one dispatch and hands each block its slice."""
        host = (off.astype(np.int64) + self.reference_value)[: self.length]
        np_dtype = _np_dtype_for(self._arrow_type)
        host = host.astype(np_dtype)
        if self._validity is not None:
            valid = mops.unpack_bits_host(self.validity_np)[: self.length]
            return pa.array(host, type=self._arrow_type, mask=~valid)
        return pa.array(host, type=self._arrow_type)

    def packed_plan(self, pred: Predicate):
        """Host-side range analysis of a predicate against this block's
        packed domain (literals are static at plan time).

        -> ("const", bool) | ("cmp", offset_u64, op) | None (unsupported).
        Shared by the per-block path and the batched row-group path
        (cache.eval_predicate_many)."""
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        lit = pred.literal
        if isinstance(lit, bool) or not isinstance(
                lit, (int, float, np.integer, np.floating)):
            return None
        op = pred.op
        # normalize non-integral float literals against an integer domain
        if isinstance(lit, (float, np.floating)):
            if math.isnan(lit):
                return ("const", op == "ne")
            if math.isinf(lit):
                pos = lit > 0
                return ("const", {
                    "eq": False, "ne": True,
                    "lt": pos, "lt_eq": pos,          # v < +inf always
                    "gt": not pos, "gt_eq": not pos,  # v > -inf always
                }[op])
            if float(lit) != int(lit):
                f = float(lit)
                if op == "eq":
                    return ("const", False)
                if op == "ne":
                    return ("const", True)
                if op in ("lt", "lt_eq"):    # v < 10.5  <=>  v <= 10
                    lit, op = math.floor(f), "lt_eq"
                else:                         # v > 10.5  <=>  v >= 11
                    lit, op = math.ceil(f), "gt_eq"
            else:
                lit = int(lit)
        lit = int(lit)
        r = self.reference_value
        max_rep = r + (1 << self.width) - 1
        if op == "eq":
            if lit < r or lit > max_rep:
                return ("const", False)
        elif op == "ne":
            if lit < r or lit > max_rep:
                return ("const", True)
        elif op in ("lt", "lt_eq"):
            if (lit <= r and op == "lt") or (lit < r):
                return ("const", False)
            if (lit > max_rep) or (lit == max_rep and op == "lt_eq"):
                return ("const", True)
        else:  # gt, gt_eq
            if (lit >= max_rep and op == "gt") or (lit > max_rep):
                return ("const", False)
            if (lit < r) or (lit == r and op == "gt_eq"):
                return ("const", True)
        return ("cmp", np.uint64(lit - r), op)

    def try_eval_predicate(self, pred: Predicate, selection=None):
        plan = self.packed_plan(pred)
        if plan is None:
            return None
        if plan[0] == "const":
            return self._const_mask(plan[1])
        _, u, op = plan
        bits = bp.cmp_const_op(self.planes, u, op)
        return mops.BoolMask(bits, validity_mask_or_full(self.validity, self.length))

    def _const_mask(self, value: bool) -> mops.BoolMask:
        bits = mops.all_set(BLOCK_ROWS) if value else mops.none_set(BLOCK_ROWS)
        return mops.BoolMask(bits, validity_mask_or_full(self.validity, self.length))

    # -- IPC ---------------------------------------------------------------

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_primitive(self)

    def squeeze(self):
        from liquid_tpu.arrays import hybrid
        return hybrid.squeeze_primitive(self)
