"""Decimal encodings.

Reference behavior: `LiquidDecimalArray` (liquid-cache
`src/core/src/liquid_array/decimal_array.rs:120`): Decimal128/256 whose
unscaled values fit u64 are bit-packed like primitives;
`LiquidFixedLenByteArray` (`fix_len_byte_array.rs:26`): big decimals are
dictionary-encoded (u16 keys) with FSST-compressed fixed-len byte values.

TPU-native: small decimals reuse the bit-plane machinery of
LiquidPrimitiveArray (predicates become packed compares on the unscaled
domain); big decimals keep a device-resident code vector and evaluate
predicates once per distinct value host-side (dictionaries are tiny),
then a device gather produces the row mask -- same split as byteview.
"""
from __future__ import annotations

import decimal as pydec
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidArray, Predicate, pack_validity, validity_mask_or_full,
)
from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
from liquid_tpu.ops import mask as mops

_I64_MIN = -(1 << 63)
_I64_MAX = (1 << 63) - 1


def is_supported_type(t: pa.DataType) -> bool:
    return pa.types.is_decimal(t)


def _byte_width(t: pa.DataType) -> int:
    return 32 if pa.types.is_decimal256(t) else 16


def _unscaled_ints(arr: pa.Array) -> np.ndarray:
    """Unscaled two's-complement ints of a decimal array (python ints)."""
    w = _byte_width(arr.type)
    data = arr.buffers()[1]
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=(arr.offset + len(arr)) * w)[arr.offset * w:]
    raw = raw.reshape(len(arr), w)
    out = np.empty(len(arr), dtype=object)
    bits = 8 * w
    for i, row in enumerate(raw):
        v = int.from_bytes(row.tobytes(), "little", signed=True)
        out[i] = v
    del bits
    return out


def _decimal_from_unscaled(vals, t: pa.DataType,
                           valid: Optional[np.ndarray] = None) -> pa.Array:
    """Build a decimal array from unscaled ints (no re-scaling)."""
    w = _byte_width(t)
    n = len(vals)
    data = bytearray(n * w)
    for i, v in enumerate(vals):
        data[i * w:(i + 1) * w] = int(v).to_bytes(w, "little", signed=True)
    bufs = [None, pa.py_buffer(bytes(data))]
    if valid is not None:
        bufs[0] = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(t, n, bufs,
                                     null_count=int((~valid).sum()))
    return pa.Array.from_buffers(t, n, bufs)


def _scaled_literal(lit, scale: int):
    """-> (exact_unscaled_int, None) or (adjusted_int, adjusted_op_map)
    for non-representable literals; None if not comparable."""
    if isinstance(lit, bool) or not isinstance(
            lit, (int, float, pydec.Decimal, np.integer, np.floating)):
        return None
    if isinstance(lit, (float, np.floating)):
        if np.isnan(lit):
            return "nan"
        lit = pydec.Decimal(str(float(lit)))
    elif isinstance(lit, (int, np.integer)):
        lit = pydec.Decimal(int(lit))
    d = pydec.Decimal(lit) * (pydec.Decimal(10) ** scale)
    whole = d.to_integral_value(rounding=pydec.ROUND_FLOOR)
    return int(whole), (d == whole)


class LiquidDecimalArray(LiquidPrimitiveArray):
    """Decimal whose unscaled values fit i64: bit-planes on the unscaled
    domain (ref decimal_array.rs:120)."""

    def __init__(self, planes, width, reference_value, validity, length,
                 arrow_type: pa.DataType):
        super().__init__(planes, width, reference_value, validity, length,
                         arrow_type)

    @classmethod
    def fits(cls, arr: pa.Array) -> bool:
        t = arr.type
        if pa.types.is_decimal128(t) and t.precision <= 18:
            return True
        vals = _unscaled_ints(arr)
        if arr.null_count:
            ok = np.asarray(arr.is_valid())
            vals = vals[ok]
        return all(_I64_MIN <= v <= _I64_MAX for v in vals)

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "LiquidDecimalArray":
        assert len(arr) <= BLOCK_ROWS
        t = arr.type
        vals_obj = _unscaled_ints(arr)
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals_obj[~valid] = 0
        else:
            valid = None
        vals = np.array([int(v) for v in vals_obj], dtype=np.int64)
        base = LiquidPrimitiveArray.from_numpy(vals, valid, pa.int64(),
                                               len(arr))
        # hand over the HOST forms (no device upload at transcode time)
        return cls(base._planes, base.width, base.reference_value,
                   base._validity, base.length, t)

    def to_arrow(self) -> pa.Array:
        dev, _ = self.to_device()
        host = np.asarray(dev)[: self.length]
        valid = None
        if self.validity is not None:
            valid = np.asarray(mops.unpack_bits(self.validity))[: self.length]
        return _decimal_from_unscaled(host, self._arrow_type, valid)

    def try_eval_predicate(self, pred: Predicate, selection=None):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        scale = self._arrow_type.scale
        r = _scaled_literal(pred.literal, scale)
        if r is None:
            return None
        if r == "nan":
            return self._const_mask(pred.op == "ne")
        floor_int, exact = r
        op = pred.op
        if not exact:
            # v < L (non-representable) <=> v <= floor(L); v == L is false
            if op == "eq":
                return self._const_mask(False)
            if op == "ne":
                return self._const_mask(True)
            if op in ("lt", "lt_eq"):
                lit, op = floor_int, "lt_eq"
            else:
                lit, op = floor_int + 1, "gt_eq"
        else:
            lit = floor_int
        return LiquidPrimitiveArray.try_eval_predicate(
            self, Predicate(op, lit), selection)

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_decimal(self)

    def squeeze(self):
        return None


class LiquidFixedLenByteArray(LiquidArray):
    """Big decimals: u16 dictionary keys (device) + FSST-compressed
    fixed-len bytes (ref fix_len_byte_array.rs:26)."""

    def __init__(self, codes: jax.Array, fsst, byte_width: int,
                 validity: Optional[jax.Array], length: int,
                 arrow_type: pa.DataType):
        self.codes = codes          # int32[BLOCK_ROWS]
        self.fsst = fsst            # arrays.fsst.FsstBuffer of w-byte values
        self.byte_width = byte_width
        self.validity = validity
        self.length = length
        self._arrow_type = arrow_type
        self._verdict_cache: dict = {}

    @classmethod
    def from_arrow(cls, arr: pa.Array, compressor=None
                   ) -> "LiquidFixedLenByteArray":
        from liquid_tpu.arrays.fsst import FsstBuffer
        assert len(arr) <= BLOCK_ROWS
        t = arr.type
        w = _byte_width(t)
        length = len(arr)
        # pyarrow can't cast/dict-encode decimals to binary; work on the
        # raw w-byte rows directly
        raw = np.frombuffer(arr.buffers()[1], dtype=np.uint8,
                            count=(arr.offset + length) * w)[arr.offset * w:]
        rows = raw.reshape(length, w) if length else raw.reshape(0, w)
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            rows = np.where(valid[:, None], rows, 0)
        else:
            valid = None
        uniq, inverse = np.unique(rows, axis=0, return_inverse=True) \
            if length else (np.zeros((0, w), np.uint8), np.zeros(0, np.int64))
        codes = np.zeros(BLOCK_ROWS, dtype=np.int32)
        codes[:length] = inverse.astype(np.int32)
        n_dict = len(uniq)
        offs = (np.arange(n_dict + 1, dtype=np.int64) * w)
        dict_bin = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n_dict,
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(uniq.tobytes())])
        buf = FsstBuffer.from_arrow(dict_bin, compressor)
        return cls(jnp.asarray(codes), buf, w, pack_validity(valid, length),
                   length, t)

    # -- LiquidArray -------------------------------------------------------

    @property
    def arrow_type(self) -> pa.DataType:
        return self._arrow_type

    @property
    def dict_size(self) -> int:
        return len(self.fsst)

    def memory_bytes(self) -> int:
        n = self.codes.size * 4 + self.fsst.memory_bytes()
        if self.validity is not None:
            n += self.validity.size * 4
        return n + 64

    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        return self.codes, self.validity

    def dictionary(self) -> pa.Array:
        """Distinct decimal values (decompressed)."""
        data, offsets = self.fsst.to_numpy()
        n = len(self.fsst)
        w = self.byte_width
        return pa.Array.from_buffers(
            self._arrow_type, n,
            [None, pa.py_buffer(data[: n * w].tobytes())])

    def to_arrow(self) -> pa.Array:
        codes = np.asarray(self.codes)[: self.length]
        if self.validity is not None:
            valid = np.asarray(mops.unpack_bits(self.validity))[: self.length]
            idx = pa.array(codes, type=pa.int32(), mask=~valid)
        else:
            idx = pa.array(codes, type=pa.int32())
        return pa.DictionaryArray.from_arrays(idx, self.dictionary()) \
            .cast(self._arrow_type)

    def try_eval_predicate(self, pred: Predicate, selection=None):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        key = (pred.op, str(pred.literal))
        verdict = self._verdict_cache.get(key)
        if verdict is None:
            lit = pred.literal
            if isinstance(lit, bool) or not isinstance(
                    lit, (int, float, pydec.Decimal, np.integer, np.floating)):
                return None
            d = self.dictionary()
            try:
                lit_s = pa.scalar(pydec.Decimal(str(lit)), type=d.type)
            except (pa.ArrowInvalid, pydec.InvalidOperation, ValueError):
                return None
            fns = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
                   "lt_eq": pc.less_equal, "gt": pc.greater,
                   "gt_eq": pc.greater_equal}
            verdict = np.asarray(fns[pred.op](d, lit_s).fill_null(False))
            self._verdict_cache[key] = verdict
        from liquid_tpu.arrays.byteview import _verdict_gather
        bits = _verdict_gather(jnp.asarray(verdict), self.codes)
        return mops.BoolMask(bits,
                             validity_mask_or_full(self.validity, self.length))

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_fixedlen(self)
