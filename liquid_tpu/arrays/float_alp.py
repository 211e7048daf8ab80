"""ALP-encoded floating point arrays.

Reference behavior: `LiquidFloatArray<T>` (liquid-cache
`src/core/src/liquid_array/float_array.rs:233-240`): Adaptive Lossless
floating Point -- floats that are really scaled decimals are stored as
bit-packed integers plus an exponent, with exception patches for values
that do not round-trip.

TPU-native: the integer lane is the same bit-plane store as
LiquidPrimitiveArray.  Predicates are evaluated ENTIRELY in the integer
domain: the decode map off -> IEEE((off + ref) * 10^-e) is monotone, so
a float comparison against a literal becomes an integer threshold
(found host-side by binary search over the ~w-bit offset range) and then
a packed bit-plane compare.  No float math touches the device, which
keeps results bit-exact even on TPUs whose emulated f64 is not IEEE
round-to-nearest.  Exception patches (rows that don't round-trip) are
settled host-side -- they are rare by construction.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidArray, LiquidSqueezedArray, Predicate, pack_validity,
    validity_mask_or_full,
)
from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as mops

_MAX_EXP = 18
_SAFE_INT = float(1 << 51)


def is_supported_type(t: pa.DataType) -> bool:
    return pa.types.is_float32(t) or pa.types.is_float64(t)


class LiquidFloatArray(LiquidArray):
    def __init__(self, planes, width, reference_value, exponent,
                 patch_idx, patch_vals, validity, length, arrow_type):
        # planes/validity may be host numpy (fresh transcode) or device;
        # device copies upload lazily (see LiquidPrimitiveArray)
        self._planes = planes                 # uint32[bucket, W]
        self._planes_dev = None if isinstance(planes, np.ndarray) else planes
        self.width = width                    # logical bit width
        self.reference_value = reference_value  # int (encoded domain)
        self.exponent = exponent              # int: enc = round(v * 10^e)
        self.patch_idx = np.asarray(patch_idx, dtype=np.int32)    # host rows
        self.patch_vals = np.asarray(patch_vals, dtype=np.float64)  # host exact
        self._validity = validity
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

    @classmethod
    def from_arrow(cls, arr: pa.Array) -> "LiquidFloatArray":
        assert len(arr) <= BLOCK_ROWS
        t = arr.type
        length = len(arr)
        np_dtype = np.float32 if pa.types.is_float32(t) else np.float64
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            vals = np.asarray(arr.fill_null(0)).astype(np_dtype)
        else:
            valid = None
            vals = np.asarray(arr).astype(np_dtype)
        return cls.from_numpy(vals, valid, t, length)

    @classmethod
    def from_numpy(cls, vals, valid, arrow_type, length):
        np_dtype = vals.dtype
        v = np.zeros(BLOCK_ROWS, dtype=np_dtype)
        v[:length] = vals[:length]
        live_mask = np.zeros(BLOCK_ROWS, dtype=bool)
        live_mask[:length] = True if valid is None else valid[:length]

        def encode(e):
            # decode is enc * (1/scale): multiply, matching _decode_host
            scale = 10.0 ** e
            inv = 1.0 / scale
            enc = np.round(v.astype(np.float64) * scale)
            ok = ((np.abs(enc) < _SAFE_INT) & np.isfinite(v)
                  & ((enc * inv).astype(np_dtype) == v))
            return enc, ok

        # exponent search on a SAMPLE first (ALP's sampling idea): rank
        # candidate exponents by exception rate over <=512 live rows,
        # then full-verify the best few -- a clean column (the common
        # case) settles in ONE full encode instead of e_best+1
        live_idx = np.flatnonzero(live_mask)
        if live_idx.size > 512:
            samp = v[live_idx[:: max(1, live_idx.size // 512)]][:512]
        else:
            samp = v[live_idx]

        def sample_exc(e):
            scale = 10.0 ** e
            enc_s = np.round(samp.astype(np.float64) * scale)
            ok_s = ((np.abs(enc_s) < _SAFE_INT) & np.isfinite(samp)
                    & ((enc_s * (1.0 / scale)).astype(np_dtype) == samp))
            return int((~ok_s).sum())

        if samp.size:
            ranked = sorted(range(_MAX_EXP + 1),
                            key=lambda e: (sample_exc(e), e))
        else:
            ranked = [0]
        best_e, best_exc = ranked[0], None
        for e in ranked[:3]:
            _, ok = encode(e)
            n_exc = int((live_mask & ~ok).sum())
            if best_exc is None or n_exc < best_exc:
                best_e, best_exc = e, n_exc
            if n_exc == 0:
                break
        enc, ok = encode(best_e)
        live_ok = live_mask & ok
        exc_rows = np.flatnonzero(live_mask & ~ok).astype(np.int32)
        enc_i = np.where(live_ok, enc, 0.0).astype(np.int64)
        ref = int(enc_i[live_ok].min()) if live_ok.any() else 0
        off = np.where(live_ok, enc_i - ref, 0)
        width = bp.bit_width_for(int(off.max()) if off.size else 0)
        planes = bp.pack_bitplanes_host(off.astype(np.uint64), width)
        return cls(planes, width, ref, best_e, exc_rows,
                   v.astype(np.float64)[exc_rows], pack_validity(valid, length),
                   length, arrow_type)

    @property
    def arrow_type(self):
        return self._arrow_type

    @property
    def num_patches(self) -> int:
        return int(self.patch_idx.size)

    @property
    def _inv(self) -> float:
        return 1.0 / (10.0 ** self.exponent)

    def memory_bytes(self) -> int:
        n = self._planes.size * 4 + self.patch_idx.nbytes + self.patch_vals.nbytes
        if self._validity is not None:
            n += self._validity.size * 4
        return n + 64

    def _host_offsets(self) -> np.ndarray:
        if isinstance(self._planes, np.ndarray):
            return bp.unpack_bitplanes_host(self._planes)
        return np.asarray(bp.unpack_bitplanes(
            self.planes,
            jnp.uint64 if self.planes.shape[0] > 32 else jnp.uint32))

    def _decode_host(self) -> np.ndarray:
        off = self._host_offsets()
        enc = off.astype(np.int64) + self.reference_value
        vals = enc.astype(np.float64) * self._inv
        vals[self.patch_idx] = self.patch_vals
        return vals

    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        # decode host-side for exactness, ship once (floats are consumed by
        # aggregates, not by the packed predicate path)
        vals = self._decode_host()
        if pa.types.is_float32(self._arrow_type):
            vals = vals.astype(np.float32)
        return jnp.asarray(vals), self.validity

    def to_arrow(self) -> pa.Array:
        return self.decode_from_offsets(self._host_offsets())

    def decode_from_offsets(self, off: np.ndarray) -> pa.Array:
        """Batched-decode entry point (see primitive.decode_from_offsets)."""
        enc = off.astype(np.int64) + self.reference_value
        vals = enc.astype(np.float64) * self._inv
        vals[self.patch_idx] = self.patch_vals
        vals = vals[: self.length]
        if pa.types.is_float32(self._arrow_type):
            vals = vals.astype(np.float32)
        if self._validity is not None:
            valid = mops.unpack_bits_host(self.validity_np)[: self.length]
            return pa.array(vals, type=self._arrow_type, mask=~valid)
        return pa.array(vals, type=self._arrow_type)

    # -- predicate: integer-threshold translation -------------------------

    def _dec1(self, off: int) -> float:
        """Decode a single offset exactly as _decode_host does."""
        v = np.float64(off + self.reference_value) * np.float64(self._inv)
        if pa.types.is_float32(self._arrow_type):
            v = np.float64(np.float32(v))
        return float(v)

    def _lower_bound(self, lit: float, strict: bool) -> int:
        """Smallest offset T with dec(T) > lit (strict) or >= lit;
        may return max_off+1 if no offset qualifies."""
        hi_off = (1 << self.width) - 1 if self.width else 0

        def above(off):
            d = self._dec1(off)
            return d > lit if strict else d >= lit

        if above(0):
            return 0
        if not above(hi_off):
            return hi_off + 1
        lo, hi = 0, hi_off
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if above(mid):
                hi = mid
            else:
                lo = mid
        return hi

    def try_eval_predicate(self, pred: Predicate, selection=None):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        lit = pred.literal
        if isinstance(lit, bool) or not isinstance(lit, (int, float, np.integer, np.floating)):
            return None
        lit = float(lit)
        op = pred.op
        if math.isnan(lit):
            bits = mops.none_set(BLOCK_ROWS) if op != "ne" else mops.all_set(BLOCK_ROWS)
        else:
            # dec is monotone in offset: translate to offset thresholds
            t_ge = self._lower_bound(lit, strict=False)  # first off with dec >= lit
            t_gt = self._lower_bound(lit, strict=True)   # first off with dec >  lit
            if op == "lt":      # dec < lit  <=>  off < t_ge
                bits = self._off_lt(t_ge)
            elif op == "lt_eq":
                bits = self._off_lt(t_gt)
            elif op == "gt":
                bits = ~self._off_lt(t_gt)
            elif op == "gt_eq":
                bits = ~self._off_lt(t_ge)
            elif op == "eq":    # t_ge <= off < t_gt
                bits = ~self._off_lt(t_ge) & self._off_lt(t_gt)
            else:               # ne
                bits = self._off_lt(t_ge) | ~self._off_lt(t_gt)
        # settle patch rows host-side (exact stored values)
        if self.num_patches:
            fns = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
                   "lt_eq": np.less_equal, "gt": np.greater,
                   "gt_eq": np.greater_equal}
            # SQL coercion promotes f32 columns to f64 before comparing
            pv = self.patch_vals
            if pa.types.is_float32(self._arrow_type):
                pv = pv.astype(np.float32).astype(np.float64)
            pverdict = fns[pred.op](pv, np.float64(lit))
            if pred.keep_nan:
                # NaN lives only in patches (ALP encodes finite values)
                pverdict = pverdict | np.isnan(pv)
            bits = _apply_patch_verdict(bits, self.patch_idx, pverdict)
        return mops.BoolMask(bits, validity_mask_or_full(self.validity, self.length))

    def _off_lt(self, t: int) -> jax.Array:
        max_off = (1 << self.width) - 1 if self.width else 0
        if t <= 0:
            return mops.none_set(BLOCK_ROWS)
        if t > max_off:
            return mops.all_set(BLOCK_ROWS)
        lt, _ = bp.cmp_const(self.planes, np.uint64(t))
        return lt

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_float(self)

    def squeeze(self):
        return squeeze_float(self)


def _apply_patch_verdict(bits: jax.Array, patch_idx: np.ndarray,
                         verdict: np.ndarray) -> jax.Array:
    """Overwrite packed-mask bits at patch rows with host-computed verdicts."""
    host = np.asarray(bits).copy()
    words = patch_idx // 32
    shifts = (patch_idx % 32).astype(np.uint32)
    set_bits = np.uint32(1) << shifts
    np.bitwise_and.at(host, words, ~set_bits)
    on = np.where(verdict, set_bits, np.uint32(0))
    np.bitwise_or.at(host, words, on)
    return jnp.asarray(host)


# -- float squeeze (ref FloatSqueezePolicy, float_array.rs:61,338) ----------

class SqueezedFloatArray(LiquidSqueezedArray):
    """Squeezed ALP floats: the integer offset lane quantized to
    `2^narrow` equal-width buckets, exact array on disk.

    The decode map off -> IEEE((off + ref) * 10^-e) is monotone, so a
    float comparison is an offset threshold T; a bucket strictly below
    or above T's bucket is decided IO-FREE, and only rows in the
    threshold bucket read the exact backing (same shape as the
    quantized integer squeeze).  Exception patches stay resident
    host-side (they are rare and tiny) so patch rows never force IO.

    Ref: `FloatSqueezePolicy` + `LiquidFloatArray::squeeze`
    (liquid-cache src/core/src/liquid_array/float_array.rs:61,338).
    """

    def __init__(self, planes, narrow_width, bucket_size, width,
                 reference_value, exponent, patch_idx, patch_vals,
                 validity, length, arrow_type, disk_range=None):
        self.planes = planes              # bucket ids, bit-planes
        self.narrow_width = narrow_width
        self.bucket_size = bucket_size
        self.width = width                # original offset width
        self.reference_value = reference_value
        self.exponent = exponent
        self.patch_idx = np.asarray(patch_idx, dtype=np.int32)
        self.patch_vals = np.asarray(patch_vals, dtype=np.float64)
        self.validity = validity
        self.length = length
        self.arrow_type = arrow_type
        self._disk_range = disk_range

    # -- LiquidSqueezedArray interface --------------------------------------

    def memory_bytes(self) -> int:
        n = self.planes.size * 4 + self.patch_idx.nbytes + self.patch_vals.nbytes
        if self.validity is not None:
            n += self.validity.size * 4
        return n + 64

    def disk_backing(self):
        return ("liquid", self._disk_range)

    def _read_full(self, io):
        from liquid_tpu.arrays import ipc
        return ipc.deserialize(io.read(self._disk_range))

    def to_arrow(self, io) -> pa.Array:
        return self._read_full(io).to_arrow()

    def filter(self, selection, io) -> pa.Array:
        return self._read_full(io).filter(selection)

    # -- predicate eval ------------------------------------------------------

    @property
    def _inv(self) -> float:
        return 10.0 ** (-self.exponent)

    def _dec1(self, off: int) -> float:
        v = np.float64(off + self.reference_value) * np.float64(self._inv)
        if pa.types.is_float32(self.arrow_type):
            v = np.float64(np.float32(v))
        return float(v)

    def _lower_bound(self, lit: float, strict: bool) -> int:
        hi_off = (1 << self.width) - 1 if self.width else 0

        def above(off):
            d = self._dec1(off)
            return d > lit if strict else d >= lit

        if above(0):
            return 0
        if not above(hi_off):
            return hi_off + 1
        lo, hi = 0, hi_off
        while lo + 1 < hi:
            mid = (lo + hi) // 2
            if above(mid):
                hi = mid
            else:
                lo = mid
        return hi

    def _bucket_lt(self, t: int):
        """(definitely off<t bits, ambiguous bits) in the bucket domain."""
        max_off = (1 << self.width) - 1 if self.width else 0
        none = mops.none_set(BLOCK_ROWS)
        if t <= 0:
            return none, none
        if t > max_off:
            return mops.all_set(BLOCK_ROWS), none
        bt, rem = divmod(t, self.bucket_size)
        nb = 1 << self.narrow_width
        if bt >= nb:
            return mops.all_set(BLOCK_ROWS), none
        lt = bp.cmp_const_op(self.planes, np.uint64(bt), "lt")
        if rem == 0:
            return lt, none
        amb = bp.cmp_const_op(self.planes, np.uint64(bt), "eq")
        return lt, amb

    def try_eval_predicate(self, pred: Predicate, io):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        lit = pred.literal
        if isinstance(lit, bool) or not isinstance(
                lit, (int, float, np.integer, np.floating)):
            return None
        lit = float(lit)
        op = pred.op
        none = mops.none_set(BLOCK_ROWS)
        if math.isnan(lit):
            bits = none if op != "ne" else mops.all_set(BLOCK_ROWS)
            amb = none
        else:
            t_ge = self._lower_bound(lit, strict=False)
            t_gt = self._lower_bound(lit, strict=True)
            lt_ge, a1 = self._bucket_lt(t_ge)
            lt_gt, a2 = self._bucket_lt(t_gt)
            # ambiguity only from thresholds the op actually uses
            if op == "lt":
                bits, amb = lt_ge, a1
            elif op == "lt_eq":
                bits, amb = lt_gt, a2
            elif op == "gt":
                bits, amb = ~lt_gt, a2
            elif op == "gt_eq":
                bits, amb = ~lt_ge, a1
            elif op == "eq":
                bits, amb = ~lt_ge & lt_gt, a1 | a2
            else:  # ne
                bits, amb = lt_ge | ~lt_gt, a1 | a2
        if int(np.asarray(mops.count(amb))):
            exact = self._read_full(io).try_eval_predicate(pred)
            if exact is None:
                return None
            bits = (bits & ~amb) | (exact.bits & amb)
        if len(self.patch_idx):
            fns = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
                   "lt_eq": np.less_equal, "gt": np.greater,
                   "gt_eq": np.greater_equal}
            pv = self.patch_vals
            if pa.types.is_float32(self.arrow_type):
                pv = pv.astype(np.float32).astype(np.float64)
            if math.isnan(lit):
                pverdict = np.zeros(len(pv), bool) if op != "ne" \
                    else np.ones(len(pv), bool)
            else:
                pverdict = fns[op](pv, np.float64(lit))
            if pred.keep_nan:
                pverdict = pverdict | np.isnan(pv)
            bits = _apply_patch_verdict(bits, self.patch_idx, pverdict)
        return mops.BoolMask(
            bits, validity_mask_or_full(self.validity, self.length))


def squeeze_float(arr: LiquidFloatArray):
    """LiquidFloatArray -> (SqueezedFloatArray-without-range, backing
    bytes); None when the lane is too narrow to gain anything."""
    if arr.width <= 2:
        return None
    narrow = max(1, (arr.width + 1) // 2)
    nb = 1 << narrow
    span = 1 << arr.width
    bs = max(1, (span + nb - 1) // nb)
    off = bp.unpack_bitplanes_host(arr.planes_np)
    buckets = off // np.uint64(bs)
    planes = jnp.asarray(bp.pack_bitplanes_host(buckets, narrow))
    sq = SqueezedFloatArray(planes, narrow, bs, arr.width,
                            arr.reference_value, arr.exponent,
                            arr.patch_idx, arr.patch_vals, arr.validity,
                            arr.length, arr.arrow_type)
    return sq, arr.to_bytes()
