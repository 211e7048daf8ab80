"""Squeezed ("hybrid") arrays: lossy device-resident forms + exact disk backing.

Reference behavior:
- `LiquidPrimitiveClampedArray` (liquid-cache
  `src/core/src/liquid_array/hybrid_primitive_array.rs:73-79`,
  design/03-squeeze-integer.md): narrow the bit-width by clamping large
  offsets to a sentinel; only predicates that cannot be decided from the
  clamped domain touch disk.
- Squeezed byte-view (design/00-fsst-view.md, `DiskBuffer`): keep codes
  + prefix keys + fingerprints in memory, dictionary bytes on disk;
  comparisons resolve on prefixes, ambiguous entries hydrate the dict.
- `SqueezedDate32Array` (squeezed_date32_array.rs:46-53): keep one
  extracted date component bit-packed; EXTRACT is served with zero IO.

The IO handler protocol (ref SqueezeIoHandler, mod.rs:284-299):
an object with `read(range: (off, len) | None) -> bytes`.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from liquid_tpu.arrays import ipc
from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidSqueezedArray, Predicate, validity_mask_or_full,
)
from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as mops
from liquid_tpu.utils import dates as datelib


class SqueezedPrimitiveArray(LiquidSqueezedArray):
    """Clamped integers: offsets at `sentinel = 2^narrow_width - 1` mean
    "true value >= reference + sentinel, consult disk"."""

    def __init__(self, planes, narrow_width, reference_value, validity,
                 length, arrow_type, disk_range):
        self.planes = planes
        self.narrow_width = narrow_width
        self.reference_value = reference_value
        self.validity = validity
        self.length = length
        self.arrow_type = arrow_type
        self._disk_range = disk_range  # (offset, len) in backing store

    def memory_bytes(self) -> int:
        n = self.planes.size * 4
        if self.validity is not None:
            n += self.validity.size * 4
        return n + 64

    def disk_backing(self):
        return ("liquid", self._disk_range)

    @property
    def sentinel(self) -> int:
        return (1 << self.narrow_width) - 1

    def _read_full(self, io):
        return ipc.deserialize(io.read(self._disk_range))

    def to_arrow(self, io) -> pa.Array:
        return self._read_full(io).to_arrow()

    def try_eval_predicate(self, pred: Predicate, io):
        """Decide from the clamped domain when possible; else exact IO.

        Clamped rows have true value in [ref + sentinel, inf).  A predicate
        is IO-free iff its verdict is uniform on that interval.
        """
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        lit = pred.literal
        if isinstance(lit, bool) or not isinstance(lit, (int, np.integer, float, np.floating)):
            return None
        if isinstance(lit, (float, np.floating)) and float(lit) != int(lit):
            # fall back to the exact path for fractional literals
            return self._read_full(io).try_eval_predicate(pred)
        lit = int(lit)
        r, s, op = self.reference_value, self.sentinel, pred.op
        clamp_floor = r + s  # every clamped value >= this
        decided = {
            "eq": lit < clamp_floor and (lambda: False),
            "ne": lit < clamp_floor and (lambda: True),
            "lt": lit <= clamp_floor and (lambda: False),
            "lt_eq": lit < clamp_floor and (lambda: False),
            "gt": lit < clamp_floor and (lambda: True),
            "gt_eq": lit <= clamp_floor and (lambda: True),
        }[op]
        if not decided:
            return self._read_full(io).try_eval_predicate(pred)
        clamped_verdict = decided()
        # non-clamped rows: exact narrow compare; clamped rows: constant
        u = lit - r
        is_clamped = bp.cmp_const_op(self.planes, np.uint64(s), "eq")
        if 0 <= u < s:
            exact_bits = bp.cmp_const_op(self.planes, np.uint64(u), op)
        else:
            # literal below ref or at/above the clamped range: verdict is
            # uniform over the unclamped domain [r, r+s)
            if op == "eq":
                exact_true = False
            elif op == "ne":
                exact_true = True
            elif op == "lt":
                exact_true = u >= s  # lit >= ref+s > any unclamped value
            elif op == "lt_eq":
                exact_true = u >= s
            elif op == "gt":
                exact_true = lit < r
            else:  # gt_eq
                exact_true = lit <= r
            exact_bits = (mops.all_set(BLOCK_ROWS) if exact_true
                          else mops.none_set(BLOCK_ROWS))
        c_bits = mops.all_set(BLOCK_ROWS) if clamped_verdict else mops.none_set(BLOCK_ROWS)
        bits = (exact_bits & ~is_clamped) | (c_bits & is_clamped)
        return mops.BoolMask(bits, validity_mask_or_full(self.validity, self.length))


def squeeze_primitive(arr) -> Optional[Tuple[object, bytes]]:
    """LiquidPrimitiveArray -> (SqueezedPrimitiveArray-without-range, bytes).

    The caller (cache squeeze pipeline) writes `bytes` to the store and
    fills in the disk range via `with_disk_range`.
    """
    if arr.width <= 2:
        return None  # nothing to gain
    narrow = max(1, (arr.width + 1) // 2)
    sentinel = (1 << narrow) - 1
    # clamp offsets host-side (planes are host-resident after transcode;
    # squeeze must not force an upload round trip), then ONE upload
    off = bp.unpack_bitplanes_host(arr.planes_np)
    clamped = np.minimum(off, np.uint64(sentinel))
    planes = jnp.asarray(bp.pack_bitplanes_host(clamped, narrow))
    sq = SqueezedPrimitiveArray(planes, narrow, arr.reference_value,
                                arr.validity, arr.length, arr.arrow_type,
                                disk_range=None)
    return sq, arr.to_bytes()


class SqueezedQuantizedArray(LiquidSqueezedArray):
    """Quantized integers (ref `LiquidPrimitiveQuantizedArray`,
    hybrid_primitive_array.rs:429-437, design/03-squeeze-integer.md):
    values bucketized to `2^narrow_width` equal-width buckets; a
    comparison is IO-free for every row whose bucket lies strictly on
    one side of the literal's bucket -- only rows in the literal's OWN
    bucket are ambiguous and touch the disk backing."""

    def __init__(self, planes, narrow_width, reference_value, bucket_size,
                 validity, length, arrow_type, disk_range):
        self.planes = planes                # bucket ids, bit-planes
        self.narrow_width = narrow_width
        self.reference_value = reference_value
        self.bucket_size = bucket_size      # values per bucket (>= 1)
        self.validity = validity
        self.length = length
        self.arrow_type = arrow_type
        self._disk_range = disk_range

    def memory_bytes(self) -> int:
        n = self.planes.size * 4
        if self.validity is not None:
            n += self.validity.size * 4
        return n + 64

    def disk_backing(self):
        return ("liquid", self._disk_range)

    def _read_full(self, io):
        return ipc.deserialize(io.read(self._disk_range))

    def to_arrow(self, io) -> pa.Array:
        return self._read_full(io).to_arrow()

    def try_eval_predicate(self, pred: Predicate, io):
        if pred.op not in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq"):
            return None
        lit = pred.literal
        if isinstance(lit, bool) or not isinstance(
                lit, (int, np.integer, float, np.floating)):
            return None
        if isinstance(lit, (float, np.floating)) and float(lit) != int(lit):
            return self._read_full(io).try_eval_predicate(pred)
        lit = int(lit)
        r, bs, op = self.reference_value, self.bucket_size, pred.op
        nb = 1 << self.narrow_width
        u = lit - r
        b = u // bs
        if b < 0 or b >= nb:
            # literal outside the stored domain: verdict uniform
            exact = self._read_full(io)
            return exact.try_eval_predicate(pred)
        lt_b = bp.cmp_const_op(self.planes, np.uint64(b), "lt")
        eq_b = bp.cmp_const_op(self.planes, np.uint64(b), "eq")
        # IO-free when no row occupies the literal's bucket
        if int(np.asarray(mops.count(eq_b))) == 0:
            if op in ("lt", "lt_eq"):
                bits = lt_b
            elif op in ("gt", "gt_eq"):
                bits = ~(lt_b | eq_b)
            elif op == "eq":
                bits = mops.none_set(BLOCK_ROWS)
            else:  # ne
                bits = mops.all_set(BLOCK_ROWS)
            return mops.BoolMask(
                bits, validity_mask_or_full(self.validity, self.length))
        # ambiguous rows exist: settle them with the exact backing
        exact_mask = self._read_full(io).try_eval_predicate(pred)
        if exact_mask is None:
            return None
        if op in ("lt", "lt_eq"):
            decided = lt_b
        elif op in ("gt", "gt_eq"):
            decided = ~(lt_b | eq_b)
        elif op == "eq":
            decided = mops.none_set(BLOCK_ROWS)  # outside the bucket: never
        else:  # ne: outside the literal's bucket is always !=
            decided = mops.all_set(BLOCK_ROWS)
        bits = (decided & ~eq_b) | (exact_mask.bits & eq_b)
        return mops.BoolMask(
            bits, validity_mask_or_full(self.validity, self.length))


def squeeze_primitive_quantized(arr) -> Optional[Tuple[object, bytes]]:
    """LiquidPrimitiveArray -> (SqueezedQuantizedArray-without-range, bytes)
    (ref IntegerSqueezePolicy::Quantize, primitive_array.rs:36-42)."""
    if arr.width <= 2:
        return None
    narrow = max(1, (arr.width + 1) // 2)
    span = 1 << arr.width
    bucket_size = max(1, (span + (1 << narrow) - 1) >> narrow)
    off = bp.unpack_bitplanes_host(arr.planes_np)
    buckets = np.minimum(off // np.uint64(bucket_size),
                         np.uint64((1 << narrow) - 1))
    planes = jnp.asarray(bp.pack_bitplanes_host(buckets, narrow))
    sq = SqueezedQuantizedArray(planes, narrow, arr.reference_value,
                                bucket_size, arr.validity, arr.length,
                                arr.arrow_type, disk_range=None)
    return sq, arr.to_bytes()


class SqueezedByteViewArray(LiquidSqueezedArray):
    """Codes + prefix keys + fingerprints resident; dictionary on disk."""

    def __init__(self, codes, prefix_meta, fingerprints, validity,
                 length, arrow_type, disk_range):
        self.codes = codes                  # int32[BLOCK_ROWS] device
        self.prefix_meta = prefix_meta      # prefixkeys.PrefixMeta (host)
        self.fingerprints = fingerprints    # uint32[dict] host | None
        self.validity = validity
        self.length = length
        self.arrow_type = arrow_type
        self._disk_range = disk_range

    def memory_bytes(self) -> int:
        pm = self.prefix_meta
        n = (self.codes.size * 4 + pm.prefixes.nbytes + pm.rest_lens.nbytes
             + len(pm.shared))
        if self.fingerprints is not None:
            n += self.fingerprints.nbytes
        if self.validity is not None:
            n += self.validity.size * 4
        return n + 64

    def disk_backing(self):
        return ("liquid", self._disk_range)

    def _read_full(self, io):
        return ipc.deserialize(io.read(self._disk_range))

    def to_arrow(self, io) -> pa.Array:
        return self._read_full(io).to_arrow()

    def try_eval_predicate(self, pred: Predicate, io):
        from liquid_tpu.arrays import prefixkeys as pk
        from liquid_tpu.arrays.byteview import _needle_fingerprint
        lit = pred.literal
        if isinstance(lit, str):
            lit_b = lit.encode()
        elif isinstance(lit, bytes):
            lit_b = lit
        else:
            return None
        op = pred.op
        needle_fp = _needle_fingerprint(lit_b) if lit_b else 0
        verdict, ambiguous = pk.prefix_verdict(
            self.prefix_meta, op, lit_b, self.fingerprints, needle_fp)
        if verdict is None:
            return self._full_eval(pred, io)
        if ambiguous.any():
            # hydrate dictionary once, settle ambiguous entries exactly
            full = self._read_full(io)
            amb_idx = np.flatnonzero(ambiguous)
            sub = full.dictionary.take(pa.array(amb_idx))
            from liquid_tpu.arrays.byteview import LiquidByteViewArray
            tmp = LiquidByteViewArray(jnp.zeros(BLOCK_ROWS, jnp.int32), sub,
                                      None, len(sub), self.arrow_type)
            sub_verdict = tmp._dict_verdict(pred)
            if sub_verdict is None:
                return self._full_eval(pred, io)
            verdict = verdict.copy()
            verdict[amb_idx] = sub_verdict
        from liquid_tpu.arrays.byteview import _verdict_gather
        bits = _verdict_gather(jnp.asarray(verdict), self.codes)
        return mops.BoolMask(bits, validity_mask_or_full(self.validity, self.length))

    def _full_eval(self, pred, io):
        full = self._read_full(io)
        out = full.try_eval_predicate(pred)
        return out


def squeeze_byteview(arr) -> Optional[Tuple[object, bytes]]:
    from liquid_tpu.arrays import prefixkeys as pk
    from liquid_tpu.arrays.byteview import _fingerprints
    meta = (arr.prefix_meta if arr.prefix_meta is not None
            else pk.build_prefix_meta(arr.dictionary))
    fps = (arr._fingerprints if arr._fingerprints is not None
           else _fingerprints(arr.dictionary))
    sq = SqueezedByteViewArray(arr.codes, meta, fps,
                               arr.validity, arr.length, arr.arrow_type,
                               disk_range=None)
    return sq, arr.to_bytes()


class SqueezedDate32Array(LiquidSqueezedArray):
    """One extracted component resident (bit-packed); full date32 on disk.

    Ref squeezed_date32_array.rs: Date32Field in {YEAR, MONTH, DAY, DOW},
    `to_component_array()` serves EXTRACT with zero IO.
    """

    def __init__(self, planes, width, component_ref, field, validity, length,
                 disk_range):
        self.planes = planes
        self.width = width
        self.component_ref = component_ref
        self.field = field  # "year" | "month" | "day" | "dow"
        self.validity = validity
        self.length = length
        self.arrow_type = pa.date32()
        self._disk_range = disk_range

    def memory_bytes(self) -> int:
        n = self.planes.size * 4
        if self.validity is not None:
            n += self.validity.size * 4
        return n + 64

    def disk_backing(self):
        return ("liquid", self._disk_range)

    def to_arrow(self, io) -> pa.Array:
        return ipc.deserialize(io.read(self._disk_range)).to_arrow()

    def to_component_array(self, field: str):
        """-> (values int32[BLOCK_ROWS] device, validity) with NO IO, or None."""
        if field != self.field:
            return None
        vals = bp.unpack_bitplanes(self.planes, jnp.uint32)
        return vals.astype(jnp.int32) + jnp.int32(self.component_ref), self.validity

    def try_eval_predicate(self, pred: Predicate, io):
        # predicates on the raw date need the backing; component predicates
        # go through to_component_array at the planner level
        full = ipc.deserialize(io.read(self._disk_range))
        return full.try_eval_predicate(pred)


def squeeze_date32(arr, field: str) -> Optional[Tuple[object, bytes]]:
    """LiquidPrimitiveArray(date32) + EXTRACT hint -> squeezed component."""
    if not pa.types.is_date32(arr.arrow_type):
        return None
    days = (bp.unpack_bitplanes_host(arr.planes_np).astype(np.int64)
            + arr.reference_value)
    comp = datelib.extract_field(days, field)
    ref = int(comp.min()) if comp.size else 0
    off = (comp.astype(np.int64) - ref).astype(np.uint64)
    width = bp.bit_width_for(int(off.max()) if off.size else 0)
    planes = jnp.asarray(bp.pack_bitplanes_host(off, width))
    sq = SqueezedDate32Array(planes, width, ref, field, arr.validity,
                             arr.length, disk_range=None)
    return sq, arr.to_bytes()
