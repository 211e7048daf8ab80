"""Dictionary-encoded string/binary arrays with FSST-compressed backing.

Reference behavior: `LiquidByteViewArray` (liquid-cache
`src/core/src/liquid_array/byte_view_array/mod.rs:76-89`): u16
dictionary keys + 7-byte prefix keys + shared prefix + FSST-compressed
value buffer, with encoding-aware predicate eval (`comparisons.rs`) that
compares on prefixes/fingerprints and only decompresses ambiguous
dictionary entries.

TPU-native split: the *code vector* (one code per row) is
device-resident; the dictionary (irregular bytes) stays host-side.
Row-level masks are a single device gather `verdict[codes]` + bit-pack,
so the per-row cost is O(1) regardless of string length.  The
dictionary itself has two backings (ref FsstBacking, mod.rs:76):

- raw: a pyarrow array; predicates run once per distinct value through
  pyarrow's C++ compute kernels.
- fsst: native-FSST-compressed bytes (arrays/fsst.py) + order-preserving
  prefix keys + shared prefix (arrays/prefixkeys.py); predicates settle
  on prefix keys and decompress only ambiguous entries
  (ref comparisons.rs:93-351).

Substring fingerprints (ref fingerprint.rs, design/04): a 32-bit
character-class bitmask per dictionary entry prunes `contains`
candidates before any decompression.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from liquid_tpu.arrays import prefixkeys as pk
from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidArray, Predicate, pack_validity, validity_mask_or_full,
)
from liquid_tpu.ops import mask as mops

#: dictionaries at least this large get FSST-compressed on transcode
FSST_THRESHOLD_BYTES = 2048

#: test instrumentation: dictionary entries fully compared (decompressed)
#: during predicate eval (ref FULL_DATA_COMPARISON_COUNTER, mod.rs:39-53)
FULL_COMPARE_COUNTER = 0


def is_supported_type(t: pa.DataType) -> bool:
    return (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)
            or pa.types.is_string_view(t) or pa.types.is_binary_view(t)
            or pa.types.is_dictionary(t))


# 32-bucket character-class map (ref: dev/design/04-string-fingerprint.md --
# ours: bytes hashed into 32 buckets; a needle's buckets must all be
# present in a value's fingerprint for the value to possibly contain it).
def _fingerprints(dict_values: pa.Array) -> np.ndarray:
    buf = dict_values.cast(pa.large_binary())
    offsets = np.frombuffer(buf.buffers()[1], dtype=np.int64,
                            count=len(buf) + 1, offset=buf.offset * 8)
    data = np.frombuffer(buf.buffers()[2] or b"", dtype=np.uint8)
    bucket = data % np.uint8(32)
    bits = (np.uint32(1) << bucket.astype(np.uint32))
    # segment-OR via reduceat (empty strings -> 0); pad one zero byte so an
    # offset equal to data.size stays a valid reduceat index
    out = np.zeros(len(buf), dtype=np.uint32)
    nonempty = offsets[1:] > offsets[:-1]
    if data.size:
        bits_p = np.concatenate([bits, np.zeros(1, np.uint32)])
        ors = np.bitwise_or.reduceat(bits_p, offsets[:-1])
        out[nonempty] = ors[nonempty]
    return out


def _needle_fingerprint(needle: bytes) -> int:
    fp = 0
    for b in needle:
        fp |= 1 << (b % 32)
    return fp


def _as_bytes(lit) -> Optional[bytes]:
    if isinstance(lit, str):
        return lit.encode()
    if isinstance(lit, bytes):
        return lit
    return None


class LiquidByteViewArray(LiquidArray):
    def __init__(self, codes: jax.Array, dictionary: Optional[pa.Array],
                 validity: Optional[jax.Array], length: int,
                 arrow_type: pa.DataType,
                 fingerprints: Optional[np.ndarray] = None,
                 fsst=None, prefix_meta: Optional[pk.PrefixMeta] = None):
        # codes/validity may be host numpy (fresh transcode) or device;
        # device copies upload lazily (see LiquidPrimitiveArray)
        self._codes = codes             # int32[BLOCK_ROWS] (dict codes)
        self._codes_dev = None if isinstance(codes, np.ndarray) else codes
        self._dict_raw = dictionary     # pa array (host) | None when fsst-backed
        self.fsst = fsst                # arrays.fsst.FsstBuffer | None
        self.prefix_meta = prefix_meta  # required when fsst-backed
        self._validity = validity
        self._validity_dev = (None if isinstance(validity, np.ndarray)
                              else validity)
        self.length = length
        self._arrow_type = arrow_type
        self._fingerprints = fingerprints
        self._verdict_cache: dict = {}
        assert dictionary is not None or fsst is not None

    @classmethod
    def from_arrow(cls, arr: pa.Array, with_fingerprints: bool = False,
                   compressor=None, compress: str = "auto"
                   ) -> "LiquidByteViewArray":
        assert len(arr) <= BLOCK_ROWS
        t = arr.type
        logical = t
        if pa.types.is_dictionary(t):
            denc = arr
            logical = t.value_type
        else:
            denc = pc.dictionary_encode(arr)
        length = len(arr)
        dict_values = denc.dictionary
        idx = denc.indices
        if idx.null_count:
            valid = np.asarray(idx.is_valid())
            codes_np = np.asarray(idx.fill_null(0)).astype(np.int32)
        else:
            valid = None
            codes_np = np.asarray(idx).astype(np.int32)
        codes = np.zeros(BLOCK_ROWS, dtype=np.int32)
        codes[:length] = codes_np
        fps = _fingerprints(dict_values) if with_fingerprints else None

        dict_bytes = sum(b.size for b in dict_values.buffers() if b is not None)
        use_fsst = (compress == "always"
                    or (compress == "auto"
                        and (compressor is not None
                             or dict_bytes >= FSST_THRESHOLD_BYTES)))
        if use_fsst and len(dict_values):
            from liquid_tpu.arrays.fsst import FsstBuffer
            meta = pk.build_prefix_meta(dict_values)
            buf = FsstBuffer.from_arrow(dict_values, compressor)
            return cls(codes, None,
                       pack_validity(valid, length), length, logical, fps,
                       fsst=buf, prefix_meta=meta)
        return cls(codes, dict_values,
                   pack_validity(valid, length), length, logical, fps)

    # -- LiquidArray -------------------------------------------------------

    @property
    def arrow_type(self) -> pa.DataType:
        return self._arrow_type

    @property
    def codes(self) -> jax.Array:
        if self._codes_dev is None:
            self._codes_dev = jnp.asarray(self._codes)
        return self._codes_dev

    @property
    def codes_np(self) -> np.ndarray:
        if isinstance(self._codes, np.ndarray):
            return self._codes
        return np.asarray(self._codes)

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

    @property
    def is_fsst(self) -> bool:
        return self.fsst is not None and self._dict_raw is None

    @property
    def dictionary(self) -> pa.Array:
        """Dictionary values; decompresses when FSST-backed (full decode
        path -- predicates avoid this)."""
        if self._dict_raw is not None:
            return self._dict_raw
        vt = self._arrow_type
        if pa.types.is_dictionary(vt):
            vt = vt.value_type
        if not (pa.types.is_binary(vt) or pa.types.is_large_binary(vt)
                or pa.types.is_string(vt) or pa.types.is_large_string(vt)):
            vt = pa.large_binary()
        return self.fsst.to_arrow(vt)

    @property
    def dict_size(self) -> int:
        if self._dict_raw is not None:
            return len(self._dict_raw)
        return len(self.fsst)

    def memory_bytes(self) -> int:
        n = self._codes.size * 4
        if self._validity is not None:
            n += self._validity.size * 4
        if self.is_fsst:
            n += self.fsst.memory_bytes()
            n += self.prefix_meta.prefixes.nbytes + self.prefix_meta.rest_lens.nbytes
            n += len(self.prefix_meta.shared)
        else:
            n += sum(b.size for b in self._dict_raw.buffers() if b is not None)
        if self._fingerprints is not None:
            n += self._fingerprints.nbytes
        return n + 64

    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        return self.codes, self.validity

    def to_arrow(self) -> pa.Array:
        codes = self.codes_np[: self.length]
        if self._validity is not None:
            valid = mops.unpack_bits_host(self.validity_np)[: self.length]
            idx = pa.array(codes, type=pa.int32(), mask=~valid)
        else:
            idx = pa.array(codes, type=pa.int32())
        return pa.DictionaryArray.from_arrays(idx, self.dictionary)

    def to_arrow_flat(self) -> pa.Array:
        return self.to_arrow().cast(self._arrow_type)

    # -- encoded predicate eval -------------------------------------------

    def _dict_verdict_raw(self, pred: Predicate, d: pa.Array
                          ) -> Optional[np.ndarray]:
        """Predicate over raw dictionary entries via pyarrow kernels."""
        lit = pred.literal
        lit_b = _as_bytes(lit)
        if lit_b is None:
            return None
        op = pred.op
        if op in ("contains", "not_contains"):
            pat = lit if isinstance(lit, str) else lit.decode("utf-8", "replace")
            if self._fingerprints is not None and len(lit_b) > 0:
                need = _needle_fingerprint(lit_b)
                candidates = (self._fingerprints & np.uint32(need)) == np.uint32(need)
                verdict = np.zeros(len(d), dtype=bool)
                if candidates.any():
                    cand_idx = np.flatnonzero(candidates)
                    sub = d.take(pa.array(cand_idx))
                    verdict[cand_idx] = np.asarray(
                        pc.match_substring(sub, pat).fill_null(False))
            else:
                verdict = np.asarray(pc.match_substring(d, pat).fill_null(False))
            return ~verdict if op == "not_contains" else verdict
        if op == "starts_with":
            pat = lit if isinstance(lit, str) else lit.decode("utf-8", "replace")
            return np.asarray(pc.starts_with(d, pat).fill_null(False))
        if op == "ends_with":
            pat = lit if isinstance(lit, str) else lit.decode("utf-8", "replace")
            return np.asarray(pc.ends_with(d, pat).fill_null(False))
        fns = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
               "lt_eq": pc.less_equal, "gt": pc.greater, "gt_eq": pc.greater_equal}
        if op not in fns:
            return None
        lit_arr = pa.scalar(lit, type=d.type) if not pa.types.is_binary(d.type) \
            else pa.scalar(lit_b, type=d.type)
        return np.asarray(fns[op](d, lit_arr).fill_null(False))

    def _settle_ambiguous(self, op: str, lit_b: bytes,
                          amb_idx: np.ndarray) -> np.ndarray:
        """Exact compare for ambiguous dictionary entries: decompress ONLY
        those (ref comparisons.rs 'decompress ambiguous')."""
        global FULL_COMPARE_COUNTER
        FULL_COMPARE_COUNTER += len(amb_idx)
        vals: List[bytes] = self.fsst.take_bytes(amb_idx)
        if op == "eq":
            return np.array([v == lit_b for v in vals], dtype=bool)
        if op == "ne":
            return np.array([v != lit_b for v in vals], dtype=bool)
        if op == "lt":
            return np.array([v < lit_b for v in vals], dtype=bool)
        if op == "lt_eq":
            return np.array([v <= lit_b for v in vals], dtype=bool)
        if op == "gt":
            return np.array([v > lit_b for v in vals], dtype=bool)
        if op == "gt_eq":
            return np.array([v >= lit_b for v in vals], dtype=bool)
        if op in ("contains", "not_contains"):
            hit = np.array([lit_b in v for v in vals], dtype=bool)
            return ~hit if op == "not_contains" else hit
        if op == "starts_with":
            return np.array([v.startswith(lit_b) for v in vals], dtype=bool)
        if op == "ends_with":
            return np.array([v.endswith(lit_b) for v in vals], dtype=bool)
        raise AssertionError(op)

    def _dict_verdict_fsst(self, pred: Predicate) -> Optional[np.ndarray]:
        lit_b = _as_bytes(pred.literal)
        if lit_b is None:
            return None
        op = pred.op
        if op == "ends_with" and self._fingerprints is not None and lit_b:
            # fingerprint prune applies to any needle-containment shape
            need = np.uint32(_needle_fingerprint(lit_b))
            candidates = (self._fingerprints & need) == need
            verdict = np.zeros(self.dict_size, dtype=bool)
            idx = np.flatnonzero(candidates)
            if len(idx):
                verdict[idx] = self._settle_ambiguous(op, lit_b, idx)
            return verdict
        needle_fp = _needle_fingerprint(lit_b) if lit_b else 0
        verdict, amb = pk.prefix_verdict(self.prefix_meta, op, lit_b,
                                         self._fingerprints, needle_fp)
        if verdict is None:
            # no prefix/fingerprint route: full decompress once, raw path
            return self._dict_verdict_raw(pred, self.dictionary)
        amb_idx = np.flatnonzero(amb)
        if len(amb_idx):
            verdict = verdict.copy()
            verdict[amb_idx] = self._settle_ambiguous(op, lit_b, amb_idx)
        return verdict

    def _dict_verdict(self, pred: Predicate) -> Optional[np.ndarray]:
        if self.is_fsst:
            return self._dict_verdict_fsst(pred)
        return self._dict_verdict_raw(pred, self._dict_raw)

    def try_eval_predicate(self, pred: Predicate, selection=None):
        key = (pred.op, pred.literal)
        verdict = self._verdict_cache.get(key)
        if verdict is None:
            verdict = self._dict_verdict(pred)
            if verdict is None:
                return None
            self._verdict_cache[key] = verdict
        return self._mask_from_verdict(verdict)

    def _mask_from_verdict(self, verdict: np.ndarray) -> mops.BoolMask:
        """Distinct-value verdicts -> packed row mask via code gather."""
        bits = _verdict_gather(jnp.asarray(verdict), self.codes)
        return mops.BoolMask(bits, validity_mask_or_full(self.validity, self.length))

    def to_bytes(self) -> bytes:
        from liquid_tpu.arrays import ipc
        return ipc.serialize_byteview(self)

    def squeeze(self):
        from liquid_tpu.arrays import hybrid
        return hybrid.squeeze_byteview(self)


@jax.jit
def _verdict_gather(verdict: jax.Array, codes: jax.Array) -> jax.Array:
    """bool[dict] , int32[N] -> packed uint32[N/32] row mask."""
    return mops.pack_bools(verdict[codes])


@jax.jit
def _verdict_gather_many(verdicts: jax.Array, codes: jax.Array) -> jax.Array:
    """Batched row-group form: bool[B, max_dict] x int32[B, N] ->
    packed uint32[B, N/32] in ONE dispatch (per-block dictionaries are
    padded to the widest; codes only index their own dictionary)."""
    return jax.vmap(lambda v, c: mops.pack_bools(v[c]))(verdicts, codes)
