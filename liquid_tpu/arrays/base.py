"""LiquidArray: the encoded-column abstraction of liquid-tpu.

Reference behavior: the `LiquidArray` trait
(liquid-cache `src/core/src/liquid_array/mod.rs:82-146`): an in-memory
cache-optimized encoding that can materialize to Arrow, filter by a
selection, evaluate predicates directly on encoded data, serialize to
bytes, and "squeeze" into a smaller partially-on-disk form.

TPU-native shape: every array is a fixed 8192-row padded block whose hot
data lives on device (bit-planes / dictionary codes as jnp arrays) and
whose irregular data (string dictionaries) lives host-side in pyarrow.
Predicate results are packed `BoolMask`es (liquid_tpu.ops.mask).
"""
from __future__ import annotations

import abc
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa

from liquid_tpu.ops import mask as mops

BLOCK_ROWS = 8192

#: Comparison operators understood by try_eval_predicate
#: (ref: ByteViewOperator, operator.rs:14-85 + numeric binary cmp in
#:  liquid_expr.rs:65-202)
CMP_OPS = ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq", "contains", "not_contains",
           "starts_with", "ends_with")


@dataclass(frozen=True)
class Predicate:
    """column-vs-literal predicate admitted to encoded evaluation.

    Ref: `LiquidExpr` validation (liquid_expr.rs:16-63) -- only binary
    cmp against a literal, LIKE '%x%' (-> contains), and boolean literals
    are pushed to encoded data.
    """

    op: str  # one of CMP_OPS
    literal: object  # python scalar / bytes / str
    #: NaN rows count as MATCHING (dynamic DESC top-k thresholds: the
    #: engine sorts NaN greatest, so NaN belongs in every DESC top-k;
    #: a plain float comparison would silently drop those rows)
    keep_nan: bool = False

    def __post_init__(self):
        assert self.op in CMP_OPS, self.op


class LiquidArray(abc.ABC):
    """One encoded 8192-row column block."""

    length: int  # valid rows (<= BLOCK_ROWS); rows beyond are padding

    @abc.abstractmethod
    def memory_bytes(self) -> int:
        """Device + host bytes this encoding occupies (budget accounting)."""

    @abc.abstractmethod
    def to_arrow(self) -> pa.Array:
        """Decode the full block (first `length` rows) to a pyarrow array."""

    @abc.abstractmethod
    def to_device(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Decode to (values, validity_packed_or_None) on device, padded to
        BLOCK_ROWS.  String arrays return dictionary codes; use
        `dictionary()` to map codes back to values."""

    def filter(self, selection: jax.Array) -> pa.Array:
        """Materialize only selected rows (packed uint32 selection).

        Ref: LiquidArray::filter (mod.rs:110-118).  Default: decode +
        host-side take; encodings override with device compaction.
        """
        arr = self.to_arrow()
        sel = np.asarray(mops.unpack_bits(selection))[: self.length]
        return arr.take(pa.array(np.flatnonzero(sel), type=pa.int64()))

    def try_eval_predicate(self, pred: Predicate,
                           selection: Optional[jax.Array] = None
                           ) -> Optional[mops.BoolMask]:
        """Evaluate a predicate directly on encoded data.

        Returns None if this encoding cannot evaluate `pred` (caller falls
        back to materialize-then-filter, ref core.rs:862-930).  The result
        covers all BLOCK_ROWS; caller ANDs with its selection.
        """
        return None

    @abc.abstractmethod
    def to_bytes(self) -> bytes:
        """Liquid IPC serialization (ref ipc.rs)."""

    def squeeze(self):
        """-> (LiquidSqueezedArray, disk_bytes) or None if unsupported.

        Ref: LiquidArray::squeeze (mod.rs:131-146).
        """
        return None

    @property
    @abc.abstractmethod
    def arrow_type(self) -> pa.DataType: ...


class LiquidSqueezedArray(abc.ABC):
    """Partially-on-disk array: keeps a lossy/partial device form plus a
    disk range holding the exact bytes.

    Ref: `LiquidSqueezedArray` trait (mod.rs:209-263) + `SqueezeIoHandler`
    (mod.rs:284-299).
    """

    length: int

    @abc.abstractmethod
    def memory_bytes(self) -> int: ...

    @abc.abstractmethod
    def to_arrow(self, io) -> pa.Array:
        """Full decode; may call io.read(range) for backing bytes."""

    def try_eval_predicate(self, pred: Predicate, io) -> Optional[mops.BoolMask]:
        """Evaluate using resident bits only where possible; IO for the
        ambiguous remainder (ref hybrid_primitive_array.rs)."""
        return None

    @abc.abstractmethod
    def disk_backing(self) -> Tuple[str, Tuple[int, int]]:
        """-> (kind, (offset, len)) of backing bytes; kind in
        {"liquid", "arrow"} (ref SqueezedBacking, mod.rs:156-170)."""


def pack_validity(valid_bools: Optional[np.ndarray], length: int):
    """Host bools[length] -> packed HOST validity words over BLOCK_ROWS,
    or None if there are no nulls (padding rows are marked invalid).
    Stays numpy so transcode never touches the device; consumers upload
    lazily (see LiquidPrimitiveArray.validity)."""
    if valid_bools is None or bool(np.all(valid_bools)):
        if length == BLOCK_ROWS:
            return None
        v = np.zeros(BLOCK_ROWS, dtype=bool)
        v[:length] = True
        return mops.pack_bools_host(v)
    v = np.zeros(BLOCK_ROWS, dtype=bool)
    v[:length] = valid_bools[:length]
    return mops.pack_bools_host(v)


def validity_mask_or_full(validity: Optional[jax.Array], length: int) -> jax.Array:
    if validity is not None:
        return validity
    return mops.all_set(BLOCK_ROWS, length)
