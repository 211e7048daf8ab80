"""Packed selection masks: the selection-vector algebra of liquid-tpu.

Reference behavior: arrow `BooleanBuffer` selections composed with
`boolean_buffer_and_then` (liquid-cache
`src/datafusion/src/utils.rs:62-164`, which uses BMI2 PDEP on x86).

TPU-native design: a selection over an 8192-row block is a `uint32[256]`
bitmask (row r -> word r//32, bit r%32, LSB first).  All boolean algebra
(AND/OR/NOT, Kleene OR/AND with null tracking, popcount) happens on the
packed words -- 32 rows per VPU element.  `and_then` replaces PDEP with
prefix-sum + gather, the canonical TPU scatter idiom.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_ROWS = 8192  # canonical block size, matches reference batch_size 8192
WORD_BITS = 32

_U32 = jnp.uint32
_FULL = jnp.uint32(0xFFFFFFFF)


def num_words(n_rows: int) -> int:
    return (n_rows + WORD_BITS - 1) // WORD_BITS


def pack_bools(bools: jax.Array) -> jax.Array:
    """bool[N] -> uint32[N/32] (N must be a multiple of 32)."""
    n = bools.shape[0]
    assert n % WORD_BITS == 0, n
    b = bools.reshape(n // WORD_BITS, WORD_BITS).astype(_U32)
    weights = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=_U32))
    return (b * weights).sum(axis=1, dtype=_U32)


def unpack_bits(words: jax.Array) -> jax.Array:
    """uint32[W] -> bool[W*32]."""
    shifts = jnp.arange(WORD_BITS, dtype=_U32)
    bits = (words[:, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(-1).astype(jnp.bool_)


def pack_bools_host(bools: np.ndarray) -> np.ndarray:
    """Host (numpy) twin of pack_bools: bool[N] -> uint32[N/32]."""
    b = np.asarray(bools, dtype=bool)
    n = b.shape[0]
    assert n % WORD_BITS == 0, n
    w = b.reshape(n // WORD_BITS, WORD_BITS).astype(np.uint32)
    weights = np.uint32(1) << np.arange(WORD_BITS, dtype=np.uint32)
    return (w * weights).sum(axis=1, dtype=np.uint32)


def unpack_bits_host(words: np.ndarray) -> np.ndarray:
    """numpy uint32[W] -> bool[W*32] without a device dispatch (decode
    paths touch validity masks per block; keep that on the host)."""
    w = np.asarray(words, dtype=np.uint32)
    bits = (w[:, None] >> np.arange(WORD_BITS, dtype=np.uint32)) & 1
    return bits.reshape(-1).astype(bool)


def tail_mask(length, n_rows: int) -> jax.Array:
    """uint32[n_rows/32] with the first `length` bits set (length may be traced)."""
    if isinstance(length, int):
        return _tail_mask_static(length, n_rows)
    w = num_words(n_rows)
    base = jnp.arange(w, dtype=jnp.int64) * WORD_BITS
    k = jnp.clip(length - base, 0, WORD_BITS)
    full = jnp.uint64(0xFFFFFFFF)
    words = jnp.where(k >= WORD_BITS, full, (jnp.uint64(1) << k.astype(jnp.uint64)) - 1)
    return words.astype(_U32)


@functools.lru_cache(maxsize=1024)
def _tail_mask_static(length: int, n_rows: int) -> jax.Array:
    """Static lengths dominate (block tails): build once on host, keep the
    device constant cached -- op-by-op construction per block was a
    measurable slice of the scan loop."""
    w = num_words(n_rows)
    host = np.zeros(w, dtype=np.uint32)
    full_words = min(length // WORD_BITS, w)
    host[:full_words] = 0xFFFFFFFF
    rem = length - full_words * WORD_BITS
    if 0 < rem and full_words < w:
        host[full_words] = (1 << rem) - 1
    return jnp.asarray(host)


def all_set(n_rows: int, length=None) -> jax.Array:
    if length is None:
        length = n_rows
    return tail_mask(length, n_rows)


@functools.lru_cache(maxsize=64)
def none_set(n_rows: int) -> jax.Array:
    return jnp.zeros((num_words(n_rows),), dtype=_U32)


@functools.lru_cache(maxsize=1024)
def all_set_host(n_rows: int, length=None) -> np.ndarray:
    """Host (numpy) twin of all_set: packed uint32 selection with the
    first `length` bits set.  Read-only (cached)."""
    if length is None:
        length = n_rows
    w = num_words(n_rows)
    host = np.zeros(w, dtype=np.uint32)
    full_words = min(length // WORD_BITS, w)
    host[:full_words] = 0xFFFFFFFF
    rem = length - full_words * WORD_BITS
    if 0 < rem and full_words < w:
        host[full_words] = (1 << rem) - 1
    host.setflags(write=False)
    return host


def count_host(words: np.ndarray) -> int:
    """Host popcount of a packed selection (no device dispatch)."""
    return int(np.unpackbits(np.asarray(words).view(np.uint8)).sum())


def count(words: jax.Array) -> jax.Array:
    """Popcount over packed mask -> int32 scalar."""
    return jax.lax.population_count(words).astype(jnp.int32).sum()


@jax.jit
def unpack_many(stacked: jax.Array) -> jax.Array:
    """uint32[B, W] packed selections -> bool[B, W*32] (ONE host fetch for
    a whole row group's surviving selections instead of B ~28ms tunnel
    syncs, PERF_NOTES.md)."""
    shifts = jnp.arange(WORD_BITS, dtype=_U32)
    bits = (stacked[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(stacked.shape[0], -1).astype(jnp.bool_)


@jax.jit
def count_many(stacked: jax.Array) -> jax.Array:
    """uint32[B, W] packed selections -> int32[B] set-bit counts
    (ONE host fetch for a whole row group instead of B syncs)."""
    return jax.lax.population_count(stacked).astype(jnp.int32).sum(
        axis=tuple(range(1, stacked.ndim)), dtype=jnp.int32)


def and_(a: jax.Array, b: jax.Array) -> jax.Array:
    return a & b


def or_(a: jax.Array, b: jax.Array) -> jax.Array:
    return a | b


def not_(a: jax.Array) -> jax.Array:
    return a ^ _FULL


@dataclass(frozen=True)
class BoolMask:
    """A three-valued (Kleene) boolean column in packed form.

    `bits` is the truth value where `valid` is set; rows with valid=0 are
    NULL.  Matches arrow BooleanArray-with-null-buffer semantics used by
    the reference's `try_eval_predicate` + `or_kleene` combination
    (`src/datafusion/src/cache/mod.rs:111-150`).
    """

    bits: jax.Array   # uint32[W]
    valid: jax.Array  # uint32[W]; all-ones => no nulls

    @staticmethod
    def from_bools(bools: jax.Array, valid_bools=None) -> "BoolMask":
        bits = pack_bools(bools)
        if valid_bools is None:
            valid = jnp.full_like(bits, _FULL)
        else:
            valid = pack_bools(valid_bools)
        return BoolMask(bits, valid)

    def and_kleene(self, other: "BoolMask") -> "BoolMask":
        # false AND x = false; true AND null = null
        a_f = self.valid & ~self.bits
        b_f = other.valid & ~other.bits
        out_false = a_f | b_f
        out_true = (self.bits & self.valid) & (other.bits & other.valid)
        return BoolMask(out_true, out_true | out_false)

    def or_kleene(self, other: "BoolMask") -> "BoolMask":
        # true OR x = true; false OR null = null
        out_true = (self.bits & self.valid) | (other.bits & other.valid)
        a_f = self.valid & ~self.bits
        b_f = other.valid & ~other.bits
        out_false = a_f & b_f
        return BoolMask(out_true, out_true | out_false)

    def not_(self) -> "BoolMask":
        return BoolMask(~self.bits, self.valid)

    def to_selection(self) -> jax.Array:
        """NULL -> excluded (DataFusion `prep_null_mask_filter` semantics,
        ref liquid_cache_reader.rs:329-333)."""
        return self.bits & self.valid


jax.tree_util.register_pytree_node(
    BoolMask,
    lambda m: ((m.bits, m.valid), None),
    lambda _, ch: BoolMask(*ch),
)


@partial(jax.jit, donate_argnums=())
def and_then(selection: jax.Array, filtered: jax.Array) -> jax.Array:
    """Compose a selection with a mask defined over the *selected* rows.

    `selection`: uint32[W] over N rows, k bits set.
    `filtered`:  uint32[W] whose first k bits correspond (in order) to the
                 selected rows of `selection`.
    Returns uint32[W] over N rows: selection with non-surviving rows cleared.

    Reference: `boolean_buffer_and_then` (utils.rs:62-83, BMI2 PDEP path
    :102-164).  TPU version: rank = exclusive-prefix-sum of the selection
    bits; surviving row r <=> selection[r] & filtered[rank[r]].
    """
    sel = unpack_bits(selection)
    n = sel.shape[0]
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1          # rank within selected
    filt = unpack_bits(filtered)
    take = filt[jnp.clip(rank, 0, n - 1)]
    return pack_bools(sel & take)


@partial(jax.jit, static_argnums=(1,))
def compact_indices(selection: jax.Array, n_rows: int):
    """Stream compaction: packed selection -> (int32[n_rows] gather indices,
    int32 count).  indices[j] = row index of the j-th selected row for
    j < count; tail is padded with the last valid index (safe for gathers).

    This is the TPU equivalent of arrow `filter()` -- prefix-sum + gather
    instead of byte-wise scatter (SURVEY.md section 7 mapping).
    """
    sel = unpack_bits(selection)[:n_rows]
    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
    k = pos[-1] + 1
    idx = jnp.arange(n_rows, dtype=jnp.int32)
    # scatter: out[pos[r]] = r where sel[r]
    out = jnp.zeros(n_rows, dtype=jnp.int32).at[jnp.where(sel, pos, n_rows)].set(
        idx, mode="drop"
    )
    # pad tail with the last selected index (or 0) so downstream gathers
    # stay in-bounds AND tail reads repeat a real selected row
    last = out[jnp.maximum(k - 1, 0)]
    out = jnp.where(jnp.arange(n_rows) < k, out, last)
    return out, k
