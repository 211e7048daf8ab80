"""LiquidCache: the concurrent encoded-column cache runtime.

Reference behavior: `LiquidCache` (liquid-cache
`src/core/src/cache/core.rs:52-141`): a concurrent cache keyed by
EntryID whose entries move through five states --
MemoryArrow, MemoryLiquid, MemorySqueezedLiquid, DiskLiquid, DiskArrow
(cached_batch.rs:12-33).  Inserts evict/squeeze victims until the new
entry fits (core.rs:339-369); reads hydrate per policy (core.rs:569-593);
predicates evaluate on encoded data without materializing
(core.rs:862-930); squeezed date32 entries serve EXTRACT with zero IO
(core.rs:689-788).

TPU-native notes: "memory" here budget-counts the device-resident
encoded forms (bit-planes / codes) plus their host metadata; the squeeze
pipeline is how HBM pressure drains to host disk.  Cache bookkeeping is
host-side Python under a lock -- the hot work (predicate kernels,
decode) runs on device outside the critical path wherever possible.
"""
from __future__ import annotations

import threading

from liquid_tpu.utils import sync as _sync
from typing import Dict, Optional, Tuple

import jax
import numpy as np
import pyarrow as pa

from liquid_tpu.arrays import ipc
from liquid_tpu.arrays.base import (
    BLOCK_ROWS, LiquidArray, LiquidSqueezedArray, Predicate,
)
from liquid_tpu.arrays import variant
from liquid_tpu.arrays.hybrid import (
    SqueezedDate32Array, squeeze_date32, squeeze_primitive_quantized,
)
from liquid_tpu.arrays.variant import VariantStructSqueezedArray
from liquid_tpu.cache import policies as pol
from liquid_tpu.cache import transcode as tc
from liquid_tpu.cache.budget import BudgetAccounting
from liquid_tpu.cache.expressions import (
    ExtractDate32, HintVote, SubstringSearch, VariantGet,
)
from liquid_tpu.cache.observer import Observer
from liquid_tpu.cache.store import BlockStore
from liquid_tpu.utils.tracing import TRACER
from liquid_tpu.ops import mask as mops

# entry states (ref cached_batch.rs:12-33)
MEMORY_ARROW = "memory_arrow"
MEMORY_LIQUID = "memory_liquid"
MEMORY_SQUEEZED = "memory_squeezed"
DISK_LIQUID = "disk_liquid"
DISK_ARROW = "disk_arrow"

_KIND_OF_STATE = {
    MEMORY_ARROW: pol.ARROW,
    MEMORY_LIQUID: pol.LIQUID,
    MEMORY_SQUEEZED: pol.SQUEEZED,
    DISK_LIQUID: pol.DISK,
    DISK_ARROW: pol.DISK,
}


class CacheEntry:
    __slots__ = ("state", "payload", "disk_range", "mem_bytes", "hint")

    def __init__(self, state, payload, disk_range=None, mem_bytes=0, hint=None):
        self.state = state
        self.payload = payload      # pa.Array | LiquidArray | LiquidSqueezedArray | None
        self.disk_range = disk_range  # (offset, len) | None
        self.mem_bytes = mem_bytes
        self.hint = hint


def _arrow_memory_bytes(arr: pa.Array) -> int:
    return sum(b.size for b in arr.buffers() if b is not None) + 64


def _arrow_to_bytes(arr: pa.Array) -> bytes:
    return ipc._arrow_to_bytes(arr)


def _arrow_from_bytes(b: bytes) -> pa.Array:
    return ipc._arrow_from_bytes(b)


class _SqueezeIo:
    """SqueezeIoHandler over the block store (ref DefaultSqueezeIo,
    io_context.rs:84-140): counts reads for the squeeze-IO stats."""

    def __init__(self, cache: "LiquidCache", entry_id: int):
        self._cache = cache
        self._entry_id = entry_id

    def read(self, rng: Optional[Tuple[int, int]]) -> bytes:
        obs = self._cache.observer
        obs.stats.bump("squeeze_io_reads")
        obs.stats.bump("disk_reads")
        obs.event("DiskRead", self._entry_id)
        obs.record_access("squeeze_io_read", self._entry_id,
                          rng[1] if rng else 0)
        if rng is None:
            data = self._cache.store.get(self._entry_id)
            assert data is not None, f"no backing for entry {self._entry_id}"
            return data
        return self._cache.store.read_range(rng)


class _SqueezeCtx:
    """Context handed to SqueezePolicy.squeeze."""

    def __init__(self, cache: "LiquidCache", hint):
        self.squeeze_hint = hint
        self._cache = cache

    def transcode(self, arr: pa.Array):
        self._cache.observer.stats.bump("transcodes")
        return tc.transcode(arr, self.squeeze_hint)

    def arrow_bytes(self, arr: pa.Array) -> bytes:
        return _arrow_to_bytes(arr)

    def squeeze_with_hint(self, liquid: LiquidArray, hint):
        if isinstance(hint, ExtractDate32) and pa.types.is_date32(liquid.arrow_type):
            return squeeze_date32(liquid, hint.field)
        if isinstance(hint, VariantGet):
            # liquid-encoded JSON column: decode, then shred
            return variant.shred_variant(liquid.to_arrow(), hint.requests)
        return None

    def squeeze_default(self, payload):
        """Default squeeze of a liquid array honoring the cache's integer
        squeeze policy (ref IntegerSqueezePolicy::{Clamp,Quantize},
        primitive_array.rs:36-42)."""
        from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
        if (self._cache.int_squeeze_mode == "quantize"
                and isinstance(payload, LiquidPrimitiveArray)):
            out = squeeze_primitive_quantized(payload)
            if out is not None:
                return out
        return payload.squeeze()

    def variant_squeeze(self, payload):
        """Arrow JSON column + VariantGet hint -> shredded squeezed form
        (ref try_variant_squeeze, squeeze.rs:222-290); None otherwise."""
        if not isinstance(self.squeeze_hint, VariantGet):
            return None
        if not isinstance(payload, pa.Array):
            return None
        return variant.shred_variant(payload, self.squeeze_hint.requests)


class DefaultCacheMetadata:
    """Per-column shared state: FSST compressors keyed by the entry id
    with its 16-bit batch field stripped (ref `EntryMetadata` +
    `DefaultCacheMetadata`, io_context.rs:21-80, and the per-column
    compressor map in `ParquetCacheMetadata`, io/mod.rs:12-56)."""

    def __init__(self):
        self._compressors: Dict[int, object] = {}

    def column_key(self, entry_id: int) -> int:
        return entry_id >> 16

    def compressor_for(self, entry_id: int):
        return self._compressors.get(self.column_key(entry_id))

    def store_compressor(self, entry_id: int, comp) -> None:
        self._compressors.setdefault(self.column_key(entry_id), comp)


class LiquidCache:
    """insert / get / eval_predicate over encoded column blocks."""

    def __init__(self, max_memory_bytes: int = 1 << 30,
                 max_disk_bytes: Optional[int] = None,
                 disk_path: str = "/tmp/liquid_tpu_cache/store.bin",
                 cache_policy: Optional[pol.CachePolicy] = None,
                 squeeze_policy: Optional[pol.SqueezePolicy] = None,
                 hydration_policy: Optional[pol.HydrationPolicy] = None,
                 transcode_on_insert: bool = True,
                 batch_size: int = BLOCK_ROWS,
                 trace_events: bool = False,
                 int_squeeze_mode: str = "clamp"):
        assert batch_size & (batch_size - 1) == 0, "batch_size must be pow2"
        self.batch_size = batch_size
        self.budget = BudgetAccounting(max_memory_bytes, max_disk_bytes)
        self.store = BlockStore(disk_path)
        self.cache_policy = cache_policy or pol.LiquidPolicy()
        self.squeeze_policy = squeeze_policy or pol.TranscodeSqueezeEvict()
        self.hydration_policy = hydration_policy or pol.AlwaysHydrate()
        self.transcode_on_insert = transcode_on_insert
        assert int_squeeze_mode in ("clamp", "quantize"), int_squeeze_mode
        self.int_squeeze_mode = int_squeeze_mode
        self.observer = Observer(trace_events=trace_events)
        self.metadata = DefaultCacheMetadata()
        self._entries: Dict[int, CacheEntry] = {}
        self._hints: Dict[int, HintVote] = {}
        self._lock = _sync.RLock()
        #: bumped on every entry-state mutation (insert/evict/squeeze/
        #: hydrate): cheap coarse invalidation key for derived caches
        #: (fused plan cache, prep stacks)
        self.epoch = 0

    # -- hints -------------------------------------------------------------

    def record_hint(self, entry_id: int, hint) -> None:
        with self._lock:
            self._hints.setdefault(entry_id, HintVote()).record(hint)

    def _hint_for(self, entry_id: int):
        vote = self._hints.get(entry_id)
        return vote.majority() if vote else None

    # -- insert (ref builders.rs:162-214 + core.rs:339-369) ----------------

    @TRACER.trace("cache.insert")
    def insert(self, entry_id: int, arr: pa.Array, hint=None) -> bool:
        """Cache an arrow column block.  Returns False if it could only be
        written to disk (or dropped) due to memory pressure."""
        obs = self.observer
        obs.stats.bump("inserts")
        obs.record_access("insert", entry_id, _arrow_memory_bytes(arr))
        if hint is not None:
            self.record_hint(entry_id, hint)
        hint = hint if hint is not None else self._hint_for(entry_id)
        if self.transcode_on_insert and not isinstance(hint, VariantGet):
            # variant columns stay arrow until squeezed into shredded form
            # (ref squeeze.rs:222-290: Arrow -> try_variant_squeeze first)
            liquid = tc.transcode(arr, hint,
                                  compressor=self.metadata.compressor_for(entry_id))
            if liquid is not None:
                obs.stats.bump("transcodes")
                obs.event("Transcode", entry_id)
                fsst = getattr(liquid, "fsst", None)
                if fsst is not None:
                    # share the trained compressor across the column's batches
                    self.metadata.store_compressor(entry_id, fsst.compressor)
                return self._insert_payload(
                    entry_id, MEMORY_LIQUID, liquid, liquid.memory_bytes(), hint)
        return self._insert_payload(
            entry_id, MEMORY_ARROW, arr, _arrow_memory_bytes(arr), hint)

    def _insert_payload(self, entry_id, state, payload, nbytes, hint) -> bool:
        # replacement loop: evict/squeeze victims until the reservation fits
        while not self.budget.try_reserve_memory(nbytes):
            _sync.yield_now()  # scheduling point (ref yield_now_if_shuttle,
            #                    core.rs:367 + utils/mod.rs:156-159)
            victims = [v for v in self.cache_policy.find_memory_victims(8)
                       if v != entry_id]
            if not victims:
                return self._insert_to_disk(entry_id, state, payload, hint)
            for v in victims:
                self._squeeze_victim(v)
        with self._lock:
            old = self._entries.get(entry_id)
            if old is not None:
                self._release_entry(entry_id, old)
            self._entries[entry_id] = CacheEntry(state, payload,
                                                 mem_bytes=nbytes, hint=hint)
            self.epoch += 1
            self.cache_policy.notify_inserted(entry_id, _KIND_OF_STATE[state])
        self.observer.event("Insert", entry_id, state)
        return True

    def _insert_to_disk(self, entry_id, state, payload, hint) -> bool:
        """No memory victims available: write the incoming batch to disk
        (ref write_in_memory_batch_to_disk, core.rs:282-336)."""
        if state == MEMORY_ARROW:
            data, new_state = _arrow_to_bytes(payload), DISK_ARROW
        else:
            data, new_state = payload.to_bytes(), DISK_LIQUID
        if not self._write_disk(entry_id, data):
            self.observer.event("Drop", entry_id)
            return False
        with self._lock:
            old = self._entries.get(entry_id)
            if old is not None:
                self._release_entry(entry_id, old)
            self._entries[entry_id] = CacheEntry(
                new_state, None, disk_range=self.store.range_of(entry_id),
                mem_bytes=0, hint=hint)
            self.epoch += 1
            self.cache_policy.notify_inserted(entry_id, pol.DISK)
        self.observer.event("EvictToDisk", entry_id, "insert_overflow")
        return False

    def _write_disk(self, entry_id: int, data: bytes) -> bool:
        """Disk write under the disk budget (ref write_batch_to_disk,
        core.rs:790-819): evict disk victims until it fits."""
        old = self.store.range_of(entry_id)
        if old is not None:
            # put() replaces the record: release the old reservation so
            # hydrate/squeeze cycles don't leak disk budget
            self.budget.release_disk(old[1])
        while not self.budget.try_reserve_disk(len(data)):
            victims = [v for v in self.cache_policy.find_disk_victims(8)
                       if v != entry_id]
            if not victims:
                return False
            for v in victims:
                self._remove_disk_victim(v)
        self.store.put(entry_id, data)
        self.observer.stats.bump("disk_writes")
        return True

    def _remove_disk_victim(self, entry_id: int) -> None:
        with self._lock:
            e = self._entries.pop(entry_id, None)
            if e is None:
                return
            self._release_entry(entry_id, e)
            self.cache_policy.notify_removed(entry_id)
        self.observer.stats.bump("removes")
        self.observer.event("Remove", entry_id, "disk_victim")

    def _release_entry(self, entry_id: int, e: CacheEntry) -> None:
        """Release all budgets held by `e` (caller holds the lock)."""
        self.epoch += 1
        if e.mem_bytes:
            self.budget.release_memory(e.mem_bytes)
        freed = self.store.remove(entry_id)
        if freed:
            self.budget.release_disk(freed)

    # -- squeeze pipeline (ref core.rs:493-559) ----------------------------

    def _squeeze_victim(self, entry_id: int) -> None:
        with self._lock:
            e = self._entries.get(entry_id)
            if e is None:
                return
            ctx = _SqueezeCtx(self, e.hint)
            outcome = self.squeeze_policy.squeeze(e.state, e.payload, ctx)
            if outcome[0] == pol.REMOVE:
                self._entries.pop(entry_id, None)
                self._release_entry(entry_id, e)
                self.cache_policy.notify_removed(entry_id)
                self.observer.stats.bump("removes")
                self.observer.event("Remove", entry_id)
                return
            _, new_state, new_payload, to_write = outcome
            if to_write is not None:
                if not self._write_disk(entry_id, to_write):
                    # disk full: drop the entry entirely
                    self._entries.pop(entry_id, None)
                    self._release_entry(entry_id, e)
                    self.cache_policy.notify_removed(entry_id)
                    self.observer.event("Drop", entry_id, "disk_full")
                    return
                rng = self.store.range_of(entry_id)
            else:
                rng = e.disk_range
            new_mem = 0
            if new_payload is not None:
                new_mem = (new_payload.memory_bytes()
                           if not isinstance(new_payload, pa.Array)
                           else _arrow_memory_bytes(new_payload))
                if isinstance(new_payload, LiquidSqueezedArray):
                    new_payload._disk_range = rng
            self.budget.force_update_memory_usage(e.mem_bytes, new_mem)
            e.state, e.payload, e.disk_range, e.mem_bytes = (
                new_state, new_payload, rng, new_mem)
            self.epoch += 1
            self.cache_policy.notify_state_changed(
                entry_id, _KIND_OF_STATE[new_state])
        self.observer.stats.bump("squeezes")
        self.observer.event("Squeeze", entry_id, new_state)

    # -- get (ref core.rs:595-788) -----------------------------------------

    @TRACER.trace("cache.get")
    def get(self, entry_id: int, selection: Optional[jax.Array] = None,
            expression_hint=None) -> Optional[pa.Array]:
        obs = self.observer
        obs.stats.bump("gets")
        with self._lock:
            e = self._entries.get(entry_id)
            if e is None:
                obs.stats.bump("cache_misses")
                return None
            obs.stats.bump("cache_hits")
            obs.record_access("get", entry_id, e.mem_bytes)
            if isinstance(self.cache_policy, pol.LruPolicy):
                self.cache_policy.notify_accessed(entry_id)
            arr = self._read_arrow(entry_id, e, expression_hint)
        if arr is None:
            return None
        if selection is not None:
            sel = np.asarray(mops.unpack_bits(selection))[: len(arr)]
            arr = arr.take(pa.array(np.flatnonzero(sel), type=pa.int64()))
        return arr

    def get_component(self, entry_id: int, field: str):
        """Zero-IO date-component read from a squeezed date32 entry
        (ref core.rs:725-745); -> (device values, validity) or None."""
        with self._lock:
            e = self._entries.get(entry_id)
            if e is None or e.state != MEMORY_SQUEEZED:
                return None
            if not isinstance(e.payload, SqueezedDate32Array):
                return None
            out = e.payload.to_component_array(field)
            if out is not None:
                self.observer.stats.bump("squeeze_io_saved")
            return out

    def get_variant_paths(self, entry_id: int, requests) -> Optional[pa.StructArray]:
        """Typed variant-path read from a squeezed variant entry
        (ref core.rs:747-788): zero IO when every requested path is
        resident; otherwise re-shred from disk with the union of paths
        (ref hydration merge, hydration.rs:147-160).
        -> StructArray with one field per (path, type) request, or None
        if the entry is absent / not a squeezed variant."""
        requests = tuple(requests)
        with self._lock:
            e = self._entries.get(entry_id)
            if e is None:
                self.observer.stats.bump("cache_misses")
                return None
            if e.state != MEMORY_SQUEEZED or not isinstance(
                    e.payload, VariantStructSqueezedArray):
                return None
            self.observer.stats.bump("cache_hits")
            self.record_hint(entry_id, VariantGet(requests))
            io = _SqueezeIo(self, entry_id)
            if all(e.payload.contains_path(p, t) for p, t in requests):
                out, _ = e.payload.to_arrow_with_paths(requests, io)
                self.observer.stats.bump("squeeze_io_saved")
                return out
            merged = e.payload.merged_with(requests, io)
            merged._disk_range = e.disk_range
            new_mem = merged.memory_bytes()
            if self.budget.try_update_memory_usage(e.mem_bytes, new_mem):
                e.payload, e.mem_bytes = merged, new_mem
                self.observer.event("Hydrate", entry_id, "variant_merge")
            out, _ = merged.to_arrow_with_paths(requests, io)
            return out

    def _read_arrow(self, entry_id, e, expression_hint=None) -> Optional[pa.Array]:
        if e.state == MEMORY_ARROW:
            return e.payload
        if e.state == MEMORY_LIQUID:
            return e.payload.to_arrow()
        io = _SqueezeIo(self, entry_id)
        if e.state == MEMORY_SQUEEZED:
            arr = e.payload.to_arrow(io)
            self._maybe_hydrate(entry_id, e, arr)
            return arr
        # disk states
        data = self.store.get(entry_id)
        if data is None:
            return None
        self.observer.stats.bump("disk_reads")
        if e.state == DISK_ARROW:
            arr = _arrow_from_bytes(data)
            self._maybe_hydrate(entry_id, e, arr)
            return arr
        liquid = ipc.deserialize(data)
        arr = liquid.to_arrow()
        self._maybe_hydrate(entry_id, e, arr, liquid)
        return arr

    def _maybe_hydrate(self, entry_id, e, arr, liquid=None) -> None:
        """Promote a disk/squeezed entry back to memory (ref
        core.rs:569-593 + hydration.rs)."""
        if not self.hydration_policy.should_hydrate(e.state):
            return
        if (e.state == MEMORY_SQUEEZED
                and isinstance(e.payload, LiquidSqueezedArray)
                and e.payload.disk_backing()[0] == "arrow"):
            # arrow-backed squeezed entries (variant) hydrate to arrow form
            # (ref hydration.rs:53-143 disk-arrow variant handling)
            payload, state, nbytes = arr, MEMORY_ARROW, _arrow_memory_bytes(arr)
        elif e.state in (MEMORY_SQUEEZED, DISK_LIQUID):
            payload = liquid if liquid is not None else ipc.deserialize(
                self.store.get(entry_id))
            state, nbytes = MEMORY_LIQUID, payload.memory_bytes()
        else:  # DISK_ARROW
            payload, state, nbytes = arr, MEMORY_ARROW, _arrow_memory_bytes(arr)
        if not self.budget.try_update_memory_usage(e.mem_bytes, nbytes):
            return  # no room: stay on disk
        e.state, e.payload, e.mem_bytes = state, payload, nbytes
        self.epoch += 1
        self.cache_policy.notify_state_changed(entry_id, _KIND_OF_STATE[state])
        self.observer.stats.bump("hydrations")
        self.observer.event("Hydrate", entry_id, state)

    # -- predicate eval (ref core.rs:862-930) ------------------------------

    @TRACER.trace("cache.eval_predicate")
    def eval_predicate(self, entry_id: int, pred: Predicate,
                       selection: Optional[jax.Array] = None
                       ) -> Optional[mops.BoolMask]:
        """Evaluate directly on the encoded entry; None -> caller should
        materialize and evaluate (or the entry is absent)."""
        obs = self.observer
        obs.stats.bump("predicate_evals")
        with self._lock:
            e = self._entries.get(entry_id)
            if e is None:
                return None
            obs.record_access("eval_predicate", entry_id, 0)
            if e.state == MEMORY_LIQUID:
                out = e.payload.try_eval_predicate(pred, selection)
                if out is not None:
                    obs.stats.bump("predicate_evals_on_encoded")
                return out
            if e.state == MEMORY_SQUEEZED:
                before = obs.stats.get("squeeze_io_reads")
                out = e.payload.try_eval_predicate(pred, _SqueezeIo(self, entry_id))
                if out is not None:
                    obs.stats.bump("predicate_evals_on_encoded")
                    if obs.stats.get("squeeze_io_reads") == before:
                        obs.stats.bump("squeeze_io_saved")
                return out
            if e.state == DISK_LIQUID:
                data = self.store.get(entry_id)
                if data is None:
                    return None
                obs.stats.bump("disk_reads")
                liquid = ipc.deserialize(data)
                out = liquid.try_eval_predicate(pred, selection)
                self._maybe_hydrate(entry_id, e, None, liquid)
                if out is not None:
                    obs.stats.bump("predicate_evals_on_encoded")
                return out
            return None  # MEMORY_ARROW / DISK_ARROW: materialize path

    @TRACER.trace("cache.eval_predicate_many")
    def eval_predicate_many(self, entry_ids, pred: Predicate):
        """Batched encoded predicate evaluation over many entries (a row
        group's batches of one column): primitive blocks sharing a width
        bucket are stacked and compared in ONE vmapped dispatch
        (ops/bitpack.cmp_const_op_many); everything else falls back to
        the per-entry path.  -> list of BoolMask|None aligned with
        entry_ids (None = caller materializes that entry).

        TPU-native: the reference's hot loop is per-batch
        (liquid_cache_reader.rs:296-339) because CPU dispatch is free;
        on TPU per-block dispatch dominated the scan (PERF_NOTES.md).
        """
        import jax.numpy as jnp
        from liquid_tpu.arrays.base import BLOCK_ROWS as _BR
        from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
        from liquid_tpu.arrays.byteview import LiquidByteViewArray
        obs = self.observer
        results: list = [None] * len(entry_ids)
        prim: Dict[tuple, list] = {}  # (bucket, op) -> [(idx, payload, u)]
        bv: list = []                 # [(idx, payload)] byteview blocks
        slow: list = []
        with self._lock:
            for i, eid in enumerate(entry_ids):
                e = self._entries.get(eid)
                if e is None:
                    continue
                if e.state == MEMORY_LIQUID and isinstance(
                        e.payload, LiquidPrimitiveArray):
                    p = e.payload
                    plan = p.packed_plan(pred)
                    if plan is None:
                        continue
                    obs.stats.bump("predicate_evals")
                    obs.stats.bump("predicate_evals_on_encoded")
                    if plan[0] == "const":
                        results[i] = p._const_mask(plan[1])
                    else:
                        prim.setdefault(
                            (p.planes.shape[0], plan[2]), []).append(
                                (i, p, plan[1]))
                elif e.state == MEMORY_LIQUID and isinstance(
                        e.payload, LiquidByteViewArray):
                    bv.append((i, e.payload))
                else:
                    slow.append((i, eid))
        from liquid_tpu.arrays.base import validity_mask_or_full
        from liquid_tpu.ops import bitpack as bp
        for (bucket, op), items in prim.items():
            if len(items) == 1:
                i, p, u = items[0]
                bits = bp.cmp_const_op(p.planes, u, op)
                results[i] = mops.BoolMask(
                    bits, validity_mask_or_full(p.validity, p.length))
                continue
            stack = jnp.stack([p.planes for _, p, _ in items])
            cs = jnp.asarray(np.array([u for _, _, u in items],
                                      dtype=np.uint64))
            bits_all = bp.cmp_const_op_many(stack, cs, op)
            for j, (i, p, _u) in enumerate(items):
                results[i] = mops.BoolMask(
                    bits_all[j], validity_mask_or_full(p.validity, p.length))
        if bv:
            # string blocks: per-block host verdicts over distinct values
            # (prefix keys / fingerprints / pyarrow kernels), then ONE
            # vmapped gather over the stacked code vectors
            from liquid_tpu.arrays.base import validity_mask_or_full as vmof
            from liquid_tpu.arrays.byteview import _verdict_gather_many
            evald = []
            for i, p in bv:
                vkey = (pred.op, pred.literal)
                vd = p._verdict_cache.get(vkey)
                if vd is None:
                    vd = p._dict_verdict(pred)
                    if vd is not None:
                        p._verdict_cache[vkey] = vd
                if vd is None:
                    slow.append((i, entry_ids[i]))
                    continue
                obs.stats.bump("predicate_evals")
                obs.stats.bump("predicate_evals_on_encoded")
                evald.append((i, p, vd))
            if len(evald) == 1:
                i, p, vd = evald[0]
                results[i] = p._mask_from_verdict(vd)
            elif evald:
                max_d = max(len(vd) for _, _, vd in evald)
                verdicts = np.zeros((len(evald), max_d), dtype=bool)
                for j, (_i, _p, vd) in enumerate(evald):
                    verdicts[j, :len(vd)] = vd
                import jax.numpy as _jnp
                codes = _jnp.stack([p.codes for _, p, _ in evald])
                bits_all = _verdict_gather_many(_jnp.asarray(verdicts), codes)
                for j, (i, p, _vd) in enumerate(evald):
                    results[i] = mops.BoolMask(
                        bits_all[j], vmof(p.validity, p.length))
        for i, eid in enumerate(slow):
            idx, entry_id = eid
            results[idx] = self.eval_predicate(entry_id, pred)
        return results

    @TRACER.trace("cache.get_arrow_many")
    def get_arrow_many(self, entry_ids):
        """Batched materialization: entries whose payload exposes
        `decode_from_offsets` (primitive/float bit-plane blocks) are
        unpacked in ONE vmapped dispatch per width bucket + ONE host
        transfer; the rest go through the per-entry get().
        -> list of pa.Array|None aligned with entry_ids."""
        import jax.numpy as jnp
        from liquid_tpu.ops import bitpack as bp
        obs = self.observer
        results: list = [None] * len(entry_ids)
        grouped: Dict[int, list] = {}  # bucket -> [(idx, payload)]
        slow: list = []
        with self._lock:
            for i, eid in enumerate(entry_ids):
                e = self._entries.get(eid)
                if e is None:
                    obs.stats.bump("gets")
                    obs.stats.bump("cache_misses")
                    continue
                p = e.payload
                if e.state == MEMORY_LIQUID and hasattr(
                        p, "decode_from_offsets") and hasattr(p, "planes"):
                    obs.stats.bump("gets")
                    obs.stats.bump("cache_hits")
                    obs.record_access("get", eid, e.mem_bytes)
                    grouped.setdefault(p.planes.shape[0], []).append((i, p))
                else:
                    slow.append((i, eid))
        for bucket, items in grouped.items():
            if len(items) == 1:
                i, p = items[0]
                results[i] = p.to_arrow()
                continue
            out_dtype = jnp.uint64 if bucket > 32 else jnp.uint32
            stack = jnp.stack([p.planes for _, p in items])
            offs = np.asarray(bp.unpack_bitplanes_many(stack, out_dtype))
            for j, (i, p) in enumerate(items):
                results[i] = p.decode_from_offsets(offs[j])
        for i, eid in slow:
            results[i] = self.get(eid)
        return results

    # -- admin (ref core.rs:224-277, stats :68-119) ------------------------

    def contains(self, entry_id: int) -> bool:
        with self._lock:
            return entry_id in self._entries

    def entry_state(self, entry_id: int) -> Optional[str]:
        with self._lock:
            e = self._entries.get(entry_id)
            return e.state if e else None

    def flush_all_to_disk(self) -> None:
        with self._lock:
            ids = list(self._entries)
            for eid in ids:
                e = self._entries[eid]
                while e.state in (MEMORY_ARROW, MEMORY_LIQUID, MEMORY_SQUEEZED):
                    self._squeeze_victim(eid)
                    e = self._entries.get(eid)
                    if e is None:
                        break

    def reset(self) -> None:
        with self._lock:
            for eid in list(self._entries):
                e = self._entries.pop(eid)
                self._release_entry(eid, e)
                self.cache_policy.notify_removed(eid)
            self._hints.clear()

    def remove_file(self, file_id: int) -> None:
        """Drop every entry belonging to one registered file (entry ids
        pack the file id in the top 16 bits, io/parquet.py pack_id).
        Called when a table registration is replaced: the dead file's
        entries would otherwise linger until evicted by pressure."""
        with self._lock:
            for eid in list(self._entries):
                if eid >> 48 == file_id:
                    e = self._entries.pop(eid)
                    self._release_entry(eid, e)
                    self.cache_policy.notify_removed(eid)

    def stats(self) -> dict:
        s = self.observer.stats.snapshot()
        with self._lock:
            states = {}
            for e in self._entries.values():
                states[e.state] = states.get(e.state, 0) + 1
        s["entries"] = len(self._entries)
        s["by_state"] = states
        s["memory_used"] = self.budget.memory_used
        s["disk_used"] = self.budget.disk_used
        return s


class LiquidCacheBuilder:
    """Fluent builder (ref builders.rs:50-64; defaults match: batch 8192,
    1 GB memory, unbounded disk, LiquidPolicy, TranscodeSqueezeEvict,
    AlwaysHydrate)."""

    def __init__(self):
        self._kw = {}

    def with_max_memory_bytes(self, n: int):
        self._kw["max_memory_bytes"] = n
        return self

    def with_max_disk_bytes(self, n: int):
        self._kw["max_disk_bytes"] = n
        return self

    def with_disk_path(self, p: str):
        self._kw["disk_path"] = p
        return self

    def with_cache_policy(self, p: pol.CachePolicy):
        self._kw["cache_policy"] = p
        return self

    def with_squeeze_policy(self, p: pol.SqueezePolicy):
        self._kw["squeeze_policy"] = p
        return self

    def with_hydration_policy(self, p: pol.HydrationPolicy):
        self._kw["hydration_policy"] = p
        return self

    def with_batch_size(self, n: int):
        self._kw["batch_size"] = n
        return self

    def with_transcode_on_insert(self, b: bool):
        self._kw["transcode_on_insert"] = b
        return self

    def with_trace_events(self, b: bool = True):
        self._kw["trace_events"] = b
        return self

    def with_integer_squeeze_policy(self, mode: str):
        """"clamp" (default) or "quantize"
        (ref IntegerSqueezePolicy, primitive_array.rs:36-42)."""
        self._kw["int_squeeze_mode"] = mode
        return self

    def build(self) -> LiquidCache:
        return LiquidCache(**self._kw)
