"""Cache replacement, squeeze, and hydration policies.

Reference behavior (liquid-cache `src/core/src/cache/policies/`):
- `CachePolicy` + `LiquidPolicy` (three_queue.rs:136-222): eviction
  advisor keeping FIFO queues per entry kind; Arrow entries are advised
  first, then Liquid, then Squeezed; a separate Disk queue yields disk
  victims.  Each entry is advised at most once per residency.
- `SqueezePolicy` (squeeze.rs:35-220): given a victim, decide its next
  representation: `TranscodeSqueezeEvict` (default) walks
  Arrow -> Liquid -> Squeezed(+disk backing) -> DiskLiquid -> gone;
  `TranscodeEvict` skips the squeezed stage; `Evict` never transcodes.
- `HydrationPolicy` (hydration.rs): on read of a disk/squeezed entry,
  decide whether to promote it back to memory.
"""
from __future__ import annotations

import abc
import threading

from liquid_tpu.utils import sync as _sync
from collections import OrderedDict
from typing import List, Optional, Tuple

# entry kinds (mirrors CacheEntry states, cached_batch.rs:12-33)
ARROW = "arrow"
LIQUID = "liquid"
SQUEEZED = "squeezed"
DISK = "disk"          # DiskLiquid / DiskArrow

_MEMORY_ORDER = (ARROW, LIQUID, SQUEEZED)


class CachePolicy(abc.ABC):
    """Eviction advisor (ref policies/cache/mod.rs:12-29)."""

    @abc.abstractmethod
    def notify_inserted(self, entry_id: int, kind: str) -> None: ...

    @abc.abstractmethod
    def notify_state_changed(self, entry_id: int, kind: str) -> None: ...

    @abc.abstractmethod
    def notify_removed(self, entry_id: int) -> None: ...

    @abc.abstractmethod
    def find_memory_victims(self, count: int) -> List[int]: ...

    @abc.abstractmethod
    def find_disk_victims(self, count: int) -> List[int]: ...


class LiquidPolicy(CachePolicy):
    """Four FIFO queues by kind; memory victims drain Arrow, then Liquid,
    then Squeezed (ref three_queue.rs).  Popped entries are not re-advised
    until a notify_* re-enqueues them."""

    def __init__(self):
        self._lock = _sync.Lock()
        self._queues = {k: OrderedDict() for k in (_MEMORY_ORDER + (DISK,))}
        self._where = {}  # entry_id -> kind

    def _remove_locked(self, entry_id: int) -> None:
        kind = self._where.pop(entry_id, None)
        if kind is not None:
            self._queues[kind].pop(entry_id, None)

    def notify_inserted(self, entry_id: int, kind: str) -> None:
        with self._lock:
            self._remove_locked(entry_id)
            self._queues[kind][entry_id] = True
            self._where[entry_id] = kind

    notify_state_changed = notify_inserted

    def notify_removed(self, entry_id: int) -> None:
        with self._lock:
            self._remove_locked(entry_id)

    def find_memory_victims(self, count: int) -> List[int]:
        out: List[int] = []
        with self._lock:
            for kind in _MEMORY_ORDER:
                q = self._queues[kind]
                while q and len(out) < count:
                    eid, _ = q.popitem(last=False)
                    self._where.pop(eid, None)
                    out.append(eid)
                if len(out) >= count:
                    break
        return out

    def find_disk_victims(self, count: int) -> List[int]:
        out: List[int] = []
        with self._lock:
            q = self._queues[DISK]
            while q and len(out) < count:
                eid, _ = q.popitem(last=False)
                self._where.pop(eid, None)
                out.append(eid)
        return out


class FifoPolicy(CachePolicy):
    """Single FIFO over all memory entries (baseline policy)."""

    def __init__(self):
        self._lock = _sync.Lock()
        self._mem = OrderedDict()
        self._disk = OrderedDict()

    def notify_inserted(self, entry_id: int, kind: str) -> None:
        with self._lock:
            self._mem.pop(entry_id, None)
            self._disk.pop(entry_id, None)
            (self._disk if kind == DISK else self._mem)[entry_id] = True

    notify_state_changed = notify_inserted

    def notify_removed(self, entry_id: int) -> None:
        with self._lock:
            self._mem.pop(entry_id, None)
            self._disk.pop(entry_id, None)

    def find_memory_victims(self, count: int) -> List[int]:
        out = []
        with self._lock:
            while self._mem and len(out) < count:
                out.append(self._mem.popitem(last=False)[0])
        return out

    def find_disk_victims(self, count: int) -> List[int]:
        out = []
        with self._lock:
            while self._disk and len(out) < count:
                out.append(self._disk.popitem(last=False)[0])
        return out


class LruPolicy(CachePolicy):
    """LRU over memory entries: notify_accessed moves to the back."""

    def __init__(self):
        self._lock = _sync.Lock()
        self._mem = OrderedDict()
        self._disk = OrderedDict()

    def notify_inserted(self, entry_id: int, kind: str) -> None:
        with self._lock:
            self._mem.pop(entry_id, None)
            self._disk.pop(entry_id, None)
            (self._disk if kind == DISK else self._mem)[entry_id] = True

    notify_state_changed = notify_inserted

    def notify_accessed(self, entry_id: int) -> None:
        with self._lock:
            if entry_id in self._mem:
                self._mem.move_to_end(entry_id)

    def notify_removed(self, entry_id: int) -> None:
        with self._lock:
            self._mem.pop(entry_id, None)
            self._disk.pop(entry_id, None)

    def find_memory_victims(self, count: int) -> List[int]:
        out = []
        with self._lock:
            while self._mem and len(out) < count:
                out.append(self._mem.popitem(last=False)[0])
        return out

    def find_disk_victims(self, count: int) -> List[int]:
        out = []
        with self._lock:
            while self._disk and len(out) < count:
                out.append(self._disk.popitem(last=False)[0])
        return out


# -- squeeze policies ------------------------------------------------------

#: outcome kinds
REPLACE = "replace"
REMOVE = "remove"


class SqueezePolicy(abc.ABC):
    """Decide a victim's next representation (ref squeeze.rs:35-44).

    `squeeze(entry, ctx)` returns one of:
      (REPLACE, new_state, new_payload, bytes_to_write | None)
      (REMOVE,)
    where new_state is a core.EntryState value.  `ctx` carries the
    transcoder and squeeze hints.
    """

    @abc.abstractmethod
    def squeeze(self, state: str, payload, ctx) -> Tuple: ...


class TranscodeSqueezeEvict(SqueezePolicy):
    """Default pipeline (ref squeeze.rs:94-165)."""

    def squeeze(self, state: str, payload, ctx):
        from liquid_tpu.cache import core as c
        if state == c.MEMORY_ARROW:
            out = ctx.variant_squeeze(payload)
            if out is not None:  # ref try_variant_squeeze, squeeze.rs:222-290
                sq, backing = out
                return (REPLACE, c.MEMORY_SQUEEZED, sq, backing)
            liquid = ctx.transcode(payload)
            if liquid is None:  # untranscodable type: straight to disk (arrow)
                return (REPLACE, c.DISK_ARROW, None, ctx.arrow_bytes(payload))
            return (REPLACE, c.MEMORY_LIQUID, liquid, None)
        if state == c.MEMORY_LIQUID:
            hint = ctx.squeeze_hint
            if hint is not None:
                out = ctx.squeeze_with_hint(payload, hint)
                if out is not None:
                    sq, backing = out
                    return (REPLACE, c.MEMORY_SQUEEZED, sq, backing)
            out = ctx.squeeze_default(payload)
            if out is None:  # unsqueezable: evict to disk in liquid form
                return (REPLACE, c.DISK_LIQUID, None, payload.to_bytes())
            sq, backing = out
            return (REPLACE, c.MEMORY_SQUEEZED, sq, backing)
        if state == c.MEMORY_SQUEEZED:
            # backing bytes are already on disk: drop the resident part
            return (REPLACE, _disk_state_for(payload), None, None)
        return (REMOVE,)


def _disk_state_for(squeezed) -> str:
    """A squeezed entry's backing may be liquid IPC or arrow bytes
    (ref SqueezedBacking::{Liquid,Arrow}, mod.rs:156-170) -- the disk
    state must record which so reads deserialize correctly."""
    from liquid_tpu.cache import core as c
    kind, _ = squeezed.disk_backing()
    return c.DISK_ARROW if kind == "arrow" else c.DISK_LIQUID


class TranscodeEvict(SqueezePolicy):
    """Arrow -> Liquid -> DiskLiquid -> gone (no squeezed stage)."""

    def squeeze(self, state: str, payload, ctx):
        from liquid_tpu.cache import core as c
        if state == c.MEMORY_ARROW:
            liquid = ctx.transcode(payload)
            if liquid is None:
                return (REPLACE, c.DISK_ARROW, None, ctx.arrow_bytes(payload))
            return (REPLACE, c.MEMORY_LIQUID, liquid, None)
        if state == c.MEMORY_LIQUID:
            return (REPLACE, c.DISK_LIQUID, None, payload.to_bytes())
        if state == c.MEMORY_SQUEEZED:
            return (REPLACE, _disk_state_for(payload), None, None)
        return (REMOVE,)


class Evict(SqueezePolicy):
    """Never transcode: memory -> disk bytes as-is -> gone."""

    def squeeze(self, state: str, payload, ctx):
        from liquid_tpu.cache import core as c
        if state == c.MEMORY_ARROW:
            return (REPLACE, c.DISK_ARROW, None, ctx.arrow_bytes(payload))
        if state == c.MEMORY_LIQUID:
            return (REPLACE, c.DISK_LIQUID, None, payload.to_bytes())
        if state == c.MEMORY_SQUEEZED:
            return (REPLACE, _disk_state_for(payload), None, None)
        return (REMOVE,)


# -- hydration policies ----------------------------------------------------

class HydrationPolicy(abc.ABC):
    """On read of a non-memory-resident entry, decide promotion
    (ref hydration.rs:44-48)."""

    @abc.abstractmethod
    def should_hydrate(self, state: str) -> bool: ...


class AlwaysHydrate(HydrationPolicy):
    def should_hydrate(self, state: str) -> bool:
        return True


class NoHydration(HydrationPolicy):
    def should_hydrate(self, state: str) -> bool:
        return False
