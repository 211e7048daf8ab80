"""Memory / disk byte budgets.

Reference behavior: `BudgetAccounting` (liquid-cache
`src/core/src/cache/budget.rs:8-102`): CAS-loop reservation of memory
and disk budgets with precise usage tracking.  Python port uses a lock
(the GIL makes per-counter CAS moot); semantics are identical:
try_reserve fails without side effects when over budget.
"""
from __future__ import annotations

import threading

from liquid_tpu.utils import sync as _sync


class BudgetExceeded(Exception):
    pass


class BudgetAccounting:
    def __init__(self, max_memory_bytes: int, max_disk_bytes: int | None = None):
        self._lock = _sync.Lock()
        self.max_memory_bytes = max_memory_bytes
        self.max_disk_bytes = max_disk_bytes  # None = unbounded (ref default)
        self._memory_used = 0
        self._disk_used = 0

    @property
    def memory_used(self) -> int:
        return self._memory_used

    @property
    def disk_used(self) -> int:
        return self._disk_used

    def try_reserve_memory(self, nbytes: int) -> bool:
        with self._lock:
            if self._memory_used + nbytes > self.max_memory_bytes:
                return False
            self._memory_used += nbytes
            return True

    def release_memory(self, nbytes: int) -> None:
        with self._lock:
            self._memory_used -= nbytes
            assert self._memory_used >= 0, "memory accounting underflow"

    def try_update_memory_usage(self, old: int, new: int) -> bool:
        """Atomically swap a reservation from `old` to `new` bytes."""
        with self._lock:
            delta = new - old
            if delta > 0 and self._memory_used + delta > self.max_memory_bytes:
                return False
            self._memory_used += delta
            assert self._memory_used >= 0
            return True

    def force_update_memory_usage(self, old: int, new: int) -> None:
        """Swap a reservation unconditionally (squeeze pipeline: the new
        representation may transiently exceed the cap; the replacement
        loop keeps squeezing until usage drops)."""
        with self._lock:
            self._memory_used += new - old
            assert self._memory_used >= 0

    def try_reserve_disk(self, nbytes: int) -> bool:
        with self._lock:
            if (self.max_disk_bytes is not None
                    and self._disk_used + nbytes > self.max_disk_bytes):
                return False
            self._disk_used += nbytes
            return True

    def release_disk(self, nbytes: int) -> None:
        with self._lock:
            self._disk_used -= nbytes
            assert self._disk_used >= 0
