"""std-vs-deterministic sync shim.

Reference behavior: `src/core/src/sync.rs:1-6` swaps `std::sync` for
`shuttle::sync` under the shuttle feature so the concurrency-model
checker controls every synchronization point; `yield_now_if_shuttle`
(`utils/mod.rs:156-159`) injects extra scheduling points in the cache
replacement loop.

The cache runtime constructs all its locks through this module.  By
default they are plain `threading` primitives with zero overhead.
Inside `liquid_tpu.utils.shuttle.run(...)` the factories hand out
scheduler-controlled locks instead, making every interleaving decision
deterministic and replayable from a seed.
"""
from __future__ import annotations

import threading

#: the active deterministic scheduler, or None for plain threading
_SCHED = None


def install(sched) -> None:
    global _SCHED
    _SCHED = sched


def uninstall() -> None:
    global _SCHED
    _SCHED = None


def current():
    return _SCHED


def Lock():
    if _SCHED is not None:
        return _SCHED.make_lock(reentrant=False)
    return threading.Lock()


def RLock():
    if _SCHED is not None:
        return _SCHED.make_lock(reentrant=True)
    return threading.RLock()


def Condition(lock=None):
    if _SCHED is not None:
        return _SCHED.make_condition(lock)
    return threading.Condition(lock)


def yield_now() -> None:
    """Extra scheduling point (ref yield_now_if_shuttle); no-op outside
    a deterministic run."""
    if _SCHED is not None:
        _SCHED.yield_point("yield_now")
