"""Deterministic concurrency-model checking for the host cache runtime.

Reference behavior: the shuttle crate (liquid-cache dev-dependency;
`src/core/src/sync.rs`, CI `cargo test --features shuttle`): run a
multi-threaded workload under a scheduler that OWNS every interleaving
decision, explore many seeds, and replay any failing schedule exactly.

Python port: tasks run on real threads but execute strictly one at a
time under a token handed out by the scheduler; every lock
acquire/release (through the `utils.sync` shim) and every explicit
`yield_now()` is a scheduling point where the seeded PRNG picks the
next runnable task.  The chosen task sequence is recorded, so a
failure replays exactly with `replay(schedule)`.

    from liquid_tpu.utils import shuttle
    shuttle.check(make_workload, iterations=200)   # explore seeds
    shuttle.replay(make_workload, schedule)        # reproduce one
"""
from __future__ import annotations

import random
import threading
from typing import Callable, List, Optional, Sequence

from liquid_tpu.utils import sync as _sync


class _Task:
    def __init__(self, tid: int, fn: Callable[[], None]):
        self.tid = tid
        self.fn = fn
        self.gate = threading.Event()
        self.done = False
        self.blocked_on = None      # _DLock it waits for, or None
        self.exc: Optional[BaseException] = None
        self.thread: Optional[threading.Thread] = None


class _DLock:
    """Scheduler-controlled (r)lock: acquire blocks the TASK (not the
    OS thread) until the scheduler grants it."""

    def __init__(self, sched: "Scheduler", reentrant: bool):
        self.sched = sched
        self.reentrant = reentrant
        self.owner: Optional[int] = None
        self.count = 0

    def acquire(self, blocking: bool = True):
        return self.sched.lock_acquire(self, blocking)

    def release(self):
        self.sched.lock_release(self)

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()

    def locked(self):
        return self.owner is not None


class _DCondition:
    """Condition over a scheduler lock (enough for the latch patterns
    the runtime uses: wait/notify_all)."""

    def __init__(self, sched: "Scheduler", lock: Optional[_DLock]):
        self.sched = sched
        self.lock = lock or _DLock(sched, reentrant=True)
        self.waiters: List[int] = []

    def __enter__(self):
        self.lock.acquire()
        return self

    def __exit__(self, *exc):
        self.lock.release()

    def wait(self, timeout=None):
        self.sched.cond_wait(self)

    def notify_all(self):
        self.sched.cond_notify(self, all=True)

    def notify(self, n: int = 1):
        self.sched.cond_notify(self, all=False)


class Scheduler:
    def __init__(self, seed: Optional[int] = None,
                 schedule: Optional[Sequence[int]] = None):
        self.rng = random.Random(seed)
        self.forced = list(schedule) if schedule is not None else None
        self.trace: List[int] = []     # chosen task per step (replayable)
        self.tasks: List[_Task] = []
        self.current: Optional[_Task] = None
        self._cv = threading.Condition()

    # -- factories (utils.sync hooks) ---------------------------------------

    def make_lock(self, reentrant: bool) -> _DLock:
        return _DLock(self, reentrant)

    def make_condition(self, lock) -> _DCondition:
        return _DCondition(self, lock if isinstance(lock, _DLock) else None)

    # -- task switching ------------------------------------------------------

    def _runnable(self) -> List[_Task]:
        out = []
        for t in self.tasks:
            if t.done or t.thread is None:
                continue
            lk = t.blocked_on
            if lk is not None and lk.owner is not None \
                    and lk.owner != t.tid:
                continue
            if t.blocked_on == "cond":
                continue
            out.append(t)
        return out

    def _pick_next(self) -> Optional[_Task]:
        runnable = self._runnable()
        if not runnable:
            return None
        if self.forced:
            want = self.forced.pop(0)
            for t in runnable:
                if t.tid == want:
                    return t
            # forced task not runnable (divergent replay): fall through
        return self.rng.choice(runnable)

    def _switch_to(self, task: Optional[_Task]) -> None:
        """Called with self._cv held."""
        self.current = task
        if task is not None:
            self.trace.append(task.tid)
            task.gate.set()

    def yield_point(self, why: str = "") -> None:
        """The running task offers a scheduling decision."""
        me = self.current
        with self._cv:
            nxt = self._pick_next()
            if nxt is me:
                return  # keep running
            me.gate.clear()
            self._switch_to(nxt)
            self._cv.notify_all()
        me.gate.wait()

    # -- lock operations -----------------------------------------------------

    def lock_acquire(self, lk: _DLock, blocking: bool) -> bool:
        me = self.current
        self.yield_point("pre-acquire")
        while True:
            if lk.owner is None or (lk.reentrant and lk.owner == me.tid):
                lk.owner = me.tid
                lk.count += 1
                return True
            if not blocking:
                return False
            # block this task until the lock frees
            with self._cv:
                me.blocked_on = lk
                me.gate.clear()
                self._switch_to(self._pick_next())
                self._cv.notify_all()
            me.gate.wait()
            me.blocked_on = None

    def lock_release(self, lk: _DLock) -> None:
        me = self.current
        assert lk.owner == me.tid, "release of foreign lock"
        lk.count -= 1
        if lk.count == 0:
            lk.owner = None
        self.yield_point("post-release")

    def cond_wait(self, cond: _DCondition) -> None:
        me = self.current
        held = cond.lock.count
        cond.lock.count = 0
        cond.lock.owner = None
        cond.waiters.append(me.tid)
        with self._cv:
            me.blocked_on = "cond"
            me.gate.clear()
            self._switch_to(self._pick_next())
            self._cv.notify_all()
        me.gate.wait()
        # reacquire the lock with the held count
        self.lock_acquire(cond.lock, True)
        cond.lock.count = held

    def cond_notify(self, cond: _DCondition, all: bool) -> None:
        woken = cond.waiters[:] if all else cond.waiters[:1]
        cond.waiters = [] if all else cond.waiters[1:]
        for tid in woken:
            self.tasks[tid].blocked_on = None
        self.yield_point("notify")

    # -- run -----------------------------------------------------------------

    def run(self, fns: Sequence[Callable[[], None]]) -> List[int]:
        """Run the workload to completion under this scheduler; returns
        the recorded schedule."""
        self.tasks = [_Task(i, fn) for i, fn in enumerate(fns)]

        def body(task: _Task):
            task.gate.wait()
            try:
                task.fn()
            except BaseException as ex:  # surfaced after join
                task.exc = ex
            finally:
                task.done = True
                with self._cv:
                    self._switch_to(self._pick_next())
                    self._cv.notify_all()

        _sync.install(self)
        try:
            for t in self.tasks:
                t.thread = threading.Thread(target=body, args=(t,),
                                            daemon=True)
                t.thread.start()
            with self._cv:
                self._switch_to(self._pick_next())
            for t in self.tasks:
                t.thread.join(timeout=60)
                if t.thread.is_alive():
                    raise RuntimeError(
                        f"deadlock: task {t.tid} never finished; "
                        f"schedule so far: {self.trace}")
            for t in self.tasks:
                if t.exc is not None:
                    raise t.exc
        finally:
            _sync.uninstall()
        return self.trace


def check(make_workload: Callable[[], Sequence[Callable[[], None]]],
          iterations: int = 100, base_seed: int = 0) -> None:
    """Explore `iterations` seeded schedules of the workload; on failure
    raise with the seed + schedule so it can be replayed exactly
    (the shuttle_test/shuttle_replay pattern, ref utils/mod.rs:156-188).
    """
    for i in range(iterations):
        seed = base_seed + i
        sched = Scheduler(seed=seed)
        try:
            sched.run(make_workload())
        except BaseException as ex:
            raise AssertionError(
                f"schedule violation at seed {seed}: {ex}\n"
                f"replay with shuttle.replay(make_workload, "
                f"{sched.trace!r})") from ex


def replay(make_workload: Callable[[], Sequence[Callable[[], None]]],
           schedule: Sequence[int]) -> List[int]:
    """Re-run the workload under an exact recorded schedule."""
    sched = Scheduler(seed=0, schedule=schedule)
    return sched.run(make_workload())
