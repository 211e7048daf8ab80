"""Runtime stats, internal event trace, and access tracer.

Reference behavior: `Observer` (liquid-cache
`src/core/src/cache/observer/`): macro-generated atomic counters
(stats.rs:20-112), a debug-only internal event trace consumed by
snapshot tests (internal_tracing.rs:7-71), and a parquet-flushable
access tracer (tracer.rs:26-100).
"""
from __future__ import annotations

import threading

from liquid_tpu.utils import sync as _sync
import time
from dataclasses import dataclass, field
from typing import List, Optional

COUNTERS = (
    # mirrors RuntimeStats (observer/stats.rs:96-112)
    "gets", "inserts", "predicate_evals", "predicate_evals_on_encoded",
    "squeeze_io_saved", "squeeze_io_reads",
    "transcodes", "squeezes", "evict_to_disk", "removes",
    "hydrations", "cache_hits", "cache_misses",
    "disk_reads", "disk_writes",
    # runtime (dynamic) filters: batches skipped by TopK thresholds /
    # join-key bounds published mid-query (ref DynamicFilterPhysicalExpr,
    # liquid_expr.rs:58 + opener.rs:185)
    "dynamic_filter_prunes",
)


class RuntimeStats:
    def __init__(self):
        self._lock = _sync.Lock()
        self._c = {k: 0 for k in COUNTERS}

    def bump(self, name: str, n: int = 1) -> None:
        with self._lock:
            self._c[name] += n

    def get(self, name: str) -> int:
        with self._lock:
            return self._c[name]

    def snapshot(self) -> dict:
        with self._lock:
            return dict(self._c)

    def reset(self) -> None:
        with self._lock:
            for k in self._c:
                self._c[k] = 0


@dataclass(frozen=True)
class Event:
    """Internal trace event (ref InternalEvent enum, 15 kinds)."""

    kind: str      # Insert | Transcode | Squeeze | EvictToDisk | Remove |
                   # Hydrate | Get | PredicateEval | DiskRead | DiskWrite | ...
    entry_id: int
    detail: str = ""


@dataclass
class TraceRecord:
    """Cache access trace row (ref observer/tracer.rs)."""

    ts: float
    op: str
    entry_id: int
    nbytes: int


class Observer:
    def __init__(self, trace_events: bool = False):
        self.stats = RuntimeStats()
        self._trace_events = trace_events
        self._events: List[Event] = []
        self._events_lock = _sync.Lock()
        self._tracer: Optional[List[TraceRecord]] = None
        self._tracer_lock = _sync.Lock()

    # -- event trace (snapshot tests) -------------------------------------

    def event(self, kind: str, entry_id: int, detail: str = "") -> None:
        if self._trace_events:
            with self._events_lock:
                self._events.append(Event(kind, entry_id, detail))

    def consume_event_trace(self) -> List[Event]:
        with self._events_lock:
            out, self._events = self._events, []
            return out

    # -- access tracer (flushable) ----------------------------------------

    def start_trace(self) -> None:
        with self._tracer_lock:
            self._tracer = []

    def stop_trace(self) -> List[TraceRecord]:
        with self._tracer_lock:
            out, self._tracer = self._tracer or [], None
            return out

    def record_access(self, op: str, entry_id: int, nbytes: int = 0) -> None:
        with self._tracer_lock:
            if self._tracer is not None:
                self._tracer.append(TraceRecord(time.time(), op, entry_id, nbytes))

    def flush_trace_parquet(self, path: str) -> int:
        """Write the current trace to a parquet file (ref CacheTracer)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        recs = self.stop_trace()
        t = pa.table({
            "ts": pa.array([r.ts for r in recs], pa.float64()),
            "op": pa.array([r.op for r in recs], pa.string()),
            "entry_id": pa.array([r.entry_id for r in recs], pa.uint64()),
            "nbytes": pa.array([r.nbytes for r in recs], pa.int64()),
        })
        pq.write_table(t, path)
        return len(recs)
