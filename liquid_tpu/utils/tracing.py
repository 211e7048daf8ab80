"""Distributed tracing: spans, W3C propagation, chrome-trace export.

Reference behavior (liquid-cache SURVEY.md section 5): `fastrace` spans
on hot functions (`#[fastrace::trace]` at core.rs:492,
liquid_cache_reader.rs:296,341), propagated across the network via a
W3C `traceparent` in the Flight ticket (rpc.rs:203, client_exec.rs:
286-292, server decode lib.rs:215-217), exported to Jaeger via OTLP.

TPU-native shape: a dependency-free span recorder -- context-manager /
decorator spans on a thread-local stack, cross-service propagation via
the same W3C traceparent header, export to Chrome trace-event JSON
(loadable in Perfetto / chrome://tracing, the role Jaeger plays for the
reference).  OTLP export is gated on the optional opentelemetry package.
"""
from __future__ import annotations

import json
import os
import threading
import time
import uuid
from contextlib import contextmanager
from typing import Dict, List, Optional


class Span:
    __slots__ = ("name", "trace_id", "span_id", "parent_id", "start",
                 "end", "attrs", "tid")

    def __init__(self, name, trace_id, span_id, parent_id, start, tid):
        self.name = name
        self.trace_id = trace_id
        self.span_id = span_id
        self.parent_id = parent_id
        self.start = start
        self.end = None
        self.attrs: Dict[str, object] = {}
        self.tid = tid


class Tracer:
    """Process-wide span collector.  Disabled (no-op, near-zero cost)
    until `enable()`."""

    def __init__(self):
        self.enabled = False
        self._spans: List[Span] = []
        self._lock = threading.Lock()
        self._local = threading.local()

    # -- recording -----------------------------------------------------------

    def _stack(self) -> list:
        st = getattr(self._local, "stack", None)
        if st is None:
            st = self._local.stack = []
        return st

    def enable(self) -> None:
        self.enabled = True

    def disable(self) -> None:
        self.enabled = False

    def reset(self) -> None:
        with self._lock:
            self._spans = []

    @contextmanager
    def span(self, name: str, **attrs):
        if not self.enabled:
            yield None
            return
        stack = self._stack()
        parent = stack[-1] if stack else None
        trace_id = parent.trace_id if parent else uuid.uuid4().hex
        s = Span(name, trace_id, uuid.uuid4().hex[:16],
                 parent.span_id if parent else getattr(
                     self._local, "remote_parent", None),
                 time.perf_counter_ns(), threading.get_ident())
        s.attrs.update(attrs)
        stack.append(s)
        try:
            yield s
        finally:
            s.end = time.perf_counter_ns()
            stack.pop()
            with self._lock:
                self._spans.append(s)

    def trace(self, name: Optional[str] = None):
        """Decorator form (ref #[fastrace::trace])."""
        def deco(fn):
            nm = name or f"{fn.__module__.rsplit('.', 1)[-1]}.{fn.__name__}"

            def wrapper(*a, **kw):
                if not self.enabled:
                    return fn(*a, **kw)
                with self.span(nm):
                    return fn(*a, **kw)
            wrapper.__name__ = fn.__name__
            wrapper.__doc__ = fn.__doc__
            return wrapper
        return deco

    # -- W3C propagation (ref rpc.rs:203 traceparent) -------------------------

    def current_traceparent(self) -> str:
        stack = self._stack()
        if stack:
            s = stack[-1]
            return f"00-{s.trace_id}-{s.span_id}-01"
        return f"00-{uuid.uuid4().hex}-{uuid.uuid4().hex[:16]}-01"

    def adopt_traceparent(self, traceparent: str) -> None:
        """Continue a remote trace in this thread (server side,
        ref lib.rs:215-217)."""
        try:
            _v, trace_id, span_id, _f = traceparent.split("-")
        except ValueError:
            return
        self._local.remote_trace = trace_id
        self._local.remote_parent = span_id

    @contextmanager
    def remote_span(self, name: str, traceparent: str, **attrs):
        if not self.enabled:
            yield None
            return
        try:
            _v, trace_id, parent_id, _f = traceparent.split("-")
        except ValueError:
            trace_id, parent_id = uuid.uuid4().hex, None
        s = Span(name, trace_id, uuid.uuid4().hex[:16], parent_id,
                 time.perf_counter_ns(), threading.get_ident())
        s.attrs.update(attrs)
        self._stack().append(s)
        try:
            yield s
        finally:
            s.end = time.perf_counter_ns()
            self._stack().pop()
            with self._lock:
                self._spans.append(s)

    # -- export ----------------------------------------------------------------

    def spans(self) -> List[Span]:
        with self._lock:
            return list(self._spans)

    def export_chrome_trace(self, path: str) -> int:
        """Chrome trace-event JSON (Perfetto-loadable; the reference's
        Jaeger-equivalent offline view)."""
        events = []
        with self._lock:
            for s in self._spans:
                events.append({
                    "name": s.name, "ph": "X", "pid": os.getpid(),
                    "tid": s.tid, "ts": s.start / 1000,
                    "dur": ((s.end or s.start) - s.start) / 1000,
                    "args": {**s.attrs, "trace_id": s.trace_id,
                             "span_id": s.span_id,
                             "parent_id": s.parent_id}})
        with open(path, "w") as f:
            json.dump({"traceEvents": events}, f)
        return len(events)

    def export_otlp(self, endpoint: str) -> bool:
        """OTLP export if opentelemetry is installed (the reference's
        Jaeger path); returns False when unavailable (gated dep)."""
        try:
            from opentelemetry import trace as _  # noqa: F401
        except ImportError:
            return False
        raise NotImplementedError("wire to opentelemetry SDK")


#: process-global tracer (ref fastrace's implicit global collector)
TRACER = Tracer()
