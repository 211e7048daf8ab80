"""Compute-node client for the disaggregated cache server.

Reference behavior: `LiquidCacheClientBuilder` + `PushdownOptimizer` +
`LiquidCacheClientExec` (liquid-cache `src/datafusion-client/src/
lib.rs:50-140`, `optimizer.rs:14-120`, `client_exec.rs:41-299`):
the client finds the largest pushable subplan, serializes it, registers
it ONCE behind an atomic 3-state latch, then opens one Flight stream per
partition and decodes record batches, recording stream metrics.

TPU-native divergence (documented): the reference pushes only scan /
partial-aggregate subtrees because its cache server embeds a bare
DataFusion; liquid-tpu's server runs the full engine, so the pushable
subtree is the whole query -- `PushdownOptimizer.pushable()` decides
push-vs-local by table residency instead of plan shape.
"""
from __future__ import annotations

import json
import threading
import time
import uuid
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from liquid_tpu.common import rpc

#: registration latch states (ref client_exec.rs:41-46)
UNREGISTERED, REGISTERING, REGISTERED = 0, 1, 2


class FlightStreamMetrics:
    """Client-side stream timing (ref datafusion-client/src/metrics.rs:43)."""

    def __init__(self):
        self.time_to_first_batch_ms = 0.0
        self.total_stream_ms = 0.0
        self.batches = 0
        self.rows = 0


class LiquidCacheClient:
    def __init__(self, host: str, port: int,
                 tables: Optional[Dict[str, str]] = None,
                 partitions: int = 1):
        self.addr = (host, port)
        self.tables = dict(tables or {})
        self.partitions = partitions
        self._latch: Dict[str, int] = {}
        self._handles: Dict[str, str] = {}
        self._latch_cv = threading.Condition()
        self.last_metrics: Optional[FlightStreamMetrics] = None
        self._flight = None
        self._conn_lock = threading.Lock()

    def _conn(self):
        # one shared grpc channel, no TLS (ref flight_channel,
        # lib.rs:123-140); pyarrow FlightClient is thread-safe
        import pyarrow.flight as fl
        with self._conn_lock:
            if self._flight is None:
                self._flight = fl.connect(
                    f"grpc://{self.addr[0]}:{self.addr[1]}")
            return self._flight

    def _call(self, action_type: str, msg: dict) -> dict:
        import pyarrow.flight as fl
        try:
            res = list(self._conn().do_action(
                fl.Action(action_type, json.dumps(msg).encode())))
        except (fl.FlightError, pa.ArrowException) as ex:
            raise RuntimeError(f"server error: {ex}") from ex
        return json.loads(res[0].body.to_pybytes()) if res else {}

    def register_object_store(self, url: str, options: dict = None) -> None:
        self._call("register_object_store",
                   {"url": url, "options": options or {}})

    def register_table(self, name: str, location: str) -> None:
        self.tables[name] = location

    def prefetch(self, url: str, location: str, rng=None) -> int:
        out = self._call("prefetch", {"url": url, "location": location,
                                      "range": list(rng) if rng else None})
        return out["bytes"]

    def _ensure_registered(self, sql: str) -> str:
        """Register the plan exactly once across threads
        (atomic 3-state latch, ref client_exec.rs:242-284)."""
        with self._latch_cv:
            while self._latch.get(sql) == REGISTERING:
                self._latch_cv.wait()
            if self._latch.get(sql) == REGISTERED:
                return self._handles[sql]
            self._latch[sql] = REGISTERING
        try:
            handle = str(uuid.uuid4())
            self._call("register_plan",
                       {"plan": sql, "handle": handle,
                        "tables": self.tables,
                        "partitions": self.partitions})
            with self._latch_cv:
                self._handles[sql] = handle
                self._latch[sql] = REGISTERED
                self._latch_cv.notify_all()
            return handle
        except BaseException:
            with self._latch_cv:
                self._latch[sql] = UNREGISTERED
                self._latch_cv.notify_all()
            raise

    def _fetch_partition(self, handle: str, partition: int,
                         metrics: FlightStreamMetrics,
                         traceparent: str = "") -> List[pa.RecordBatch]:
        import pyarrow.flight as fl
        t0 = time.perf_counter()
        batches: List[pa.RecordBatch] = []
        # FetchResults ticket (ref rpc.rs:195-212 FetchResults -> Ticket)
        ticket = fl.Ticket(json.dumps(
            {"handle": handle, "partition": partition,
             "traceparent": traceparent or _traceparent()}).encode())
        try:
            reader = self._conn().do_get(ticket)
        except (fl.FlightError, pa.ArrowException) as ex:
            raise RuntimeError(f"server error: {ex}") from ex
        first = True
        for chunk in reader:
            if first:
                metrics.time_to_first_batch_ms = (
                    (time.perf_counter() - t0) * 1000)
                first = False
            batches.append(chunk.data)
            metrics.batches += 1
            metrics.rows += chunk.data.num_rows
        return batches

    def sql(self, query: str) -> pa.Table:
        from liquid_tpu.utils.tracing import TRACER
        with TRACER.span("client.sql", query=query[:120]):
            return self._sql_inner(query)

    def _sql_inner(self, query: str) -> pa.Table:
        handle = self._ensure_registered(query)
        metrics = FlightStreamMetrics()
        t0 = time.perf_counter()
        all_batches: List[pa.RecordBatch] = []
        # one stream per partition (ref client_exec.rs:148-179)
        threads, results = [], [None] * self.partitions
        tp = _traceparent()  # capture on the caller thread (span stack)
        if self.partitions == 1:
            all_batches = self._fetch_partition(handle, 0, metrics, tp)
        else:
            def work(i):
                results[i] = self._fetch_partition(handle, i, metrics, tp)
            for i in range(self.partitions):
                th = threading.Thread(target=work, args=(i,))
                th.start()
                threads.append(th)
            for th in threads:
                th.join()
            for r in results:
                all_batches.extend(r or [])
        metrics.total_stream_ms = (time.perf_counter() - t0) * 1000
        self.last_metrics = metrics
        if not all_batches:
            return pa.table({})
        return pa.Table.from_batches(all_batches)

    def execution_metrics(self, sql: Optional[str] = None
                          ) -> rpc.ExecutionMetricsResponse:
        handle = self._handles.get(sql, "") if sql else ""
        out = self._call("execution_metrics", {"handle": handle})
        return rpc.ExecutionMetricsResponse(**out["metrics"])

    def server_stats(self) -> dict:
        return self._call("stats", {})["stats"]

    def reset_cache(self) -> None:
        self._call("reset", {})


def _traceparent() -> str:
    """W3C traceparent for cross-service span propagation
    (ref client_exec.rs:286-292): continues the client's current span
    when tracing is enabled."""
    from liquid_tpu.utils.tracing import TRACER
    return TRACER.current_traceparent()


class LiquidCacheClientBuilder:
    """Fluent builder (ref datafusion-client lib.rs:50-117)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._host, self._port = host, port
        self._tables: Dict[str, str] = {}
        self._stores: List[Tuple[str, dict]] = []
        self._partitions = 1

    def with_server(self, host: str, port: int):
        self._host, self._port = host, port
        return self

    def with_object_store(self, url: str, options: dict = None):
        self._stores.append((url, options or {}))
        return self

    def with_parquet_table(self, name: str, location: str):
        self._tables[name] = location
        return self

    def with_partitions(self, n: int):
        self._partitions = n
        return self

    def build(self) -> LiquidCacheClient:
        c = LiquidCacheClient(self._host, self._port, self._tables,
                              self._partitions)
        for url, options in self._stores:
            c.register_object_store(url, options)
        return c
