"""The cache server: plan-in, arrow-stream-out service.

Reference behavior: `LiquidCacheService` + `LiquidCacheServiceInner`
(liquid-cache `src/datafusion-server/src/lib.rs:102-349`, `service.rs:
38-214`): an Arrow Flight SQL service whose DoActions register object
stores (wrapped in ByteCache) and physical plans (UUID handles), and
whose DoGet executes one plan partition and streams record batches.

TPU-native shape: the reference ships serialized DataFusion physical
plans because its cache server embeds DataFusion; our server embeds the
full liquid-tpu engine, so the shipped "plan" is the SQL text + table
registrations (same boundary; action/ticket payloads from
common/rpc.py).  Served over real Arrow Flight (`pyarrow.flight`
gRPC): DoAction for registrations/prefetch, DoGet(FetchResults ticket)
for per-partition record-batch streams.  Partition streams slice the
cached result.
"""
from __future__ import annotations

import threading
import time
import uuid
from typing import Dict, Optional, Tuple

import pyarrow as pa

from liquid_tpu.common import rpc
from liquid_tpu.utils.tracing import TRACER
from liquid_tpu.common.object_store import (
    ByteCache, LocalStore, MockStore, ObjectStore, StoreFile, sanitize_url,
)
from liquid_tpu.io.parquet import ParquetTable
from liquid_tpu.sql.exec import QueryExecutor
from liquid_tpu.sql.session import SessionContext


class _RowGroupSlice:
    """View of a ParquetTable restricted to a set of row groups; shares
    the base table's cache, zone maps and fused-prep state.  This is the
    unit of partition-parallel plan execution: each server partition
    scans ONLY its row groups (ref independent per-partition execution,
    service.rs:158-176)."""

    __slots__ = ("_base", "_rgs")

    def __init__(self, base, rgs):
        object.__setattr__(self, "_base", base)
        object.__setattr__(self, "_rgs", frozenset(rgs))

    def prune_row_groups(self, preds):
        keep = self._base.prune_row_groups(preds)
        return [rg for rg in keep if rg in self._rgs]

    def __getattr__(self, k):
        return getattr(self._base, k)

    def __setattr__(self, k, v):
        setattr(self._base, k, v)


def _partitionable_scan(sql: str, tables) -> Optional[str]:
    """Table name when `sql` is a plain single-table scan whose result
    is row-group-decomposable (no aggregate/group/order/limit/distinct/
    join/setop) -- the shape the server executes partition-parallel."""
    from liquid_tpu.sql import ast
    from liquid_tpu.sql.exec import _has_subquery
    from liquid_tpu.sql.parser import parse_statement
    from liquid_tpu.sql.physical import find_aggs
    try:
        stmt = parse_statement(sql)
        if stmt[0] != "select" or not isinstance(stmt[1], ast.Select):
            return None
        q = stmt[1]
        if (q.ctes or q.group_by or q.having or q.order_by
                or q.limit is not None or q.offset is not None
                or q.distinct):
            return None
        if not isinstance(q.from_, ast.TableRef) or q.from_.name not in tables:
            return None
        if q.where is not None and _has_subquery(q.where):
            # a subquery must see the FULL table, not one partition's
            # row-group slice
            return None
        aggs: list = []
        for it in q.items:
            find_aggs(it.expr, aggs)
            if _has_window(it.expr) or _has_subquery(it.expr):
                return None
        if aggs:
            return None
        return q.from_.name
    except Exception:
        return None


def _has_window(e) -> bool:
    from liquid_tpu.sql import ast
    if isinstance(e, ast.WindowFunc):
        return True
    for f_ in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f_)
        if isinstance(v, ast.Expr) and _has_window(v):
            return True
        if isinstance(v, (list, tuple)):
            for x in v:
                if isinstance(x, ast.Expr) and _has_window(x):
                    return True
    return False


class LiquidCacheServiceInner:
    """Plan + object-store registries around one cache/session
    (ref service.rs:38-214)."""

    def __init__(self, cache, byte_cache_dir: Optional[str] = None):
        self.cache = cache
        self.ctx = SessionContext(cache)
        self.byte_cache_dir = byte_cache_dir
        self.stores: Dict[str, ObjectStore] = {}
        #: handle -> (sql, n_partitions, result pa.Table | None, lock)
        self.plans: Dict[str, dict] = {}
        self.execution_stats: list = []
        self._lock = threading.Lock()

    # -- object stores (ref service.rs:90-126) -----------------------------

    def register_object_store(self, url: str, options: dict) -> None:
        with self._lock:
            if url in self.stores:
                return
            if url.startswith("mock://"):
                store: ObjectStore = MockStore(
                    {k: v.encode("latin1") for k, v in
                     options.get("objects", {}).items()})
            elif url.startswith("file://") or url == "local":
                store = LocalStore(options.get("root", "/"))
            else:
                raise ValueError(f"unsupported object store {url!r}")
            if self.byte_cache_dir and not url.startswith("file://") \
                    and url != "local":
                # every remote store is wrapped in the byte cache
                # (ref service.rs:108-120)
                store = ByteCache(
                    store, f"{self.byte_cache_dir}/{sanitize_url(url)}")
            self.stores[url] = store

    def store_for(self, url: str) -> ObjectStore:
        return self.stores[url]

    def _register_table(self, name: str, location: str) -> None:
        if name in self.ctx._tables:
            return
        url, _, path = location.partition("!")
        if not path:  # local filesystem path
            self.ctx.register_parquet(name, url)
            return
        store = self.stores[url]
        fid = self.ctx._next_file_id
        self.ctx._next_file_id += 1
        self.ctx._tables[name] = ParquetTable(
            name, f"{url}/{path}", self.cache, fid,
            open_file=lambda s=store, p=path: StoreFile(s, p))

    # -- plans (ref service.rs:128-176) --------------------------------------

    def register_plan(self, sql: str, handle: str, tables: Dict[str, str],
                      partitions: int = 1) -> None:
        for name, loc in tables.items():
            self._register_table(name, loc)
        scan_of = _partitionable_scan(sql, self.ctx._tables)
        with self._lock:
            if handle not in self.plans:
                self.plans[handle] = {"sql": sql, "partitions": partitions,
                                      "result": None, "eval_ms": 0,
                                      "scan_table": scan_of,
                                      "lock": threading.Lock()}

    def _partition_rgs(self, table, partition: int, n: int):
        """Contiguous row-group range for one partition (contiguity
        keeps partition-order concatenation == full-scan order)."""
        nrg = table.num_row_groups
        per = (nrg + n - 1) // n
        return list(range(partition * per, min((partition + 1) * per, nrg)))

    def execute_partition_stream(self, handle: str, partition: int):
        """Yield result tables INCREMENTALLY.  Partitionable scans
        execute ONLY their own row groups, one row group at a time
        (streaming, bounded memory -- ref per-partition plan execution,
        service.rs:158-176 + client fan-out client_exec.rs:148-179);
        other plans execute once and slice (aggregate results are tiny).
        """
        ent = self.plans[handle]
        name = ent.get("scan_table")
        n = ent["partitions"]
        if name is not None:
            base = self.ctx._tables[name]
            t0 = time.perf_counter()
            produced = False
            for rg in self._partition_rgs(base, partition, n):
                ex = QueryExecutor(
                    {**self.ctx._tables, name: _RowGroupSlice(base, [rg])})
                out = ex.execute_sql(ent["sql"])
                produced = True
                yield out
            if not produced:
                # empty partition: still need a typed schema -> zero rgs
                ex = QueryExecutor(
                    {**self.ctx._tables, name: _RowGroupSlice(base, [])})
                yield ex.execute_sql(ent["sql"])
            ent["eval_ms"] += int((time.perf_counter() - t0) * 1000)
            return
        yield self.execute_partition(handle, partition)

    def execute_partition(self, handle: str, partition: int) -> pa.Table:
        ent = self.plans[handle]
        if ent.get("scan_table") is not None:
            parts = list(self.execute_partition_stream(handle, partition))
            return pa.concat_tables(parts, promote_options="permissive")
        with ent["lock"]:
            if ent["result"] is None:
                t0 = time.perf_counter()
                ent["result"] = self.ctx.sql(ent["sql"]).to_arrow()
                ent["eval_ms"] = int((time.perf_counter() - t0) * 1000)
        t = ent["result"]
        n = ent["partitions"]
        rows = t.num_rows
        per = (rows + n - 1) // n if n else rows
        return t.slice(partition * per, per)

    def prefetch(self, url: str, location: str,
                 rng: Optional[Tuple[int, int]] = None) -> int:
        """Pull object bytes into the byte cache ahead of the query
        (ref PrefetchFromObjectStore, lib.rs:273-300).  Returns bytes read."""
        store = self.stores[url]
        if rng is None:
            data = store.get(location)
        else:
            data = store.get_range(location, rng[0], rng[1] - rng[0])
        return len(data)

    def metrics(self, handle: str) -> rpc.ExecutionMetricsResponse:
        ent = self.plans.get(handle)
        st = self.cache.stats()
        return rpc.ExecutionMetricsResponse(
            pushdown_eval_time=ent["eval_ms"] if ent else 0,
            cache_memory_usage=st["memory_used"],
            liquid_cache_usage=st["memory_used"])

    def reset(self) -> None:
        with self._lock:
            self.plans.clear()
        self.cache.reset()


class _FlightServer(__import__("pyarrow.flight", fromlist=["x"]).FlightServerBase):
    """Arrow Flight front-end (ref LiquidCacheService, lib.rs:102-349):
    DoAction carries the control protocol (RegisterObjectStore /
    RegisterPlan / Prefetch / metrics / reset / stats as JSON bodies --
    the prost-message equivalents of common/rpc.py), DoGet executes one
    plan partition from a FetchResults ticket and streams record
    batches."""

    def __init__(self, location, inner):
        super().__init__(location)
        self.inner = inner

    def do_action(self, context, action):
        import json
        import pyarrow.flight as fl
        inner = self.inner
        body = action.body.to_pybytes() if action.body is not None else b""
        msg = json.loads(body or b"{}")
        t = action.type
        if t == "register_object_store":
            inner.register_object_store(msg["url"], msg.get("options", {}))
            out = {"ok": True}
        elif t == "register_plan":
            inner.register_plan(msg["plan"], msg["handle"],
                                msg.get("tables", {}),
                                msg.get("partitions", 1))
            out = {"ok": True, "partitions": msg.get("partitions", 1)}
        elif t == "prefetch":
            n = inner.prefetch(msg["url"], msg["location"],
                               tuple(msg["range"]) if msg.get("range")
                               else None)
            out = {"ok": True, "bytes": n}
        elif t == "execution_metrics":
            m = inner.metrics(msg.get("handle", ""))
            out = {"ok": True, "metrics": m.__dict__}
        elif t == "reset":
            inner.reset()
            out = {"ok": True}
        elif t == "stats":
            out = {"ok": True, "stats": inner.cache.stats()}
        else:
            raise fl.FlightServerError(f"unknown action {t!r}")
        yield fl.Result(json.dumps(out).encode())

    def do_get(self, context, ticket):
        import json
        import pyarrow.flight as fl
        msg = json.loads(ticket.ticket)
        # continue the client's trace (ref W3C traceparent decode,
        # datafusion-server lib.rs:215-217)
        with TRACER.remote_span("server.fetch",
                                msg.get("traceparent", ""),
                                handle=msg["handle"],
                                partition=msg["partition"]):
            gen = self.inner.execute_partition_stream(msg["handle"],
                                                      msg["partition"])
            first = next(gen)

        def batches():
            # batches materialize INCREMENTALLY per row group: the
            # client sees the first batch before later row groups are
            # even scanned (streaming, bounded memory)
            for b in first.to_batches():
                yield b
            for t in gen:
                for b in t.to_batches():
                    yield b

        return fl.GeneratorStream(first.schema, batches())


class LiquidCacheService:
    """Arrow Flight front-end over LiquidCacheServiceInner
    (ref lib.rs:102-349); `start()` serves on a daemon thread."""

    def __init__(self, cache, host: str = "127.0.0.1", port: int = 0,
                 byte_cache_dir: Optional[str] = None):
        self.inner = LiquidCacheServiceInner(cache, byte_cache_dir)
        self._srv = _FlightServer(f"grpc://{host}:{port}", self.inner)
        self.addr = (host, self._srv.port)
        self._thread: Optional[threading.Thread] = None

    def start(self) -> Tuple[str, int]:
        self._thread = threading.Thread(target=self._srv.serve, daemon=True)
        self._thread.start()
        return self.addr

    def stop(self) -> None:
        self._srv.shutdown()
