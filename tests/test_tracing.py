"""Span tracing tests: decorator/context spans, W3C propagation across
the client/server boundary, chrome-trace export.

Ref: liquid-cache's fastrace spans + traceparent propagation
(SURVEY.md section 5; rpc.rs:203, client_exec.rs:286-292,
lib.rs:215-217) and Jaeger/OTLP export.
"""
import json

import numpy as np
import pyarrow as pa
import pytest

from liquid_tpu.utils.tracing import TRACER, Tracer


@pytest.fixture(autouse=True)
def clean_tracer():
    TRACER.reset()
    TRACER.enable()
    yield
    TRACER.disable()
    TRACER.reset()


def test_span_nesting_and_attrs():
    with TRACER.span("outer", q=1) as o:
        with TRACER.span("inner") as i:
            pass
    spans = {s.name: s for s in TRACER.spans()}
    assert spans["inner"].parent_id == spans["outer"].span_id
    assert spans["inner"].trace_id == spans["outer"].trace_id
    assert spans["outer"].attrs["q"] == 1
    assert spans["outer"].end >= spans["inner"].end


def test_trace_decorator_noop_when_disabled():
    t = Tracer()

    @t.trace("f")
    def f(x):
        return x + 1
    assert f(1) == 2
    assert t.spans() == []
    t.enable()
    assert f(2) == 3
    assert [s.name for s in t.spans()] == ["f"]


def test_remote_span_continues_trace():
    with TRACER.span("client") as c:
        tp = TRACER.current_traceparent()
    with TRACER.remote_span("server", tp):
        pass
    spans = {s.name: s for s in TRACER.spans()}
    assert spans["server"].trace_id == spans["client"].trace_id
    assert spans["server"].parent_id == spans["client"].span_id


def test_chrome_trace_export(tmp_path):
    with TRACER.span("a"):
        pass
    out = str(tmp_path / "trace.json")
    n = TRACER.export_chrome_trace(out)
    assert n >= 1
    data = json.load(open(out))
    ev = data["traceEvents"][0]
    assert ev["ph"] == "X" and ev["dur"] >= 0


def test_end_to_end_propagation_through_server(tmp_path):
    """client.sql span -> traceparent on the wire -> server.fetch span in
    the same trace; cache spans appear under the server span."""
    import pyarrow.parquet as pq
    from liquid_tpu.cache import LiquidCacheBuilder
    from liquid_tpu.server import LiquidCacheClientBuilder, LiquidCacheService
    t = pa.table({"v": pa.array(np.arange(9000, dtype=np.int64))})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    cache = (LiquidCacheBuilder()
             .with_disk_path(str(tmp_path / "s.bin")).build())
    srv = LiquidCacheService(cache)
    host, port = srv.start()
    try:
        client = (LiquidCacheClientBuilder(host, port)
                  .with_parquet_table("t", p).build())
        out = client.sql("SELECT COUNT(*) AS c FROM t WHERE v > 100")
        assert out.column("c")[0].as_py() == 8899
    finally:
        srv.stop()
    spans = TRACER.spans()
    by_name = {}
    for s in spans:
        by_name.setdefault(s.name, []).append(s)
    assert "client.sql" in by_name and "server.fetch" in by_name
    csql = by_name["client.sql"][0]
    sfetch = by_name["server.fetch"][0]
    assert sfetch.trace_id == csql.trace_id, "trace did not propagate"
    assert sfetch.parent_id == csql.span_id
    # cache hot-path spans recorded under the server's execution
    assert "cache.insert" in by_name
    assert ("cache.eval_predicate" in by_name
            or "cache.eval_predicate_many" in by_name
            # round 4: the whole-query fused program subsumes the
            # per-block predicate spans for aggregate shapes
            or "sql.fused_aggregate" in by_name)
    assert by_name["cache.insert"][0].trace_id == csql.trace_id
