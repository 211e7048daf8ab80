"""Disaggregated-mode tests: client <-> server over localhost, mock
object store with access assertions, byte cache, admin endpoints.

Mirrors the reference's server tests (liquid-cache
`src/datafusion-server/src/tests/mod.rs:29-60`, `lib.rs:351-548`
server_actions_tests incl. the prefetch block-alignment case
`lib.rs:485-547`) and the MockStore suite (`mock_store.rs`).
"""
import json
import threading
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow

from liquid_tpu.cache import LiquidCacheBuilder
from liquid_tpu.common.object_store import (
    ByteCache, MockStore, StoreFile, sanitize_url,
)
from liquid_tpu.server import (
    AdminServer, LiquidCacheClientBuilder, LiquidCacheService,
)


def _make_parquet_bytes(n=20_000, seed=3):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "val": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        "name": pa.array(rng.choice(["alpha", "beta", "gamma"], n)),
    })
    import io
    sink = io.BytesIO()
    pq.write_table(t, sink)
    return t, sink.getvalue()


@pytest.fixture()
def served(tmp_path):
    t, data = _make_parquet_bytes()
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 26)
             .with_disk_path(str(tmp_path / "store.bin"))
             .build())
    srv = LiquidCacheService(cache, byte_cache_dir=str(tmp_path / "bc"))
    host, port = srv.start()
    yield srv, (host, port), t, data, tmp_path
    srv.stop()


def test_end_to_end_query(served):
    srv, (host, port), t, data, _ = served
    srv.inner.register_object_store("mock://b", {})
    srv.inner.stores["mock://b"].inner.put("hits.parquet", data) \
        if isinstance(srv.inner.stores["mock://b"], ByteCache) \
        else srv.inner.stores["mock://b"].put("hits.parquet", data)
    client = (LiquidCacheClientBuilder(host, port)
              .with_parquet_table("hits", "mock://b!hits.parquet")
              .build())
    out = client.sql("SELECT name, COUNT(*) AS c, SUM(val) AS s FROM hits "
                     "WHERE val > 500 GROUP BY name ORDER BY name")
    df = t.to_pandas()
    ref = (df[df.val > 500].groupby("name")
           .agg(c=("val", "size"), s=("val", "sum")).reset_index())
    assert out.column("name").to_pylist() == list(ref.name)
    assert out.column("c").to_pylist() == list(ref.c)
    assert out.column("s").to_pylist() == list(ref.s)
    m = client.last_metrics
    assert m.rows == len(ref) and m.batches >= 1
    assert m.time_to_first_batch_ms > 0


def test_plan_registered_once_across_threads(served):
    srv, (host, port), t, data, _ = served
    srv.inner.register_object_store("mock://b", {})
    _store_put(srv, "mock://b", "hits.parquet", data)
    client = (LiquidCacheClientBuilder(host, port)
              .with_parquet_table("hits", "mock://b!hits.parquet")
              .build())
    sql = "SELECT COUNT(*) AS c FROM hits"
    outs = [None] * 8

    def run(i):
        outs[i] = client.sql(sql)
    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    for o in outs:
        assert o.column("c")[0].as_py() == t.num_rows
    # the latch admitted exactly one registration (ref client_exec.rs:242-284)
    assert len(srv.inner.plans) == 1


def test_partitioned_streams(served):
    srv, (host, port), t, data, _ = served
    srv.inner.register_object_store("mock://b", {})
    _store_put(srv, "mock://b", "hits.parquet", data)
    client = (LiquidCacheClientBuilder(host, port)
              .with_parquet_table("hits", "mock://b!hits.parquet")
              .with_partitions(4)
              .build())
    out = client.sql("SELECT id FROM hits WHERE val <= 100 ORDER BY id")
    df = t.to_pandas()
    ref = sorted(df[df.val <= 100].id)
    assert sorted(out.column("id").to_pylist()) == ref


def test_execution_metrics_and_stats(served):
    srv, (host, port), t, data, _ = served
    srv.inner.register_object_store("mock://b", {})
    _store_put(srv, "mock://b", "hits.parquet", data)
    client = (LiquidCacheClientBuilder(host, port)
              .with_parquet_table("hits", "mock://b!hits.parquet")
              .build())
    sql = "SELECT SUM(val) AS s FROM hits"
    client.sql(sql)
    m = client.execution_metrics(sql)
    assert m.cache_memory_usage > 0
    st = client.server_stats()
    assert st["inserts"] > 0
    client.reset_cache()
    st2 = client.server_stats()
    assert st2["entries"] == 0


def test_server_side_error_propagates(served):
    srv, (host, port), *_ = served
    client = LiquidCacheClientBuilder(host, port).build()
    with pytest.raises(RuntimeError):
        client.sql("SELECT * FROM does_not_exist")


# -- mock store + byte cache ---------------------------------------------------

def test_mock_store_instrumentation():
    ms = MockStore({"a": b"0123456789"})
    assert ms.get_range("a", 2, 3) == b"234"
    assert ms.get("a") == b"0123456789"
    assert ms.get_access_count("a") == 2
    assert ms.get_access_ranges("a") == [(2, 5), (0, 10)]
    fork = ms.fork()
    assert fork.get_access_count("a") == 0
    assert fork.get("a") == b"0123456789"
    assert ms.get_access_count("a") == 2  # fork is isolated


def test_byte_cache_block_alignment(tmp_path):
    """Reads through the cache hit the upstream in aligned blocks and only
    once per block (ref prefetch block-alignment test, lib.rs:485-547)."""
    blob = bytes(range(256)) * 40  # 10240 bytes
    ms = MockStore({"obj": blob})
    bc = ByteCache(ms, str(tmp_path / "bc"), block_size=4096)
    assert bc.get_range("obj", 100, 50) == blob[100:150]
    assert ms.get_access_ranges("obj") == [(0, 4096)]  # aligned
    # same block again: served from disk cache, no upstream read
    assert bc.get_range("obj", 200, 100) == blob[200:300]
    assert ms.get_access_count("obj") == 1
    # spanning read: second + third block fetched once each
    assert bc.get_range("obj", 4000, 5000) == blob[4000:9000]
    assert ms.get_access_count("obj") == 3
    assert bc.cached_blocks("obj") == 3
    assert bc.disk_usage() == 4096 + 4096 + (10240 - 8192)
    # whole-object read: only the last block remains to fetch
    assert bc.get("obj") == blob


def test_store_file_parquet_roundtrip(tmp_path):
    t, data = _make_parquet_bytes(5000)
    ms = MockStore({"f.parquet": data})
    bc = ByteCache(ms, str(tmp_path / "bc"))
    got = pq.read_table(StoreFile(bc, "f.parquet"))
    assert got.equals(t)


def test_prefetch_warms_byte_cache(served):
    srv, (host, port), t, data, tmp = served
    srv.inner.register_object_store("mock://b", {})
    _store_put(srv, "mock://b", "hits.parquet", data)
    client = (LiquidCacheClientBuilder(host, port)
              .with_parquet_table("hits", "mock://b!hits.parquet")
              .build())
    n = client.prefetch("mock://b", "hits.parquet")
    assert n == len(data)
    store = srv.inner.stores["mock://b"]
    upstream = store.inner
    before = upstream.get_access_count("hits.parquet")
    client.sql("SELECT COUNT(*) AS c FROM hits")
    # the query was served from the byte cache: no new upstream reads
    assert upstream.get_access_count("hits.parquet") == before


def test_sanitize_url():
    assert sanitize_url("s3://bucket/a b!") == "s3___bucket_a_b_"


# -- admin server ---------------------------------------------------------------

def _http(addr, path):
    with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}{path}") as r:
        body = r.read()
    try:
        return json.loads(body)
    except ValueError:
        return body.decode()


def test_admin_endpoints(served):
    srv, (host, port), t, data, tmp = served
    admin = AdminServer(srv.inner)
    aaddr = admin.start()
    try:
        srv.inner.register_object_store("mock://b", {})
        _store_put(srv, "mock://b", "hits.parquet", data)
        client = (LiquidCacheClientBuilder(host, port)
                  .with_parquet_table("hits", "mock://b!hits.parquet")
                  .build())
        _http(aaddr, "/start_trace")
        client.sql("SELECT COUNT(*) AS c FROM hits WHERE val < 10")
        stats = _http(aaddr, "/cache_stats")
        assert stats["inserts"] > 0
        info = _http(aaddr, "/cache_info")
        assert info["memory_usage_bytes"] > 0
        sysinfo = _http(aaddr, "/system_info")
        assert sysinfo["pid"] > 0
        trace = _http(aaddr, "/stop_trace")
        assert len(trace["trace"]) > 0
        plans = _http(aaddr, "/execution_plans")
        assert len(plans) == 1 and list(plans.values())[0]["executed"]
        usage = _http(aaddr, "/parquet_cache_usage")
        assert usage["memory_used"] > 0
        _http(aaddr, "/start_disk_usage_monitor?path=" + str(tmp))
        mon = _http(aaddr, "/stop_disk_usage_monitor")
        assert len(mon["samples"]) >= 1
        _http(aaddr, "/reset_cache")
        assert _http(aaddr, "/cache_stats")["entries"] == 0
        with pytest.raises(urllib.error.HTTPError):
            _http(aaddr, "/nope")
    finally:
        admin.stop()


def test_admin_flamegraph(served):
    srv, *_ = served
    admin = AdminServer(srv.inner)
    aaddr = admin.start()
    try:
        _http(aaddr, "/start_flamegraph")
        # generate some work to sample
        t_end = [0]

        def busy():
            x = 0
            for i in range(3_000_000):
                x += i
            t_end[0] = x
        th = threading.Thread(target=busy)
        th.start()
        th.join()
        folded = _http(aaddr, "/stop_flamegraph")
        assert isinstance(folded, str)
    finally:
        admin.stop()


def test_trace_flush_parquet(served, tmp_path):
    srv, (host, port), t, data, _ = served
    admin = AdminServer(srv.inner)
    aaddr = admin.start()
    try:
        srv.inner.register_object_store("mock://b", {})
        _store_put(srv, "mock://b", "hits.parquet", data)
        client = (LiquidCacheClientBuilder(host, port)
                  .with_parquet_table("hits", "mock://b!hits.parquet")
                  .build())
        _http(aaddr, "/start_trace")
        # needs a filter: bare COUNT(*) is answered from metadata alone
        client.sql("SELECT COUNT(*) AS c FROM hits WHERE val > 3")
        out = str(tmp_path / "trace.parquet")
        res = _http(aaddr, f"/stop_trace?path={out}")
        assert res["flushed"] > 0
        tr = pq.read_table(out)
        assert set(tr.column_names) == {"ts", "op", "entry_id", "nbytes"}
        assert tr.num_rows == res["flushed"]
    finally:
        admin.stop()


def _store_put(srv, url, path, data):
    store = srv.inner.stores[url]
    upstream = store.inner if isinstance(store, ByteCache) else store
    upstream.put(path, data)
