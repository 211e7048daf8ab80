"""Variant/JSON shredding tests.

Mirrors the reference's variant suites (liquid-cache
`src/datafusion-local/tests/variants.rs`, `variant_array.rs` unit
tests, `policies/squeeze.rs:222-290` try_variant_squeeze).
"""
import json

import numpy as np
import pyarrow as pa
import pytest

from liquid_tpu.arrays import variant as vlib
from liquid_tpu.cache import (
    LiquidCacheBuilder, MEMORY_SQUEEZED, VariantGet,
)
from liquid_tpu.cache.expressions import HintVote, parse_hint


def make_json_column(n=100, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        doc = {"user": {"id": int(rng.integers(0, 1000)),
                        "name": f"user{i}"},
               "score": float(rng.random()) if i % 3 else int(i),
               "tags": [f"t{i % 5}", f"t{i % 7}"],
               "flag": bool(i % 2)}
        if i % 10 == 0:
            del doc["score"]
        rows.append(json.dumps(doc))
    if n > 5:
        rows[5] = None  # null variant
    return pa.array(rows, type=pa.string())


# -- path parsing / extraction ----------------------------------------------

def test_parse_path():
    assert vlib.parse_path("a.b.c") == ("a", "b", "c")
    assert vlib.parse_path("$.a[0].c") == ("a", 0, "c")
    assert vlib.parse_path("tags[1]") == ("tags", 1)


def test_extract_typed_paths():
    arr = make_json_column(30)
    docs = vlib.parse_docs(arr)
    st = vlib.extract_paths(docs, [("user.id", "int64"),
                                   ("user.name", "utf8"),
                                   ("flag", "bool"),
                                   ("tags[0]", "utf8")])
    ids = st.field(0).to_pylist()
    for i, d in enumerate(docs):
        if d is None:
            assert ids[i] is None
        else:
            assert ids[i] == d["user"]["id"]
    names = st.field(1).to_pylist()
    assert names[0] == "user0"
    assert st.field(3).to_pylist()[0] == "t0"


def test_type_mismatch_is_null():
    arr = pa.array([json.dumps({"x": "str"}), json.dumps({"x": 3}),
                    json.dumps({"x": 1.5}), json.dumps({"x": True})])
    docs = vlib.parse_docs(arr)
    st = vlib.extract_paths(docs, [("x", "int64"), ("x", "utf8"),
                                   ("x", "float64"), ("x", "bool")])
    assert st.field(0).to_pylist() == [None, 3, None, None]
    assert st.field(1).to_pylist() == ["str", None, None, None]
    assert st.field(2).to_pylist() == [None, 3.0, 1.5, None]
    assert st.field(3).to_pylist() == [None, None, None, True]


def test_untyped_variant_returns_json():
    arr = pa.array([json.dumps({"a": {"b": [1, 2]}})])
    docs = vlib.parse_docs(arr)
    st = vlib.extract_paths(docs, [("a", "variant")])
    assert json.loads(st.field(0)[0].as_py()) == {"b": [1, 2]}


def test_contains_path():
    arr = pa.array([json.dumps({"a": 1}), json.dumps({"b": 2}),
                    json.dumps({"a": None}), None])
    docs = vlib.parse_docs(arr)
    got = vlib.contains_path_docs(docs, "a").to_pylist()
    assert got == [True, False, True, None]


# -- shred / squeeze round trip ----------------------------------------------

class _MemIo:
    def __init__(self, data: bytes):
        self.data = data
        self.reads = 0

    def read(self, rng):
        self.reads += 1
        if rng is None:
            return self.data
        off, ln = rng
        return self.data[off:off + ln]


def test_shred_variant_roundtrip():
    arr = make_json_column(64)
    sq, backing = vlib.shred_variant(arr, [("user.id", "int64"),
                                           ("user.name", "utf8")])
    assert sq.contains_path("user.id", "int64")
    assert not sq.contains_path("score", "float64")
    io = _MemIo(backing)
    # resident paths: zero IO
    st, used_io = sq.to_arrow_with_paths(
        [("user.id", "int64"), ("user.name", "utf8")], io)
    assert not used_io and io.reads == 0
    docs = vlib.parse_docs(arr)
    expect = vlib.extract_paths(docs, [("user.id", "int64"),
                                       ("user.name", "utf8")])
    assert st.field(0).to_pylist() == expect.field(0).to_pylist()
    assert st.field(1).to_pylist() == expect.field(1).to_pylist()
    # non-resident path: needs IO
    st2, used_io2 = sq.to_arrow_with_paths([("score", "float64")], io)
    assert used_io2 and io.reads == 1
    # full column from disk
    full = sq.to_arrow(io)
    assert full.to_pylist() == arr.to_pylist()


def test_merged_with_unions_paths():
    arr = make_json_column(32)
    sq, backing = vlib.shred_variant(arr, [("user.id", "int64")])
    io = _MemIo(backing)
    merged = sq.merged_with([("flag", "bool")], io)
    assert merged.contains_path("user.id", "int64")
    assert merged.contains_path("flag", "bool")


# -- hint plumbing ------------------------------------------------------------

def test_hint_parse_and_merge():
    h = parse_hint("variant_get:a.b@int64,c")
    assert h == VariantGet((("a.b", "int64"), ("c", "variant")))
    v = HintVote()
    v.record(VariantGet((("a", "int64"),)))
    v.record(VariantGet((("b", "utf8"),)))
    got = v.majority()
    assert isinstance(got, VariantGet)
    assert set(got.requests) == {("a", "int64"), ("b", "utf8")}


# -- cache integration ---------------------------------------------------------

def _mk_cache(tmp_path, mem=1 << 20):
    return (LiquidCacheBuilder()
            .with_max_memory_bytes(mem)
            .with_disk_path(str(tmp_path / "store.bin"))
            .build())


def test_cache_variant_squeeze_and_zero_io_read(tmp_path):
    cache = _mk_cache(tmp_path)
    arr = make_json_column(200)
    hint = VariantGet((("user.id", "int64"), ("user.name", "utf8")))
    cache.insert(1, arr, hint=hint)
    # variant columns stay arrow until squeezed
    assert cache.entry_state(1) == "memory_arrow"
    cache._squeeze_victim(1)
    assert cache.entry_state(1) == MEMORY_SQUEEZED

    reads_before = cache.observer.stats.get("squeeze_io_reads")
    st = cache.get_variant_paths(1, [("user.id", "int64")])
    assert st is not None
    assert cache.observer.stats.get("squeeze_io_reads") == reads_before
    docs = vlib.parse_docs(arr)
    expect = vlib.extract_paths(docs, [("user.id", "int64")])
    assert st.field(0).to_pylist() == expect.field(0).to_pylist()


def test_cache_variant_merge_on_new_path(tmp_path):
    cache = _mk_cache(tmp_path)
    arr = make_json_column(100)
    hint = VariantGet((("user.id", "int64"),))
    cache.insert(7, arr, hint=hint)
    cache._squeeze_victim(7)
    # new path: one IO to re-shred, then resident
    st = cache.get_variant_paths(7, [("flag", "bool")])
    assert st is not None
    st2 = cache.get_variant_paths(7, [("flag", "bool"), ("user.id", "int64")])
    assert st2 is not None
    e = cache._entries[7]
    assert e.payload.contains_path("flag", "bool")
    assert e.payload.contains_path("user.id", "int64")


def test_cache_variant_full_read_after_squeeze(tmp_path):
    cache = _mk_cache(tmp_path)
    arr = make_json_column(50)
    cache.insert(3, arr, hint=VariantGet((("user.id", "int64"),)))
    cache._squeeze_victim(3)
    got = cache.get(3)
    assert got.to_pylist() == arr.to_pylist()


def test_variant_squeeze_to_disk_and_back(tmp_path):
    """Squeezed variant -> disk (arrow backing) -> read."""
    cache = _mk_cache(tmp_path)
    arr = make_json_column(50)
    cache.insert(4, arr, hint=VariantGet((("user.id", "int64"),)))
    cache._squeeze_victim(4)   # arrow -> squeezed
    cache._squeeze_victim(4)   # squeezed -> disk (arrow bytes)
    assert cache.entry_state(4) == "disk_arrow"
    got = cache.get(4)
    assert got.to_pylist() == arr.to_pylist()


def test_variant_eviction_under_pressure(tmp_path):
    """Tiny budget: inserts squeeze variant entries through the pipeline."""
    cache = _mk_cache(tmp_path, mem=40_000)
    hint = VariantGet((("user.id", "int64"),))
    arrays = {}
    for i in range(12):
        arr = make_json_column(300, seed=i)
        arrays[i] = arr
        cache.insert(i, arr, hint=hint)
    for i in range(12):
        got = cache.get(i)
        if got is not None:
            assert got.to_pylist() == arrays[i].to_pylist()


def _sql(sess, q):
    return sess.sql(q).to_arrow()


# -- SQL UDFs ----------------------------------------------------------------

@pytest.fixture()
def variant_session(tmp_path):
    import pyarrow.parquet as pq
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    n = 300
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        rows.append(json.dumps({
            "user": {"id": int(rng.integers(0, 50)), "name": f"u{i % 20}"},
            "score": float(np.round(rng.random(), 6)),
            "active": bool(i % 3 == 0),
        }))
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "payload": pa.array(rows, pa.string())})
    path = tmp_path / "variants.parquet"
    pq.write_table(t, str(path))
    sess, _cache = (LiquidCacheLocalBuilder()
                    .with_max_memory_bytes(1 << 24)
                    .with_cache_dir(str(tmp_path))
                    .build())
    sess.register_parquet("events", str(path))
    return sess, t


def test_sql_variant_get(variant_session):
    sess, t = variant_session
    out = _sql(sess, "SELECT variant_get(payload, 'user.id', 'int64') AS uid "
                   "FROM events WHERE id < 10")
    docs = [json.loads(s) for s in t.column("payload").to_pylist()[:10]]
    assert out.column("uid").to_pylist() == [d["user"]["id"] for d in docs]


def test_sql_variant_get_aggregate(variant_session):
    sess, t = variant_session
    out = _sql(sess, 
        "SELECT variant_get(payload, 'user.name', 'utf8') AS nm, COUNT(*) AS c "
        "FROM events GROUP BY nm ORDER BY nm")
    docs = [json.loads(s) for s in t.column("payload").to_pylist()]
    from collections import Counter
    expect = Counter(d["user"]["name"] for d in docs)
    got = dict(zip(out.column("nm").to_pylist(), out.column("c").to_pylist()))
    assert got == dict(expect)


def test_sql_variant_filter(variant_session):
    sess, t = variant_session
    out = _sql(sess, "SELECT COUNT(*) AS c FROM events "
                   "WHERE variant_get(payload, 'active', 'bool')")
    docs = [json.loads(s) for s in t.column("payload").to_pylist()]
    assert out.column("c")[0].as_py() == sum(1 for d in docs if d["active"])


def test_sql_variant_served_from_squeezed(variant_session):
    """After squeeze, variant_get queries are served from the shredded
    resident paths (squeeze_io_saved grows, not squeeze_io_reads)."""
    sess, _ = variant_session
    q = ("SELECT SUM(variant_get(payload, 'user.id', 'int64')) AS s "
         "FROM events")
    first = _sql(sess, q)
    # squeeze every memory entry once: arrow -> shredded variant
    for eid in list(sess.cache._entries):
        sess.cache._squeeze_victim(eid)
    states = {sess.cache.entry_state(e) for e in sess.cache._entries}
    assert "memory_squeezed" in states
    saved_before = sess.cache.observer.stats.get("squeeze_io_saved")
    reads_before = sess.cache.observer.stats.get("squeeze_io_reads")
    second = _sql(sess, q)
    assert first.column("s")[0].as_py() == second.column("s")[0].as_py()
    assert sess.cache.observer.stats.get("squeeze_io_saved") > saved_before
    assert sess.cache.observer.stats.get("squeeze_io_reads") == reads_before


def test_sql_variant_pretty_and_to_json(variant_session):
    sess, t = variant_session
    out = _sql(sess, "SELECT variant_to_json(payload) AS j, "
                   "variant_pretty(payload) AS p FROM events WHERE id = 0")
    src = json.loads(t.column("payload")[0].as_py())
    assert json.loads(out.column("j")[0].as_py()) == src
    assert json.loads(out.column("p")[0].as_py()) == src
    assert "\n" in out.column("p")[0].as_py()
