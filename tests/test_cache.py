"""Cache runtime tests.

Mirrors reference tests in core.rs:965-1366, budget.rs:104-219,
policies snapshot tests, and the eviction/squeeze event sequences.
"""
import numpy as np
import pyarrow as pa
import pytest

from liquid_tpu.arrays import Predicate
from liquid_tpu.cache import (
    DISK_LIQUID, MEMORY_LIQUID, MEMORY_SQUEEZED,
    ExtractDate32, LiquidCacheBuilder, LiquidPolicy, TranscodeSqueezeEvict,
)
from liquid_tpu.cache.budget import BudgetAccounting
from liquid_tpu.cache.policies import ARROW, DISK, LIQUID, SQUEEZED
from liquid_tpu.ops import mask as mops


@pytest.fixture
def cache(tmp_path):
    return (LiquidCacheBuilder()
            .with_max_memory_bytes(1 << 30)
            .with_disk_path(str(tmp_path / "store.bin"))
            .with_trace_events()
            .build())


def _ints(n=1000, seed=0, lo=0, hi=1000):
    rng = np.random.default_rng(seed)
    return pa.array(rng.integers(lo, hi, n), type=pa.int64())


def test_insert_get_roundtrip(cache):
    arr = _ints()
    assert cache.insert(1, arr)
    assert cache.entry_state(1) == MEMORY_LIQUID
    out = cache.get(1)
    assert out.equals(arr)


def test_get_with_selection(cache):
    arr = _ints(100)
    cache.insert(1, arr)
    import jax.numpy as jnp
    sel = np.zeros(8192, bool)
    sel[[5, 50]] = True
    out = cache.get(1, selection=mops.pack_bools(jnp.asarray(sel)))
    assert out.to_pylist() == [arr[5].as_py(), arr[50].as_py()]


def test_eval_predicate_on_encoded(cache):
    arr = _ints(2000, seed=3)
    cache.insert(7, arr)
    bm = cache.eval_predicate(7, Predicate("gt", 500))
    got = np.asarray(mops.unpack_bits(bm.to_selection()))[:2000]
    np.testing.assert_array_equal(got, np.asarray(arr) > 500)
    assert cache.stats()["predicate_evals_on_encoded"] == 1


def test_miss_returns_none(cache):
    assert cache.get(99) is None
    assert cache.eval_predicate(99, Predicate("eq", 1)) is None
    assert cache.stats()["cache_misses"] == 1


def test_eviction_squeeze_pipeline(tmp_path):
    # tiny budget: inserting several blocks must walk entries down the
    # Arrow->Liquid->Squeezed->Disk ladder without losing data
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(30_000)
             .with_disk_path(str(tmp_path / "s.bin"))
             .with_trace_events()
             .build())
    arrays = {i: _ints(8192, seed=i, hi=100_000) for i in range(6)}
    for i, arr in arrays.items():
        cache.insert(i, arr)
    st = cache.stats()
    assert st["squeezes"] > 0
    # every entry still readable and exact
    for i, arr in arrays.items():
        out = cache.get(i)
        assert out is not None and out.equals(arr), f"entry {i}"


def test_squeezed_predicate_zero_io(tmp_path):
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 30)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    arr = _ints(8192, hi=1 << 20)
    cache.insert(1, arr)
    # force one squeeze step: liquid -> squeezed
    cache._squeeze_victim(1)
    assert cache.entry_state(1) == MEMORY_SQUEEZED
    before = cache.stats()["squeeze_io_reads"]
    bm = cache.eval_predicate(1, Predicate("ne", -5))  # decidable: all true
    got = np.asarray(mops.unpack_bits(bm.to_selection()))[:8192]
    assert got.all()
    assert cache.stats()["squeeze_io_reads"] == before  # no disk IO
    assert cache.stats()["squeeze_io_saved"] >= 1


def test_date32_squeeze_hint_component_read(tmp_path):
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 30)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    days = pa.array(np.arange(19000, 19600).astype("datetime64[D]"))
    assert days.type == pa.date32()
    cache.insert(1, days, hint=ExtractDate32("year"))
    cache._squeeze_victim(1)
    assert cache.entry_state(1) == MEMORY_SQUEEZED
    out = cache.get_component(1, "year")
    assert out is not None
    vals, _ = out
    years = np.asarray(vals)[:600]
    import datetime
    expected = np.array([
        (datetime.date(1970, 1, 1) + datetime.timedelta(days=int(d))).year
        for d in range(19000, 19600)])
    np.testing.assert_array_equal(years, expected)


def test_flush_all_to_disk_and_readback(tmp_path):
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 30)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    arrays = {i: _ints(500, seed=i) for i in range(4)}
    for i, a in arrays.items():
        cache.insert(i, a)
    cache.flush_all_to_disk()
    for i in range(4):
        assert cache.entry_state(i) == DISK_LIQUID
    assert cache.budget.memory_used == 0
    for i, a in arrays.items():
        assert cache.get(i).equals(a)


def test_hydration_promotes(tmp_path):
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 30)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    arr = _ints(100)
    cache.insert(1, arr)
    cache.flush_all_to_disk()
    assert cache.entry_state(1) == DISK_LIQUID
    cache.get(1)
    assert cache.entry_state(1) == MEMORY_LIQUID  # AlwaysHydrate
    assert cache.stats()["hydrations"] == 1


def test_disk_budget_evicts(tmp_path):
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(10_000)
             .with_max_disk_bytes(100_000)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    for i in range(30):
        cache.insert(i, _ints(8192, seed=i, hi=1 << 30))
    st = cache.stats()
    assert cache.budget.disk_used <= 100_000
    assert st["removes"] > 0  # disk victims dropped


def test_reset(cache):
    cache.insert(1, _ints())
    cache.reset()
    assert cache.get(1) is None
    assert cache.budget.memory_used == 0


def test_strings_through_cache(cache):
    arr = pa.array(["foo", "bar", None, "foobar"] * 100, type=pa.string())
    cache.insert(5, arr)
    out = cache.get(5)
    assert out.cast(pa.string()).equals(arr) or out.equals(arr)
    bm = cache.eval_predicate(5, Predicate("contains", "oo"))
    got = np.asarray(mops.unpack_bits(bm.to_selection()))[:400]
    import pyarrow.compute as pc
    np.testing.assert_array_equal(
        got, np.asarray(pc.match_substring(arr, "oo").fill_null(False)))


def test_event_trace_sequence(tmp_path):
    """Squeeze event sequences (ref snapshot tests in cache/tests/)."""
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 30)
             .with_disk_path(str(tmp_path / "s.bin"))
             .with_trace_events()
             .build())
    cache.insert(1, _ints(8192, hi=1 << 20))
    cache._squeeze_victim(1)   # liquid -> squeezed (writes backing)
    cache._squeeze_victim(1)   # squeezed -> disk
    kinds = [e.kind for e in cache.observer.consume_event_trace()]
    assert kinds == ["Transcode", "Insert", "DiskWrite", "Squeeze", "Squeeze"] or \
        kinds == ["Transcode", "Insert", "Squeeze", "Squeeze"], kinds


def test_budget_accounting():
    b = BudgetAccounting(100, 50)
    assert b.try_reserve_memory(60)
    assert not b.try_reserve_memory(60)
    assert b.try_reserve_memory(40)
    b.release_memory(100)
    assert b.memory_used == 0
    assert b.try_reserve_disk(50)
    assert not b.try_reserve_disk(1)
    b.release_disk(50)
    assert b.try_update_memory_usage(0, 100)
    assert not b.try_update_memory_usage(100, 101)
    b.force_update_memory_usage(100, 101)
    assert b.memory_used == 101


def test_liquid_policy_order():
    """Arrow victims first, then liquid, then squeezed; advised once."""
    p = LiquidPolicy()
    p.notify_inserted(1, LIQUID)
    p.notify_inserted(2, ARROW)
    p.notify_inserted(3, SQUEEZED)
    p.notify_inserted(4, ARROW)
    assert p.find_memory_victims(3) == [2, 4, 1]
    assert p.find_memory_victims(3) == [3]
    assert p.find_memory_victims(3) == []  # each advised at most once
    p.notify_inserted(5, DISK)
    assert p.find_disk_victims(2) == [5]


def test_concurrent_inserts(tmp_path):
    """Concurrent inserts under pressure keep accounting sane
    (ref shuttle test core.rs:1118-1178)."""
    import threading
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(60_000)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    errs = []

    def worker(base):
        try:
            for i in range(10):
                cache.insert(base * 100 + i, _ints(4096, seed=base * 100 + i))
        except Exception as ex:  # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert cache.budget.memory_used >= 0
    # every entry present somewhere (memory or disk) must read back
    readable = sum(1 for b in range(4) for i in range(10)
                   if cache.get(b * 100 + i) is not None)
    assert readable >= 1


# -- batch zone maps (page-index-pruning equivalent) -------------------------

def test_zone_map_pruning(tmp_path):
    """After the first scan builds zone maps, selective predicates skip
    whole batches without touching encoded data (ref page-index pruning,
    opener.rs:314-327, at our batch granularity)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder

    n = 80_000  # ~10 batches, values strictly increasing -> disjoint zones
    t = pa.table({"v": pa.array(np.arange(n, dtype=np.int64)),
                  "w": pa.array(np.ones(n, dtype=np.int64))})
    p = str(tmp_path / "z.parquet")
    pq.write_table(t, p, row_group_size=n)
    sess, cache = (LiquidCacheLocalBuilder()
                   .with_cache_dir(str(tmp_path)).build())
    sess.register_parquet("t", p)
    table = sess._tables["t"]

    q = "SELECT SUM(w) AS s FROM t WHERE v >= 79000"
    out1 = sess.sql(q).to_arrow()
    assert out1.column("s")[0].as_py() == 1000
    # zones are recorded when the row group first loads; every LATER scan
    # prunes the batches whose zone disproves the predicate
    evals_before = cache.observer.stats.get("predicate_evals")
    out2 = sess.sql(q).to_arrow()
    assert out2.column("s")[0].as_py() == 1000
    assert table.zone_prunes >= 8, "zone maps did not prune"
    # pruned batches cost no predicate evaluations on the warm scan
    evals = cache.observer.stats.get("predicate_evals") - evals_before
    assert evals <= 2


def test_quantized_integer_squeeze(tmp_path):
    """IntegerSqueezePolicy::Quantize: bucketized resident form decides
    predicates IO-free unless the literal's own bucket is occupied
    (ref hybrid_primitive_array.rs:429-437, design/03-squeeze-integer.md)."""
    import numpy as np
    import pyarrow as pa
    from liquid_tpu.arrays.base import Predicate
    from liquid_tpu.cache import LiquidCacheBuilder

    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 24)
             .with_disk_path(str(tmp_path / "s.bin"))
             .with_integer_squeeze_policy("quantize")
             .build())
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 100_000, 8192)
    cache.insert(1, pa.array(vals))
    cache._squeeze_victim(1)
    assert cache.entry_state(1) == "memory_squeezed"
    from liquid_tpu.arrays.hybrid import SqueezedQuantizedArray
    assert isinstance(cache._entries[1].payload, SqueezedQuantizedArray)

    from liquid_tpu.ops import mask as mops
    for op, lit, np_op in [("gt", 50_000, np.greater),
                           ("lt", 30_000, np.less),
                           ("lt_eq", 99_999, np.less_equal),
                           ("eq", int(vals[5]), np.equal),
                           ("ne", 12_345, np.not_equal)]:
        out = cache.eval_predicate(1, Predicate(op, lit))
        assert out is not None, (op, lit)
        got = np.asarray(mops.unpack_bits(out.to_selection()))[:8192]
        np.testing.assert_array_equal(got, np_op(vals, lit), err_msg=op)

    # exact round trip through the backing
    assert cache.get(1).to_pylist() == vals.tolist()
