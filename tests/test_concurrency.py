"""Deterministic-ish concurrency tests for the host cache runtime.

The reference uses shuttle schedule exploration (liquid-cache
`src/core/src/sync.rs`, `utils/mod.rs:156-188`, CI `--features shuttle`)
with invariants like "each entry advised for eviction at most once"
(policies/cache/mod.rs:41-95), concurrent budget accounting
(budget.rs:133-201) and concurrent inserts (core.rs:1118-1178).
Python has no shuttle; we get schedule diversity from a tiny
sys.setswitchinterval + seeded thread workloads, and assert the same
invariants.
"""
import sys
import threading

import numpy as np
import pyarrow as pa
import pytest

from liquid_tpu.cache import LiquidCacheBuilder
from liquid_tpu.cache.budget import BudgetAccounting
from liquid_tpu.cache.policies import LiquidPolicy


@pytest.fixture(autouse=True)
def tight_switch_interval():
    old = sys.getswitchinterval()
    sys.setswitchinterval(1e-5)  # force frequent preemption
    yield
    sys.setswitchinterval(old)


def _ints(n=8192, seed=0):
    rng = np.random.default_rng(seed)
    return pa.array(rng.integers(0, 1000, n).astype(np.int64))


def test_budget_concurrent_accounting():
    """N threads reserve/release; usage never exceeds the budget and ends
    at zero (ref budget.rs:133-201)."""
    b = BudgetAccounting(10_000)
    errors = []

    def work(seed):
        rng = np.random.default_rng(seed)
        held = []
        for _ in range(500):
            n = int(rng.integers(1, 500))
            if b.try_reserve_memory(n):
                if b.memory_used > 10_000:
                    errors.append(f"over budget: {b.memory_used}")
                held.append(n)
            if held and rng.random() < 0.5:
                b.release_memory(held.pop())
        for n in held:
            b.release_memory(n)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert b.memory_used == 0


def test_policy_advises_each_entry_once():
    """Concurrent find_memory_victims never yields the same entry twice
    between notifications (ref policies/cache/mod.rs:41-95)."""
    pol = LiquidPolicy()
    for i in range(2000):
        pol.notify_inserted(i, "arrow")
    seen = []
    lock = threading.Lock()

    def drain():
        while True:
            vs = pol.find_memory_victims(7)
            if not vs:
                return
            with lock:
                seen.extend(vs)

    threads = [threading.Thread(target=drain) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(seen) == 2000
    assert len(set(seen)) == 2000, "an entry was advised twice"


def test_concurrent_inserts_under_pressure(tmp_path):
    """8 threads insert disjoint entries into a tiny cache; every entry
    is either readable with exact bytes or cleanly absent
    (ref concurrent inserts, core.rs:1118-1178)."""
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(80_000)
             .with_max_disk_bytes(1 << 20)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    data = {}
    errors = []

    def work(tid):
        for k in range(12):
            eid = tid * 100 + k
            arr = _ints(seed=eid)
            data[eid] = arr
            try:
                cache.insert(eid, arr)
            except Exception as ex:  # noqa: BLE001
                errors.append(f"insert {eid}: {ex}")

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    present = 0
    for eid, arr in data.items():
        got = cache.get(eid)
        if got is not None:
            present += 1
            assert got.to_pylist() == arr.to_pylist(), f"entry {eid} corrupt"
    assert present > 0
    # budgets consistent after the storm
    assert 0 <= cache.budget.memory_used <= 80_000


def test_concurrent_insert_get_same_entries(tmp_path):
    """Writers re-insert while readers get + eval predicates: no crashes,
    reads always return a full block of the right length."""
    from liquid_tpu.arrays.base import Predicate
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(200_000)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    arrs = {i: _ints(seed=i) for i in range(6)}
    for i, a in arrs.items():
        cache.insert(i, a)
    stop = threading.Event()
    errors = []

    def writer():
        k = 0
        while not stop.is_set():
            i = k % 6
            cache.insert(i, arrs[i])
            k += 1

    def reader(seed):
        rng = np.random.default_rng(seed)
        for _ in range(300):
            i = int(rng.integers(0, 6))
            got = cache.get(i)
            if got is not None and len(got) != 8192:
                errors.append(f"bad length {len(got)}")
            out = cache.eval_predicate(i, Predicate("gt", 500))
            if out is not None:
                from liquid_tpu.ops import mask as mops
                n = int(mops.count(out.to_selection()))
                expect = int(np.sum(np.asarray(arrs[i]) > 500))
                if n != expect:
                    errors.append(f"pred {i}: {n} != {expect}")

    w = threading.Thread(target=writer)
    rs = [threading.Thread(target=reader, args=(s,)) for s in range(4)]
    w.start()
    for r in rs:
        r.start()
    for r in rs:
        r.join()
    stop.set()
    w.join()
    assert not errors, errors[:5]


def test_concurrent_squeeze_and_read(tmp_path):
    """One thread squeezes victims while readers hydrate: entries stay
    readable and bit-exact through state transitions."""
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 22)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    arrs = {i: _ints(seed=100 + i) for i in range(8)}
    for i, a in arrs.items():
        cache.insert(i, a)
    errors = []
    stop = threading.Event()

    def squeezer():
        k = 0
        while not stop.is_set():
            cache._squeeze_victim(k % 8)
            k += 1

    def reader(seed):
        rng = np.random.default_rng(seed)
        for _ in range(200):
            i = int(rng.integers(0, 8))
            got = cache.get(i)
            if got is not None and got.to_pylist() != arrs[i].to_pylist():
                errors.append(f"entry {i} corrupt")

    sq = threading.Thread(target=squeezer)
    rs = [threading.Thread(target=reader, args=(s,)) for s in range(4)]
    sq.start()
    for r in rs:
        r.start()
    for r in rs:
        r.join()
    stop.set()
    sq.join()
    assert not errors, errors[:5]
