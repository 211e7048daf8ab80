"""Event-trace snapshot tests for cache policies and the squeeze pipeline.

Mirrors the reference's insta snapshot suites (liquid-cache
`src/core/src/cache/tests/{policies,squeezed}.rs` + snapshots/*.snap),
driven by the debug event trace (`Observer::consume_event_trace`,
core.rs:477-480): a scripted workload produces a deterministic event
sequence which must match the stored snapshot exactly.  Snapshots live
in tests/snapshots/*.snap; regenerate by deleting the file and
re-running with LIQUID_TPU_UPDATE_SNAPSHOTS=1.
"""
import os

import numpy as np
import pyarrow as pa
import pytest

from liquid_tpu.cache import (
    LiquidCacheBuilder, LruPolicy, TranscodeEvict, VariantGet,
)

SNAP_DIR = os.path.join(os.path.dirname(__file__), "snapshots")


def _events_text(cache) -> str:
    evs = cache.observer.consume_event_trace()
    return "\n".join(f"{e.kind} {e.entry_id}" + (f" {e.detail}" if e.detail else "")
                     for e in evs)


def assert_snapshot(name: str, got: str):
    os.makedirs(SNAP_DIR, exist_ok=True)
    path = os.path.join(SNAP_DIR, name + ".snap")
    if not os.path.exists(path) or os.environ.get("LIQUID_TPU_UPDATE_SNAPSHOTS"):
        with open(path, "w") as f:
            f.write(got)
        if not os.environ.get("LIQUID_TPU_UPDATE_SNAPSHOTS"):
            pytest.skip(f"snapshot {name} created; re-run to verify")
    expect = open(path).read()
    assert got == expect, (f"event trace diverged from snapshot {name}:\n"
                           f"--- got ---\n{got}\n--- expected ---\n{expect}")


def _ints(n=8192, lo=0, hi=1000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.array(rng.integers(lo, hi, n).astype(np.int64))


def _strings(n=8192, seed=0):
    rng = np.random.default_rng(seed)
    return pa.array(rng.choice(["alpha", "beta", "gamma", "delta"], n))


def _mk(tmp_path, mem, **kw):
    return (LiquidCacheBuilder()
            .with_max_memory_bytes(mem)
            .with_disk_path(str(tmp_path / "s.bin"))
            .with_trace_events(True)
            .build() if not kw else
            LiquidCacheBuilder()
            .with_max_memory_bytes(mem)
            .with_disk_path(str(tmp_path / "s.bin"))
            .with_trace_events(True)
            .with_squeeze_policy(kw["squeeze"]).build())


def test_snapshot_insert_transcode(tmp_path):
    cache = _mk(tmp_path, 1 << 24)
    for i in range(3):
        cache.insert(i, _ints(seed=i))
    assert_snapshot("insert_transcode", _events_text(cache))


def test_snapshot_eviction_squeeze_pipeline(tmp_path):
    """Memory pressure drives Arrow->Liquid->Squeezed->Disk transitions
    in FIFO-per-kind order (ref three_queue + squeeze.rs snapshots)."""
    cache = _mk(tmp_path, 60_000)
    for i in range(8):
        cache.insert(i, _ints(seed=i))
    cache.get(0)
    cache.get(7)
    assert_snapshot("eviction_squeeze_pipeline", _events_text(cache))


def test_snapshot_transcode_evict_policy(tmp_path):
    """TranscodeEvict skips the squeezed stage (ref squeeze.rs:169-220)."""
    cache = _mk(tmp_path, 60_000, squeeze=TranscodeEvict())
    for i in range(8):
        cache.insert(i, _ints(seed=i))
    assert_snapshot("transcode_evict_policy", _events_text(cache))


def test_snapshot_string_squeeze(tmp_path):
    cache = _mk(tmp_path, 1 << 24)
    cache.insert(1, _strings())
    cache._squeeze_victim(1)   # liquid -> squeezed byteview
    cache._squeeze_victim(1)   # squeezed -> disk
    cache.get(1)               # disk read + hydration
    assert_snapshot("string_squeeze", _events_text(cache))


def test_snapshot_float_squeeze(tmp_path):
    """Floats squeeze to the bucketized ALP lane instead of evicting
    whole (ref FloatSqueezePolicy, float_array.rs:61,338)."""
    cache = _mk(tmp_path, 1 << 24)
    rng = np.random.default_rng(6)
    cache.insert(3, pa.array(np.round(rng.uniform(0, 100, 8192), 2)))
    cache._squeeze_victim(3)   # liquid float -> squeezed float
    cache._squeeze_victim(3)   # squeezed -> disk
    cache.get(3)               # disk read + hydration
    assert_snapshot("float_squeeze", _events_text(cache))


def test_snapshot_variant_squeeze(tmp_path):
    import json
    cache = _mk(tmp_path, 1 << 24)
    rows = [json.dumps({"a": i, "b": f"s{i}"}) for i in range(100)]
    hint = VariantGet((("a", "int64"),))
    cache.insert(5, pa.array(rows), hint=hint)
    cache._squeeze_victim(5)
    cache.get_variant_paths(5, [("a", "int64")])   # zero IO
    cache.get_variant_paths(5, [("b", "utf8")])    # merge: disk read
    assert_snapshot("variant_squeeze", _events_text(cache))


def test_snapshot_flush_all(tmp_path):
    cache = _mk(tmp_path, 1 << 24)
    cache.insert(1, _ints(seed=1))
    cache.insert(2, _strings(seed=2))
    cache.flush_all_to_disk()
    assert_snapshot("flush_all", _events_text(cache))


def test_snapshot_lru_access_order(tmp_path):
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(60_000)
             .with_disk_path(str(tmp_path / "s.bin"))
             .with_trace_events(True)
             .with_cache_policy(LruPolicy())
             .build())
    for i in range(4):
        cache.insert(i, _ints(seed=i))
    cache.get(0)  # 0 becomes MRU
    for i in range(4, 8):
        cache.insert(i, _ints(seed=i))
    assert_snapshot("lru_access_order", _events_text(cache))
