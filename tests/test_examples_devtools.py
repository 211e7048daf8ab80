"""Examples are runnable; dev-tools trace viz renders real traces.

Ref: liquid-cache ships 7 runnable examples (`examples/*.rs`) and the
dev-tools trace visualization app (`dev/dev-tools/`).
"""
import glob
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
RUNNABLE = ["example_local.py", "example_inprocess_read.py",
            "example_inprocess_insertion.py",
            "example_inprocess_cache_eviction.py",
            "example_client.py", "example_projection_pushdown.py"]


def test_example_files_exist():
    files = {os.path.basename(p) for p in glob.glob(f"{EXAMPLES}/*.py")}
    assert set(RUNNABLE) <= files
    assert "example_server.py" in files  # blocking: started in server tests


@pytest.mark.parametrize("name", RUNNABLE)
def test_example_runs(name):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, os.path.join(EXAMPLES, name)],
                         capture_output=True, text=True, timeout=360, env=env)
    assert out.returncode == 0, out.stderr[-2000:]


def test_trace_viz_end_to_end(tmp_path):
    import numpy as np
    import pyarrow as pa
    from liquid_tpu.cache import LiquidCacheBuilder
    from liquid_tpu.devtools import trace_viz
    cache = (LiquidCacheBuilder()
             .with_disk_path(str(tmp_path / "s.bin")).build())
    cache.observer.start_trace()
    for i in range(4):
        cache.insert(i, pa.array(np.arange(8192, dtype=np.int64)))
        cache.get(i)
    trace = str(tmp_path / "trace.parquet")
    n = cache.observer.flush_trace_parquet(trace)
    assert n > 0
    out = str(tmp_path / "viz.html")
    assert trace_viz.main([trace, out]) == 0
    body = open(out).read()
    assert "<svg" in body and "Per-entry state simulation" in body
    assert "insert" in body


def test_simulate_state():
    from liquid_tpu.devtools.trace_viz import simulate_state
    recs = [(0.0, "insert", 1, 100), (0.1, "get", 1, 0),
            (0.2, "get", 1, 0), (0.3, "squeeze_io_read", 2, 4096)]
    sim = {s["entry_id"]: s for s in simulate_state(recs)}
    assert sim[1]["inserts"] == 1 and sim[1]["gets"] == 2
    assert sim[2]["io_reads"] == 1 and sim[2]["bytes"] == 4096
