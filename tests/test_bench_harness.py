"""Benchmark harness tests: manifests, in-process runner, server-mode
client, modes, answer verification.

Mirrors the reference's benchmark plumbing (liquid-cache `benchmark/`:
manifest.rs, inprocess_runner.rs, bench_server.rs, clickbench_client.rs)
and its CI usage (answers-verified runs under memory caps).
"""
import json
import os

import pytest

from liquid_tpu.bench import tpch_data, tpch_queries
from liquid_tpu.bench.manifest import Manifest
from liquid_tpu.bench.runner import InProcessRunner, save_answers


@pytest.fixture(scope="module")
def tiny_manifest(tmp_path_factory):
    d = tmp_path_factory.mktemp("bench")
    tables = tpch_data.generate(0.002)
    paths = tpch_data.write_parquet(tables, str(d / "data"))
    m = {
        "name": "tpch-tiny",
        "tables": paths,
        "queries": [tpch_queries.QUERIES[1], tpch_queries.QUERIES[6],
                    "select count(*) as c from lineitem"],
    }
    mp = d / "manifest.json"
    mp.write_text(json.dumps(m))
    return str(mp), d


def test_manifest_load_resolves_sql_files(tmp_path):
    (tmp_path / "q0.sql").write_text("select 1 as x;")
    m = {"name": "t", "tables": {}, "queries": ["q0.sql", "select 2 as y"]}
    (tmp_path / "m.json").write_text(json.dumps(m))
    loaded = Manifest.load(str(tmp_path / "m.json"))
    assert loaded.queries == ["select 1 as x", "select 2 as y"]


def test_inprocess_runner_modes(tiny_manifest, tmp_path):
    mp, _ = tiny_manifest
    m = Manifest.load(mp)
    out_by_mode = {}
    for mode in ("liquid", "arrow", "liquid-no-squeeze"):
        r = InProcessRunner(m, mode=mode, iterations=2,
                            cache_dir=str(tmp_path / mode))
        res = r.run()
        assert res["mode"] == mode
        assert len(res["queries"]) == 3
        for q in res["queries"]:
            assert q["best_ms"] > 0
            assert len(q["iterations"]) == 2
        out_by_mode[mode] = res
    # liquid mode transcodes; arrow mode must not
    assert out_by_mode["liquid"]["cache_stats"]["transcodes"] > 0
    assert out_by_mode["arrow"]["cache_stats"]["transcodes"] == 0


def test_answers_roundtrip_verification(tiny_manifest, tmp_path):
    mp, d = tiny_manifest
    m = Manifest.load(mp)
    ans_dir = str(tmp_path / "answers")
    save_answers(m, ans_dir, cache_dir=str(tmp_path / "gen"))
    m.answers = ans_dir
    r = InProcessRunner(m, iterations=1, cache_dir=str(tmp_path / "verify"))
    res = r.run(verify=True)
    assert all(q["verified"] is True for q in res["queries"])


def test_runner_writes_results(tiny_manifest, tmp_path):
    mp, _ = tiny_manifest
    m = Manifest.load(mp)
    r = InProcessRunner(m, iterations=1, cache_dir=str(tmp_path / "c"))
    res = r.run(verify=False)
    out = str(tmp_path / "results.json")
    r.write_results(out, res)
    assert json.load(open(out))["manifest"] == "tpch-tiny"


def test_server_mode_benchmark_client(tiny_manifest, tmp_path):
    from liquid_tpu.bench.clients import BenchmarkClient, serve
    mp, _ = tiny_manifest
    m = Manifest.load(mp)
    srv, admin = serve(cache_mode="liquid", max_memory_mb=256,
                       disk_cache_dir=str(tmp_path / "srv"),
                       port=0, admin_port=0, block=False)
    try:
        host, port = srv.addr
        c = BenchmarkClient(m, host, port, admin=admin.addr, iterations=2,
                            cache_trace_dir=str(tmp_path / "traces"))
        res = c.run(verify=False)
        assert len(res["queries"]) == 3
        assert res["server_cache_stats"]["inserts"] > 0
        # cache traces were flushed per query
        assert os.path.exists(str(tmp_path / "traces" / "q0.parquet"))
    finally:
        srv.stop()
        admin.stop()


def test_cli_in_process(tiny_manifest, tmp_path, capsys):
    from liquid_tpu.bench.clients import main
    mp, _ = tiny_manifest
    out = str(tmp_path / "r.json")
    rc = main(["in-process", "--manifest", mp, "--iterations", "1",
               "--output", out])
    assert rc == 0
    res = json.load(open(out))
    assert len(res["queries"]) == 3


def test_clickbench_manifest_loads():
    mp = os.path.join(os.path.dirname(__file__), "..",
                      "benchmark", "clickbench", "manifest.json")
    m = Manifest.load(mp)
    assert len(m.queries) == 43
    assert "hits" in m.tables


def test_tracepoints(tmp_path, monkeypatch):
    from liquid_tpu.bench import tracepoints
    seen = []
    tracepoints.subscribe(lambda b, q: seen.append((b, q)))
    monkeypatch.setattr(tracepoints, "TRACE_PATH", str(tmp_path / "tp.log"))
    tracepoints.iteration_start("tpch", 5)
    assert seen == [("tpch", 5)]
    assert "iteration_start tpch 5" in (tmp_path / "tp.log").read_text()
