"""Runtime (dynamic) filters: TopK ORDER BY/LIMIT thresholds and
join-key bounds that tighten scans MID-QUERY (VERDICT r2 item 6; ref
`DynamicFilterPhysicalExpr` unwrapping, liquid-cache liquid_expr.rs:58,
and dynamic-filter file pruning, opener.rs:185).
"""
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from liquid_tpu.bench.runner import make_session


def _session():
    return make_session("liquid", 1 << 30, tempfile.mkdtemp())


def test_topk_threshold_prunes_later_row_groups():
    # ascending data: row group 0 already contains the global top-10.
    # The fused device top-k select (round 5) normally serves this
    # query without any host scan; force the classic path so the
    # dynamic-filter threshold machinery itself stays covered.
    import os
    n = 30_000
    v = np.arange(n, dtype=np.int64)
    t = pa.table({"v": v, "w": v * 2})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=10_000)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    os.environ["LIQUID_FUSED"] = "0"
    try:
        out = ctx.sql("SELECT v, w FROM t ORDER BY v LIMIT 10").to_arrow()
    finally:
        del os.environ["LIQUID_FUSED"]
    assert out.column("v").to_pylist() == list(range(10))
    assert cache.stats()["dynamic_filter_prunes"] > 0
    # and the fused route must agree
    out2 = ctx.sql("SELECT v, w FROM t ORDER BY v LIMIT 10").to_arrow()
    assert out2.column("v").to_pylist() == list(range(10))

    # DESC: row group 2 holds the top, later (lower) groups prune
    before = cache.stats()["dynamic_filter_prunes"]
    out = ctx.sql("SELECT v FROM t ORDER BY v DESC LIMIT 7").to_arrow()
    assert out.column("v").to_pylist() == list(range(n - 1, n - 8, -1))
    # rg0/rg1 were already scanned before the threshold existed on the
    # first pass ordering; at least the threshold mechanism must not
    # change results -- prune count may or may not grow depending on
    # row-group visit order, so only correctness is asserted here


def test_topk_with_offset_and_ties():
    rng = np.random.default_rng(5)
    v = rng.integers(0, 50, 20_000)  # heavy ties
    t = pa.table({"v": v})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=4096)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    out = ctx.sql("SELECT v FROM t ORDER BY v LIMIT 20 OFFSET 5").to_arrow()
    expect = np.sort(v)[5:25]
    assert out.column("v").to_pylist() == expect.tolist()


def test_topk_with_nulls():
    rng = np.random.default_rng(6)
    v = rng.integers(0, 1000, 16_000).astype(float)
    mask = rng.random(16_000) < 0.2
    t = pa.table({"v": pa.array(v, mask=mask)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=4096)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    out = ctx.sql("SELECT v FROM t ORDER BY v LIMIT 15").to_arrow()
    expect = np.sort(v[~mask])[:15]
    assert out.column("v").to_pylist() == expect.tolist()


def test_join_key_bounds_prune_probe_scan():
    """A selective build side publishes key min/max; the probe scan
    prunes row groups outside the range (observable as fewer cache
    inserts)."""
    n = 40_000
    fact = pa.table({
        "fk": np.arange(n, dtype=np.int64),      # sorted: rg stats disjoint
        "amt": np.arange(n, dtype=np.int64) % 97,
    })
    dim = pa.table({
        "dk": np.arange(100, 200, dtype=np.int64),  # narrow key range
        "tag": ["x"] * 100,
    })
    d = tempfile.mkdtemp()
    pq.write_table(fact, f"{d}/fact.parquet", row_group_size=10_000)
    pq.write_table(dim, f"{d}/dim.parquet")

    ctx, cache = _session()
    ctx.register_parquet("fact", f"{d}/fact.parquet")
    ctx.register_parquet("dim", f"{d}/dim.parquet")
    out = ctx.sql(
        "SELECT sum(amt) s, count(*) c FROM dim JOIN fact ON dk = fk"
    ).to_arrow()
    fj = fact.to_pandas().merge(dim.to_pandas(), left_on="fk",
                                right_on="dk")
    assert out.column("c").to_pylist() == [len(fj)]
    assert out.column("s").to_pylist() == [int(fj["amt"].sum())]
    # the fact scan only cached row group 0 (keys 0..9999 cover 100..199);
    # without bounds it would cache all 4 row groups of both columns
    inserts = cache.stats()["inserts"]
    assert inserts <= 2 * 2 + 1 * 2, inserts  # dim (1 rg) + fact rg0


def test_join_empty_build_skips_probe_entirely():
    n = 20_000
    fact = pa.table({"fk": np.arange(n, dtype=np.int64),
                     "amt": np.ones(n, dtype=np.int64)})
    dim = pa.table({"dk": np.array([5], dtype=np.int64),
                    "tag": ["never"]})
    d = tempfile.mkdtemp()
    pq.write_table(fact, f"{d}/fact.parquet", row_group_size=5_000)
    pq.write_table(dim, f"{d}/dim.parquet")
    ctx, cache = _session()
    ctx.register_parquet("fact", f"{d}/fact.parquet")
    ctx.register_parquet("dim", f"{d}/dim.parquet")
    out = ctx.sql(
        "SELECT count(*) c FROM dim JOIN fact ON dk = fk "
        "WHERE tag = 'absent'").to_arrow()
    assert out.column("c").to_pylist() == [0]
    # empty build side -> impossible range -> fact never read
    ins = cache.stats()["inserts"]
    assert ins <= 1, ins  # just the dim column(s)


def test_left_join_unaffected_by_bounds():
    """Outer joins preserve unmatched rows: bounds must not prune the
    preserved side."""
    left = pa.table({"k": np.arange(100, dtype=np.int64),
                     "a": np.arange(100, dtype=np.int64)})
    right = pa.table({"k2": np.array([5, 6], dtype=np.int64),
                      "b": np.array([50, 60], dtype=np.int64)})
    d = tempfile.mkdtemp()
    pq.write_table(left, f"{d}/l.parquet", row_group_size=25)
    pq.write_table(right, f"{d}/r.parquet")
    ctx, cache = _session()
    ctx.register_parquet("l", f"{d}/l.parquet")
    ctx.register_parquet("r", f"{d}/r.parquet")
    out = ctx.sql("SELECT count(*) c, count(b) cb FROM l "
                  "LEFT JOIN r ON k = k2").to_arrow()
    assert out.column("c").to_pylist() == [100]
    assert out.column("cb").to_pylist() == [2]
