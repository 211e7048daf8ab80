"""Regression fences for the round-4 advisor findings (ADVICE.md r4).

Each test pins a specific reported bug:
- ::DATE over a timestamp column silently produced garbage date32 on
  the fused path (the i64 image is epoch seconds/us, not day counts);
- ::DATE over date32/integer images (including the ::INT::DATE chain
  ClickBench q40 uses) must STAY fused;
- distributed DISTINCT shape guards must survive `python -O` (raise,
  not assert) so unsupported shapes still degrade to the fallback.
"""
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from liquid_tpu.bench.runner import make_session
from liquid_tpu.sql import fused_agg


@pytest.fixture(scope="module")
def ctxs():
    n = 8192 * 3
    rng = np.random.default_rng(11)
    days = rng.integers(15_000, 16_000, n)
    ts = (days.astype("int64") * 86_400 + rng.integers(0, 86_400, n))
    t = pa.table({
        "d32": pa.array(days.astype("datetime64[D]")),
        "ts_s": pa.array(ts.astype("datetime64[s]")),
        "ts_us": pa.array((ts * 1_000_000).astype("datetime64[us]")),
        "u16": pa.array(days.astype(np.uint16)),
        "v": pa.array(rng.integers(0, 100, n)),
    })
    path = os.path.join(tempfile.mkdtemp(), "r4.parquet")
    pq.write_table(t, path, row_group_size=8192)
    out = {}
    for mode in ("fused", "classic"):
        ctx, _cache = make_session("liquid", 1 << 30, tempfile.mkdtemp())
        ctx.register_parquet("t", path)
        out[mode] = ctx
    return out


def run_both(ctxs, sql):
    prev = os.environ.pop("LIQUID_FUSED", None)
    try:
        a = ctxs["fused"].sql(sql).to_arrow()
        os.environ["LIQUID_FUSED"] = "0"
        b = ctxs["classic"].sql(sql).to_arrow()
    finally:
        os.environ.pop("LIQUID_FUSED", None)
        if prev is not None:
            os.environ["LIQUID_FUSED"] = prev
    return a, b


@pytest.mark.parametrize("col", ["ts_s", "ts_us"])
def test_date_cast_over_timestamp_matches_classic(ctxs, col):
    """ADVICE r4 (high): fused CAST(ts AS DATE) returned epoch-seconds
    reinterpreted as days.  The fused path must now bail (or convert);
    either way results match the classic conversion."""
    sql = (f'SELECT "{col}"::DATE AS day, count(*) AS c, sum(v) AS s '
           f'FROM t GROUP BY "{col}"::DATE ORDER BY day LIMIT 5')
    a, b = run_both(ctxs, sql)
    assert a.column("day").to_pylist() == b.column("day").to_pylist()
    assert a.column("s").to_pylist() == b.column("s").to_pylist()


def test_date_cast_over_date32_stays_fused(ctxs):
    sql = ('SELECT "d32"::DATE AS day, count(*) AS c FROM t '
           'GROUP BY "d32"::DATE ORDER BY c DESC, day LIMIT 5')
    before = fused_agg.STATS["fused_queries"]
    a, b = run_both(ctxs, sql)
    assert fused_agg.STATS["fused_queries"] > before, "route regressed"
    assert a.column("day").to_pylist() == b.column("day").to_pylist()


def test_int_date_cast_chain_stays_fused(ctxs):
    """ClickBench q40's "EventDate"::INT::DATE over an integer image."""
    sql = ('SELECT "u16"::INT::DATE AS day, count(*) AS c FROM t '
           'GROUP BY "u16"::INT::DATE ORDER BY c DESC, day LIMIT 5')
    before = fused_agg.STATS["fused_queries"]
    a, b = run_both(ctxs, sql)
    assert fused_agg.STATS["fused_queries"] > before, "route regressed"
    assert a.column("day").to_pylist() == b.column("day").to_pylist()


def test_distinct_shape_guards_raise_not_assert():
    """ADVICE r4: under `python -O` asserts vanish; the DISTINCT shape
    guards must be real raises so unsupported shapes degrade."""
    import ast as pyast
    import inspect
    import textwrap
    from liquid_tpu.parallel.session import DistributedSession
    src = textwrap.dedent(
        inspect.getsource(DistributedSession._exec_distinct))
    asserts = [n for n in pyast.walk(pyast.parse(src))
               if isinstance(n, pyast.Assert)]
    assert not asserts, "shape guards must raise, not assert"


def test_plan_segments_rejects_single_tile_overflow():
    """Round-5 bug: plan_segments returned seg=1 even when ONE tile's
    accumulation exceeds the i32 window (scaled revenue sums at
    maxabs~2e9 wrapped by exactly 2^32: TPC-H q3 @sf0.01 reported
    -113066.13 instead of +316430.60 for the largest group)."""
    from liquid_tpu.ops import grouphist_pallas as gh
    assert gh.plan_segments(1 << 16, 1_940_000_000) is None
    got = gh.plan_hilo(1 << 16, 1_940_000_000)
    assert got is not None and got[1] == gh.SPLIT  # hi/lo split applies
    # narrow bounds still plan direct
    assert gh.plan_segments(1 << 16, 4095) is not None


def test_minmax_alp_float_routes_scaled():
    """min/max over ALP decimal floats must reduce over the scaled-int
    image: the device's emulated-f64 multiply can differ from numpy by
    1 ulp, which broke cross-path equality joins (TPC-H q2 matched 0
    rows).  Pin the rslot dtype."""
    import tempfile
    import pyarrow.parquet as pq
    from liquid_tpu.bench.runner import make_session
    from liquid_tpu.sql import fused_agg as FA
    rng = np.random.default_rng(2)
    n = 8192
    t = pa.table({"g": pa.array(rng.integers(0, 20, n)),
                  "cost": pa.array(np.round(rng.uniform(1, 1000, n), 2))})
    d = tempfile.mkdtemp()
    pq.write_table(t, f"{d}/t.parquet", row_group_size=8192)
    ctx, _ = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    ctx.register_parquet("t", f"{d}/t.parquet")
    seen = {}
    real = FA.execute_plan

    def spy(p, mode, empty, slots, table, topk=None):
        seen["rslots"] = list(p.rslots)
        return real(p, mode, empty, slots, table, topk)

    FA.execute_plan = spy
    try:
        r = ctx.sql("SELECT g, min(cost) mn, max(cost) mx FROM t "
                    "GROUP BY g ORDER BY g").to_arrow().to_pandas()
    finally:
        FA.execute_plan = real
    kinds = [(k, dt) for k, dt, _, _ in seen["rslots"]]
    assert all(dt.startswith("i64s") for _k, dt in kinds), kinds
    df = t.to_pandas()
    exp = df.groupby("g").cost.agg(["min", "max"]).reset_index()
    assert list(r.mn) == list(exp["min"])
    assert list(r.mx) == list(exp["max"])
