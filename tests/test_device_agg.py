"""Device group-by / aggregation kernels vs pyarrow oracles.

Covers ops/groupby.py (sort-based grouped reduction) and
sql/device_agg.py (the arrow <-> device bridge that replaced the
round-1 pyarrow Table.group_by partial aggregation).
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import jax.numpy as jnp

from liquid_tpu.ops import groupby as gops
from liquid_tpu.sql import device_agg as da
from liquid_tpu.sql.physical import (
    AggSlot, GroupedAggregator, ScalarAggregator, make_slots,
)
from liquid_tpu.sql import ast


def _sorted_pylist(t: pa.Table):
    rows = list(zip(*[t.column(c).to_pylist() for c in t.column_names]))
    return sorted(rows, key=lambda r: tuple(
        (x is None, x) for x in r))


def _assert_tables_equal(a: pa.Table, b: pa.Table, float_cols=()):
    assert set(a.column_names) == set(b.column_names)
    b = b.select(a.column_names)
    ra, rb = _sorted_pylist(a), _sorted_pylist(b)
    assert len(ra) == len(rb)
    for x, y in zip(ra, rb):
        for i, name in enumerate(a.column_names):
            if name in float_cols and x[i] is not None and y[i] is not None:
                assert x[i] == pytest.approx(y[i], rel=1e-9), name
            else:
                assert x[i] == y[i], (name, x, y)


# -- kernel-level ------------------------------------------------------------


def test_group_reduce_basic():
    codes = (jnp.asarray(np.array([1, 2, 1, 2, 3, 1], np.int64)),)
    knulls = (jnp.zeros(6, jnp.bool_),)
    valid = jnp.ones(6, jnp.bool_)
    vals = (jnp.asarray(np.array([10, 20, 30, 40, 50, 60], np.int64)),)
    vnulls = (jnp.zeros(6, jnp.bool_),)
    ng, uk, un, outs, cnts = gops.group_reduce(
        codes, knulls, valid, vals, vnulls, ("sum",))
    g = int(ng)
    assert g == 3
    got = dict(zip(np.asarray(uk[0])[:g].tolist(),
                   np.asarray(outs[0])[:g].tolist()))
    assert got == {1: 100, 2: 60, 3: 50}
    counts = dict(zip(np.asarray(uk[0])[:g].tolist(),
                      np.asarray(cnts[0])[:g].tolist()))
    assert counts == {1: 3, 2: 2, 3: 1}


def test_group_reduce_null_keys_and_invalid_rows():
    codes = (jnp.asarray(np.array([1, 0, 1, 0, 9], np.int64)),)
    knulls = (jnp.asarray(np.array([False, True, False, True, False])),)
    valid = jnp.asarray(np.array([True, True, True, True, False]))
    vals = (jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 99.0])),)
    vnulls = (jnp.zeros(5, jnp.bool_),)
    ng, uk, un, outs, cnts = gops.group_reduce(
        codes, knulls, valid, vals, vnulls, ("sum",))
    g = int(ng)
    assert g == 2  # {1} and {NULL}; padding row 9 dropped
    res = {}
    for i in range(g):
        key = None if bool(np.asarray(un[0])[i]) else int(np.asarray(uk[0])[i])
        res[key] = float(np.asarray(outs[0])[i])
    assert res == {1: 4.0, None: 6.0}


def test_group_reduce_min_max_null_inputs():
    codes = (jnp.asarray(np.array([7, 7, 8, 8], np.int64)),)
    knulls = (jnp.zeros(4, jnp.bool_),)
    valid = jnp.ones(4, jnp.bool_)
    vals = (jnp.asarray(np.array([5, 1, 0, 0], np.int64)),
            jnp.asarray(np.array([5, 1, 0, 0], np.int64)))
    vnulls = (jnp.asarray(np.array([False, False, True, True])),) * 2
    ng, uk, un, outs, cnts = gops.group_reduce(
        codes, knulls, valid, vals, vnulls, ("min", "max"))
    g = int(ng)
    keys = np.asarray(uk[0])[:g]
    mins = dict(zip(keys.tolist(), np.asarray(outs[0])[:g].tolist()))
    counts = dict(zip(keys.tolist(), np.asarray(cnts[0])[:g].tolist()))
    assert mins[7] == 1 and counts[7] == 2
    assert counts[8] == 0  # all-null group -> finalizes to SQL NULL


# -- aggregator-level: device vs pyarrow oracle -------------------------------


def _run_both(key_names, slots, chunks):
    dev = da.DeviceGroupedAggregator(key_names, slots)
    ref = GroupedAggregator(key_names, slots)
    for keys, inputs, n in chunks:
        dev.update(keys, inputs, n)
        ref.update(keys, inputs, n)
    return dev.finalize(), ref.finalize()


def test_grouped_sum_avg_min_max_ints():
    rng = np.random.default_rng(0)
    f = [ast.Func("sum", (ast.Column("x"),)),
         ast.Func("avg", (ast.Column("x"),)),
         ast.Func("min", (ast.Column("x"),)),
         ast.Func("max", (ast.Column("x"),)),
         ast.Func("count", (), star=True)]
    slots = make_slots(f)
    chunks = []
    for _ in range(3):
        n = 1000
        k = pa.array(rng.integers(0, 17, n), pa.int32())
        x = pa.array(rng.integers(-1000, 1000, n), pa.int64())
        inputs = {s.name: x for s in slots if s.input is not None}
        chunks.append(([k], inputs, n))
    d, r = _run_both(["k"], slots, chunks)
    _assert_tables_equal(d, r, float_cols={"__agg1"})


def test_grouped_nullable_and_string_keys():
    f = [ast.Func("sum", (ast.Column("x"),)),
         ast.Func("count", (ast.Column("x"),))]
    slots = make_slots(f)
    k1 = pa.array(["a", "b", None, "a", "b", None, "c"])
    k2 = pa.array([1, None, 1, 1, None, None, 2], pa.int64())
    x = pa.array([1.5, 2.5, None, 4.0, 8.0, 16.0, None], pa.float64())
    inputs = {s.name: x for s in slots}
    d, r = _run_both(["k1", "k2"], slots, [([k1, k2], inputs, 7)])
    _assert_tables_equal(d, r, float_cols={"__agg0"})


def test_grouped_all_null_value_group_is_null():
    f = [ast.Func("sum", (ast.Column("x"),)),
         ast.Func("min", (ast.Column("x"),))]
    slots = make_slots(f)
    k = pa.array([1, 1, 2], pa.int64())
    x = pa.array([None, None, 5], pa.int64())
    inputs = {s.name: x for s in slots}
    d, r = _run_both(["k"], slots, [([k], inputs, 3)])
    _assert_tables_equal(d, r)


def test_grouped_float_date_timestamp_keys():
    import datetime
    f = [ast.Func("count", (), star=True)]
    slots = make_slots(f)
    kf = pa.array([1.5, float("nan"), 1.5, -0.0, 0.0, float("nan")],
                  pa.float64())
    kd = pa.array([datetime.date(2020, 1, 1)] * 3
                  + [datetime.date(2021, 1, 1)] * 3, pa.date32())
    d, _ = _run_both(["kf", "kd"], slots, [([kf, kd], {}, 6)])
    # NaNs group together; -0.0 groups with 0.0
    assert d.num_rows == 4
    # oracle comparison on the date key behavior
    assert set(d.column("kd").to_pylist()) == {
        datetime.date(2020, 1, 1), datetime.date(2021, 1, 1)}


def test_grouped_stddev_var():
    rng = np.random.default_rng(1)
    f = [ast.Func("stddev", (ast.Column("x"),)),
         ast.Func("var", (ast.Column("x"),))]
    slots = make_slots(f)
    k = pa.array(rng.integers(0, 5, 500), pa.int64())
    x = pa.array(rng.normal(0, 10, 500), pa.float64())
    inputs = {s.name: x for s in slots}
    d, r = _run_both(["k"], slots, [([k], inputs, 500)])
    _assert_tables_equal(d, r, float_cols={"__agg0", "__agg1"})


def test_grouped_compaction_matches_single_shot():
    f = [ast.Func("sum", (ast.Column("x"),)),
         ast.Func("min", (ast.Column("x"),)),
         ast.Func("avg", (ast.Column("x"),))]
    slots = make_slots(f)
    rng = np.random.default_rng(2)
    dev = da.DeviceGroupedAggregator(["k"], slots)
    dev.COMPACT_ROWS = 256  # force multiple compaction rounds
    ref = GroupedAggregator(["k"], slots)
    for _ in range(8):
        n = 200
        k = pa.array(rng.integers(0, 9, n), pa.int64())
        x = pa.array(rng.integers(0, 100, n), pa.int64())
        inputs = {s.name: x for s in slots}
        dev.update([k], inputs, n)
        ref.update([k], inputs, n)
    _assert_tables_equal(dev.finalize(), ref.finalize(),
                         float_cols={"__agg2"})


def test_scalar_device_agg():
    f = [ast.Func("sum", (ast.Column("x"),)),
         ast.Func("avg", (ast.Column("x"),)),
         ast.Func("min", (ast.Column("x"),)),
         ast.Func("max", (ast.Column("x"),)),
         ast.Func("count", (), star=True),
         ast.Func("count", (ast.Column("x"),))]
    slots = make_slots(f)
    dev = da.DeviceScalarAggregator(slots)
    ref = ScalarAggregator(slots)
    rng = np.random.default_rng(3)
    types = {}
    for _ in range(3):
        n = 300
        x = pa.array([None if v < -800 else int(v)
                      for v in rng.integers(-1000, 1000, n)], pa.int64())
        inputs = {s.name: x for s in slots if s.input is not None}
        for s in slots:
            if s.input is not None:
                types.setdefault(s.name, x.type)
        dev.update(inputs, n)
        ref.update(inputs, n)
    _assert_tables_equal(dev.finalize(types), ref.finalize(types),
                         float_cols={"__agg1"})


def test_scalar_empty_input_semantics():
    f = [ast.Func("sum", (ast.Column("x"),)),
         ast.Func("count", (), star=True)]
    slots = make_slots(f)
    dev = da.DeviceScalarAggregator(slots)
    x = pa.array([], pa.int64())
    dev.update({slots[0].name: x}, 0)
    out = dev.finalize({slots[0].name: pa.int64()})
    assert out.column(slots[0].name)[0].as_py() is None
    assert out.column(slots[1].name)[0].as_py() == 0


def test_hybrid_falls_back_for_distinct_and_strings():
    # count_distinct is not device-supported -> pyarrow path
    f = [ast.Func("count", (ast.Column("x"),), distinct=True)]
    slots = make_slots(f)
    h = da.HybridGroupedAggregator(["k"], slots)
    k = pa.array([1, 1, 2], pa.int64())
    x = pa.array(["a", "a", "b"])
    h.update([k], {slots[0].name: x}, 3)
    out = h.finalize()
    got = dict(zip(out.column("k").to_pylist(),
                   out.column(slots[0].name).to_pylist()))
    assert got == {1: 1, 2: 1}
    # string min -> runtime type fallback
    f2 = [ast.Func("min", (ast.Column("x"),))]
    slots2 = make_slots(f2)
    h2 = da.HybridGroupedAggregator(["k"], slots2)
    h2.update([k], {slots2[0].name: x}, 3)
    out2 = h2.finalize()
    got2 = dict(zip(out2.column("k").to_pylist(),
                    out2.column(slots2[0].name).to_pylist()))
    assert got2 == {1: "a", 2: "b"}


def test_device_agg_is_used_for_supported_queries():
    before = da.STATS["device_agg_updates"]
    f = [ast.Func("sum", (ast.Column("x"),))]
    slots = make_slots(f)
    h = da.HybridGroupedAggregator(["k"], slots)
    h.update([pa.array([1, 2], pa.int64())],
             {slots[0].name: pa.array([1, 2], pa.int64())}, 2)
    assert isinstance(h._impl, da.DeviceGroupedAggregator)
    assert da.STATS["device_agg_updates"] > before
