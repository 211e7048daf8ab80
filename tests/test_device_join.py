"""Device equi-join (ops/join.py + sql/device_join.py) vs pyarrow oracles.

The device join replaces pyarrow.Table.join in the executor (VERDICT
round-1 "missing" #1) — sort + searchsorted build/probe, the TPU idiom
for DataFusion's HashJoinExec.
"""
import numpy as np
import pyarrow as pa
import pytest

import jax.numpy as jnp

from liquid_tpu.ops import join as jops
from liquid_tpu.sql import device_join as dj


def _sorted_rows(t: pa.Table, names):
    cols = [t.column(c).to_pylist() for c in names]
    return sorted(zip(*cols), key=lambda r: tuple((x is None, x) for x in r))


def _assert_same(a: pa.Table, b: pa.Table):
    assert set(a.column_names) == set(b.column_names), (
        a.column_names, b.column_names)
    names = sorted(a.column_names)
    assert _sorted_rows(a, names) == _sorted_rows(b, names)


def _arrow_join(left, right, lkeys, rkeys, kind):
    """Oracle mirroring exec._fold_join's arrow path (both key columns
    preserved with per-side nullability)."""
    jt = {"inner": "inner", "left": "left outer", "right": "right outer",
          "full": "full outer"}[kind]
    l, r = left, right
    if jt != "inner":
        for lk in lkeys:
            l = l.append_column("__l__" + lk, l.column(lk))
        for rk in rkeys:
            r = r.append_column("__r__" + rk, r.column(rk))
    out = l.join(r, keys=lkeys, right_keys=rkeys, join_type=jt)
    if jt != "inner":
        cols = {n: out.column(n) for n in out.column_names}
        for lk in lkeys:
            cols[lk] = cols.pop("__l__" + lk)
        for rk in rkeys:
            cols[rk] = cols.pop("__r__" + rk)
        out = pa.table(cols)
    else:
        for lk, rk in zip(lkeys, rkeys):
            if rk not in out.column_names:
                out = out.append_column(rk, out.column(lk))
    return out


# -- kernel level ------------------------------------------------------------


def test_expand_matches_kernel():
    lo = jnp.asarray(np.array([0, 2, 5], np.int32))
    counts = jnp.asarray(np.array([2, 0, 3], np.int32))
    p, b, valid = jops.expand_matches(lo, counts, 8)
    v = np.asarray(valid)
    assert v.sum() == 5
    assert np.asarray(p)[v].tolist() == [0, 0, 2, 2, 2]
    assert np.asarray(b)[v].tolist() == [0, 1, 5, 6, 7]


def test_matched_flags_kernel():
    keys = jnp.asarray(np.array([1, 1, 2, 3, 5], np.int64))
    lo = jnp.asarray(np.array([0, 3], np.int32))
    hi = jnp.asarray(np.array([2, 4], np.int32))
    flags = np.asarray(jops.matched_flags(keys, lo, hi))
    assert flags.tolist() == [True, True, False, True, False]


# -- table level -------------------------------------------------------------

KINDS = ["inner", "left", "right", "full"]


def _rand_tables(seed, n_l=200, n_r=150, card=20, with_nulls=True):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, card, n_l)
    rk = rng.integers(0, card, n_r)
    lnull = rng.random(n_l) < (0.1 if with_nulls else 0)
    rnull = rng.random(n_r) < (0.1 if with_nulls else 0)
    left = pa.table({
        "lkey": pa.array(lk, pa.int64(), mask=lnull),
        "lval": pa.array(rng.normal(size=n_l)),
    })
    right = pa.table({
        "rkey": pa.array(rk, pa.int64(), mask=rnull),
        "rval": pa.array(rng.integers(0, 1000, n_r), pa.int64()),
    })
    return left, right


@pytest.mark.parametrize("kind", KINDS)
def test_int_keys_with_nulls_and_dupes(kind):
    left, right = _rand_tables(seed=7)
    got = dj.try_device_join(left, right, ["lkey"], ["rkey"], kind)
    assert got is not None
    want = _arrow_join(left, right, ["lkey"], ["rkey"], kind)
    _assert_same(got, want)


@pytest.mark.parametrize("kind", KINDS)
def test_device_path_forced(kind, monkeypatch):
    monkeypatch.setattr(dj, "HOST_JOIN_MAX", 0)
    left, right = _rand_tables(seed=11, n_l=300, n_r=100)
    before = dj.STATS["device_joins"]
    got = dj.try_device_join(left, right, ["lkey"], ["rkey"], kind)
    assert dj.STATS["device_joins"] == before + 1
    want = _arrow_join(left, right, ["lkey"], ["rkey"], kind)
    _assert_same(got, want)


def test_string_and_multi_keys():
    rng = np.random.default_rng(3)
    words = np.array(["ab", "cd", "ef", "gh", "ijk"])
    left = pa.table({
        "s": pa.array(words[rng.integers(0, 5, 120)]),
        "k": pa.array(rng.integers(0, 4, 120), pa.int32()),
        "lv": pa.array(np.arange(120, dtype=np.int64)),
    })
    right = pa.table({
        "rs": pa.array(words[rng.integers(0, 5, 90)]),
        "rk": pa.array(rng.integers(0, 4, 90), pa.int32()),
        "rv": pa.array(np.arange(90, dtype=np.int64)),
    })
    for kind in KINDS:
        got = dj.try_device_join(left, right, ["s", "k"], ["rs", "rk"], kind)
        assert got is not None
        want = _arrow_join(left, right, ["s", "k"], ["rs", "rk"], kind)
        _assert_same(got, want)


def test_date_and_float_keys():
    left = pa.table({
        "d": pa.array([0, 1, 2, 1, None], pa.date32()),
        "f": pa.array([1.5, 2.5, 1.5, 2.5, 0.0]),
        "lv": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    right = pa.table({
        "rd": pa.array([1, 2, 3, None], pa.date32()),
        "rf": pa.array([2.5, 1.5, 9.0, 0.0]),
        "rv": pa.array([10, 20, 30, 40], pa.int64()),
    })
    for kind in KINDS:
        got = dj.try_device_join(left, right, ["d", "f"], ["rd", "rf"], kind)
        assert got is not None
        want = _arrow_join(left, right, ["d", "f"], ["rd", "rf"], kind)
        _assert_same(got, want)


def test_empty_sides():
    left = pa.table({"k": pa.array([], pa.int64()),
                     "lv": pa.array([], pa.float64())})
    right = pa.table({"rk": pa.array([1, 2], pa.int64()),
                      "rv": pa.array([7, 8], pa.int64())})
    for kind in KINDS:
        got = dj.try_device_join(left, right, ["k"], ["rk"], kind)
        assert got is not None
        want = _arrow_join(left, right, ["k"], ["rk"], kind)
        _assert_same(got, want)


def test_coalesced_same_name_key():
    left = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                     "lv": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([2, 3], pa.int64()),
                      "rv": pa.array([20, 30], pa.int64())})
    got = dj.try_device_join(left, right, ["k"], ["k"], "full")
    assert got is not None
    # coalesced key: left value where the left side exists, else right
    rows = _sorted_rows(got, ["k", "lv", "rv"])
    assert rows == [(1, 1, None), (2, 2, 20), (3, None, 30),
                    (None, 3, None)]


def test_fallback_on_collision():
    left = pa.table({"k": pa.array([1], pa.int64()),
                     "shared": pa.array([1], pa.int64())})
    right = pa.table({"rk": pa.array([1], pa.int64()),
                      "shared": pa.array([2], pa.int64())})
    before = dj.STATS["fallback_joins"]
    assert dj.try_device_join(left, right, ["k"], ["rk"], "inner") is None
    assert dj.STATS["fallback_joins"] == before + 1


def test_sql_join_uses_device_join(monkeypatch):
    """End-to-end: an executor join query routes through device_join
    (with the fused star path disabled: star handles this shape fully
    on-device now, so device_join is the CLASSIC path's join engine)."""
    import tempfile
    import pyarrow.parquet as pq
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    monkeypatch.setenv("LIQUID_FUSED_STAR", "0")

    rng = np.random.default_rng(5)
    with tempfile.TemporaryDirectory() as d:
        orders = pa.table({
            "o_id": pa.array(np.arange(500, dtype=np.int64)),
            "cust": pa.array(rng.integers(0, 50, 500), pa.int64()),
            "amt": pa.array(rng.random(500) * 100),
        })
        custs = pa.table({
            "c_id": pa.array(np.arange(50, dtype=np.int64)),
            "name": pa.array([f"c{i}" for i in range(50)]),
        })
        pq.write_table(orders, f"{d}/orders.parquet")
        pq.write_table(custs, f"{d}/custs.parquet")
        sess, _cache = LiquidCacheLocalBuilder().build()
        sess.register_parquet("orders", f"{d}/orders.parquet")
        sess.register_parquet("custs", f"{d}/custs.parquet")
        before = dj.STATS["host_joins"] + dj.STATS["device_joins"]
        out = sess.sql(
            "SELECT name, SUM(amt) AS s FROM orders "
            "JOIN custs ON cust = c_id GROUP BY name ORDER BY name").to_arrow()
        assert dj.STATS["host_joins"] + dj.STATS["device_joins"] > before
        # oracle via pandas
        po = orders.to_pandas().merge(
            custs.to_pandas(), left_on="cust", right_on="c_id")
        want = po.groupby("name")["amt"].sum().sort_index()
        got = dict(zip(out.column("name").to_pylist(),
                       out.column("s").to_pylist()))
        assert list(got) == list(want.index)
        for k in got:
            assert got[k] == pytest.approx(want[k], rel=1e-9)
