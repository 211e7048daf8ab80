"""Distributed shuffle joins on the 8-device mesh (VERDICT item 4):
TPC-H q3-shaped join + group-by vs pandas, exact-capacity exchange
under pathological skew, and left-deep join chains."""
import os

# regressions must surface as failures here, not as silent
# graceful-degradation fallbacks to the single-host engine.  Scoped to
# this module: a process-global set would leak strict mode into later
# test files whose queries legitimately fall back (test_dist_clickbench
# runs the full 43-query set through graceful degradation).
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _strict_dist():
    prior = os.environ.get("LIQUID_DIST_STRICT")
    os.environ["LIQUID_DIST_STRICT"] = "1"
    yield
    if prior is None:
        os.environ.pop("LIQUID_DIST_STRICT", None)
    else:
        os.environ["LIQUID_DIST_STRICT"] = prior

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.slow

from liquid_tpu.parallel.session import DistributedSession


@pytest.fixture(scope="module")
def jsess():
    rng = np.random.default_rng(17)
    n_c, n_o, n_l = 500, 4_000, 12_007
    cust = pa.table({
        "c_custkey": pa.array(np.arange(n_c, dtype=np.int64)),
        "c_mktsegment": pa.array(rng.choice(
            ["BUILDING", "AUTOMOBILE", "MACHINERY"], n_c)),
    })
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(n_o, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_c, n_o).astype(np.int64)),
        "o_orderdate": pa.array(
            (np.datetime64("1995-01-01")
             + rng.integers(0, 120, n_o).astype("timedelta64[D]")
             ).astype("datetime64[D]").astype(object)),
    })
    line = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_o, n_l).astype(np.int64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(10, 1000, n_l), 2)),
        "l_quantity": pa.array(rng.integers(1, 50, n_l).astype(np.int64)),
    })
    s = DistributedSession()
    s.register_table("customer", cust)
    s.register_table("orders", orders)
    s.register_table("lineitem", line)
    return (s, cust.to_pandas(), orders.to_pandas(), line.to_pandas())


def test_join_groupby_q3_shape(jsess):
    """customer x orders x lineitem with per-table filters and a
    grouped SUM -- the TPC-H q3 pipeline shape."""
    s, cust, orders, line = jsess
    out = s.sql(
        "select o_custkey, count(*) as c, sum(l_extendedprice) as rev "
        "from lineitem join orders on l_orderkey = o_orderkey "
        "join customer on o_custkey = c_custkey "
        "where c_mktsegment = 'BUILDING' "
        "and o_orderdate < date '1995-03-15' and l_quantity > 10 "
        "group by o_custkey order by rev desc limit 10").to_pandas()
    m = line[line.l_quantity > 10].merge(
        orders[pd.to_datetime(orders.o_orderdate)
               < pd.Timestamp("1995-03-15")],
        left_on="l_orderkey", right_on="o_orderkey")
    m = m.merge(cust[cust.c_mktsegment == "BUILDING"],
                left_on="o_custkey", right_on="c_custkey")
    ref = (m.groupby("o_custkey")
           .agg(c=("l_extendedprice", "size"),
                rev=("l_extendedprice", "sum"))
           .reset_index().sort_values("rev", ascending=False).head(10))
    assert list(out.o_custkey) == list(ref.o_custkey)
    assert list(out.c) == list(ref.c)
    assert np.allclose(out.rev, ref.rev)


def test_join_scalar_agg(jsess):
    s, cust, orders, line = jsess
    out = s.sql(
        "select count(*) as c, sum(l_quantity) as q, "
        "min(l_quantity) as lo, max(l_quantity) as hi "
        "from lineitem join orders on l_orderkey = o_orderkey "
        "where o_orderdate >= date '1995-03-01'").to_pandas()
    m = line.merge(orders[pd.to_datetime(orders.o_orderdate)
                          >= pd.Timestamp("1995-03-01")],
                   left_on="l_orderkey", right_on="o_orderkey")
    assert out.c[0] == len(m)
    assert out.q[0] == m.l_quantity.sum()
    assert out.lo[0] == m.l_quantity.min()
    assert out.hi[0] == m.l_quantity.max()


def test_join_nonunique_build_keys(jsess):
    """Build side with duplicate keys must expand (one output row per
    match), not pick one arbitrarily."""
    s, *_ = jsess
    a = pa.table({"ak": pa.array([1, 2, 2, 3], pa.int64()),
                  "av": pa.array([10, 20, 21, 30], pa.int64())})
    b = pa.table({"bk": pa.array([2, 2, 2, 3, 4], pa.int64()),
                  "bv": pa.array([1, 2, 3, 4, 5], pa.int64())})
    s.register_table("ja", a)
    s.register_table("jb", b)
    out = s.sql("select count(*) as c, sum(bv) as sv from ja "
                "join jb on ak = bk").to_pandas()
    m = a.to_pandas().merge(b.to_pandas(), left_on="ak", right_on="bk")
    assert out.c[0] == len(m) == 7
    assert out.sv[0] == m.bv.sum()


def test_join_skewed_key_exact(jsess):
    """Pathological skew: 80% of probe rows carry ONE key.  The
    exact-capacity exchange must return exact answers (the round-1
    shuffle dropped rows past a fixed capacity, VERDICT weak #3)."""
    s, *_ = jsess
    n = 20_000
    rng = np.random.default_rng(23)
    keys = rng.integers(0, 50, n).astype(np.int64)
    keys[: int(n * 0.8)] = 7
    fact = pa.table({"fk": pa.array(keys),
                     "fv": pa.array(np.ones(n, np.int64))})
    dim = pa.table({"dk": pa.array(np.arange(50, dtype=np.int64)),
                    "dv": pa.array(np.arange(50, dtype=np.int64) * 100)})
    s.register_table("skf", fact)
    s.register_table("skd", dim)
    out = s.sql("select dk, count(*) as c, sum(dv) as sv from skf "
                "join skd on fk = dk group by dk order by dk").to_pandas()
    ref = (fact.to_pandas().merge(dim.to_pandas(),
                                  left_on="fk", right_on="dk")
           .groupby("dk").agg(c=("dv", "size"), sv=("dv", "sum"))
           .reset_index())
    assert list(out.dk) == list(ref.dk)
    assert list(out.c) == list(ref.c)
    assert list(out.sv) == list(ref.sv)


def test_join_with_nulls(jsess):
    """NULL join keys match nothing; NULL payloads skip aggregation."""
    s, *_ = jsess
    a = pa.table({"k": pa.array([1, None, 2, 2], pa.int64()),
                  "v": pa.array([5, 6, None, 8], pa.int64())})
    b = pa.table({"k2": pa.array([1, 2, None], pa.int64()),
                  "w": pa.array([100, 200, 300], pa.int64())})
    s.register_table("na", a)
    s.register_table("nb", b)
    out = s.sql("select count(*) as c, count(v) as cv, sum(w) as sw "
                "from na join nb on k = k2").to_pandas()
    # matches: (1,5)x(1,100), (2,None)x(2,200), (2,8)x(2,200)
    assert out.c[0] == 3
    assert out.cv[0] == 2
    assert out.sw[0] == 500


def test_multi_key_equi_join(jsess):
    """Round-3 review finding 1: with two equality conditions between
    the same pair of tables, the second condition used to be DROPPED
    (single-key shuffle only), multiplying the match count.  The second
    key now applies as a post-join equality filter."""
    s, *_ = jsess
    t1 = pa.table({"a": pa.array([1, 1, 2, 2], pa.int64()),
                   "b": pa.array([10, 20, 10, 20], pa.int64()),
                   "v": pa.array([1.0, 2.0, 3.0, 4.0])})
    t2 = pa.table({"c": pa.array([1, 1, 2, 2], pa.int64()),
                   "d": pa.array([10, 20, 10, 20], pa.int64())})
    s.register_table("mk1", t1)
    s.register_table("mk2", t2)
    # comma-join: second equality arrives via WHERE
    out = s.sql("select count(*) as n, sum(v) as sv from mk1, mk2 "
                "where a = c and b = d").to_pandas()
    assert out.n[0] == 4 and out.sv[0] == 10.0
    # explicit JOIN ... ON with an AND of equalities
    out = s.sql("select count(*) as n from mk1 join mk2 "
                "on a = c and b = d").to_pandas()
    assert out.n[0] == 4
    # single-key baseline unchanged
    out = s.sql("select count(*) as n from mk1, mk2 where a = c").to_pandas()
    assert out.n[0] == 8


def test_multi_key_join_null_second_key(jsess):
    """NULL in the residual (second) key must not match (SQL equality
    is null-rejecting), even though the shuffle key matches."""
    s, *_ = jsess
    t1 = pa.table({"a": pa.array([1, 1], pa.int64()),
                   "b": pa.array([10, None], pa.int64())})
    t2 = pa.table({"c": pa.array([1, 1], pa.int64()),
                   "d": pa.array([10, None], pa.int64())})
    s.register_table("mkn1", t1)
    s.register_table("mkn2", t2)
    out = s.sql("select count(*) as n from mkn1, mkn2 "
                "where a = c and b = d").to_pandas()
    assert out.n[0] == 1  # only (10, 10); NULL = NULL is not a match
