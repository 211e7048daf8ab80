"""UNMODIFIED TPC-H on the distributed mesh engine (VERDICT r2 item 4,
extended round 3): q1 q3 q5 q6 q10 q12 q14 q19 -- expression aggregates
(`sum(l_extendedprice * (1 - l_discount))`), CASE WHEN aggregates with
string conditions (q12/q14), post-aggregate arithmetic over aggregates
(q14's `100.00 * sum(..) / sum(..)`), cross-table OR residual filters
(q19), six-table join chains (q5), float GROUP BY keys (q10) -- runs
through `DistributedSession.sql` on the 8-device virtual mesh and
matches the independent pandas oracles (`bench/tpch_ref.py`).
"""
import os

# regressions must surface as failures here, not as silent
# graceful-degradation fallbacks to the single-host engine
os.environ["LIQUID_DIST_STRICT"] = "1"

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow

from liquid_tpu.bench import tpch_data, tpch_queries, tpch_ref
from liquid_tpu.parallel.session import DistributedSession

SF = 0.01


@pytest.fixture(scope="module")
def dist_tpch():
    tables = tpch_data.generate(SF)
    sess = DistributedSession()
    for name, t in tables.items():
        sess.register_table(name, t)
    pdt = tpch_ref.to_pandas_tables(tables)
    return sess, pdt


def _check(out, expect: pd.DataFrame):
    got = out.to_pandas()
    assert len(got) == len(expect), (got, expect)
    assert list(got.columns) == list(expect.columns), \
        (list(got.columns), list(expect.columns))
    for c in expect.columns:
        e = expect[c].reset_index(drop=True)
        g = got[c].reset_index(drop=True)
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            assert np.allclose(g.astype(float), e.astype(float),
                               rtol=1e-9), c
        else:
            def norm(x):
                import datetime
                if isinstance(x, (pd.Timestamp, np.datetime64)):
                    return str(pd.Timestamp(x).date())
                if isinstance(x, datetime.date):
                    return str(x)
                return x
            assert [norm(x) for x in g] == [norm(x) for x in e], (c, g, e)


def test_q1_unmodified(dist_tpch):
    sess, pdt = dist_tpch
    out = sess.sql(tpch_queries.QUERIES[1])
    _check(out, tpch_ref.q1(pdt))


def test_q6_unmodified(dist_tpch):
    sess, pdt = dist_tpch
    out = sess.sql(tpch_queries.QUERIES[6])
    _check(out, tpch_ref.q6(pdt))


def test_q3_unmodified(dist_tpch):
    sess, pdt = dist_tpch
    out = sess.sql(tpch_queries.QUERIES[3])
    _check(out, tpch_ref.q3(pdt))


def test_having_distributed(dist_tpch):
    sess, pdt = dist_tpch
    out = sess.sql(
        "SELECT l_returnflag, sum(l_quantity) sq FROM lineitem "
        "GROUP BY l_returnflag HAVING sum(l_quantity) > 1000 "
        "ORDER BY l_returnflag")
    li = pdt["lineitem"]
    g = li.groupby("l_returnflag")["l_quantity"].sum().reset_index(name="sq")
    g = g[g["sq"] > 1000].sort_values("l_returnflag").reset_index(drop=True)
    _check(out, g)


def test_expr_minmax_distributed(dist_tpch):
    sess, pdt = dist_tpch
    out = sess.sql(
        "SELECT min(l_extendedprice * l_discount) mn, "
        "max(l_extendedprice * (1 - l_discount)) mx FROM lineitem "
        "WHERE l_quantity < 10")
    li = pdt["lineitem"]
    sub = li[li["l_quantity"] < 10]
    assert np.isclose(out.column("mn")[0].as_py(),
                      (sub["l_extendedprice"] * sub["l_discount"]).min(),
                      rtol=1e-9)
    assert np.isclose(out.column("mx")[0].as_py(),
                      (sub["l_extendedprice"] * (1 - sub["l_discount"])).max(),
                      rtol=1e-9)


@pytest.mark.parametrize("qid", [5, 10, 12, 14, 19])
def test_unmodified_query(dist_tpch, qid):
    """Round-3 additions: six-table chains, float group keys, CASE
    aggregates, post-aggregate arithmetic, cross-table OR residuals."""
    sess, pdt = dist_tpch
    out = sess.sql(tpch_queries.QUERIES[qid])
    _check(out, tpch_ref.REFS[qid](pdt))
