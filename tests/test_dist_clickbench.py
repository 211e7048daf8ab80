"""ClickBench on DistributedSession (VERDICT r4 item 9): every query
text COMPLETES -- distributed where the mesh planner supports the
shape, gracefully degraded elsewhere -- with results matching the
single-host engine.  The distributed set is pinned grow-only."""
import pathlib
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow

from liquid_tpu.bench.runner import make_session
from liquid_tpu.parallel.session import DistributedSession

REPO = pathlib.Path(__file__).resolve().parents[1]

#: queries that MUST run distributed (growth welcome, shrink fails)
EXPECT_DISTRIBUTED_CB = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
                         14, 15, 16, 17, 29, 30, 31, 32, 33}


@pytest.fixture(scope="module")
def sessions():
    t = pq.read_table(REPO / "benchmark/data/nano_hits.parquet")
    dist = DistributedSession()
    dist.register_table("hits", t)
    local, _ = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    local.register_parquet(
        "hits", str(REPO / "benchmark/data/nano_hits.parquet"))
    return dist, local


@pytest.mark.parametrize("qid", list(range(43)))
def test_clickbench_distributed(sessions, qid):
    # tie-aware comparison (LIMIT-boundary tie selection is the one
    # legal divergence between correct engines): reuse the bench
    # harness's verifier
    import bench as B
    dist, local = sessions
    sql = open(REPO / f"benchmark/clickbench/queries/q{qid}.sql") \
        .read().strip().rstrip(";")
    d0 = dist.route_stats["distributed"]
    got = dist.sql(sql)
    ran_dist = dist.route_stats["distributed"] > d0
    if qid in EXPECT_DISTRIBUTED_CB:
        assert ran_dist, f"q{qid} regressed to fallback"
    exp = local.sql(sql).to_arrow()
    resolver = B._order_info(sql)
    oidx = resolver(got) if resolver else None
    B._assert_tables_equal(f"cb_q{qid}", got, exp, order_idx=oidx,
                           limited=B._has_limit(sql))
