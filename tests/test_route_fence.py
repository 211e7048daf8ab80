"""Grow-only routing fences for the benchmark suites (VERDICT r4 item
7): a planner regression that silently drops one of these queries to
the classic host path would read as a 10-100x slowdown at bench scale,
so the expected fused/star sets are pinned at test scale on CPU.

Sets may only GROW (like EXPECT_DISTRIBUTED in test_dist_fallback).
"""
import glob
import os
import pathlib
import tempfile

import numpy as np
import pyarrow.parquet as pq
import pytest

from liquid_tpu.bench.runner import make_session
from liquid_tpu.sql.fused_agg import STATS

REPO = pathlib.Path(__file__).resolve().parents[1]

#: ClickBench queries that MUST run on a fused device path (aggregate
#: or bare-select) -- grow-only
EXPECT_CB_FUSED = [1, 2, 3, 4, 7, 8, 9, 12, 13, 14, 15, 16, 17, 18,
                   21, 22, 24, 26, 27, 28, 30, 34, 35, 40, 42]

#: TPC-H queries that MUST route star (fused multi-table) -- grow-only
EXPECT_TPCH_STAR = [2, 3, 5, 7, 8, 9, 10, 11, 12, 14, 16, 18, 19, 21]
#: TPC-H queries that MUST route fused single-table -- grow-only
EXPECT_TPCH_FUSED = [1, 4, 6, 17, 20, 22]


def _route(before_f, before_s, before_sel):
    if STATS.get("star_queries", 0) > before_s:
        return "star"
    if STATS.get("fused_queries", 0) > before_f \
            or STATS.get("fused_selects", 0) > before_sel:
        return "fused"
    return "classic"


@pytest.fixture(scope="module")
def cb_ctx():
    sess, _ = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    sess.register_parquet(
        "hits", str(REPO / "benchmark/data/nano_hits.parquet"))
    return sess


def test_clickbench_route_fence(cb_ctx):
    routed = {}
    for i in EXPECT_CB_FUSED:
        sql = open(REPO / f"benchmark/clickbench/queries/q{i}.sql") \
            .read().strip().rstrip(";")
        b_f = STATS.get("fused_queries", 0)
        b_s = STATS.get("star_queries", 0)
        b_sel = STATS.get("fused_selects", 0)
        cb_ctx.sql(sql)
        routed[i] = _route(b_f, b_s, b_sel)
    bad = {i: r for i, r in routed.items() if r == "classic"}
    assert not bad, f"ClickBench route regressions: {bad}"


@pytest.fixture(scope="module")
def tpch_ctx():
    from liquid_tpu.bench.tpch_data import generate
    tdir = "/tmp/liquid_route_fence_tpch_0.01"
    if not os.path.exists(os.path.join(tdir, "lineitem.parquet")):
        os.makedirs(tdir, exist_ok=True)
        for name, t in generate(0.01).items():
            pq.write_table(t, f"{tdir}/{name}.parquet.tmp",
                           row_group_size=1 << 20)
            os.replace(f"{tdir}/{name}.parquet.tmp",
                       f"{tdir}/{name}.parquet")
    sess, _ = make_session("liquid", 4 << 30, tempfile.mkdtemp())
    for p in sorted(glob.glob(f"{tdir}/*.parquet")):
        sess.register_parquet(os.path.basename(p)[:-8], p)
    return sess


def test_tpch_route_fence(tpch_ctx):
    from liquid_tpu.bench import tpch_queries
    routed = {}
    for qid in EXPECT_TPCH_STAR + EXPECT_TPCH_FUSED:
        sql = tpch_queries.QUERIES[qid]
        b_f = STATS.get("fused_queries", 0)
        b_s = STATS.get("star_queries", 0)
        b_sel = STATS.get("fused_selects", 0)
        if isinstance(sql, list):
            for stmt in sql:
                tpch_ctx.sql(stmt)
        else:
            tpch_ctx.sql(sql)
        routed[qid] = _route(b_f, b_s, b_sel)
    bad = {q: r for q, r in routed.items()
           if (q in EXPECT_TPCH_STAR and r != "star")
           and (q in EXPECT_TPCH_FUSED and r != "fused")}
    # star/fused may legitimately flip between each other (both are
    # device paths); only a fall to CLASSIC is a regression
    bad = {q: r for q, r in routed.items() if r == "classic"}
    assert not bad, f"TPC-H route regressions: {bad}"
