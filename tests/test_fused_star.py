"""Fused star-join pipeline (sql/fused_star): routing + semantics.

The whole-device join path must be bit-exact vs the classic host join
path on every shape it accepts, and must BAIL (not approximate) on
shapes it cannot serve exactly (N:M joins, outer joins).  Reference
behavior: DataFusion's HashJoinExec over the LiquidCacheReader hot
loop (liquid-cache reader/runtime/liquid_cache_reader.rs:118-161).
"""
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from liquid_tpu.sql.fused_agg import STATS


@pytest.fixture()
def strict(monkeypatch):
    monkeypatch.setenv("LIQUID_FUSED_STRICT", "1")


def _session():
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    return LiquidCacheLocalBuilder().with_max_memory_bytes(1 << 30) \
        .with_cache_dir(tempfile.mkdtemp()).build()


def _register(ctx, **tables):
    d = tempfile.mkdtemp()
    for name, t in tables.items():
        pq.write_table(t, f"{d}/{name}.parquet")
        ctx.register_parquet(name, f"{d}/{name}.parquet")


def _stars():
    return STATS.get("star_queries", 0), STATS.get("star_bailouts", 0)


def _dual(sql, **tables):
    """Run `sql` with the star path on and off; assert identical
    results; return (star result, ran_star)."""
    ctx, _ = _session()
    _register(ctx, **tables)
    b_star, _ = _stars()
    got = ctx.sql(sql).to_arrow()
    ran_star = STATS.get("star_queries", 0) > b_star

    os.environ["LIQUID_FUSED_STAR"] = "0"
    try:
        ctx2, _ = _session()
        _register(ctx2, **tables)
        want = ctx2.sql(sql).to_arrow()
    finally:
        os.environ.pop("LIQUID_FUSED_STAR", None)

    assert got.num_rows == want.num_rows, (got, want)
    for i in range(want.num_columns):
        a, b = got.column(i), want.column(i)
        if pa.types.is_floating(b.type):
            av = np.asarray(a.cast(pa.float64()), dtype=float)
            bv = np.asarray(b.cast(pa.float64()), dtype=float)
            nan = np.isnan(av) & np.isnan(bv)
            assert (nan | np.isclose(av, bv, rtol=1e-9)).all(), (a, b)
        else:
            assert a.to_pylist() == b.to_pylist(), (a, b)
    return got, ran_star


def _fact_dim(n=5000, dn=64, seed=0, null_fk=False, dup_dim=False):
    rng = np.random.default_rng(seed)
    fk = rng.integers(0, dn + 10, n)  # some keys miss the dim
    fact = pa.table({
        "fk": pa.array(fk, pa.int64()) if not null_fk else pa.array(
            [None if i % 7 == 0 else int(v) for i, v in enumerate(fk)],
            pa.int64()),
        "amt": pa.array(rng.random(n) * 100),
        "qty": pa.array(rng.integers(0, 50, n), pa.int64()),
    })
    dk = np.arange(dn, dtype=np.int64)
    if dup_dim:
        dk = np.concatenate([dk, dk[:5]])
    dim = pa.table({
        "dk": pa.array(dk),
        "grp": pa.array([f"g{int(k) % 7}" for k in dk]),
        "w": pa.array((dk % 13).astype(np.float64)),
    })
    return fact, dim


def test_star_basic_grouped(strict):
    fact, dim = _fact_dim()
    _, ran = _dual(
        "SELECT grp, sum(amt) s, count(*) c FROM fact "
        "JOIN dim ON fk = dk GROUP BY grp ORDER BY grp",
        fact=fact, dim=dim)
    assert ran


def test_star_scalar_no_group(strict):
    fact, dim = _fact_dim()
    _, ran = _dual(
        "SELECT sum(amt * w), count(*), min(qty), max(w) "
        "FROM fact, dim WHERE fk = dk AND qty < 25 AND w > 2",
        fact=fact, dim=dim)
    assert ran


def test_star_null_fact_keys_never_match(strict):
    fact, dim = _fact_dim(null_fk=True)
    _, ran = _dual(
        "SELECT grp, count(*) c FROM fact JOIN dim ON fk = dk "
        "GROUP BY grp ORDER BY grp", fact=fact, dim=dim)
    assert ran


def test_star_duplicate_dim_keys_bail_exact(strict):
    """N:M join: the star path must detect the duplicate build keys on
    device and fall back to the classic path (row multiplication)."""
    fact, dim = _fact_dim(dup_dim=True)
    b_dup = STATS.get("star_dup_bails", 0)
    _, ran = _dual(
        "SELECT grp, count(*) c FROM fact JOIN dim ON fk = dk "
        "GROUP BY grp ORDER BY grp", fact=fact, dim=dim)
    assert not ran
    assert STATS.get("star_dup_bails", 0) > b_dup


def test_star_empty_dim_annihilates(strict):
    fact, dim = _fact_dim()
    _, ran = _dual(
        "SELECT grp, count(*) c FROM fact JOIN dim ON fk = dk "
        "WHERE w > 1e9 GROUP BY grp", fact=fact, dim=dim)
    # empty dim -> impossible probe range -> empty fact scan; either
    # way the star path must complete with a typed empty result
    assert ran


def test_star_dim_group_key_and_case(strict):
    """Group by dim string payload; CASE over dim payload in an
    aggregate input (the TPC-H q12 shape)."""
    fact, dim = _fact_dim()
    _, ran = _dual(
        "SELECT grp, sum(case when w > 5 then qty else 0 end) s "
        "FROM fact JOIN dim ON fk = dk GROUP BY grp ORDER BY grp",
        fact=fact, dim=dim)
    assert ran


def test_star_snowflake_cascade(strict):
    """fact -> mid -> leaf chain: leaf payloads cascade through mid's
    build into the fact probe (the TPC-H q5/q10 nation/region shape)."""
    rng = np.random.default_rng(3)
    n = 4000
    fact = pa.table({
        "mk": pa.array(rng.integers(0, 50, n), pa.int64()),
        "amt": pa.array(rng.random(n)),
    })
    mid = pa.table({
        "m_id": pa.array(np.arange(50, dtype=np.int64)),
        "lk": pa.array((np.arange(50) % 8).astype(np.int64)),
    })
    leaf = pa.table({
        "l_id": pa.array(np.arange(8, dtype=np.int64)),
        "lname": pa.array([f"L{i}" for i in range(8)]),
    })
    _, ran = _dual(
        "SELECT lname, sum(amt) s, count(*) c FROM fact, mid, leaf "
        "WHERE mk = m_id AND lk = l_id AND lname <> 'L3' "
        "GROUP BY lname ORDER BY lname",
        fact=fact, mid=mid, leaf=leaf)
    assert ran


def test_star_cross_dim_residual_equality(strict):
    """A non-tree equality (cycle) evaluates as a fact-level residual
    over gathered payloads (the TPC-H q5 c_nationkey=s_nationkey
    shape)."""
    rng = np.random.default_rng(4)
    n = 3000
    fact = pa.table({
        "ak": pa.array(rng.integers(0, 40, n), pa.int64()),
        "bk": pa.array(rng.integers(0, 40, n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
    })
    da = pa.table({
        "a_id": pa.array(np.arange(40, dtype=np.int64)),
        "a_tag": pa.array((np.arange(40) % 5).astype(np.int64)),
    })
    db = pa.table({
        "b_id": pa.array(np.arange(40, dtype=np.int64)),
        "b_tag": pa.array((np.arange(40) % 5).astype(np.int64)),
    })
    _, ran = _dual(
        "SELECT a_tag, sum(v) s FROM fact, da, db "
        "WHERE ak = a_id AND bk = b_id AND a_tag = b_tag "
        "GROUP BY a_tag ORDER BY a_tag",
        fact=fact, da=da, db=db)
    assert ran


def test_star_outer_join_bails(strict):
    fact, dim = _fact_dim()
    _, ran = _dual(
        "SELECT grp, count(*) c FROM fact LEFT JOIN dim ON fk = dk "
        "GROUP BY grp ORDER BY grp", fact=fact, dim=dim)
    assert not ran


def test_star_date_group_key_from_dim(strict):
    """Dim date32 payload as a group key (the TPC-H q3 o_orderdate
    shape)."""
    import datetime
    rng = np.random.default_rng(5)
    n = 3000
    fact = pa.table({
        "ok": pa.array(rng.integers(0, 100, n), pa.int64()),
        "amt": pa.array(rng.random(n)),
    })
    base = datetime.date(1995, 1, 1)
    dim = pa.table({
        "o_id": pa.array(np.arange(100, dtype=np.int64)),
        "odate": pa.array([base + datetime.timedelta(days=int(i) % 10)
                           for i in range(100)], pa.date32()),
        "prio": pa.array((np.arange(100) % 3).astype(np.int64)),
    })
    _, ran = _dual(
        "SELECT odate, prio, sum(amt) s FROM fact JOIN dim ON ok = o_id"
        " GROUP BY odate, prio ORDER BY odate, prio",
        fact=fact, dim=dim)
    assert ran


def test_tpch_star_routing():
    """The expected TPC-H fused-star set must not shrink (VERDICT r3
    item 3: silent routing regressions must be visible)."""
    from liquid_tpu.bench import tpch_data, tpch_queries
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    d = tempfile.mkdtemp()
    tables = tpch_data.generate(0.005)
    paths = tpch_data.write_parquet(tables, d)
    sess, _ = (LiquidCacheLocalBuilder().with_max_memory_bytes(1 << 30)
               .with_cache_dir(d).build())
    for n, p in paths.items():
        sess.register_parquet(n, p)
    routed = {}
    for qid in (3, 5, 10, 12, 14, 19):
        before = STATS.get("star_queries", 0)
        sess.sql(tpch_queries.QUERIES[qid]).to_arrow()
        routed[qid] = STATS.get("star_queries", 0) > before
    assert all(routed.values()), routed


def test_clickbench_fused_routing():
    """The expected ClickBench fused set must not shrink (VERDICT r3
    item 3: a silent route regression would read as a 10-100x
    slowdown).  SUITE_r04.json records the full-scale on-chip routing
    (38 fused + 9 star + 18 classic of 65); this pins a representative
    subset at test scale."""
    import pathlib
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    repo = pathlib.Path(__file__).resolve().parents[1]
    import numpy as np
    import pyarrow.parquet as pq
    src = pq.read_table(repo / "benchmark/data/nano_hits.parquet")
    d = tempfile.mkdtemp()
    path = f"{d}/hits.parquet"
    pq.write_table(src, path)
    sess, _ = (LiquidCacheLocalBuilder().with_max_memory_bytes(1 << 30)
               .with_cache_dir(d).build())
    sess.register_parquet("hits", path)
    # queries that MUST run on a fused device path (classic means a
    # silent order-of-magnitude regression at bench scale)
    expect_fused = [1, 2, 3, 4, 7, 8, 12, 14, 15, 16, 17, 21, 30, 34,
                    35, 40]
    routed = {}
    for i in expect_fused:
        sql = open(repo / f"benchmark/clickbench/queries/q{i}.sql") \
            .read().strip().rstrip(";")
        before = STATS.get("fused_queries", 0)
        sess.sql(sql)
        routed[i] = STATS.get("fused_queries", 0) > before
    assert all(routed.values()), \
        {i: v for i, v in routed.items() if not v}


def _fact_ps(n=6000, nparts=40, nsupps=6, seed=3):
    """TPC-H q9 shape: fact joins a dim on a COMPOSITE key
    (ps_partkey, ps_suppkey) that is unique only as a pair."""
    rng = np.random.default_rng(seed)
    pk = rng.integers(1, nparts + 1, n)
    sk = rng.integers(1, nsupps + 1, n)
    fact = pa.table({
        "l_pk": pa.array(pk, pa.int64()),
        "l_sk": pa.array(sk, pa.int64()),
        "l_qty": pa.array(rng.integers(1, 50, n), pa.int64()),
    })
    pairs = [(p, s) for p in range(1, nparts + 1)
             for s in range(1, nsupps + 1)]
    ps = pa.table({
        "ps_pk": pa.array([p for p, _ in pairs], pa.int64()),
        "ps_sk": pa.array([s for _, s in pairs], pa.int64()),
        "ps_cost": pa.array([(p * 31 + s * 7) % 97 + 0.25
                             for p, s in pairs]),
    })
    return fact, ps


def test_star_composite_key_dim(strict):
    """Composite (two-column) join keys build a sorted chain index
    instead of bailing on the single-key dup check (TPC-H q9's
    partsupp; reference q9 runs through DataFusion HashJoinExec)."""
    fact, ps = _fact_ps()
    got, ran = _dual(
        "SELECT l_sk, SUM(ps_cost * l_qty) AS amount, "
        "COUNT(*) AS c FROM fact, ps "
        "WHERE ps_pk = l_pk AND ps_sk = l_sk "
        "GROUP BY l_sk ORDER BY l_sk",
        fact=fact, ps=ps)
    assert ran, "composite-key star did not route"


def test_star_composite_key_missing_pairs(strict):
    """Fact rows whose (pk, sk) pair is absent from the dim drop
    (INNER); rows whose pk exists but sk differs must NOT match."""
    fact, ps = _fact_ps(n=3000, nparts=20, nsupps=6)
    # keep only even suppkeys in the dim: odd-sk fact rows must drop
    import pyarrow.compute as pc
    ps2 = ps.filter(pc.equal(pc.bit_wise_and(ps["ps_sk"], 1), 0))
    got, ran = _dual(
        "SELECT SUM(l_qty) AS s, COUNT(*) AS c FROM fact, ps "
        "WHERE ps_pk = l_pk AND ps_sk = l_sk",
        fact=fact, ps=ps2)
    assert ran


def test_star_composite_dup_pair_bails(strict):
    """A duplicated (pk, sk) PAIR defeats N:1 -- the star path must
    bail to the classic join, not return approximate rows."""
    fact, ps = _fact_ps(n=1000, nparts=10, nsupps=4)
    dup = ps.take(pa.array(list(range(ps.num_rows)) + [0, 1],
                           pa.int64()))
    got, ran = _dual(
        "SELECT SUM(l_qty * ps_cost) AS s FROM fact, ps "
        "WHERE ps_pk = l_pk AND ps_sk = l_sk",
        fact=fact, ps=dup)
    assert not ran, "dup composite pair must bail"
