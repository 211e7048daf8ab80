"""Regression tests for the round-3 code-review findings (each test is
one confirmed finding from the post-fused-engine review pass):

1. distributed multi-key equi-joins dropped all but one key column
   (covered in tests/test_dist_join.py::test_multi_key_* -- needs the
   8-device mesh fixture)
2. TopK dynamic-filter thresholds poisoned by NaN values
3. partition-parallel server scans must reject subqueries (a subquery
   must see the FULL table, not one partition's row-group slice)
4. fused aggregation compiled SQL int/int "/" as f64 true division
5. planner literal folding used Python true division for int literals
6. fused prep caches bypassed the cache memory budget
"""
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from liquid_tpu.bench.runner import make_session


def _session():
    return make_session("liquid", 1 << 30, tempfile.mkdtemp())


# -- finding 2: NaN-poisoned TopK threshold ------------------------------------

def test_topk_threshold_ignores_nan():
    """NaN sorts greatest under pyarrow, so a float DESC LIMIT whose
    early row groups contain NaN used to install a NaN threshold --
    every later comparison is False, pruning row groups that hold real
    top values."""
    n = 30_000
    rng = np.random.default_rng(7)
    v = rng.uniform(0, 100, n)
    v[:64] = np.nan            # NaNs live in row group 0
    v[-5:] = [990, 991, 992, 993, 994]   # true top values in the LAST rg
    t = pa.table({"f": v, "i": np.arange(n, dtype=np.int64)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=10_000)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    # LIMIT > #NaN: the tail of the top-k comes from the LAST row
    # group; a NaN threshold would have pruned it away
    lim = ctx.sql("SELECT f, i FROM t ORDER BY f DESC LIMIT 70").to_arrow()
    got_i = set(lim.column("i").to_pylist())
    assert len(got_i) == 70
    assert {n - 1, n - 2, n - 3, n - 4, n - 5} <= got_i
    # multiset of keys matches the numpy reference (NaN greatest)
    ref = np.sort(np.where(np.isnan(v), np.inf, v))[::-1][:70]
    got = np.sort(np.nan_to_num(np.array(lim.column("f").to_pylist()),
                                nan=np.inf))[::-1]
    assert np.array_equal(ref, got)


def test_topk_desc_keeps_nan_in_late_row_groups():
    """NaN sorts GREATEST, so NaN rows in a LATE row group belong at
    the head of a DESC top-k even after earlier row groups installed a
    finite threshold -- the threshold must keep them (keep_nan)."""
    n = 30_000
    rng = np.random.default_rng(21)
    v = rng.uniform(0, 100, n)
    v[-8:] = np.nan              # NaNs ONLY in the last row group
    t = pa.table({"f": v, "i": np.arange(n, dtype=np.int64)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=10_000)
    ctx, _ = _session()
    ctx.register_parquet("t", path)
    lim = ctx.sql("SELECT f, i FROM t ORDER BY f DESC LIMIT 10").to_arrow()
    got_i = lim.column("i").to_pylist()
    assert set(range(n - 8, n)) <= set(got_i), got_i  # all 8 NaN rows
    ref = np.sort(np.where(np.isnan(v), np.inf, v))[::-1][:10]
    got = np.sort(np.nan_to_num(np.array(lim.column("f").to_pylist()),
                                nan=np.inf))[::-1]
    assert np.array_equal(ref, got)
    # ASC with NaN present stays exact too (NaN sorts last: never top-k)
    asc = ctx.sql("SELECT f FROM t ORDER BY f ASC LIMIT 10").to_arrow()
    ref = np.sort(v[~np.isnan(v)])[:10]
    assert np.allclose(sorted(asc.column("f").to_pylist()), ref)


def test_float_filter_with_nan_batches_matches_arrow():
    """Zone maps must not record NaN min/max bounds; a NaN bound makes
    every zone comparison False, which (depending on the prune
    direction) can drop batches that contain matching rows."""
    n = 24_576
    rng = np.random.default_rng(11)
    v = rng.uniform(0, 100, n)
    v[8192:8200] = np.nan      # NaNs inside the middle batch
    t = pa.table({"f": v})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path, row_group_size=n)
    ctx, _ = _session()
    ctx.register_parquet("t", path)
    got = ctx.sql("SELECT count(*) AS n FROM t WHERE f < 50").to_arrow()
    expect = int(np.sum(v[~np.isnan(v)] < 50))
    assert got.column("n").to_pylist() == [expect]


# -- finding 3: partitionable scan with a subquery ----------------------------

def test_partition_scan_rejects_subquery():
    from liquid_tpu.cache.core import LiquidCacheBuilder
    from liquid_tpu.server.flight import LiquidCacheServiceInner
    tmp = tempfile.mkdtemp()
    n = 16_384
    rng = np.random.default_rng(5)
    t = pa.table({"v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
                  "g": pa.array((np.arange(n) // 8192).astype(np.int64))})
    path = f"{tmp}/t.parquet"
    pq.write_table(t, path, row_group_size=8192)
    cache = LiquidCacheBuilder().with_disk_path(f"{tmp}/store.bin").build()
    inner = LiquidCacheServiceInner(cache)
    sql = ("SELECT v FROM t WHERE v > "
           "(SELECT avg(v) FROM t WHERE g = 1)")
    inner.register_plan(sql, "h", {"t": path}, partitions=2)
    # the scalar subquery must see the FULL table -> not partitionable
    assert inner.plans["h"]["scan_table"] is None
    parts = [inner.execute_partition("h", p) for p in range(2)]
    got = sorted(pa.concat_tables(parts).column("v").to_pylist())
    df = t.to_pandas()
    thr = df[df.g == 1].v.mean()
    assert got == sorted(df[df.v > thr].v.tolist())


# -- findings 4+5: SQL integer division ---------------------------------------

def test_fused_integer_division_truncates():
    """sum(v / 3) over int64 must use SQL integer division (trunc
    toward zero), not f64 true division -- the fused compiler bails to
    the classic path for int/int '/'."""
    n = 20_000
    rng = np.random.default_rng(3)
    v = rng.integers(-1000, 1000, n).astype(np.int64)
    t = pa.table({"v": v, "k": rng.integers(0, 8, n).astype(np.int64)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path)
    ctx, _ = _session()
    ctx.register_parquet("t", path)
    got = ctx.sql("SELECT sum(v / 3) AS s FROM t WHERE k < 6").to_arrow()
    tv = v[t.column("k").to_numpy() < 6]
    trunc = np.sign(tv) * (np.abs(tv) // 3)
    assert got.column("s").to_pylist() == [int(trunc.sum())]
    # output type stays integral, matching SQL int division
    assert pa.types.is_integer(got.column("s").type)


def test_literal_integer_division_folds_truncated():
    """`7 / 2` in a WHERE literal folds to 3 (SQL int division), not
    3.5 -- rows with v == 3 distinguish the two."""
    t = pa.table({"v": pa.array([1, 2, 3, 3, 4], pa.int64())})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path)
    ctx, _ = _session()
    ctx.register_parquet("t", path)
    got = ctx.sql("SELECT count(*) AS n FROM t WHERE v < 7 / 2").to_arrow()
    assert got.column("n").to_pylist() == [2]        # v in {1, 2}
    got = ctx.sql("SELECT count(*) AS n FROM t WHERE v < -7 / 2").to_arrow()
    assert got.column("n").to_pylist() == [0]        # -7/2 -> -3 (trunc)


# -- finding 6: fused prep cache budget accounting -----------------------------

def test_fused_prep_reserves_cache_budget():
    import liquid_tpu.sql.fused_agg as fa
    n = 65_536
    rng = np.random.default_rng(9)
    t = pa.table({"v": rng.integers(0, 1 << 20, n).astype(np.int64),
                  "k": rng.integers(0, 16, n).astype(np.int64)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    sql = "SELECT k, sum(v) AS s FROM t GROUP BY k"
    ctx.sql(sql).to_arrow()
    table = ctx._tables["t"]
    variants = getattr(table, "_fused_prep", {})
    cached = [ent for col in variants.values() for ent in col.values()]
    assert cached, "fused prep was not cached"
    prep_bytes = sum(ent[2] for ent in cached)
    assert prep_bytes > 0
    assert cache.budget.memory_used >= prep_bytes
    # a repeat query hits the cache: no double reservation
    before = cache.budget.memory_used
    ctx.sql(sql).to_arrow()
    assert cache.budget.memory_used == before


def test_fused_prep_uncached_when_budget_exhausted():
    n = 32_768
    rng = np.random.default_rng(13)
    t = pa.table({"v": rng.integers(0, 1 << 20, n).astype(np.int64),
                  "k": rng.integers(0, 16, n).astype(np.int64)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    # populate column cache + preps, then drop the preps (releasing
    # their reservation, as eviction would) and exhaust the budget
    ctx.sql("SELECT k, sum(v) AS s FROM t GROUP BY k").to_arrow()
    table = ctx._tables["t"]
    variants = getattr(table, "_fused_prep", {})
    for col_variants in variants.values():
        for ent in col_variants.values():
            cache.budget.release_memory(ent[2])
        col_variants.clear()
    head = cache.budget.max_memory_bytes - cache.budget.memory_used
    assert cache.budget.try_reserve_memory(head)
    try:
        out = ctx.sql("SELECT k, sum(v) AS s FROM t GROUP BY k").to_arrow()
        df = t.to_pandas().groupby("k", as_index=False).v.sum()
        got = dict(zip(out.column("k").to_pylist(),
                       out.column("s").to_pylist()))
        assert got == dict(zip(df.k, df.v))
        # nothing was cached (no budget), and nothing was leaked
        variants = getattr(table, "_fused_prep", {})
        assert not any(col for col in variants.values())
        assert cache.budget.memory_used <= cache.budget.max_memory_bytes
    finally:
        cache.budget.release_memory(head)


def test_prep_budget_released_on_table_replacement():
    """Re-registering a table name replaces the ParquetTable object;
    the old object's fused-prep budget reservations must be released
    (they used to leak ~200KB per re-registration)."""
    n = 65_536
    rng = np.random.default_rng(17)
    t = pa.table({"v": rng.integers(0, 1 << 20, n).astype(np.int64),
                  "k": rng.integers(0, 16, n).astype(np.int64)})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path)
    ctx, cache = _session()
    ctx.register_parquet("t", path)
    ctx.sql("SELECT k, sum(v) AS s FROM t GROUP BY k").to_arrow()
    used_once = cache.budget.memory_used
    for _ in range(3):
        ctx.register_parquet("t", path)
        ctx.sql("SELECT k, sum(v) AS s FROM t GROUP BY k").to_arrow()
    # same cache entries + one generation of preps: no growth across
    # re-registrations (entries re-used; preps released with the table)
    assert cache.budget.memory_used <= used_once + 1024, \
        (cache.budget.memory_used, used_once)


def test_star_derived_table_reports_real_columns():
    """exec._relation_columns must expand `select *` through derived
    tables (predicate pushdown and join-edge ownership depend on it);
    it used to report a bogus '*'-rendered column."""
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "x": pa.array([10, 20, 30], pa.int64())})
    path = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, path)
    ctx, _ = _session()
    ctx.register_parquet("t", path)
    from liquid_tpu.sql.parser import parse_statement
    q = parse_statement(
        "select a.id from (select * from t) a, (select * from t) b "
        "where a.id = b.id")[1]
    qq = ctx._exec._qualify(q)
    leaves = []
    ctx._exec._leaf_relations(qq.from_, leaves)
    cols = ctx._exec._relation_columns(leaves[0])
    assert sorted(cols) == ["a__id", "a__x"], cols
    # and the query itself runs with correct results
    out = ctx.sql(
        "select count(*) as n from (select * from t) a, (select * from t) b "
        "where a.id = b.id and a.x > 10").to_arrow()
    assert out.column("n").to_pylist() == [2]
