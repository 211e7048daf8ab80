"""Regression tests for the round-1 code-review findings (each test is
one confirmed finding from the high-effort review pass)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def sess(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    t = pa.table({
        "k": pa.array([1, 2, 3, 4, None], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "t.parquet"))
    s, c = LiquidCacheLocalBuilder().with_cache_dir(str(tmp_path)).build()
    s.register_parquet("t", str(tmp_path / "t.parquet"))
    return s


def q(sess, sql):
    return sess.sql(sql).to_arrow()


def test_mixed_union_chain_left_associative(sess):
    # a UNION a UNION ALL b  ->  dedup(a,a) then append b
    out = q(sess, "select 1 as x union select 1 as x union all select 2 as x")
    assert sorted(out.column("x").to_pylist()) == [1, 2]
    # a UNION ALL a UNION b -> final union dedups everything
    out = q(sess, "select 1 as x union all select 1 as x union select 2 as x")
    assert sorted(out.column("x").to_pylist()) == [1, 2]
    # pure UNION ALL keeps duplicates
    out = q(sess, "select 1 as x union all select 1 as x")
    assert out.column("x").to_pylist() == [1, 1]


def test_union_offset_applies_to_combined(sess):
    out = q(sess, "select v from t where v <= 20 union all "
                  "select v from t where v >= 40 order by v limit 2 offset 1")
    assert out.column("v").to_pylist() == [20, 40]


def test_cte_does_not_clobber_stored_view(sess):
    sess.sql("create view w as select v from t where v > 30")
    out = q(sess, "with w as (select v from t where v <= 20) "
                  "select count(*) as c from w")
    assert out.column("c")[0].as_py() == 2
    # the stored view survives the CTE shadowing
    out = q(sess, "select count(*) as c from w")
    assert out.column("c")[0].as_py() == 2  # v in (40, 50)
    sess.sql("drop view w")


def test_not_in_list_with_null_literal(sess):
    out = q(sess, "select v from t where v not in (10, null)")
    assert out.num_rows == 0  # never TRUE under 3VL
    out = q(sess, "select v from t where v in (10, null) order by v")
    assert out.column("v").to_pylist() == [10]


def test_modulo_takes_dividend_sign(sess):
    out = q(sess, "select (0 - 7) % 3 as m, 7 % 3 as p from t limit 1")
    assert out.column("m")[0].as_py() == -1
    assert out.column("p")[0].as_py() == 1


def test_constant_group_key_aggregates(sess):
    out = q(sess, "select 'all' as g, count(*) as c from t group by g")
    assert out.num_rows == 1
    assert out.column("c")[0].as_py() == 5


def test_correlated_exists_with_null_keys(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    a = pa.table({"ak": pa.array([1, 2, None], pa.int64()),
                  "av": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"bk": pa.array([1, None], pa.int64()),
                  "bv": pa.array([10, 20], pa.int64())})
    pq.write_table(a, str(tmp_path / "a.parquet"))
    pq.write_table(b, str(tmp_path / "b.parquet"))
    s, _ = LiquidCacheLocalBuilder().with_cache_dir(str(tmp_path)).build()
    s.register_parquet("a", str(tmp_path / "a.parquet"))
    s.register_parquet("b", str(tmp_path / "b.parquet"))
    # NULL = NULL must NOT match: only ak=1 has a partner
    out = s.sql("select av from a where exists "
                "(select * from b where bk = ak)").to_arrow()
    assert out.column("av").to_pylist() == [1]
    # NOT EXISTS with a NULL correlation key: subquery is empty -> TRUE
    out = s.sql("select av from a where not exists "
                "(select * from b where bk = ak) order by av").to_arrow()
    assert out.column("av").to_pylist() == [2, 3]
    # correlated scalar lookup: NULL keys resolve to NULL, filtered out
    out = s.sql("select av from a where av < "
                "(select sum(bv) from b where bk = ak)").to_arrow()
    assert out.column("av").to_pylist() == [1]


def test_residual_corr_lookup_on_single_table(tmp_path):
    """Correlated EXISTS with a non-equality extra term over ONE table:
    the residual filter must not try to fetch inner-table columns."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    t = pa.table({"k": pa.array([1, 1, 2, 2], pa.int64()),
                  "v": pa.array([5, 6, 7, 7], pa.int64())})
    pq.write_table(t, str(tmp_path / "t.parquet"))
    s, _ = LiquidCacheLocalBuilder().with_cache_dir(str(tmp_path)).build()
    s.register_parquet("t", str(tmp_path / "t.parquet"))
    out = s.sql("select k, v from t where exists (select * from t u "
                "where u.k = t.k and u.v <> t.v) order by v").to_arrow()
    # k=1 rows differ in v (5 vs 6) -> both survive; k=2 rows are equal
    assert out.column("v").to_pylist() == [5, 6]


def test_disk_budget_no_leak_on_resqueeze(tmp_path):
    """Squeeze -> hydrate -> squeeze cycles must not leak disk budget."""
    from liquid_tpu.cache import LiquidCacheBuilder
    cache = (LiquidCacheBuilder()
             .with_max_memory_bytes(1 << 22)
             .with_max_disk_bytes(1 << 20)
             .with_disk_path(str(tmp_path / "s.bin"))
             .build())
    arr = pa.array(np.arange(8192, dtype=np.int64))
    cache.insert(1, arr)
    for _ in range(16):
        cache._squeeze_victim(1)   # -> squeezed (writes backing)
        got = cache.get(1)         # hydrates back to memory
        assert got.to_pylist() == arr.to_pylist()
    # the backing record is stored once; budget must track ~one copy
    assert cache.budget.disk_used <= 2 * cache.store.live_bytes + 64
