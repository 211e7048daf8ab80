"""Adversarial SQL semantics: three-valued logic, NULL joins, empty
inputs, type edges -- the places engines silently diverge.

The reference inherits these from DataFusion; every case here is checked
against the SQL-standard behavior (and, where easy, a pandas oracle).
"""
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
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "x": pa.array([10, None, 30, None, 50], pa.int64()),
        "s": pa.array(["a", "b", None, "d", "e"], pa.string()),
    })
    u = pa.table({
        "uid": pa.array([1, 2, None, 4], pa.int64()),
        "w": pa.array([100, 200, 300, 400], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "t.parquet"))
    pq.write_table(u, str(tmp_path / "u.parquet"))
    s, _ = LiquidCacheLocalBuilder().with_cache_dir(str(tmp_path)).build()
    s.register_parquet("t", str(tmp_path / "t.parquet"))
    s.register_parquet("u", str(tmp_path / "u.parquet"))
    return s


def q(sess, sql):
    return sess.sql(sql).to_arrow()


def test_null_comparison_filters_row(sess):
    out = q(sess, "select id from t where x > 5 order by id")
    assert out.column("id").to_pylist() == [1, 3, 5]
    out = q(sess, "select id from t where not (x > 5) order by id")
    assert out.column("id").to_pylist() == []  # NOT NULL is still NULL


def test_not_in_subquery_with_nulls_matches_nothing(sess):
    # u.uid contains NULL -> NOT IN is never true (three-valued logic)
    out = q(sess, "select id from t where id not in (select uid from u)")
    assert out.num_rows == 0


def test_in_subquery_with_nulls_matches_known(sess):
    out = q(sess, "select id from t where id in (select uid from u) order by id")
    assert out.column("id").to_pylist() == [1, 2, 4]


def test_in_list_with_null_operand(sess):
    out = q(sess, "select id from t where x in (10, 50) order by id")
    assert out.column("id").to_pylist() == [1, 5]


def test_count_ignores_nulls_count_star_does_not(sess):
    out = q(sess, "select count(*) as a, count(x) as b, count(s) as c from t")
    assert out.column("a")[0].as_py() == 5
    assert out.column("b")[0].as_py() == 3
    assert out.column("c")[0].as_py() == 4


def test_sum_avg_null_handling(sess):
    out = q(sess, "select sum(x) as s, avg(x) as a from t where x is null")
    assert out.column("s")[0].as_py() is None
    assert out.column("a")[0].as_py() is None
    out = q(sess, "select sum(x) as s from t")
    assert out.column("s")[0].as_py() == 90


def test_group_by_null_key_forms_group(sess):
    out = q(sess, "select x, count(*) as c from t group by x order by x")
    d = dict(zip(out.column("x").to_pylist(), out.column("c").to_pylist()))
    assert d[None] == 2 and d[10] == 1


def test_join_null_keys_never_match(sess):
    out = q(sess, "select id, w from t, u where id = uid order by id")
    assert out.column("id").to_pylist() == [1, 2, 4]


def test_left_join_preserves_unmatched(sess):
    out = q(sess, "select id, w from t left join u on id = uid order by id")
    assert out.num_rows == 5
    d = dict(zip(out.column("id").to_pylist(), out.column("w").to_pylist()))
    assert d[3] is None and d[5] is None and d[1] == 100


def test_is_distinct_semantics_via_is_null(sess):
    out = q(sess, "select count(*) as c from t where x is null")
    assert out.column("c")[0].as_py() == 2
    out = q(sess, "select count(*) as c from t where x is not null")
    assert out.column("c")[0].as_py() == 3


def test_string_null_in_like(sess):
    out = q(sess, "select id from t where s like '%a%' order by id")
    assert out.column("id").to_pylist() == [1]  # NULL never matches


def test_empty_table_aggregates(sess):
    out = q(sess, "select count(*) as c, sum(x) as s, min(x) as m from t "
                  "where id > 100")
    assert out.column("c")[0].as_py() == 0
    assert out.column("s")[0].as_py() is None
    assert out.column("m")[0].as_py() is None


def test_empty_group_by_returns_no_rows(sess):
    out = q(sess, "select x, count(*) as c from t where id > 100 group by x")
    assert out.num_rows == 0


def test_case_null_propagation(sess):
    out = q(sess, "select id, case when x > 20 then 'big' else 'small' end "
                  "as sz from t order by id")
    # NULL condition -> ELSE branch (CASE WHEN NULL is not-true)
    assert out.column("sz").to_pylist() == [
        "small", "small", "big", "small", "big"]


def test_distinct_with_nulls(sess):
    out = q(sess, "select distinct x from t")
    vals = out.column("x").to_pylist()
    assert len(vals) == 4 and None in vals


def test_union_distinct_dedups_across_members(sess):
    out = q(sess, "select id from t where id <= 2 union select id from t "
                  "where id <= 3 order by id")
    assert out.column("id").to_pylist() == [1, 2, 3]


def test_stddev_var_median_approx_distinct(sess):
    import numpy as np
    out = q(sess, "select stddev(id) as sd, var(id) as vr, "
                  "median(id) as md, approx_distinct(id) as ad from t")
    vals = np.array([1, 2, 3, 4, 5], dtype=float)
    assert abs(out.column("vr")[0].as_py() - vals.var(ddof=1)) < 1e-12
    assert abs(out.column("sd")[0].as_py() - vals.std(ddof=1)) < 1e-12
    assert out.column("md")[0].as_py() == 3.0
    assert out.column("ad")[0].as_py() == 5


def test_grouped_stddev_median(sess):
    out = q(sess, "select id % 2 as g, var(id) as vr, median(id) as md "
                  "from t group by g order by g")
    # g=0: ids 2,4 -> var 2.0, median 3.0 ; g=1: ids 1,3,5 -> var 4.0, med 3
    assert out.column("vr").to_pylist() == [2.0, 4.0]
    assert out.column("md").to_pylist() == [3.0, 3.0]


def test_intersect_distinct(sess):
    out = sess.sql("""
        SELECT id FROM t WHERE id <= 3
        INTERSECT
        SELECT id FROM t WHERE id >= 2""").to_arrow()
    assert sorted(out.column(0).to_pylist()) == [2, 3]


def test_except_distinct(sess):
    out = sess.sql("""
        SELECT id FROM t
        EXCEPT
        SELECT id FROM t WHERE id >= 3""").to_arrow()
    assert sorted(out.column(0).to_pylist()) == [1, 2]


def test_intersect_nulls_compare_equal(sess):
    out = sess.sql("""
        SELECT x FROM t
        INTERSECT
        SELECT x FROM t""").to_arrow()
    vals = out.column(0).to_pylist()
    assert None in vals  # NULL intersects with NULL (set-op semantics)
    assert sorted(v for v in vals if v is not None) == [10, 30, 50]


def test_except_all_multiset(sess):
    # t has x values [10, None, 30, None, 50]; EXCEPT ALL keeps one NULL
    out = sess.sql("""
        SELECT x FROM t
        EXCEPT ALL
        SELECT x FROM t WHERE x IS NULL LIMIT 10""").to_arrow()
    # subquery LIMIT binds to the chain; rewrite without it:
    out = sess.sql("""
        SELECT x FROM t
        EXCEPT ALL
        SELECT x FROM t WHERE id = 2""").to_arrow()
    vals = out.column(0).to_pylist()
    assert sorted(v for v in vals if v is not None) == [10, 30, 50]
    assert vals.count(None) == 1  # two NULLs minus one NULL


def test_intersect_all_multiset(sess):
    out = sess.sql("""
        SELECT s FROM (
          SELECT 'a' AS s UNION ALL SELECT 'a' UNION ALL SELECT 'b') l
        INTERSECT ALL
        SELECT s2 FROM (
          SELECT 'a' AS s2 UNION ALL SELECT 'a' UNION ALL
          SELECT 'a' UNION ALL SELECT 'c') r""").to_arrow()
    assert sorted(out.column(0).to_pylist()) == ["a", "a"]


def test_intersect_binds_tighter_than_union(sess):
    # a UNION b INTERSECT c  ==  a UNION (b INTERSECT c)
    out = sess.sql("""
        SELECT 1 AS v
        UNION
        SELECT 2 AS v
        INTERSECT
        SELECT 3 AS v""").to_arrow()
    assert sorted(out.column(0).to_pylist()) == [1]


def test_setop_order_by_limit(sess):
    out = sess.sql("""
        SELECT id FROM t
        EXCEPT
        SELECT id FROM t WHERE id = 1
        ORDER BY id DESC LIMIT 2""").to_arrow()
    assert out.column(0).to_pylist() == [5, 4]


def test_derived_alias_name_collision(sess):
    """Two derived tables exposing the SAME output names (the TPC-DS
    q44 asceding/descending shape): qualified refs must resolve to the
    right side, and the unaliased qualified item keeps its bare name."""
    out = q(sess, """
        select lo.id, hi.id big
        from (select * from t where id <= 2) lo,
             (select * from t where id >= 4) hi
        where lo.id + 3 = hi.id
        order by lo.id""")
    assert out.column_names[0] == "id"
    assert out.column("id").to_pylist() == [1, 2]
    assert out.column("big").to_pylist() == [4, 5]


def test_order_by_aliased_qualified_item(sess):
    """ORDER BY an expr that IS an aliased select item sorts by the
    OUTPUT column (expr name differs from the output name)."""
    out = q(sess, """
        select a.x out_x from (select * from t) a, (select * from t) b
        where a.id = b.id and a.x is not null
        order by a.x desc""")
    assert out.column("out_x").to_pylist() == [50, 30, 10]
