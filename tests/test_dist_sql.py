"""Distributed SQL on the 8-device mesh: answers must match the local
engine / pandas exactly (SURVEY.md section 7 step 7)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from liquid_tpu.parallel.session import DistributedSession


@pytest.fixture(scope="module")
def dsess():
    rng = np.random.default_rng(3)
    n = 100_000  # not divisible by 8: exercises padding
    n = n + 3
    t = pa.table({
        "region": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        "status": pa.array(rng.choice(["ok", "warn", "err"], n)),
        "qty": pa.array(rng.integers(1, 100, n).astype(np.int64)),
        "price": pa.array(np.round(rng.random(n) * 100, 2)),
        "day": pa.array((np.datetime64("2024-01-01")
                         + rng.integers(0, 365, n).astype("timedelta64[D]")
                         ).astype("datetime64[D]").astype(object)),
    })
    s = DistributedSession()
    s.register_table("events", t)
    return s, t.to_pandas()


def test_global_count_and_sum(dsess):
    s, df = dsess
    out = s.sql("select count(*) as c, sum(qty) as s from events "
                "where qty > 50").to_pandas()
    ref = df[df.qty > 50]
    assert out.c[0] == len(ref) and out.s[0] == ref.qty.sum()


def test_group_by_int_key(dsess):
    s, df = dsess
    out = s.sql("select region, count(*) as c, sum(qty) as s, "
                "min(qty) as lo, max(qty) as hi from events "
                "where qty >= 10 group by region order by region").to_pandas()
    ref = (df[df.qty >= 10].groupby("region")
           .agg(c=("qty", "size"), s=("qty", "sum"),
                lo=("qty", "min"), hi=("qty", "max")).reset_index())
    assert list(out.region) == list(ref.region)
    assert list(out.c) == list(ref.c)
    assert list(out.s) == list(ref.s)
    assert list(out.lo) == list(ref.lo)
    assert list(out.hi) == list(ref.hi)


def test_group_by_string_key(dsess):
    s, df = dsess
    out = s.sql("select status, count(*) as c, avg(price) as p from events "
                "where region < 25 group by status order by status").to_pandas()
    ref = (df[df.region < 25].groupby("status")
           .agg(c=("price", "size"), p=("price", "mean")).reset_index()
           .sort_values("status"))
    assert list(out.status) == list(ref.status)
    assert list(out.c) == list(ref.c)
    assert np.allclose(out.p, ref.p)


def test_string_predicate_and_date(dsess):
    s, df = dsess
    out = s.sql("select count(*) as c from events "
                "where status = 'err' and day >= date '2024-06-01'").to_pandas()
    ref = df[(df.status == "err")
             & (pd.to_datetime(df.day) >= pd.Timestamp("2024-06-01"))]
    assert out.c[0] == len(ref)


def test_float_sum(dsess):
    s, df = dsess
    out = s.sql("select sum(price) as s from events where price > 90").to_pandas()
    ref = df[df.price > 90].price.sum()
    assert np.isclose(out.s[0], ref, rtol=1e-9)


def test_order_limit(dsess):
    s, df = dsess
    out = s.sql("select region, sum(qty) as s from events group by region "
                "order by s desc limit 5").to_pandas()
    ref = (df.groupby("region").qty.sum().sort_values(ascending=False)
           .head(5))
    assert list(out.s) == list(ref.values)


def test_padding_rows_excluded(dsess):
    s, df = dsess
    # no WHERE: padded rows must not leak into counts
    out = s.sql("select count(*) as c from events").to_pandas()
    assert out.c[0] == len(df)


def test_empty_group_dropped(dsess):
    s, df = dsess
    out = s.sql("select region, count(*) as c from events "
                "where qty > 98 group by region").to_pandas()
    ref = df[df.qty > 98].groupby("region").size()
    assert set(out.region) == set(ref.index)


def test_big_int64_literal_exact(dsess):
    """Literals above 2^53 must not round-trip through float64."""
    import pyarrow as pa
    big = 4350909328992872310
    t = pa.table({"uid": pa.array([big, big + 1, big + 2], pa.int64()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    s, _ = dsess
    s.register_table("bigids", t)
    out = s.sql(f"select count(*) as c from bigids where uid = {big + 1}"
                ).to_pandas()
    assert out.c[0] == 1


def test_fractional_literal_on_int_column(dsess):
    s, df = dsess
    # qty < 50.5  <=>  qty <= 50 (not qty < 50)
    a = s.sql("select count(*) as c from events where qty < 50.5").to_pandas()
    assert a.c[0] == (df.qty <= 50).sum()
    # fractional equality on ints can never match
    b = s.sql("select count(*) as c from events where qty = 50.5").to_pandas()
    assert b.c[0] == 0


def test_null_columns_rejected():
    import pyarrow as pa
    import pytest as _pytest
    from liquid_tpu.parallel.session import DistributedSession
    s = DistributedSession()
    t = pa.table({"x": pa.array([1, None], pa.int64())})
    with _pytest.raises(NotImplementedError):
        s.register_table("nully", t)
