"""Distributed SQL on the 8-device mesh: answers must match the local
engine / pandas exactly (SURVEY.md section 7 step 7)."""
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


def test_null_columns(dsess):
    """NULLs: excluded by comparisons, own group key, skipped by aggs
    (VERDICT item 4: the round-1 NULL-free restriction is lifted)."""
    import pyarrow as pa
    s, _ = dsess
    t = pa.table({
        "k": pa.array([1, 1, None, 2, None, 2], pa.int64()),
        "v": pa.array([10, None, 5, 7, None, None], pa.int64()),
    })
    s.register_table("nully", t)
    out = s.sql("select k, count(*) as c, count(v) as cv, sum(v) as s "
                "from nully group by k order by k").to_pandas()
    # pandas: groupby dropna=False ordering NULL last
    assert list(out.k.fillna(-1)) == [1, 2, -1]
    assert list(out.c) == [2, 2, 2]
    assert list(out.cv) == [1, 1, 1]
    assert list(out.s) == [10, 7, 5]
    # comparisons exclude NULL rows
    f = s.sql("select count(*) as c from nully where v >= 0").to_pandas()
    assert f.c[0] == 3
    # min/max skip NULLs; all-NULL group yields NULL
    m = s.sql("select k, min(v) as lo, max(v) as hi from nully "
              "group by k order by k").to_pandas()
    assert list(m.lo.fillna(-1)) == [10, 7, 5]


def test_encoded_shard_bytes(dsess):
    """Distributed shards hold bit-planes: device bytes for an int column
    are width/32 of the raw int64 form, and the query's scan byte count
    reflects that (VERDICT item 5 bytes-moved assertion)."""
    s, df = dsess
    dt = s.tables["events"]
    qty = dt.columns["qty"]
    assert qty.kind == "planes"
    raw_bytes = dt.padded * 8
    # qty in [1, 100) -> width 7 -> bucket 8 planes = 8/64 of raw    
    assert qty.width == 7
    assert qty.device_bytes() <= raw_bytes * 8 / 64 + dt.padded // 8
    s.sql("select count(*) as c from events where qty > 50")
    assert s.last_scan_bytes == qty.device_bytes()
    assert s.last_scan_bytes < raw_bytes / 4


def test_multi_key_group_by(dsess):
    """Multi-column GROUP BY (round-1 limit was one dense key)."""
    s, df = dsess
    out = s.sql("select region, status, count(*) as c, sum(qty) as sq "
                "from events where qty < 90 group by region, status "
                "order by region, status").to_pandas()
    ref = (df[df.qty < 90].groupby(["region", "status"])
           .agg(c=("qty", "size"), sq=("qty", "sum")).reset_index())
    assert list(out.region) == list(ref.region)
    assert list(out.status) == list(ref.status)
    assert list(out.c) == list(ref.c)
    assert list(out.sq) == list(ref.sq)


def test_high_cardinality_group_by(dsess):
    """Cardinality past the first hash stage forces the salted retry."""
    import numpy as np
    import pyarrow as pa
    s, _ = dsess
    n = 40_000
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 60, n).astype(np.int64)
    keys[: n // 2] = keys[: n // 2] // 2 * 2  # some repeats
    t = pa.table({"k": pa.array(keys), "v": pa.array(np.ones(n, np.int64))})
    s.register_table("hc", t)
    out = s.sql("select k, sum(v) as s from hc group by k").to_pandas()
    import pandas as pd
    ref = pd.DataFrame({"k": keys}).groupby("k").size()
    assert len(out) == len(ref)
    got = dict(zip(out.k, out.s))
    assert all(got[k] == v for k, v in ref.items())
