"""Differential tests for the fused device scan->filter->aggregate path
(sql/fused_agg.py): every query runs twice through liquid mode -- once
with the fused path enabled, once forced onto the classic scan path
(LIQUID_FUSED=0) -- and results must agree.  Mirrors the reference's
answer-verification discipline (clickbench_client.rs) applied to an
internal routing decision.
"""
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from liquid_tpu.bench.runner import make_session
from liquid_tpu.sql import fused_agg


def _table(seed=7, n=20_000):
    rng = np.random.default_rng(seed)
    ints = rng.integers(-50, 5000, n)
    int_nulls = rng.random(n) < 0.1
    floats = np.round(rng.normal(100, 30, n), 2)  # ALP-clean (2dp)
    float_nulls = rng.random(n) < 0.05
    raw = rng.standard_normal(n)  # ALP-hostile: patches
    cats = rng.choice(["alpha", "beta", "gamma", "delta", ""], n)
    urls = np.array([f"http://site{i % 97}.example/page{i % 13}"
                     for i in rng.integers(0, 10_000, n)])
    dates = rng.integers(8000, 12_000, n).astype("datetime64[D]")
    big = rng.integers(0, 1 << 62, n)
    flags = rng.random(n) < 0.5
    hi_card = rng.integers(0, 15_000, n)
    return pa.table({
        "i": pa.array(ints, mask=int_nulls),
        "f": pa.array(floats, mask=float_nulls),
        "raw": pa.array(raw),
        "cat": pa.array(cats),
        "url": pa.array(urls),
        "d": pa.array(dates),
        "big": pa.array(big),
        "flag": pa.array(flags),
        "hc": pa.array(hi_card),
    })


@pytest.fixture(scope="module")
def ctxs():
    path = os.path.join(tempfile.mkdtemp(), "fused.parquet")
    pq.write_table(_table(), path, row_group_size=6000)
    out = {}
    for mode in ("fused", "classic"):
        ctx, cache = make_session("liquid", 1 << 30, tempfile.mkdtemp())
        ctx.register_parquet("t", path)
        out[mode] = ctx
    return out


def run_both(ctxs, sql):
    os.environ["LIQUID_FUSED_STRICT"] = "1"
    try:
        prev = os.environ.pop("LIQUID_FUSED", None)
        a = ctxs["fused"].sql(sql).to_arrow()
        os.environ["LIQUID_FUSED"] = "0"
        b = ctxs["classic"].sql(sql).to_arrow()
    finally:
        os.environ.pop("LIQUID_FUSED", None)
        os.environ.pop("LIQUID_FUSED_STRICT", None)
        if prev is not None:
            os.environ["LIQUID_FUSED"] = prev
    return a, b


def assert_same(a: pa.Table, b: pa.Table, rtol=1e-9):
    assert a.num_rows == b.num_rows, (a, b)
    assert a.column_names == b.column_names, (a.column_names, b.column_names)
    for c in a.column_names:
        ca, cb = a.column(c).combine_chunks(), b.column(c).combine_chunks()
        if pa.types.is_floating(ca.type) or pa.types.is_floating(cb.type):
            va = np.asarray(ca.cast(pa.float64()), dtype=float)
            vb = np.asarray(cb.cast(pa.float64()), dtype=float)
            nan = np.isnan(va) & np.isnan(vb)
            assert (nan | np.isclose(va, vb, rtol=rtol, atol=1e-12,
                                     equal_nan=True)).all(), (c, va, vb)
        else:
            assert ca.to_pylist() == cb.to_pylist(), (c, ca, cb)


SCALAR_QUERIES = [
    # (plain `count(*) FROM t` takes the metadata-only pure_count path)
    "SELECT count(*) FROM t WHERE i > 100",
    "SELECT count(*), count(i), count(cat) FROM t WHERE i <> 7",
    "SELECT sum(i), avg(i), min(i), max(i) FROM t WHERE i >= -10",
    "SELECT sum(f), avg(f), min(f), max(f) FROM t WHERE f < 120.5",
    "SELECT sum(raw), avg(raw) FROM t",               # ALP patches in aggs
    "SELECT sum(i * 2 + 1), sum(f * (1 - f)) FROM t",
    "SELECT sum(f * i) FROM t WHERE i > 0 AND f > 50",
    "SELECT count(*) FROM t WHERE url LIKE '%site7.%'",
    "SELECT count(*) FROM t WHERE cat = 'alpha' OR cat = 'beta'",
    "SELECT count(*) FROM t WHERE i < -1000",          # empty
    "SELECT sum(i) FROM t WHERE i < -1000",            # empty -> NULL sum
    "SELECT min(d), max(d) FROM t WHERE d >= date '1995-01-01'",
    "SELECT sum(big), count(big) FROM t",
    "SELECT stddev(f), var(i) FROM t WHERE i > 0",
    "SELECT count(*) FROM t WHERE flag = true",
    "SELECT count(*) FROM t WHERE i > 10 OR f < 80.0",
    "SELECT avg(i) FROM t WHERE cat <> ''",
]

GROUP_QUERIES = [
    "SELECT cat, count(*) c FROM t GROUP BY cat ORDER BY cat",
    "SELECT cat, sum(i), avg(f), min(i), max(f) FROM t "
    "WHERE i > 0 GROUP BY cat ORDER BY cat",
    "SELECT flag, count(*) FROM t GROUP BY flag ORDER BY flag",
    "SELECT d, count(*) c FROM t WHERE d < date '1997-06-01' "
    "GROUP BY d ORDER BY c DESC, d LIMIT 20",
    "SELECT i, count(*) c FROM t GROUP BY i ORDER BY c DESC, i LIMIT 15",
    "SELECT cat, flag, sum(f * (1 - f)), count(i) FROM t "
    "GROUP BY cat, flag ORDER BY cat, flag",
    "SELECT hc, count(*) c FROM t GROUP BY hc ORDER BY c DESC, hc LIMIT 10",
    "SELECT f, count(*) c FROM t WHERE f > 140 GROUP BY f "
    "ORDER BY c DESC, f LIMIT 10",
    "SELECT cat, stddev(f), var(f) FROM t GROUP BY cat ORDER BY cat",
    "SELECT url, count(*) c FROM t WHERE url LIKE '%page7%' "
    "GROUP BY url ORDER BY c DESC, url LIMIT 10",
    "SELECT cat, count(*) FROM t WHERE i < -1000 GROUP BY cat",  # empty
    "SELECT cat, avg(raw) FROM t GROUP BY cat ORDER BY cat",  # patches
    "SELECT big, count(*) c FROM t GROUP BY big ORDER BY c DESC, big "
    "LIMIT 5",
]


@pytest.mark.parametrize("sql", SCALAR_QUERIES)
def test_scalar_matches_classic(ctxs, sql):
    before = fused_agg.STATS["fused_queries"]
    a, b = run_both(ctxs, sql)
    assert_same(a, b)
    assert fused_agg.STATS["fused_queries"] > before, \
        f"query did not take the fused path: {sql} " \
        f"(last bail: {fused_agg.STATS.get('last_bail')})"


@pytest.mark.parametrize("sql", GROUP_QUERIES)
def test_grouped_matches_classic(ctxs, sql):
    before = fused_agg.STATS["fused_queries"]
    a, b = run_both(ctxs, sql)
    assert_same(a, b)
    assert fused_agg.STATS["fused_queries"] > before, \
        f"query did not take the fused path: {sql} " \
        f"(last bail: {fused_agg.STATS.get('last_bail')})"


def test_unsupported_shapes_fall_back(ctxs):
    """median routes to the classic path and still produces correct
    results."""
    for sql in [
        "SELECT median(i) FROM t",
    ]:
        before = fused_agg.STATS["fused_queries"]
        a, b = run_both(ctxs, sql)
        assert_same(a, b)
        assert fused_agg.STATS["fused_queries"] == before, sql


def test_round4_shapes_fuse(ctxs):
    """Round-4 fused-path extensions: residual predicates (arithmetic
    over columns), expression group keys, and min/max over strings run
    IN the fused program and match the classic path."""
    for sql in [
        "SELECT cat, count(*) FROM t WHERE i + 1 > f GROUP BY cat "
        "ORDER BY cat",                     # residual predicate
        "SELECT i - 2 AS k, count(*) c, sum(f) FROM t GROUP BY i - 2 "
        "ORDER BY k",                       # expression group key
        "SELECT 1 AS one, cat, count(*) c FROM t GROUP BY 1, cat "
        "ORDER BY cat",                     # literal position key
        "SELECT min(cat), max(cat) FROM t",  # string min/max
        "SELECT i, min(cat) m FROM t GROUP BY i ORDER BY i",
        # count(DISTINCT): two-level fused (keys+[d] inner + host fold)
        "SELECT count(DISTINCT cat) FROM t",
        "SELECT cat, count(DISTINCT i) u, count(*) c, sum(f) s, "
        "avg(i) a FROM t GROUP BY cat ORDER BY cat",
    ]:
        before = fused_agg.STATS["fused_queries"]
        a, b = run_both(ctxs, sql)
        assert_same(a, b)
        assert fused_agg.STATS["fused_queries"] > before, \
            f"{sql} (last bail: {fused_agg.STATS.get('last_bail')})"


def test_float_pred_with_patches_fuses(ctxs):
    """Predicates over an ALP column with exception patches use the
    interval form plus host-settled patch overlays (the fused analogue
    of float_alp._apply_patch_verdict)."""
    for sql in [
        "SELECT count(*) FROM t WHERE raw > 0.5",
        "SELECT count(*) FROM t WHERE raw <> 0.25",
        "SELECT sum(i) FROM t WHERE raw <= -0.3 OR raw >= 1.5",
    ]:
        before = fused_agg.STATS["fused_queries"]
        a, b = run_both(ctxs, sql)
        assert_same(a, b)
        assert fused_agg.STATS["fused_queries"] > before, \
            (sql, fused_agg.STATS.get("last_bail"))


def test_fused_used_by_default_liquid_session():
    """The public session takes the fused path for a plain aggregate."""
    path = os.path.join(tempfile.mkdtemp(), "small.parquet")
    pq.write_table(_table(n=5000), path)
    ctx, _ = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    ctx.register_parquet("t", path)
    before = fused_agg.STATS["fused_queries"]
    out = ctx.sql("SELECT cat, count(*) c FROM t GROUP BY cat "
                  "ORDER BY cat").to_arrow()
    assert fused_agg.STATS["fused_queries"] == before + 1
    # oracle: pyarrow group_by on the raw data
    t = pq.read_table(path)
    expect = t.group_by("cat").aggregate([("cat", "count")])
    expect = expect.sort_by("cat")
    assert out.column("cat").to_pylist() == \
        expect.column("cat").to_pylist()
    assert out.column("c").to_pylist() == \
        expect.column("cat_count").to_pylist()


def test_arrow_mode_never_fuses():
    path = os.path.join(tempfile.mkdtemp(), "small2.parquet")
    pq.write_table(_table(n=3000), path)
    ctx, _ = make_session("arrow", 1 << 30, tempfile.mkdtemp())
    ctx.register_parquet("t", path)
    before = fused_agg.STATS["fused_queries"]
    ctx.sql("SELECT count(*) FROM t WHERE i > 0")
    assert fused_agg.STATS["fused_queries"] == before


def test_prep_invalidated_after_reset():
    """Cache reset drops payloads; the fused prep must rebuild (not
    serve stale device stacks)."""
    path = os.path.join(tempfile.mkdtemp(), "small3.parquet")
    pq.write_table(_table(n=4000), path)
    ctx, cache = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    ctx.register_parquet("t", path)
    r1 = ctx.sql("SELECT sum(i) FROM t").to_arrow()
    cache.reset()
    r2 = ctx.sql("SELECT sum(i) FROM t").to_arrow()
    assert r1.column(0).to_pylist() == r2.column(0).to_pylist()


def test_high_cardinality_group_by_fuses(ctxs):
    """~11k distinct keys defeat single-shot hash collision detection
    (birthday bound); the multi-round scatter (hash_rounds_reduce)
    must converge WITHOUT falling back to the classic path."""
    sql = "SELECT hc, count(*) c, sum(i) s FROM t GROUP BY hc " \
          "ORDER BY c DESC, hc LIMIT 20"
    bail_before = fused_agg.STATS["fused_bailouts"]
    grouped_before = fused_agg.STATS["fused_grouped"]
    a, b = run_both(ctxs, sql)
    assert_same(a, b)
    # the fused run must have taken the grouped path and NOT bailed
    # (LIQUID_FUSED=0 runs return before any counter; ladder exhaustion
    # would bump fused_bailouts)
    assert fused_agg.STATS["fused_grouped"] == grouped_before + 1
    assert fused_agg.STATS["fused_bailouts"] == bail_before, \
        fused_agg.STATS


def test_linear_coded_column_fuses():
    """Near-monotonic int columns transcode to LiquidLinearArray; the
    fused path decodes them on device (residual + round(slope*i))."""
    n = 40_000
    rng = np.random.default_rng(9)
    t = pa.table({
        "oid": np.arange(n, dtype=np.int64) * 4
        + rng.integers(0, 3, n),                      # linear-codable
        "grp": rng.integers(0, 50, n),
        "v": rng.integers(0, 1000, n),
    })
    path = os.path.join(tempfile.mkdtemp(), "lin.parquet")
    pq.write_table(t, path, row_group_size=16_384)
    from liquid_tpu.arrays.linear import LiquidLinearArray
    ctx, cache = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    ctx.register_parquet("t", path)
    pt = ctx._tables["t"]
    pt.ensure_cached(0, "oid")
    eid = pt.entry_id(0, "oid", 0)
    with cache._lock:
        assert isinstance(cache._entries[eid].payload, LiquidLinearArray)
    before = fused_agg.STATS["fused_grouped"]
    os.environ["LIQUID_FUSED_STRICT"] = "1"
    try:
        out = ctx.sql("SELECT grp, sum(oid) s, max(oid) m FROM t "
                      "GROUP BY grp ORDER BY grp").to_arrow().to_pandas()
    finally:
        os.environ.pop("LIQUID_FUSED_STRICT", None)
    assert fused_agg.STATS["fused_grouped"] == before + 1, \
        fused_agg.STATS.get("last_bail")
    g = t.to_pandas().groupby("grp").agg(
        s=("oid", "sum"), m=("oid", "max")).reset_index()
    assert out["s"].tolist() == g["s"].tolist()
    assert out["m"].tolist() == g["m"].tolist()


def test_count_distinct_sort_path():
    """count(DISTINCT d) routes through the sort-based pair dedup
    (fused_agg "sortpairs": sorted adjacency flags, small outer-key
    table) when the outer-key cardinality is bounded; NULL d rows
    count in COUNT(*) but never in the distinct count.  Reference
    behavior: DataFusion single_distinct_to_groupby."""
    import tempfile
    import pyarrow.parquet as pq
    from liquid_tpu.bench.runner import make_session
    from liquid_tpu.sql.fused_agg import STATS
    rng = np.random.default_rng(11)
    n = 40000
    d = [None if i % 11 == 0 else int(v) for i, v in
         enumerate(rng.integers(0, 500, n) * 104729 + 7)]
    t = pa.table({
        "g": pa.array(rng.integers(0, 30, n), pa.int32()),
        "d": pa.array(d, pa.int64()),
        "x": pa.array(rng.standard_normal(n)),
    })
    p = tempfile.mktemp(suffix=".parquet")
    pq.write_table(t, p)
    ctx, _ = make_session("liquid", 1 << 30, tempfile.mkdtemp())
    ctx.register_parquet("h", p)
    before = STATS.get("distinct_sort", 0)
    r = ctx.sql(
        "SELECT g, COUNT(DISTINCT d) AS u, COUNT(*) AS c, "
        "SUM(x) AS s, MAX(d) AS md FROM h GROUP BY g ORDER BY g"
    ).to_arrow().to_pandas()
    assert STATS.get("distinct_sort", 0) > before, "sort path not taken"
    df = t.to_pandas()
    want = df.groupby("g").agg(
        u=("d", "nunique"), c=("d", "size"), s=("x", "sum"),
        md=("d", "max")).reset_index()
    assert r["u"].tolist() == want["u"].tolist()
    assert r["c"].tolist() == want["c"].tolist()
    assert np.allclose(r["s"], want["s"])
    assert r["md"].tolist() == want["md"].tolist()
