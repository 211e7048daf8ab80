"""TPC-DS subset end-to-end: differential vs pandas oracle + dual-path
self-check (encoded pushdown vs arrow fallback).

Mirrors the reference's TPC-DS suite (liquid-cache
`benchmark/tpcds/manifest.json` + `tpcds_client.rs`; its CI disables
TPC-DS for upstream DataFusion bugs, `tpcds_notes.md` -- ours runs).
"""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.slow

from liquid_tpu.bench import tpcds_data, tpcds_queries, tpcds_ref

SF = float(os.environ.get("LIQUID_TPCDS_SF", "0.005"))


@pytest.fixture(scope="module")
def tpcds(tmp_path_factory):
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    d = tmp_path_factory.mktemp("tpcds")
    tables = tpcds_data.generate(SF)
    paths = tpcds_data.write_parquet(tables, str(d))
    sess, _ = (LiquidCacheLocalBuilder()
               .with_max_memory_bytes(1 << 28)
               .with_cache_dir(str(d)).build())
    for n, p in paths.items():
        sess.register_parquet(n, p)
    pdt = tpcds_ref.to_pandas_tables(tables)
    return sess, pdt


def _norm(v):
    import datetime
    if v is None or (isinstance(v, float) and np.isnan(v)):
        # arrow->pandas renders string NULLs as NaN in object columns;
        # both mean SQL NULL in this comparison
        return None
    if isinstance(v, (pd.Timestamp, np.datetime64, datetime.date)):
        return str(pd.Timestamp(v).date())
    return v


def assert_equal(got: pa.Table, ref: pd.DataFrame, qid: int):
    g = got.to_pandas()
    assert g.shape == ref.shape, f"q{qid}: {g.shape} != {ref.shape}\n{g}\n{ref}"
    g.columns = list(ref.columns)
    for c in ref.columns:
        if pd.api.types.is_float_dtype(ref[c]) \
                or pd.api.types.is_float_dtype(g[c]):
            rf = ref[c].astype(float).to_numpy()
            gf = g[c].astype(float).to_numpy()
            ok = (np.isnan(rf) & np.isnan(gf)) | np.isclose(
                rf, gf, rtol=1e-6, atol=1e-9)
            assert ok.all(), f"q{qid} col {c}: {gf[~ok][:4]} != {rf[~ok][:4]}"
        else:
            assert [_norm(x) for x in g[c]] == [_norm(x) for x in ref[c]], \
                f"q{qid} col {c}"


@pytest.mark.parametrize("qid", sorted(tpcds_queries.QUERIES))
def test_tpcds_query(tpcds, qid):
    sess, pdt = tpcds
    out = sess.sql(tpcds_queries.QUERIES[qid]).to_arrow()
    ref = tpcds_ref.REFS[qid](pdt)
    assert_equal(out, ref, qid)


def test_queries_nonempty(tpcds):
    """The parameter/data distributions must make most queries非trivial."""
    sess, pdt = tpcds
    nonempty = 0
    for qid in tpcds_queries.QUERIES:
        ref = tpcds_ref.REFS[qid](pdt)
        if len(ref) and not ref.isna().all().all():
            nonempty += 1
    assert nonempty >= 10, f"only {nonempty} queries produce data"
