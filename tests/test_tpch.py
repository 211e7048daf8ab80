"""TPC-H end-to-end: all 22 queries, verified differentially against an
independent pandas implementation on the same generated data.

Mirrors the reference's TPC-H CI job (liquid-cache `.github/workflows/
ci.yml:139-320` runs TPC-H sf0.1 with answer verification against
`benchmark/tpch/answers/`); we verify against `bench/tpch_ref.py`.
Scale factor via LIQUID_TPCH_SF (default 0.005 to keep CI fast).
"""
import datetime
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from liquid_tpu.bench import tpch_data, tpch_queries, tpch_ref

SF = float(os.environ.get("LIQUID_TPCH_SF", "0.005"))


@pytest.fixture(scope="module")
def tpch(tmp_path_factory):
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    d = tmp_path_factory.mktemp("tpch")
    tables = tpch_data.generate(SF)
    paths = tpch_data.write_parquet(tables, str(d))
    sess, cache = (LiquidCacheLocalBuilder()
                   .with_max_memory_bytes(1 << 28)
                   .with_cache_dir(str(d))
                   .build())
    for n, p in paths.items():
        sess.register_parquet(n, p)
    pdt = tpch_ref.to_pandas_tables(tables)
    return sess, pdt


def _norm_cell(v):
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        return str(pd.Timestamp(v).date())
    if isinstance(v, datetime.date):
        return str(v)
    return v


def assert_tables_equal(got: pa.Table, ref: pd.DataFrame, qid: int):
    g = got.to_pandas()
    assert g.shape == ref.shape, \
        f"q{qid}: shape {g.shape} != expected {ref.shape}\n{g}\n{ref}"
    g.columns = list(ref.columns)  # names compared positionally
    for c in ref.columns:
        rv, gv = ref[c].to_numpy(), g[c].to_numpy()
        if pd.api.types.is_float_dtype(ref[c]) \
                or pd.api.types.is_float_dtype(g[c]):
            rf = ref[c].astype(float).to_numpy()
            gf = g[c].astype(float).to_numpy()
            both_nan = np.isnan(rf) & np.isnan(gf)
            ok = both_nan | np.isclose(rf, gf, rtol=1e-6, atol=1e-9)
            assert ok.all(), f"q{qid} col {c}: {gf[~ok][:5]} != {rf[~ok][:5]}"
        else:
            rn = [_norm_cell(x) for x in rv]
            gn = [_norm_cell(x) for x in gv]
            assert gn == rn, f"q{qid} col {c}:\n got {gn[:8]}\n exp {rn[:8]}"


@pytest.mark.parametrize("qid", sorted(tpch_queries.QUERIES))
def test_tpch_query(tpch, qid):
    sess, pdt = tpch
    q = tpch_queries.QUERIES[qid]
    if isinstance(q, list):
        out = None
        for stmt in q:
            r = sess.sql(stmt).to_arrow()
            if r.num_columns:
                out = r  # the SELECT; CREATE/DROP VIEW return empty
    else:
        out = sess.sql(q).to_arrow()
    ref = tpch_ref.REFS[qid](pdt)
    assert_tables_equal(out, ref, qid)
