"""ClickBench at scale: 1M-row bootstrap-resampled hits, all 43 queries
dual-path checked (encoded pushdown vs arrow fallback, bit-exact).

The reference CI runs ClickBench partition-0 (~1M rows) at a 256MB cap
(liquid-cache ci.yml:139-320); nano_hits is only 24k rows, so this
suite resamples it to 1M rows (preserving per-column distributions) and
runs the full query set under the same kind of memory cap.

Marked slow-ish: ~2-4 minutes; scale with LIQUID_CLICKBENCH_ROWS.
"""
import os
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.slow

_REPO = pathlib.Path(__file__).resolve().parents[1]
NANO = _REPO / "benchmark/data/nano_hits.parquet"
QDIR = _REPO / "benchmark/clickbench/queries"
ROWS = int(os.environ.get("LIQUID_CLICKBENCH_ROWS", "1000000"))


@pytest.fixture(scope="module")
def big_hits(tmp_path_factory):
    d = tmp_path_factory.mktemp("cb_scale")
    src = pq.read_table(NANO)
    rng = np.random.default_rng(2024)
    idx = rng.integers(0, src.num_rows, ROWS)
    big = src.take(pa.array(idx, pa.int64()))
    path = str(d / "hits.parquet")
    pq.write_table(big, path, row_group_size=1 << 18)
    return d, path


def _session(d, path, arrow_mode=False, cap=256 << 20):
    from liquid_tpu.cache.policies import Evict
    from liquid_tpu.sql.session import LiquidCacheLocalBuilder
    b = (LiquidCacheLocalBuilder()
         .with_max_memory_bytes(cap)
         .with_cache_dir(str(d)))
    if arrow_mode:
        b = b.with_transcode_on_insert(False).with_squeeze_policy(Evict())
    sess, cache = b.build()
    sess.register_parquet("hits", path)
    return sess, cache


def _queries():
    return [open(f"{QDIR}/q{i}.sql").read().strip().rstrip(";")
            for i in range(43)]


def test_all_43_queries_dual_path_at_scale(big_hits):
    import re
    d, path = big_hits
    liquid, lcache = _session(d, path)
    arrow, _ = _session(d, path, arrow_mode=True)
    failures = []
    for i, q in enumerate(_queries()):
        a = liquid.sql(q).to_arrow()
        b = arrow.sql(q).to_arrow().rename_columns(a.column_names)
        if a.equals(b):
            continue
        # rows tied at a LIMIT boundary are implementation-defined order
        # (ORDER BY rarely totally orders the output; the resampled data
        # has massive count ties): compare the UN-LIMITED results sorted
        # by every column -- strictly stronger
        m = re.search(r"(?i)\s+limit\s+\d+\s*$", q)
        if m is None:
            failures.append(i)
            continue
        q2 = q[: m.start()]
        a2 = liquid.sql(q2).to_arrow()
        b2 = arrow.sql(q2).to_arrow().rename_columns(a2.column_names)
        keys = [(c, "ascending") for c in a2.column_names]
        if not a2.sort_by(keys).equals(b2.sort_by(keys)):
            failures.append(i)
    assert not failures, f"queries diverged at {ROWS} rows: {failures}"
    st = lcache.stats()
    assert st["predicate_evals_on_encoded"] > 0
    assert st["memory_used"] <= 256 << 20
