"""First-read page pruning from the parquet ColumnIndex (VERDICT
missing #3; ref opener.rs:314-327): zone maps are seeded from the page
index BEFORE any column data IO, so a provably-empty first scan never
touches the data pages."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from liquid_tpu.common.object_store import MockStore, StoreFile
from liquid_tpu.io.pageindex import PageIndexReader


@pytest.fixture(scope="module")
def gap_file(tmp_path_factory):
    """One row group whose x values jump 0..8191 then 100000..108191:
    row-group stats span [0, 108191] but NO page contains 50000."""
    d = tmp_path_factory.mktemp("pageindex")
    x = np.concatenate([np.arange(8192), np.arange(100_000, 108_192)])
    t = pa.table({"x": pa.array(x, pa.int64()),
                  "y": pa.array(np.arange(len(x), dtype=np.float64))})
    path = str(d / "gap.parquet")
    # page-per-write-batch (data_page_size=1 forces a flush every
    # write_batch_size rows) so page boundaries align with the jump
    pq.write_table(t, path, row_group_size=len(x),
                   write_page_index=True, data_page_size=1,
                   write_batch_size=4096)
    return path, t


def test_page_zones_roundtrip(gap_file):
    path, t = gap_file
    md = pq.ParquetFile(path).metadata
    r = PageIndexReader(path)
    zones = r.page_zones(0, 0, "INT64", md.row_group(0).num_rows)
    assert zones is not None and len(zones) >= 2
    assert zones[0][2] == 0                       # first page min
    assert zones[-1][3] == 108_191                # last page max
    # the gap: no page range contains 50000
    assert all(not (lo <= 50_000 <= hi) for _, _, lo, hi in zones)


def _make_session(path, store=None):
    import tempfile
    from liquid_tpu.io.parquet import ParquetTable
    from liquid_tpu.sql.exec import QueryExecutor
    from liquid_tpu.cache.core import LiquidCacheBuilder
    cache = LiquidCacheBuilder().with_disk_path(
        tempfile.mktemp(suffix=".bin")).build()
    open_file = (lambda: StoreFile(store, "gap.parquet")) if store else None
    tables = {"gap": ParquetTable("gap", path, cache, 0,
                                  open_file=open_file)}
    return QueryExecutor(tables), tables["gap"]


def test_first_scan_prunes_before_data_io(gap_file):
    """The access-range proof: `x = 50000` passes row-group stats but
    every batch zone (from the page index) disproves it -- the scan
    must finish without reading ANY data-page byte range."""
    path, t = gap_file
    store = MockStore({"gap.parquet": open(path, "rb").read()})
    ex, pt = _make_session(path, store)
    md = pq.ParquetFile(path).metadata
    cc = md.row_group(0).column(0)
    data_start = cc.data_page_offset
    if cc.dictionary_page_offset is not None:
        data_start = min(data_start, cc.dictionary_page_offset)
    # the y column chunk sits right after x's; the whole data region is
    # [x_start, x_start + both chunks' compressed size)
    data_end = data_start + cc.total_compressed_size + \
        md.row_group(0).column(1).total_compressed_size
    ranges_before = store.get_access_ranges("gap.parquet")
    out = ex.execute_sql("select count(*) as c from gap where x = 50000")
    assert out.column("c").to_pylist() == [0]
    assert pt.zone_prunes >= 2  # both batches pruned
    new = store.get_access_ranges("gap.parquet")[len(ranges_before):]
    touched = [(a, b) for a, b in new if a < data_end and b > data_start]
    assert touched == [], f"first scan read data pages: {touched}"


def test_first_scan_selective_batches(gap_file):
    """x < 5000 matches only batch 0; batch 1 is zone-pruned on the
    FIRST scan (before any decode), and the answer is exact."""
    path, t = gap_file
    ex, pt = _make_session(path)
    out = ex.execute_sql(
        "select count(*) as c, sum(x) as s from gap where x < 5000")
    assert out.column("c").to_pylist() == [5000]
    assert out.column("s").to_pylist() == [sum(range(5000))]
    assert pt.zone_prunes >= 1
    assert pt.pageindex_seeds >= 1


def test_lazy_zones_still_work(tmp_path):
    """Files WITHOUT a page index keep the round-1 behavior: zones are
    built lazily after the first decode, pruning later scans."""
    x = np.concatenate([np.zeros(8192), np.full(8192, 10_000)])
    t = pa.table({"x": pa.array(x, pa.int64())})
    path = str(tmp_path / "noindex.parquet")
    pq.write_table(t, path, row_group_size=len(x), write_page_index=False)
    ex, pt = _make_session(path)
    r = PageIndexReader(path)
    assert r.page_zones(0, 0, "INT64", len(x)) is None
    out = ex.execute_sql("select count(*) as c from gap where x = 10000")
    assert out.column("c").to_pylist() == [8192]
    out = ex.execute_sql("select count(*) as c from gap where x = 5")
    assert out.column("c").to_pylist() == [0]
    assert pt.zone_prunes >= 1  # second scan pruned from lazy zones
