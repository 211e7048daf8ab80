"""Parquet bloom-filter row-group pruning.

Reference behavior: `RowGroupAccessPlanFilter::prune_by_bloom_filters`
(liquid-cache reader/plantime/row_group_filter.rs:103): equality
predicates that survive min/max pruning probe the column chunk's
split-block bloom filter; provably-absent literals drop the row group.

The end-to-end cases double as a differential test of our XXH64 +
thrift + SBBF implementation against Arrow C++'s bloom WRITER: every
present value must probe True.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from liquid_tpu.arrays.base import Predicate
from liquid_tpu.io.bloom import BloomReader, parse_bloom_header, xxhash64
from liquid_tpu.sql.session import LiquidCacheLocalBuilder


def test_xxhash64_vectors():
    # canonical XXH64 seed-0 vectors
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    # exercise the >=32-byte lane path + 8/4/1-byte tails (value checked
    # against Arrow C++ indirectly via the bloom probes below)
    for n in (31, 32, 33, 40, 100):
        h = xxhash64(bytes(range(n % 251 + 5)) * 8)
        assert 0 <= h < (1 << 64)


def _write(tmp_path, name, table, **kw):
    p = str(tmp_path / name)
    pq.write_table(table, p, **kw)
    return p


def test_bloom_reader_differential(tmp_path):
    """Every written value probes True (validates hash + header + SBBF
    against the Arrow C++ writer); absent values probe mostly False."""
    ints = list(range(0, 4000, 4))
    strs = [f"val_{i:06d}_{'x' * (i % 37)}" for i in range(1000)]
    t = pa.table({"k": pa.array(ints, pa.int64()),
                  "k32": pa.array([i % 2**31 for i in ints], pa.int32()),
                  "s": strs})
    p = _write(tmp_path, "b.parquet", t,
               bloom_filter_options={"k": True, "k32": True, "s": True})
    md = pq.ParquetFile(p).metadata
    br = BloomReader(p, md)
    for v in ints[:64]:
        assert br.might_contain(0, 0, v, "INT64") is True
        assert br.might_contain(0, 1, v % 2**31, "INT32") is True
    for s in strs[:64]:
        assert br.might_contain(0, 2, s, "BYTE_ARRAY") is True
    absent_int = [br.might_contain(0, 0, v, "INT64")
                  for v in range(1, 4000, 40)]  # odd: none present
    absent_str = [br.might_contain(0, 2, f"nope_{i}", "BYTE_ARRAY")
                  for i in range(100)]
    # SBBF false-positive rate at default NDV sizing is well under 10%
    assert sum(absent_int) < len(absent_int) * 0.1
    assert sum(absent_str) < len(absent_str) * 0.1
    # out-of-range int32 literal is definitely absent
    assert br.might_contain(0, 1, 2**40, "INT32") is False


def test_bloom_header_rejects_garbage():
    with pytest.raises((ValueError, IndexError)):
        parse_bloom_header(b"\xff\xff\xff\xff\xff\xff")


def test_no_bloom_filter_returns_none(tmp_path):
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    p = _write(tmp_path, "nb.parquet", t)
    md = pq.ParquetFile(p).metadata
    br = BloomReader(p, md)
    assert br.might_contain(0, 0, 1, "INT64") is None


def test_row_group_pruning_end_to_end(tmp_path):
    """Two row groups with disjoint key sets that share min/max overlap
    (so min/max pruning CANNOT separate them): the bloom filter must."""
    # rg0: even keys 0..998, rg1: odd keys 1..999 -> identical ranges
    evens = list(range(0, 1000, 2))
    odds = list(range(1, 1000, 2))
    t = pa.table({
        "k": pa.array(evens + odds, pa.int64()),
        "tag": pa.array(["e"] * len(evens) + ["o"] * len(odds)),
        "v": pa.array(list(range(len(evens) + len(odds))), pa.int64()),
    })
    p = _write(tmp_path, "two_rg.parquet", t, row_group_size=500,
               bloom_filter_options={"k": True, "tag": True})
    sess, cache = LiquidCacheLocalBuilder().with_cache_dir(
        str(tmp_path)).build()
    sess.register_parquet("t", p)
    pt = sess._tables["t"]
    assert pt.num_row_groups == 2
    # min/max can't prune (both rgs span [0..999]); bloom can
    assert pt.prune_row_groups([("k", Predicate("eq", 2))]) == [0]
    assert pt.prune_row_groups([("k", Predicate("eq", 3))]) == [1]
    # (tag is single-valued per rg, so min/max alone settles these two)
    assert pt.prune_row_groups([("tag", Predicate("eq", "e"))]) == [0]
    assert pt.prune_row_groups([("tag", Predicate("eq", "zz"))]) == []
    assert pt.bloom_prunes >= 2
    # non-eq predicates don't consult blooms
    assert pt.prune_row_groups([("k", Predicate("gt", 0))]) == [0, 1]
    # and the answers stay exact through SQL
    out = sess.sql("SELECT v FROM t WHERE k = 3").to_arrow()
    assert out.column(0).to_pylist() == [len(evens) + 1]
    out = sess.sql("SELECT count(*) FROM t WHERE tag = 'zz'").to_arrow()
    assert out.column(0).to_pylist() == [0]


def test_bloom_pruning_skips_io(tmp_path):
    """A fully bloom-pruned query must not read any column chunk."""
    t = pa.table({"k": pa.array([10, 20, 30] * 100, pa.int64()),
                  "v": pa.array(range(300), pa.int64())})
    p = _write(tmp_path, "skip.parquet", t,
               bloom_filter_options={"k": True})
    sess, cache = LiquidCacheLocalBuilder().with_cache_dir(
        str(tmp_path)).build()
    sess.register_parquet("t", p)
    out = sess.sql("SELECT sum(v) FROM t WHERE k = 11").to_arrow()
    assert out.column(0).to_pylist() in ([None], [0])
    st = cache.stats()
    assert st["inserts"] == 0, "bloom prune should have avoided the scan"
