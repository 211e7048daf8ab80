"""FSST codec, FSST-backed byteview, prefix keys, native block store.

Mirrors the reference's fsst_buffer unit tests and the libFuzzer
differential target (fuzz/fuzz_targets/fsst_view.rs): encoded-compare
results must match pyarrow compute kernels on arbitrary inputs.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from liquid_tpu.arrays import byteview as bv
from liquid_tpu.arrays import ipc
from liquid_tpu.arrays.base import Predicate
from liquid_tpu.arrays.fsst import FsstBuffer, FsstCompressor
from liquid_tpu.arrays.prefixkeys import build_prefix_meta, prefix_verdict
from liquid_tpu.ops import mask as mops


def unpack(bm, n):
    bits = np.asarray(mops.unpack_bits(bm.bits))[:n]
    valid = np.asarray(mops.unpack_bits(bm.valid))[:n]
    return bits & valid


# -- codec ------------------------------------------------------------------

def test_fsst_roundtrip_text():
    vals = [f"https://host{i % 7}.example.com/path/{i}".encode()
            for i in range(300)]
    c = FsstCompressor.train(vals)
    blob = b"".join(vals)
    comp = c.compress(blob)
    assert len(comp) < len(blob) / 2, "should compress repetitive URLs >2x"
    assert c.decompress(comp) == blob


def test_fsst_roundtrip_binary_and_empty():
    vals = [b"", b"\x00" * 10, bytes(range(256)), b"\xff\xfe\xfd" * 100]
    c = FsstCompressor.train(vals)
    for v in vals:
        assert c.decompress(c.compress(v)) == v


def test_fsst_table_serialization():
    vals = [b"abcabcabc" * 5, b"hello world"]
    c = FsstCompressor.train(vals)
    c2 = FsstCompressor.from_bytes(c.to_bytes())
    comp = c.compress(b"abcabc hello")
    assert c2.decompress(comp) == b"abcabc hello"
    assert c2.num_symbols == c.num_symbols


def test_fsst_buffer_random_access():
    arr = pa.array([f"value-{i:04d}-suffix" for i in range(100)])
    fb = FsstBuffer.from_arrow(arr)
    assert fb.get(42) == b"value-0042-suffix"
    assert fb.take_bytes(np.array([0, 99])) == [b"value-0000-suffix",
                                                b"value-0099-suffix"]
    assert fb.to_arrow(pa.string()).equals(arr)


def test_fsst_buffer_serialization_with_context_compressor():
    arr = pa.array(["aaa", "bbb", "ccc"])
    fb = FsstBuffer.from_arrow(arr)
    raw = fb.to_bytes(include_table=False)
    fb2 = FsstBuffer.from_bytes(raw, compressor=fb.compressor)
    assert fb2.to_arrow(pa.string()).equals(arr)


# -- prefix keys ------------------------------------------------------------

def _oracle(values, op, lit):
    a = pa.array(values)
    fns = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
           "lt_eq": pc.less_equal, "gt": pc.greater, "gt_eq": pc.greater_equal}
    if op in fns:
        return np.asarray(fns[op](a, pa.scalar(lit)))
    if op == "starts_with":
        return np.asarray(pc.starts_with(a, lit))
    if op == "contains":
        return np.asarray(pc.match_substring(a, lit))
    raise AssertionError(op)


@pytest.mark.parametrize("op", ["eq", "ne", "lt", "lt_eq", "gt", "gt_eq",
                                "starts_with"])
def test_prefix_verdict_vs_oracle(op):
    values = ["", "a", "ab", "abc", "abcdefgh", "abcdefghi", "abcdefghj",
              "b", "ba", "zzzzzzzzzzzz", "abcdefgh\x00", "aab"]
    meta = build_prefix_meta(pa.array(values))
    for lit in ["", "a", "ab", "abc", "abcdefgh", "abcdefghi", "b", "z",
                "abcdefghzzzz"]:
        verdict, amb = prefix_verdict(meta, op, lit.encode())
        assert verdict is not None
        oracle = _oracle(values, op, lit)
        settled = ~amb
        assert (verdict[settled] == oracle[settled]).all(), \
            f"op={op} lit={lit!r}: {verdict} vs {oracle} (amb={amb})"


def test_prefix_shared_prefix_short_circuit():
    values = ["http://example.com/a", "http://example.com/b",
              "http://example.com/zz"]
    meta = build_prefix_meta(pa.array(values))
    assert meta.shared == b"http://example.com/"
    # needle outside the shared prefix: uniform verdict, no ambiguity
    verdict, amb = prefix_verdict(meta, "lt", b"ftp://x")
    assert not amb.any() and not verdict.any()
    verdict, amb = prefix_verdict(meta, "gt", b"ftp://x")
    assert not amb.any() and verdict.all()


# -- fsst-backed byteview ----------------------------------------------------

def _bv_fsst(values, with_fp=False):
    arr = pa.array(values)
    return bv.LiquidByteViewArray.from_arrow(arr, with_fingerprints=with_fp,
                                             compress="always")


@pytest.mark.parametrize("op,lit", [
    ("eq", "http://example.com/page/7"), ("ne", "http://example.com/page/7"),
    ("lt", "http://example.com/page/3"), ("gt_eq", "http://example.com/page/5"),
    ("contains", "page/1"), ("starts_with", "http://example.com/page/1"),
    ("ends_with", "/9"),
])
def test_byteview_fsst_predicates_match_raw(op, lit):
    values = [f"http://example.com/page/{i % 13}" for i in range(50)]
    a_fsst = _bv_fsst(values, with_fp=True)
    assert a_fsst.is_fsst
    arr = pa.array(values)
    a_raw = bv.LiquidByteViewArray.from_arrow(arr, with_fingerprints=True,
                                              compress="never")
    p = Predicate(op, lit)
    m1, m2 = a_fsst.try_eval_predicate(p), a_raw.try_eval_predicate(p)
    assert m1 is not None and m2 is not None
    np.testing.assert_array_equal(unpack(m1, 50), unpack(m2, 50))


def test_byteview_fsst_roundtrip_and_ipc():
    values = [f"user-{i % 9}@example.org" for i in range(64)] + [None]
    arr = pa.array(values)
    a = bv.LiquidByteViewArray.from_arrow(arr, compress="always")
    assert a.is_fsst
    assert a.to_arrow_flat().equals(arr)
    back = ipc.deserialize(a.to_bytes())
    assert back.is_fsst
    assert back.to_arrow_flat().equals(arr)
    assert back.memory_bytes() < sum(
        len(v or "") for v in values) + 8192 * 4 + 4096


def test_byteview_fsst_decompresses_only_ambiguous():
    values = [f"item-{i:06d}" for i in range(100)]  # shared prefix "item-0000"
    a = _bv_fsst(values)
    before = bv.FULL_COMPARE_COUNTER
    m = a.try_eval_predicate(Predicate("gt", "item-000050"))
    assert m is not None
    decompressed = bv.FULL_COMPARE_COUNTER - before
    # prefix keys decide everything here: rest is <= 8 bytes ("50" etc.)
    assert decompressed <= 1, decompressed
    oracle = np.array([v > "item-000050" for v in values])
    np.testing.assert_array_equal(unpack(m, 100), oracle)


def test_byteview_fsst_memory_smaller_than_raw():
    values = [f"https://www.google.com/search?q=term{i % 40}&hl=en&page={i % 7}"
              for i in range(2000)]
    arr = pa.array(values)
    a_f = bv.LiquidByteViewArray.from_arrow(arr, compress="always")
    a_r = bv.LiquidByteViewArray.from_arrow(arr, compress="never")
    assert a_f.memory_bytes() < a_r.memory_bytes()


def test_byteview_compressor_shared_across_batches():
    from liquid_tpu.cache.core import LiquidCacheBuilder
    import tempfile
    d = tempfile.mkdtemp()
    cache = (LiquidCacheBuilder()
             .with_disk_path(os.path.join(d, "s.bin")).build())
    vals = [f"https://example.com/r/{i}" for i in range(3000)]
    arr = pa.array(vals)
    cache.insert(0x0100, arr.slice(0, 1500))
    cache.insert(0x0101, arr.slice(1500, 1500))
    e0 = cache._entries[0x0100].payload
    e1 = cache._entries[0x0101].payload
    assert e0.is_fsst and e1.is_fsst
    assert e0.fsst.compressor is e1.fsst.compressor
    got = cache.get(0x0101)
    assert got.cast(pa.string()).equals(arr.slice(1500, 1500))


# -- differential fuzz (mirrors fuzz/fuzz_targets/fsst_view.rs) --------------

def test_differential_fuzz_byteview_vs_arrow():
    rng = np.random.default_rng(7)
    alphabet = list("abcxyz01/%\x00\xff")
    for trial in range(25):
        n = int(rng.integers(1, 200))
        values = ["".join(rng.choice(alphabet, size=rng.integers(0, 20)))
                  for _ in range(n)]
        arr = pa.array(values)
        a = bv.LiquidByteViewArray.from_arrow(arr, with_fingerprints=True,
                                              compress="always")
        needle = "".join(rng.choice(alphabet, size=rng.integers(0, 10)))
        for op in ("eq", "ne", "lt", "lt_eq", "gt", "gt_eq", "contains",
                   "starts_with", "ends_with"):
            m = a.try_eval_predicate(Predicate(op, needle))
            assert m is not None
            if op == "contains":
                oracle = np.array([needle in v for v in values])
            elif op == "starts_with":
                oracle = np.array([v.startswith(needle) for v in values])
            elif op == "ends_with":
                oracle = np.array([v.endswith(needle) for v in values])
            else:
                cmp = {"eq": lambda v: v == needle, "ne": lambda v: v != needle,
                       "lt": lambda v: v < needle, "lt_eq": lambda v: v <= needle,
                       "gt": lambda v: v > needle, "gt_eq": lambda v: v >= needle}[op]
                # compare as BYTES (arrow semantics = utf8 byte order)
                nb = needle.encode("utf-8", "surrogatepass")
                cmp_b = {"eq": lambda v: v == nb, "ne": lambda v: v != nb,
                         "lt": lambda v: v < nb, "lt_eq": lambda v: v <= nb,
                         "gt": lambda v: v > nb, "gt_eq": lambda v: v >= nb}[op]
                oracle = np.array([cmp_b(v.encode("utf-8", "surrogatepass"))
                                   for v in values])
            got = unpack(m, n)
            assert (got == oracle).all(), \
                f"trial={trial} op={op} needle={needle!r}"


# -- native block store -------------------------------------------------------

def test_native_store(tmp_path):
    from liquid_tpu.cache.store import NativeBlockStore
    s = NativeBlockStore(str(tmp_path / "s.bin"))
    r1 = s.put(1, b"hello")
    s.put(2, b"world!!")
    assert s.get(1) == b"hello"
    assert s.read_range((r1[0], 4)) == b"hell"
    assert s.remove(1) == 5
    assert s.get(1) is None
    assert s.live_bytes == 7 and s.file_bytes == 12
    s.compact()
    assert s.file_bytes == 7 and s.get(2) == b"world!!"
    s.close()


def test_native_store_concurrent(tmp_path):
    import threading
    from liquid_tpu.cache.store import NativeBlockStore
    s = NativeBlockStore(str(tmp_path / "c.bin"))
    errors = []

    def worker(k):
        try:
            for i in range(50):
                data = bytes([k]) * (i + 1)
                s.put(k * 1000 + i, data)
                assert s.get(k * 1000 + i) == data
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    for k in range(8):
        assert s.get(k * 1000 + 49) == bytes([k]) * 50
    s.close()
