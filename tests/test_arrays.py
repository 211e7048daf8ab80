"""Liquid array round-trip + encoded-predicate tests.

Mirrors the reference's colocated unit tests for liquid_array/*
(arrow->liquid->arrow equality, predicate eval vs arrow compute,
serialize->deserialize).
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from liquid_tpu.arrays import (
    LiquidByteViewArray, LiquidFloatArray, LiquidPrimitiveArray, Predicate, ipc,
)
from liquid_tpu.ops import mask as mops

CMPS = ["eq", "ne", "lt", "lt_eq", "gt", "gt_eq"]


def _mask_to_np(bm, length):
    bits = np.asarray(mops.unpack_bits(bm.to_selection()))[:length]
    valid = np.asarray(mops.unpack_bits(bm.valid))[:length]
    return bits, valid


# -- primitive -------------------------------------------------------------

@pytest.mark.parametrize("dtype,lo,hi", [
    (pa.int16(), -300, 300), (pa.int32(), -1, 2), (pa.int64(), -(1 << 40), 1 << 40),
    (pa.uint32(), 0, 1 << 31),
])
def test_primitive_roundtrip(dtype, lo, hi):
    rng = np.random.default_rng(42)
    vals = rng.integers(lo, hi, size=5000)
    arr = pa.array(vals, type=dtype)
    liq = LiquidPrimitiveArray.from_arrow(arr)
    assert liq.to_arrow().equals(arr)
    # packed form beats a full 8192-row padded block of the raw dtype
    assert liq.memory_bytes() < 8192 * dtype.bit_width // 8 + 1152


def test_primitive_roundtrip_with_nulls():
    vals = pa.array([1, None, 3, None, -7] * 100, type=pa.int64())
    liq = LiquidPrimitiveArray.from_arrow(vals)
    assert liq.to_arrow().equals(vals)


def test_primitive_constant_column():
    vals = pa.array([99] * 1000, type=pa.int32())
    liq = LiquidPrimitiveArray.from_arrow(vals)
    assert liq.width == 0
    assert liq.to_arrow().equals(vals)


@pytest.mark.parametrize("op", CMPS)
def test_primitive_predicate_matches_arrow(op):
    rng = np.random.default_rng(11)
    vals = rng.integers(-50, 50, size=2000)
    vals_pa = pa.array(vals, type=pa.int32())
    liq = LiquidPrimitiveArray.from_arrow(vals_pa)
    fns = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
           "lt_eq": pc.less_equal, "gt": pc.greater, "gt_eq": pc.greater_equal}
    for lit in [-100, -50, 0, 13, 49, 50, 1000, 10.5, -0.5]:
        bm = liq.try_eval_predicate(Predicate(op, lit))
        got, _ = _mask_to_np(bm, len(vals))
        want = np.asarray(fns[op](vals_pa.cast(pa.float64()), lit))
        np.testing.assert_array_equal(got, want, err_msg=f"op={op} lit={lit}")


def test_primitive_predicate_nulls_excluded():
    vals = pa.array([1, None, 3, 4, None] * 10, type=pa.int32())
    liq = LiquidPrimitiveArray.from_arrow(vals)
    bm = liq.try_eval_predicate(Predicate("gt", 0))
    got, valid = _mask_to_np(bm, len(vals))
    assert not got[1] and not got[4]
    assert got[0] and got[2]
    assert not valid[1]


def test_primitive_filter():
    vals = pa.array(np.arange(100), type=pa.int64())
    liq = LiquidPrimitiveArray.from_arrow(vals)
    sel = np.zeros(8192, dtype=bool)
    sel[[3, 50, 99]] = True
    import jax.numpy as jnp
    out = liq.filter(mops.pack_bools(jnp.asarray(sel)))
    assert out.to_pylist() == [3, 50, 99]


def test_primitive_ipc_roundtrip():
    vals = pa.array([5, None, 1 << 33, -9], type=pa.int64())
    liq = LiquidPrimitiveArray.from_arrow(vals)
    back = ipc.deserialize(liq.to_bytes())
    assert back.to_arrow().equals(vals)


# -- byteview --------------------------------------------------------------

STRINGS = ["", "google", "googles", "yandex", "google maps", "a" * 30, None,
           "яндекс", "google"]


def test_byteview_roundtrip():
    arr = pa.array(STRINGS * 100, type=pa.string())
    liq = LiquidByteViewArray.from_arrow(arr)
    assert liq.to_arrow_flat().equals(arr)


@pytest.mark.parametrize("op,lit", [
    ("eq", "google"), ("ne", "google"), ("lt", "h"), ("gt_eq", "y"),
    ("contains", "oog"), ("contains", "яндекс"), ("not_contains", "oog"),
    ("starts_with", "goo"), ("ends_with", "s"), ("eq", ""), ("ne", ""),
])
def test_byteview_predicate(op, lit):
    arr = pa.array(STRINGS * 50, type=pa.string())
    for with_fp in (False, True):
        liq = LiquidByteViewArray.from_arrow(arr, with_fingerprints=with_fp)
        bm = liq.try_eval_predicate(Predicate(op, lit))
        got, valid = _mask_to_np(bm, len(arr))
        fns = {"eq": pc.equal, "ne": pc.not_equal, "lt": pc.less,
               "gt_eq": pc.greater_equal}
        if op in fns:
            want = fns[op](arr, lit)
        elif op == "contains":
            want = pc.match_substring(arr, lit)
        elif op == "not_contains":
            want = pc.invert(pc.match_substring(arr, lit))
        elif op == "starts_with":
            want = pc.starts_with(arr, lit)
        else:
            want = pc.ends_with(arr, lit)
        want_np = np.asarray(want.fill_null(False))
        np.testing.assert_array_equal(got, want_np, err_msg=f"{op} {lit} fp={with_fp}")
        np.testing.assert_array_equal(valid, np.asarray(arr.is_valid()))


def test_byteview_ipc_roundtrip():
    arr = pa.array(STRINGS, type=pa.string())
    liq = LiquidByteViewArray.from_arrow(arr, with_fingerprints=True)
    back = ipc.deserialize(liq.to_bytes())
    assert back.to_arrow_flat().equals(arr)
    assert back._fingerprints is not None


def test_byteview_dictionary_input():
    arr = pa.array(["a", "b", "a", None], type=pa.string()).dictionary_encode()
    liq = LiquidByteViewArray.from_arrow(arr)
    assert liq.to_arrow_flat().equals(pa.array(["a", "b", "a", None], type=pa.string()))


# -- float / ALP -----------------------------------------------------------

def test_float_decimal_like_roundtrip():
    vals = pa.array([1.25, 3.5, -2.75, 100.0, 0.01] * 200, type=pa.float64())
    liq = LiquidFloatArray.from_arrow(vals)
    assert liq.num_patches == 0
    assert liq.to_arrow().equals(vals)


def test_float_random_roundtrip_with_patches():
    rng = np.random.default_rng(0)
    raw = rng.standard_normal(500)
    vals = pa.array(raw, type=pa.float64())
    liq = LiquidFloatArray.from_arrow(vals)
    assert liq.to_arrow().equals(vals)


def test_float32_roundtrip():
    vals = pa.array(np.float32([0.5, 1.5, 2.25, np.inf, -np.inf]), type=pa.float32())
    liq = LiquidFloatArray.from_arrow(vals)
    assert liq.to_arrow().equals(vals)


def test_float_nan_and_nulls():
    vals = pa.array([1.0, None, float("nan"), 2.5], type=pa.float64())
    liq = LiquidFloatArray.from_arrow(vals)
    back = liq.to_arrow()
    assert back[0].as_py() == 1.0 and back[3].as_py() == 2.5
    assert not back[1].is_valid
    assert np.isnan(back[2].as_py())


def test_float_predicate():
    vals = pa.array([0.5, 1.5, 2.5, None, -1.0] * 100, type=pa.float64())
    liq = LiquidFloatArray.from_arrow(vals)
    bm = liq.try_eval_predicate(Predicate("gt", 1.0))
    got, _ = _mask_to_np(bm, len(vals))
    want = np.asarray(pc.greater(vals, 1.0).fill_null(False))
    np.testing.assert_array_equal(got, want)


def test_float_ipc_roundtrip():
    vals = pa.array([1.25, None, float("nan"), 3.14159], type=pa.float64())
    liq = LiquidFloatArray.from_arrow(vals)
    back = ipc.deserialize(liq.to_bytes())
    assert str(back.to_arrow()) == str(vals)
