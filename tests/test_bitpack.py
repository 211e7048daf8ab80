"""Bit-plane pack/unpack + packed-compare tests.

Mirrors reference round-trip tests for raw::BitPackedArray
(src/core/src/liquid_array/raw/bit_pack_array.rs) and the encoded
predicate-eval semantics of LiquidPrimitiveArray.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as m

OPS = {
    "eq": np.equal, "ne": np.not_equal, "lt": np.less,
    "lt_eq": np.less_equal, "gt": np.greater, "gt_eq": np.greater_equal,
}


@pytest.mark.parametrize("width", [0, 1, 3, 7, 13, 27, 32, 41, 64])
def test_pack_unpack_roundtrip(width):
    rng = np.random.default_rng(width)
    n = 8192
    hi = (1 << width) if width < 64 else (1 << 63)
    vals = rng.integers(0, max(hi, 1), size=n, dtype=np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), width)
    assert planes.shape == (bp.bucket_for(width), n // 32)
    out_dtype = jnp.uint64 if width > 32 else jnp.uint32
    back = np.asarray(bp.unpack_bitplanes(planes, out_dtype))
    np.testing.assert_array_equal(back.astype(np.uint64), vals)


@pytest.mark.parametrize("width", [1, 5, 11, 33, 64])
@pytest.mark.parametrize("op", list(OPS))
def test_cmp_const(width, op):
    rng = np.random.default_rng(width * 31 + len(op))
    n = 2048
    hi = (1 << width) if width < 64 else (1 << 63)
    vals = rng.integers(0, hi, size=n, dtype=np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), width)
    for c in [0, 1, int(vals[0]), int(vals.max()), hi - 1]:
        got = np.asarray(
            m.unpack_bits(bp.cmp_const_op(planes, np.uint64(c), op))
        )[:n]
        np.testing.assert_array_equal(got, OPS[op](vals, c), err_msg=f"c={c}")


def test_cmp_const_overflowing_constant():
    # constant larger than any representable value at this width
    vals = np.arange(256, dtype=np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), 8)
    got = np.asarray(m.unpack_bits(bp.cmp_const_op(planes, np.uint64(1 << 20), "lt")))[:256]
    assert got.all()
    got = np.asarray(m.unpack_bits(bp.cmp_const_op(planes, np.uint64(1 << 20), "eq")))[:256]
    assert not got.any()


def test_in_range():
    vals = np.arange(1024, dtype=np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), 10)
    got = np.asarray(m.unpack_bits(bp.in_range(planes, (np.uint64(100), np.uint64(200)))))[:1024]
    np.testing.assert_array_equal(got, (vals >= 100) & (vals <= 200))


def test_zero_width_column():
    # all-equal column packs to width 0; compares still work via overflow path
    planes = bp.pack_bitplanes(jnp.zeros(64, dtype=jnp.uint32), 0)
    eq = np.asarray(m.unpack_bits(bp.cmp_const_op(planes, np.uint64(0), "eq")))[:64]
    assert eq.all()
    lt = np.asarray(m.unpack_bits(bp.cmp_const_op(planes, np.uint64(3), "lt")))[:64]
    assert lt.all()
