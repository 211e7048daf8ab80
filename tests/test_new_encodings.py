"""Round-trip + predicate tests for decimal, fixed-len-byte, linear and
delta encodings (mirrors reference unit tests in decimal_array.rs,
fix_len_byte_array.rs, linear_integer_array.rs, primitive_array.rs)."""
import decimal as pydec

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from liquid_tpu.arrays import ipc
from liquid_tpu.arrays.base import Predicate
from liquid_tpu.arrays.decimal import LiquidDecimalArray, LiquidFixedLenByteArray
from liquid_tpu.arrays.linear import LiquidLinearArray, LiquidPrimitiveDeltaArray
from liquid_tpu.cache.transcode import transcode
from liquid_tpu.ops import mask as mops


def _mask_np(bm, length):
    bits = np.asarray(mops.unpack_bits(bm.bits))[:length]
    valid = np.asarray(mops.unpack_bits(bm.valid))[:length]
    return bits & valid


def _dec_arr(vals, prec=10, scale=2, nulls=False):
    t = pa.decimal128(prec, scale)
    py = [pydec.Decimal(v).quantize(pydec.Decimal(1).scaleb(-scale))
          for v in vals]
    if nulls:
        py = [None if i % 7 == 3 else v for i, v in enumerate(py)]
    return pa.array(py, type=t)


class TestDecimal:
    def test_roundtrip(self):
        arr = _dec_arr(["1.25", "-3.50", "0.00", "99999.99", "-0.01"])
        la = LiquidDecimalArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)

    def test_roundtrip_nulls(self):
        arr = _dec_arr([str(i * 7 % 100) + ".5" for i in range(50)], nulls=True)
        la = LiquidDecimalArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)

    @pytest.mark.parametrize("op,fn", [
        ("eq", pc.equal), ("ne", pc.not_equal), ("lt", pc.less),
        ("lt_eq", pc.less_equal), ("gt", pc.greater), ("gt_eq", pc.greater_equal)])
    def test_predicates(self, op, fn):
        arr = _dec_arr([f"{i}.{i % 100:02d}" for i in range(200)], nulls=True)
        la = LiquidDecimalArray.from_arrow(arr)
        lit = pydec.Decimal("57.57")
        bm = la.try_eval_predicate(Predicate(op, lit))
        got = _mask_np(bm, la.length)
        want = np.asarray(fn(arr, pa.scalar(lit, type=arr.type))
                          .fill_null(False))
        np.testing.assert_array_equal(got, want)

    def test_non_representable_literal(self):
        arr = _dec_arr(["1.25", "1.26", "3.00"])
        la = LiquidDecimalArray.from_arrow(arr)
        # 1.255 has more digits than scale=2
        bm = la.try_eval_predicate(Predicate("gt", pydec.Decimal("1.255")))
        np.testing.assert_array_equal(_mask_np(bm, 3), [False, True, True])
        bm = la.try_eval_predicate(Predicate("lt", 1.255))
        np.testing.assert_array_equal(_mask_np(bm, 3), [True, False, False])
        bm = la.try_eval_predicate(Predicate("eq", 1.255))
        np.testing.assert_array_equal(_mask_np(bm, 3), [False, False, False])

    def test_int_and_float_literals(self):
        arr = _dec_arr(["1.00", "2.00", "2.50"])
        la = LiquidDecimalArray.from_arrow(arr)
        bm = la.try_eval_predicate(Predicate("gt_eq", 2))
        np.testing.assert_array_equal(_mask_np(bm, 3), [False, True, True])
        bm = la.try_eval_predicate(Predicate("eq", 2.5))
        np.testing.assert_array_equal(_mask_np(bm, 3), [False, False, True])

    def test_ipc(self):
        arr = _dec_arr([f"{i}.99" for i in range(64)], nulls=True)
        la = LiquidDecimalArray.from_arrow(arr)
        back = ipc.deserialize(la.to_bytes())
        assert back.to_arrow().equals(arr)

    def test_transcode_dispatch(self):
        arr = _dec_arr(["5.00"])
        assert isinstance(transcode(arr), LiquidDecimalArray)


class TestFixedLen:
    def _big(self, nulls=False):
        t = pa.decimal128(38, 4)
        vals = [pydec.Decimal(f"{(i % 13) * 10**20}.{i % 10:04d}")
                for i in range(100)]
        if nulls:
            vals = [None if i % 9 == 2 else v for i, v in enumerate(vals)]
        return pa.array(vals, type=t)

    def test_roundtrip(self):
        arr = self._big(nulls=True)
        la = LiquidFixedLenByteArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)

    def test_predicates(self):
        arr = self._big()
        la = LiquidFixedLenByteArray.from_arrow(arr)
        lit = pydec.Decimal("500000000000000000000.0005")
        for op, fn in [("lt", pc.less), ("gt_eq", pc.greater_equal),
                       ("eq", pc.equal)]:
            bm = la.try_eval_predicate(Predicate(op, lit))
            want = np.asarray(fn(arr, pa.scalar(lit, type=arr.type))
                              .fill_null(False))
            np.testing.assert_array_equal(_mask_np(bm, la.length), want)

    def test_ipc(self):
        arr = self._big(nulls=True)
        la = LiquidFixedLenByteArray.from_arrow(arr)
        back = ipc.deserialize(la.to_bytes())
        assert back.to_arrow().equals(arr)

    def test_transcode_dispatch(self):
        assert isinstance(transcode(self._big()), LiquidFixedLenByteArray)

    def test_decimal256(self):
        t = pa.decimal256(76, 2)
        vals = [pydec.Decimal(f"{10**40 + i}.25") for i in range(20)]
        arr = pa.array(vals, type=t)
        la = transcode(arr)
        assert isinstance(la, LiquidFixedLenByteArray)
        assert la.to_arrow().equals(arr)


class TestLinear:
    def test_roundtrip_monotonic(self):
        vals = (np.arange(500) * 3 + np.random.default_rng(0)
                .integers(-5, 6, 500)).astype(np.int64)
        arr = pa.array(vals, type=pa.int64())
        la = LiquidLinearArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)
        # residual width should be far below the value width
        assert la.residuals.width <= 6

    def test_roundtrip_nulls(self):
        vals = np.arange(100, dtype=np.int64) * 7
        arr = pa.array(vals, mask=np.arange(100) % 11 == 4)
        la = LiquidLinearArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)

    def test_predicate(self):
        vals = np.arange(300, dtype=np.int64) * 2 + 10
        arr = pa.array(vals)
        la = LiquidLinearArray.from_arrow(arr)
        bm = la.try_eval_predicate(Predicate("gt", 500))
        np.testing.assert_array_equal(_mask_np(bm, 300), vals > 500)
        bm = la.try_eval_predicate(Predicate("lt_eq", 99.5))
        np.testing.assert_array_equal(_mask_np(bm, 300), vals <= 99.5)

    def test_ipc(self):
        vals = np.arange(128, dtype=np.int32) * 5 - 64
        arr = pa.array(vals, type=pa.int32())
        la = LiquidLinearArray.from_arrow(arr)
        back = ipc.deserialize(la.to_bytes())
        assert back.to_arrow().equals(arr)


class TestDelta:
    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        vals = np.cumsum(rng.integers(0, 50, 1000)).astype(np.int64)
        arr = pa.array(vals)
        la = LiquidPrimitiveDeltaArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)
        assert la.deltas.width <= 6

    def test_roundtrip_nulls(self):
        vals = np.cumsum(np.ones(64, dtype=np.int64) * 3)
        arr = pa.array(vals, mask=np.arange(64) % 5 == 0)
        la = LiquidPrimitiveDeltaArray.from_arrow(arr)
        assert la.to_arrow().equals(arr)

    def test_predicate(self):
        vals = np.cumsum(np.arange(200, dtype=np.int64))
        arr = pa.array(vals)
        la = LiquidPrimitiveDeltaArray.from_arrow(arr)
        bm = la.try_eval_predicate(Predicate("gt_eq", 1000))
        np.testing.assert_array_equal(_mask_np(bm, 200), vals >= 1000)

    def test_ipc(self):
        vals = np.cumsum(np.arange(100, dtype=np.int64) % 17)
        arr = pa.array(vals, type=pa.int64())
        la = LiquidPrimitiveDeltaArray.from_arrow(arr)
        back = ipc.deserialize(la.to_bytes())
        assert back.to_arrow().equals(arr)
        assert back.first_value == la.first_value


def test_transcode_picks_linear_for_monotonic():
    """Adaptive encoding: near-monotonic int columns transcode to
    LiquidLinearArray when residuals pack >=3 bits narrower
    (ref design/02-linear-integer.md)."""
    import numpy as np
    import pyarrow as pa
    from liquid_tpu.arrays.linear import LiquidLinearArray
    from liquid_tpu.arrays.primitive import LiquidPrimitiveArray
    from liquid_tpu.cache import transcode as tc

    rng = np.random.default_rng(0)
    # sequential ids + small jitter: linear wins by a mile
    seq = np.arange(8192, dtype=np.int64) * 1000 + rng.integers(0, 8, 8192)
    out = tc.transcode(pa.array(seq))
    assert isinstance(out, LiquidLinearArray), type(out)
    assert out.to_arrow().to_pylist() == seq.tolist()
    # random data: plain bit-planes stay
    rnd = rng.integers(0, 1 << 20, 8192)
    out2 = tc.transcode(pa.array(rnd))
    assert isinstance(out2, LiquidPrimitiveArray), type(out2)
    # linear memory is genuinely smaller
    plain = LiquidPrimitiveArray.from_arrow(pa.array(seq))
    assert out.memory_bytes() < plain.memory_bytes() / 2
