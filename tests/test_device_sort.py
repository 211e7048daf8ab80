"""Device ORDER BY permutation (sql/device_sort.py) vs pyarrow oracle."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from liquid_tpu.sql import device_sort as ds


def _oracle(arrays, orders):
    st = pa.table({f"k{i}": a for i, a in enumerate(arrays)})
    keys = [(f"k{i}", "descending" if d else "ascending")
            for i, (d, _) in enumerate(orders)]
    null_keys = [(f"k{i}", "descending" if d else "ascending",
                  "at_start" if nf else "at_end")
                 for i, (d, nf) in enumerate(orders)]
    return np.asarray(pc.sort_indices(st, sort_keys=null_keys))


@pytest.mark.parametrize("seed", [0, 1])
def test_multikey_numeric(seed):
    rng = np.random.default_rng(seed)
    n = 5000
    a = pa.array(rng.integers(0, 50, n), pa.int64())
    b = pa.array(rng.normal(size=n), pa.float64())
    orders = [(False, False), (True, True)]
    got = ds.try_sort_indices([a, b], orders)
    exp = _oracle([a, b], orders)
    np.testing.assert_array_equal(got, exp)


def test_nulls_and_placement():
    a = pa.array([3, None, 1, None, 2], pa.int64())
    for desc in (False, True):
        for nf in (False, True):
            got = ds.try_sort_indices([a], [(desc, nf)])
            exp = _oracle([a], [(desc, nf)])
            np.testing.assert_array_equal(got, exp, err_msg=f"{desc} {nf}")


def test_floats_nan_and_negzero():
    a = pa.array([1.0, float("nan"), -0.0, 0.0, -1.5, None], pa.float64())
    got = ds.try_sort_indices([a], [(False, False)])
    exp = _oracle([a], [(False, False)])
    # NaN sorts after numbers, NULL at end; -0.0/0.0 tie keeps row order
    np.testing.assert_array_equal(got, exp)


def test_strings_rank_codes():
    a = pa.array(["pear", "Apple", None, "apple", "", "pear"])
    b = pa.array([2, 1, 0, 5, 4, 1], pa.int64())
    orders = [(False, False), (True, False)]
    got = ds.try_sort_indices([a, b], orders)
    exp = _oracle([a, b], orders)
    np.testing.assert_array_equal(got, exp)


def test_large_goes_device_and_matches():
    rng = np.random.default_rng(7)
    n = 50_000
    a = pa.array(rng.integers(-10**9, 10**9, n), pa.int64())
    before = ds.STATS["device_sorts"]
    got = ds.try_sort_indices([a], [(True, True)])
    assert ds.STATS["device_sorts"] > before
    exp = _oracle([a], [(True, True)])
    np.testing.assert_array_equal(got, exp)


def test_topk_fast_path():
    rng = np.random.default_rng(8)
    n = 50_000
    a = pa.array(rng.permutation(n), pa.int64())
    before = ds.STATS["topk_sorts"]
    got = ds.try_sort_indices([a], [(True, False)], limit=10)
    assert ds.STATS["topk_sorts"] > before
    assert len(got) == 10
    exp = _oracle([a], [(True, False)])[:10]
    np.testing.assert_array_equal(got, exp)


def test_uint64_full_range():
    a = pa.array([0, 2**64 - 1, 2**63, 5], pa.uint64())
    got = ds.try_sort_indices([a], [(False, False)])
    exp = _oracle([a], [(False, False)])
    np.testing.assert_array_equal(got, exp)


def test_unsupported_type_returns_none():
    a = pa.array([[1], [2]], pa.list_(pa.int64()))
    assert ds.try_sort_indices([a], [(False, False)]) is None
