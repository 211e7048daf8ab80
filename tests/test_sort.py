"""Device sort kernels: correctness vs numpy."""
import jax.numpy as jnp
import numpy as np
import pytest

from liquid_tpu.ops import sort as dsort


@pytest.mark.parametrize("seed", range(5))
def test_sort_pairs(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    k = rng.integers(0, 1 << 40, n).astype(np.uint64)
    v = rng.integers(0, 1000, n).astype(np.int64)
    ks, vs = dsort.sort_pairs(jnp.asarray(k), jnp.asarray(v))
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ks), k[order])
    np.testing.assert_array_equal(np.asarray(vs), v[order])


@pytest.mark.parametrize("dtype,bits", [(np.uint32, 32), (np.uint32, 16),
                                        (np.uint64, 64)])
def test_radix_sort_pairs(dtype, bits):
    rng = np.random.default_rng(7)
    n = 4096
    hi = (1 << bits) - 1
    k = rng.integers(0, hi, n, dtype=np.uint64).astype(dtype)
    v = np.arange(n, dtype=np.int64)
    ks, vs = dsort.radix_sort_pairs(jnp.asarray(k), jnp.asarray(v), bits)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ks), k[order])
    np.testing.assert_array_equal(np.asarray(vs), v[order])


def test_radix_sort_stability():
    k = np.array([3, 1, 3, 1, 3], dtype=np.uint32)
    v = np.arange(5, dtype=np.int64)
    ks, vs = dsort.radix_sort_pairs(jnp.asarray(k), jnp.asarray(v), 8)
    assert np.asarray(vs).tolist() == [1, 3, 0, 2, 4]


def test_top_k_rows():
    rng = np.random.default_rng(1)
    k = rng.integers(0, 1 << 30, 2000).astype(np.int64)
    vals, idx = dsort.top_k_rows(jnp.asarray(k), 25, descending=True)
    expect = np.sort(k)[::-1][:25]
    np.testing.assert_array_equal(np.asarray(vals), expect)
    np.testing.assert_array_equal(k[np.asarray(idx)], expect)
    vals2, _ = dsort.top_k_rows(jnp.asarray(k), 10, descending=False)
    np.testing.assert_array_equal(np.asarray(vals2), np.sort(k)[:10])


def test_argsort_selected_stable():
    k = np.array([5, 2, 5, 2], dtype=np.int64)
    asc = np.asarray(dsort.argsort_selected(jnp.asarray(k)))
    assert asc.tolist() == [1, 3, 0, 2]
    desc = np.asarray(dsort.argsort_selected(jnp.asarray(k), descending=True))
    assert desc.tolist() == [0, 2, 1, 3]


def test_descending_unsigned_and_int_min():
    """Negation-based descending order breaks on unsigned wrap and
    int64 min; the bitwise-complement reversal must not."""
    k = np.array([5, 0, 3], dtype=np.uint64)
    d = np.asarray(dsort.argsort_selected(jnp.asarray(k), descending=True))
    assert k[d].tolist() == [5, 3, 0]
    k2 = np.array([0, -2**63, 7], dtype=np.int64)
    d2 = np.asarray(dsort.argsort_selected(jnp.asarray(k2), descending=True))
    assert k2[d2].tolist() == [7, 0, -2**63]
    vals, idx = dsort.top_k_rows(jnp.asarray(k), 2, descending=False)
    assert np.asarray(vals).tolist() == [0, 3]
