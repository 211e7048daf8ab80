"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import os

# regressions must surface as failures here, not as silent
# graceful-degradation fallbacks to the single-host engine.  Scoped to
# this module: a process-global set would leak strict mode into later
# test files whose queries legitimately fall back (test_dist_clickbench
# runs the full 43-query set through graceful degradation).
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _strict_dist():
    prior = os.environ.get("LIQUID_DIST_STRICT")
    os.environ["LIQUID_DIST_STRICT"] = "1"
    yield
    if prior is None:
        os.environ.pop("LIQUID_DIST_STRICT", None)
    else:
        os.environ["LIQUID_DIST_STRICT"] = prior

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from liquid_tpu.ops import bitpack as bp
from liquid_tpu.ops import mask as mops
from liquid_tpu.parallel import dist


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, jax.devices()
    return dist.make_mesh(8)


def test_dist_filter_count(mesh):
    rng = np.random.default_rng(0)
    n = 8 * 4096
    real = n - 100  # trailing rows are padding and must not count
    vals = rng.integers(0, 1000, n).astype(np.uint64)
    vals[real:] = 0
    planes = bp.pack_bitplanes(jnp.asarray(vals), 10)
    planes = dist.shard_rows(mesh, planes.T).T  # shard words axis
    valid = np.zeros(n, bool)
    valid[:real] = True
    vmask = dist.shard_rows(mesh, mops.pack_bools(jnp.asarray(valid)))
    step = dist.dist_filter_count(mesh)
    out = jax.jit(step)(planes, vmask, jnp.uint64(500))
    assert int(out[0]) == (vals[:real] != 500).sum()


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


def test_dist_lookup_join(mesh):
    """Probe (fact) x build (dimension, unique keys) equi-join across the
    mesh: every probe row finds its build value exactly."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    n_probe, n_build = 1024, 256
    build_keys = np.arange(1, n_build + 1).astype(np.int64)
    build_vals = (build_keys * 10).astype(np.int64)
    probe_keys = rng.choice(build_keys, n_probe).astype(np.int64)
    probe_vals = rng.integers(0, 100, n_probe).astype(np.int64)
    # some probe keys miss (no build row)
    probe_keys[:32] = 10_000 + np.arange(32)

    step = dist.dist_lookup_join(mesh, n_probe // 8, n_build // 8)
    pk, pv, joined, hit, ovf = step(
        dist.shard_rows(mesh, jnp.asarray(probe_keys)),
        dist.shard_rows(mesh, jnp.asarray(probe_vals)),
        dist.shard_rows(mesh, jnp.asarray(build_keys)),
        dist.shard_rows(mesh, jnp.asarray(build_vals)))
    assert int(jnp.asarray(ovf).sum()) == 0
    pk = np.asarray(pk); joined = np.asarray(joined); hit = np.asarray(hit)
    # every surviving probe row: joined value == key * 10
    assert hit.sum() == (probe_keys <= n_build).sum()
    ok = hit & (pk <= n_build)
    assert (joined[ok] == pk[ok] * 10).all()
    # misses are not marked hit
    assert not hit[(pk > n_build) & (pk != 0)].any()


def test_dist_agg_by_key_skewed(mesh):
    """SUM by key with one very heavy key: local combining keeps the
    exchange within capacity (no overflow) and the totals are exact."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    n = 2048
    keys = rng.integers(0, 50, n).astype(np.int64)
    keys[: n // 2] = 7  # 50%+ of all rows carry one key
    values = rng.integers(0, 1000, n).astype(np.int64)

    step = dist.dist_agg_by_key(mesh, n // 8)
    fk, fs, fvalid, ovf = step(
        dist.shard_rows(mesh, jnp.asarray(keys)),
        dist.shard_rows(mesh, jnp.asarray(values)))
    assert int(jnp.asarray(ovf).sum()) == 0, "skew overflowed the exchange"
    fk = np.asarray(fk); fs = np.asarray(fs); fvalid = np.asarray(fvalid)
    got = {}
    for k, s, v in zip(fk, fs, fvalid):
        if v:
            got[int(k)] = got.get(int(k), 0) + int(s)
    import collections
    expect = collections.defaultdict(int)
    for k, v in zip(keys, values):
        expect[int(k)] += int(v)
    assert got == dict(expect)
