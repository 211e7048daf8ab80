"""Bit-packed device->host result fetch (ops/packfetch.py).

Reference behavior: the liquid-cache server streams encoded Arrow IPC
instead of raw batches (src/datafusion-server/src/lib.rs:200-235); here
the device->host tunnel is the network, so result matrices cross it
bit-packed.  These tests pin exact round-trips for every dtype tag and
the wire-byte accounting the bench reports.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from liquid_tpu.ops import packfetch


def _roundtrip(cols_np, g):
    cols = [jnp.asarray(c) for c in cols_np]
    out = packfetch.fetch_columns(cols, g)
    assert len(out) == len(cols_np)
    for got, want in zip(out, cols_np):
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got[:g], want[:g])


def test_small_fetch_raw_path():
    rng = np.random.default_rng(0)
    a = rng.integers(-50, 50, 256)
    _roundtrip([a.astype(np.int64)], 200)


def test_packed_narrow_ints():
    rng = np.random.default_rng(1)
    n = 1 << 18  # above MIN_PACK_BYTES with 2+ columns
    cols = [
        rng.integers(0, 7, n).astype(np.int64),
        rng.integers(-1000, -900, n).astype(np.int64),  # offset coding
        (rng.integers(0, 2, n) > 0),                    # bool nulls
        np.full(n, 123456789, np.int64),                # constant: 0 bits
    ]
    before = dict(packfetch.STATS)
    _roundtrip(cols, n - 17)
    assert packfetch.STATS["packed_fetches"] == before["packed_fetches"] + 1
    moved = packfetch.STATS["wire_bytes"] - before["wire_bytes"]
    raw = packfetch.STATS["raw_bytes"] - before["raw_bytes"]
    assert moved < raw / 4  # narrow columns must actually compress


def test_f64_bits_ride_raw_exact():
    rng = np.random.default_rng(2)
    n = 1 << 18
    f = rng.standard_normal(n) * 1e12
    f[3] = -0.0
    f[4] = np.inf
    cols = [f, rng.integers(0, 100, n).astype(np.int64)]
    out = packfetch.fetch_columns([jnp.asarray(c) for c in cols], n)
    assert out[0].dtype == np.float64
    np.testing.assert_array_equal(out[0].view(np.int64),
                                  cols[0].view(np.int64))
    np.testing.assert_array_equal(out[1], cols[1])


def test_garbage_beyond_g_ignored():
    n = 1 << 18
    a = np.zeros(n, np.int64)
    g = 1000
    a[:g] = np.arange(g) % 13
    a[g:] = (1 << 61)  # garbage must not widen or corrupt the pack
    out = packfetch.fetch_columns([jnp.asarray(a)], g)
    np.testing.assert_array_equal(out[0][:g], a[:g])


def test_negative_span_and_empty_g():
    n = 1 << 18
    a = np.arange(n, dtype=np.int64) - (n // 2)
    out = packfetch.fetch_columns([jnp.asarray(a)], 0)
    assert out[0].shape[0] == n  # raw fallback on g == 0


@pytest.mark.parametrize("span_bits", [33, 41, 55])
def test_wide_spans(span_bits):
    rng = np.random.default_rng(span_bits)
    n = 1 << 18
    a = rng.integers(0, 1 << span_bits, n).astype(np.int64) - (1 << 32)
    _roundtrip([a], n)
