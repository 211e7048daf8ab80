"""f64_bits matches numpy's bit view exactly (the TPU-safe bitcast).

Exception pinned by design (see ops/floatbits.py docstring): subnormal
inputs encode as signed zero, because XLA device arithmetic is DAZ/FTZ
and already treats them as zero everywhere else in the engine.
"""
import numpy as np
import jax.numpy as jnp

from liquid_tpu.ops.floatbits import f64_bits

TINY = np.finfo(np.float64).tiny  # 2^-1022, smallest normal


def _is_subnormal(v):
    return (v != 0) & (np.abs(v) < TINY)


ADVERSARIAL = np.array([
    0.0, -0.0, 1.0, -1.0, 0.5, 2.0, 1.5, -2.25,
    np.pi, -np.e, 1e300, -1e300, 1e-300, -1e-300,
    np.finfo(np.float64).max, np.finfo(np.float64).min,
    TINY, -TINY,                          # smallest normals, 2^-1022
    np.nextafter(0.0, 1.0), np.nextafter(1.0, 2.0), np.nextafter(1.0, 0.0),
    np.inf, -np.inf,
], dtype=np.float64)


def test_bit_exact_on_adversarial_values():
    got = np.asarray(f64_bits(jnp.asarray(ADVERSARIAL)))
    exp = ADVERSARIAL.view(np.int64)
    sub = _is_subnormal(ADVERSARIAL)
    np.testing.assert_array_equal(got[~sub], exp[~sub])


def test_subnormals_encode_as_signed_zero():
    x = np.array([5e-324, -5e-324, TINY / 2, -TINY / 2,
                  2.2250738585072009e-308], dtype=np.float64)
    got = np.asarray(f64_bits(jnp.asarray(x))).view(np.float64)
    assert (got == 0).all()
    np.testing.assert_array_equal(np.signbit(got), np.signbit(x))


def test_bit_exact_on_random_bit_patterns():
    rng = np.random.default_rng(0)
    bits = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max,
                        20000, dtype=np.int64)
    vals = bits.view(np.float64)
    ok = np.isfinite(vals) & ~_is_subnormal(vals)
    got = np.asarray(f64_bits(jnp.asarray(vals)))
    np.testing.assert_array_equal(got[ok], bits[ok])


def test_nan_collapses_to_canonical():
    x = np.array([np.nan, -np.nan], dtype=np.float64)
    got = np.asarray(f64_bits(jnp.asarray(x)))
    assert (got == np.int64(0x7FF8000000000000)).all()
    assert np.isnan(got.view(np.float64)).all()


def test_roundtrip_via_view():
    rng = np.random.default_rng(1)
    vals = rng.standard_normal(4096) * np.exp(rng.uniform(-300, 300, 4096))
    got = np.asarray(f64_bits(jnp.asarray(vals))).view(np.float64)
    np.testing.assert_array_equal(got, vals)
