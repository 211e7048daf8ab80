"""float64 -> int64 IEEE-754 bit image without any bitcast.

TPU's X64-rewriting pass (which decomposes 64-bit element types into
32-bit pairs) does not implement `bitcast-convert` on 64-bit operands:
compiling one fails with "While rewriting computation to not contain
X64 element types ..." and the s64->f64 direction silently returns
wrong values (measured on v5e via the axon tunnel, PERF_NOTES.md
round 2).  That rules out not just `jax.lax.bitcast_convert_type` but
also `jnp.frexp` and `jnp.signbit`, which lower to bitcasts internally.

The engine needs float bit images in two hot places -- float GROUP BY
key codes (parallel/session.py) and the packed hash-aggregate
device->host fetch (ops/hashagg.py) -- so this module reconstructs the
exact IEEE bit pattern with pure arithmetic: a 10-step binary
normalization by exact power-of-two constants (the portable-frexp
algorithm) recovers the exponent and mantissa, and integer ops
assemble the pattern.

The result is bit-identical to `np.float64(...).view(np.int64)` for
every normal/inf/zero input.  NaNs collapse to the canonical quiet-NaN
pattern 0x7FF8000000000000 (what grouping semantics want anyway).
Subnormals map to signed zero: XLA device arithmetic runs DAZ/FTZ
(measured: `x * 2^54` and even `x + x` return 0 for subnormal x on the
CPU backend), so subnormal doubles are architecturally invisible to
every device op -- mapping them to +-0 here is CONSISTENT with how the
rest of the engine already treats them.  Verified by
tests/test_floatbits.py over adversarial values incl. boundary
exponents.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def f64_bits(x: jax.Array) -> jax.Array:
    """IEEE-754 bit image of a float64 array as int64 (no bitcast).

    Inverse on host: `np.asarray(bits).view(np.float64)`.
    """
    assert x.dtype == jnp.float64, x.dtype
    a = jnp.abs(x)
    e = jnp.zeros(x.shape, jnp.int64)
    # binary normalization into [1, 2): multiply/divide by 2^512..2^1.
    # Every constant and every scale step is an exact power-of-two
    # operation; the two branches are mutually exclusive.  Subnormal
    # inputs flush to 0 during the multiplies (DAZ) and fall into the
    # zero branch below, by design.
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        c = jnp.float64(2.0 ** k)
        up = a >= c                      # too big: halve k times
        a = jnp.where(up, a / c, a)
        dn = a < jnp.float64(2.0 ** (1 - k))  # too small: safe to scale up
        a = jnp.where(dn, a * c, a)
        e = e + jnp.where(up, jnp.int64(k), jnp.int64(0)) \
              - jnp.where(dn, jnp.int64(k), jnp.int64(0))
    # now |x| = a * 2^e with a in [1, 2) for finite nonzero x;
    # a * 2^52 is an integer in [2^52, 2^53): the convert is exact
    mi = (a * jnp.float64(1 << 52)).astype(jnp.int64)
    biased = e + jnp.int64(1023)
    frac = mi - (jnp.int64(1) << 52)
    # zeros (and DAZ-flushed subnormals)
    zero = mi == 0
    # enforce the subnormal -> signed-zero contract in code: a backend
    # that does NOT flush subnormals normalizes them to e < -1022, which
    # would make `biased` non-positive and silently emit NaN-pattern
    # bits; clamp those lanes to the zero image instead (ADVICE round 2)
    sub = biased <= jnp.int64(0)
    zero = zero | sub
    biased = jnp.where(zero, jnp.int64(0), biased)
    frac = jnp.where(zero, jnp.int64(0), frac)
    # inf / nan
    inf = jnp.isinf(x)
    nan = jnp.isnan(x)
    biased = jnp.where(inf | nan, jnp.int64(2047), biased)
    frac = jnp.where(inf, jnp.int64(0),
                     jnp.where(nan, jnp.int64(1) << 51, frac))
    # sign without jnp.signbit (which bitcasts): -0.0 via the sign of
    # its reciprocal
    neg = jnp.where(x == 0, jnp.float64(1.0) / x < 0, x < 0)
    sign = jnp.where(neg & ~nan, jnp.int64(1), jnp.int64(0))
    return (sign << 63) | (biased << 52) | frac
