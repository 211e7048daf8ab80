"""float64 -> int64 IEEE-754 bit image without bitcast_convert_type.

TPU's X64-rewriting pass (which decomposes 64-bit element types into
32-bit pairs) does not implement `bitcast-convert` on 64-bit operands:
compiling one fails with "While rewriting computation to not contain
X64 element types ..." and the s64->f64 direction silently returns
wrong values (measured on v5e via the axon tunnel, PERF_NOTES.md
round 2).  The engine needs float bit images in two hot places --
float GROUP BY key codes (parallel/session.py) and the packed
hash-aggregate device->host fetch (ops/hashagg.py) -- so this module
reconstructs the exact IEEE bit pattern from `jnp.frexp` plus integer
arithmetic, all of which the rewriter supports.

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
    # subnormals: device arithmetic is DAZ (see module docstring), so
    # they land in the mi == 0 branch below and encode as signed zero
    m, e = jnp.frexp(x)  # x = m * 2^e with |m| in [0.5, 1) (exact)
    e = e.astype(jnp.int64)
    # |m| * 2^53 is an integer in {0} U [2^52, 2^53), exactly
    # representable in f64, so the convert is exact
    mi = jnp.abs(m * jnp.float64(1 << 53)).astype(jnp.int64)

    # normals: biased exponent = (e - 1) + 1023, fraction drops the
    # implicit leading bit
    biased = e + jnp.int64(1022)
    frac = mi - (jnp.int64(1) << 52)
    # subnormals (e < -1021): biased = 0, fraction is mi shifted back
    # down -- exact, the shifted-out bits of a representable subnormal
    # are zero
    is_sub = e < jnp.int64(-1021)
    shift = jnp.clip(jnp.int64(-1021) - e, 0, 63)
    frac = jnp.where(is_sub, jax.lax.shift_right_logical(mi, shift), frac)
    biased = jnp.where(is_sub, jnp.int64(0), biased)
    # zeros (frexp returns m == 0, e == 0)
    zero = mi == 0
    biased = jnp.where(zero, jnp.int64(0), biased)
    frac = jnp.where(zero, jnp.int64(0), frac)
    # inf / nan
    inf = jnp.isinf(x)
    nan = jnp.isnan(x)
    biased = jnp.where(inf | nan, jnp.int64(2047), biased)
    frac = jnp.where(inf, jnp.int64(0),
                     jnp.where(nan, jnp.int64(1) << 51, frac))
    sign = jnp.where(jnp.signbit(x) & ~nan, jnp.int64(1), jnp.int64(0))
    return (sign << 63) | (biased << 52) | frac
