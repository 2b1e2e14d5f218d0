"""Integer bit-math helpers (the analog of src/libFLAC/bitmath.c), in forms
that compile on TPU (no f64 bitcasts — XLA's x64 rewriting pass does not
implement s64 bitcast-convert, so jnp.frexp on float64 is off limits)."""

from __future__ import annotations

import jax.numpy as jnp


def bitlen64(x: jnp.ndarray) -> jnp.ndarray:
    """Number of bits needed for x >= 0 (0 -> 0), exact, integer-only.
    int32 inputs stay int32 (TPU emulates int64 as int32 pairs)."""
    if x.dtype in (jnp.int32, jnp.uint32):
        shifts = (16, 8, 4, 2, 1)
    else:
        x = x.astype(jnp.int64)
        shifts = (32, 16, 8, 4, 2, 1)
    n = jnp.zeros(x.shape, jnp.int32)
    for s in shifts:
        m = x >> s
        c = m > 0
        n = n + jnp.where(c, s, 0)
        x = jnp.where(c, m, x)
    return n + (x > 0).astype(jnp.int32)


def ilog2(x: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(x)) for x >= 1 (FLAC__bitmath_ilog2, bitmath.c:61)."""
    return bitlen64(x) - 1


def frexp_exponent(x: jnp.ndarray) -> jnp.ndarray:
    """The frexp exponent e of x > 0 (x = m * 2^e with 0.5 <= m < 1).

    Computed from the float32 bit pattern (f32 bitcasts are TPU-legal); for
    values within one f32 ulp of a power of two the result can differ from the
    f64 frexp by 1, which only perturbs the LPC quantization shift by one —
    the stream stays valid and lossless.
    """
    import jax
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
    raw_exp = (bits >> 23) & 0xFF
    return (raw_exp - 126).astype(jnp.int32)
