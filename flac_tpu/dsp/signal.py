"""Per-frame signal utilities: wasted bits, constant detection, stereo transforms.

Replaces get_wasted_bits_ (stream_encoder.c:4108), the constant-subframe
double-check (stream_encoder.c:3218-3230), and the mid/side generation
(stream_encoder.c:1991-1992) with batched tensor ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def wasted_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Shared trailing-zero-bit count of a frame's samples.

    x: [..., T] int32. Returns [...] int32 — 0 when the frame is all zeros
    (get_wasted_bits_: shift = count-trailing-zeros of the OR of all samples).
    """
    acc = jnp.bitwise_or.reduce(x, axis=-1)
    # ctz via popcount((v & -v) - 1)
    low = jnp.bitwise_and(acc, -acc)
    ctz = _popcount32(low - 1)
    return jnp.where(acc == 0, 0, ctz).astype(jnp.int32)


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return ((v * 0x01010101) >> 24).astype(jnp.int32)


def is_constant(x: jnp.ndarray) -> jnp.ndarray:
    """True where all samples in the frame equal the first sample."""
    return jnp.all(x == x[..., :1], axis=-1)


def mid_side(left: jnp.ndarray, right: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mid = (L+R)>>1 (arithmetic, NOT /2), side = L-R (stream_encoder.c:1991)."""
    mid = (left + right) >> 1
    side = left - right
    return mid, side


def undo_channel_assignment(ch0: jnp.ndarray, ch1: jnp.ndarray, assignment: jnp.ndarray
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decoder-side stereo undo (stream_decoder.c:2067-2103).

    assignment: [...] int32 per frame; ch0/ch1: [..., T] decoded subframe
    signals. LEFT_SIDE: ch1 = L - side; RIGHT_SIDE: ch0 = side + R;
    MID_SIDE: mid was (L+R)>>1, side = L-R — reconstruct via
    L = ((mid<<1 | (side&1)) + side) >> 1, R = ((mid<<1 | (side&1)) - side) >> 1.
    """
    a = assignment[..., None]
    # left-side: ch0 = left, ch1 = side -> right = left - side
    ls_l, ls_r = ch0, ch0 - ch1
    # right-side: ch0 = side, ch1 = right -> left = side + right
    rs_l, rs_r = ch0 + ch1, ch1
    # mid-side
    mid2 = (ch0 << 1) | (ch1 & 1)
    ms_l = (mid2 + ch1) >> 1
    ms_r = (mid2 - ch1) >> 1
    left = jnp.where(a == 1, ls_l, jnp.where(a == 2, rs_l, jnp.where(a == 3, ms_l, ch0)))
    right = jnp.where(a == 1, ls_r, jnp.where(a == 2, rs_r, jnp.where(a == 3, ms_r, ch1)))
    return left, right
