"""Fixed (polynomial) predictors, orders 0-4, batched over frames.

Re-expresses src/libFLAC/fixed.c as whole-frame tensor ops: the difference
cascades of FLAC__fixed_compute_best_predictor[_wide] (fixed.c:224-350)
become jnp.diff chains reduced over the frame axis, and
FLAC__fixed_compute_residual / FLAC__fixed_restore_signal (fixed.c:352-435)
become binomial-coefficient stencils / cumulative sums.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_FIXED_ORDER = 4

# binomial stencil rows: residual_o[t] = sum_j COEF[o][j] * x[t-j]
_STENCILS = np.array([
    [1, 0, 0, 0, 0],
    [1, -1, 0, 0, 0],
    [1, -2, 1, 0, 0],
    [1, -3, 3, -1, 0],
    [1, -4, 6, -4, 1],
], dtype=np.int32)


def fixed_errors(x: jnp.ndarray, wide: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Total absolute error of each fixed order and the best-order choice.

    x: [..., T] int32 frame signal. Mirrors FLAC__fixed_compute_best_predictor
    (fixed.c:224): errors are summed over data indices [MAX_FIXED_ORDER, T)
    (the encoder calls it with signal+4, length T-4). In the narrow path the
    accumulators are uint32 and wrap (fixed.c:234 total_error_* are
    FLAC__uint32); `wide` selects the uint64 accumulators, per the encoder's
    use_wide_by_block dispatch (stream_encoder.c:888).

    Returns (total_errors [..., 5] uint64-valued int64, best_order [...] int32).
    """
    x64 = x.astype(jnp.int64)
    d0 = x64[..., 4:]
    d1 = jnp.diff(x64, 1)[..., 3:]
    d2 = jnp.diff(x64, 2)[..., 2:]
    d3 = jnp.diff(x64, 3)[..., 1:]
    d4 = jnp.diff(x64, 4)
    errs = jnp.stack(
        [jnp.sum(jnp.abs(d), axis=-1) for d in (d0, d1, d2, d3, d4)], axis=-1
    )
    if not wide:
        errs = errs & 0xFFFFFFFF  # uint32 wraparound of the narrow accumulators
    # strict-< cascade (fixed.c:245-254): ties go to the higher order
    e0, e1, e2, e3, e4 = (errs[..., i] for i in range(5))
    order = jnp.where(
        e0 < jnp.minimum(jnp.minimum(e1, e2), jnp.minimum(e3, e4)), 0,
        jnp.where(e1 < jnp.minimum(e2, jnp.minimum(e3, e4)), 1,
                  jnp.where(e2 < jnp.minimum(e3, e4), 2,
                            jnp.where(e3 < e4, 3, 4))))
    return errs, order.astype(jnp.int32)


def residual_bits_per_sample(total_errors: jnp.ndarray, n: int) -> jnp.ndarray:
    """FLAC__float residual_bits_per_sample[order] (fixed.c:266-270):
    log2(ln2 * err / n), 0 when err == 0. float32 result like FLAC__real."""
    e = total_errors.astype(jnp.float64)
    bps = jnp.log(jnp.log(2.0) * e / float(n)) / jnp.log(2.0)
    return jnp.where(total_errors > 0, bps, 0.0).astype(jnp.float32)


def fixed_residuals_all_orders(x: jnp.ndarray) -> jnp.ndarray:
    """Residuals of every fixed order at once.

    x: [..., T] int32. Returns [..., 5, T] int32 where out[..., o, t] is the
    order-o residual at sample t, valid for t >= o; entries t < o are zeroed.
    (FLAC__fixed_compute_residual, fixed.c:352.)
    """
    T = x.shape[-1]
    # int32 throughout: the reference computes these residuals in FLAC__int32
    # (fixed.c:352), and mod-2^32 add/mul make stepwise int32 wraparound
    # identical to int64-then-truncate — while halving the op width on TPU
    x32 = x.astype(jnp.int32)
    outs = []
    t = jnp.arange(T)
    for o in range(MAX_FIXED_ORDER + 1):
        acc = jnp.zeros_like(x32)
        for j in range(o + 1):
            c = int(_STENCILS[o, j])
            shifted = jnp.roll(x32, j, axis=-1)  # x[t-j]; wrapped region masked below
            acc = acc + c * shifted
        acc = jnp.where(t >= o, acc, 0)
        outs.append(acc)
    return jnp.stack(outs, axis=-2)


def fixed_restore(residual: jnp.ndarray, warmup: jnp.ndarray, order: int) -> jnp.ndarray:
    """Decode-side restore for a static order (FLAC__fixed_restore_signal,
    fixed.c:395).

    The order-o residual is the o-th finite difference of the signal, so the
    restore is o nested cumulative sums, each seeded by the corresponding
    difference of the warmup samples — a parallel-scan-friendly form instead
    of the reference's per-sample recurrence.

    residual: [..., T-order] int32, warmup: [..., order]. Returns [..., T] int32.
    """
    if order == 0:
        return residual
    cur = warmup.astype(jnp.int64)
    seeds = []
    for _ in range(order):
        seeds.append(cur[..., 0:1])  # seed_k = (Delta^k x)[k]
        cur = cur[..., 1:] - cur[..., :-1]
    out = residual.astype(jnp.int64)  # (Delta^order x)[t] for t in [order, T)
    for k in range(order - 1, -1, -1):
        out = jnp.cumsum(jnp.concatenate([seeds[k], out], axis=-1), axis=-1)
    return out.astype(jnp.int32)
