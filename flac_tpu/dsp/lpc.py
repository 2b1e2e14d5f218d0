"""LPC analysis and synthesis, batched over frames.

Re-expresses src/libFLAC/lpc.c for TPU execution:

* windowing + autocorrelation (lpc.c:56-110, plus the SSE variants in
  ia32/lpc_asm.nasm:75-620) as float32 tensor reductions over the frame axis,
* Levinson-Durbin producing coefficients for every order 1..max and per-order
  error (lpc.c:112-154) as a float64 scan over order, vectorized over frames,
* precision-quantization with error feedback and negative-shift handling
  (lpc.c:156-263),
* residual computation (lpc.c:265-530 and the _wide 64-bit path at :531) as a
  masked lag-stencil with int64 accumulation,
* signal restoration (decode side, lpc.c:795/1061) as a lax.scan recurrence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flac_tpu.constants import MAX_LPC_ORDER  # noqa: F401
from flac_tpu.dsp import bitmath


def autocorrelation(windowed: jnp.ndarray, maxlag: int) -> jnp.ndarray:
    """autoc[..., j] = sum_t d[t] * d[t+j], j = 0..maxlag (lpc.c:63).

    `windowed`: [..., T] float32 (already multiplied by the apodization
    window, FLAC__lpc_window_data lpc.c:56). Accumulates in float32 like the
    reference's FLAC__real path.
    """
    T = windowed.shape[-1]
    cols = []
    for j in range(maxlag + 1):
        prod = windowed[..., : T - j] * windowed[..., j:]
        cols.append(jnp.sum(prod, axis=-1))
    return jnp.stack(cols, axis=-1)


def levinson(autoc: jnp.ndarray, max_order: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin over all orders 1..max_order, vectorized over the batch.

    autoc: [..., max_order+1] float-like (promoted to float64 internally, the
    reference uses FLAC__double throughout lpc.c:112-154).

    Returns:
      lp_coeffs [..., max_order, max_order] float32 — row o-1 holds the
        predictor coefficients for order o (sign-negated FIR like the
        reference's lp_coeff),
      errors    [..., max_order] float64 — prediction error per order,
      valid     [..., max_order] bool — False for orders the reference would
        never produce (err hit 0.0 at a lower order, lpc.c:150-153).
    """
    a = autoc.astype(jnp.float64)
    batch = a.shape[:-1]
    L = max_order
    lpc = jnp.zeros(batch + (L,), jnp.float64)
    err = a[..., 0]
    rows = []
    errs = []
    valids = []
    alive = jnp.ones(batch, bool)  # err has stayed nonzero so far
    for i in range(L):
        # r = -autoc[i+1] - sum_{j<i} lpc[j] * autoc[i-j]
        r = -a[..., i + 1]
        for j in range(i):
            r = r - lpc[..., j] * a[..., i - j]
        r = r / jnp.where(err == 0.0, 1.0, err)  # guarded; masked by `alive`
        new_lpc = lpc.at[..., i].set(r)
        half = i >> 1
        for j in range(half):
            tmp = new_lpc[..., j]
            new_lpc = new_lpc.at[..., j].add(r * new_lpc[..., i - 1 - j])
            new_lpc = new_lpc.at[..., i - 1 - j].add(r * tmp)
        if i & 1:
            new_lpc = new_lpc.at[..., half].add(new_lpc[..., half] * r)
        new_err = err * (1.0 - r * r)
        lpc = jnp.where(alive[..., None], new_lpc, lpc)
        err_out = jnp.where(alive, new_err, err)
        rows.append(-lpc)  # negate FIR coeff to get predictor coeff (lpc.c:147)
        errs.append(err_out)
        valids.append(alive)
        err = err_out
        alive = alive & (err != 0.0)
    lp_coeffs = jnp.stack(rows, axis=-2).astype(jnp.float32)
    return lp_coeffs, jnp.stack(errs, axis=-1), jnp.stack(valids, axis=-1)


def expected_bits_per_residual_sample(lpc_error: jnp.ndarray, total_samples: jnp.ndarray) -> jnp.ndarray:
    """FLAC__lpc_compute_expected_bits_per_residual_sample (lpc.c:1325-1351)."""
    error_scale = 0.5 * jnp.log(2.0) ** 2 / total_samples.astype(jnp.float64)
    bps = 0.5 * jnp.log(error_scale * lpc_error) / jnp.log(2.0)
    return jnp.where(
        lpc_error > 0.0, jnp.maximum(bps, 0.0),
        jnp.where(lpc_error < 0.0, 1e32, 0.0))


def compute_best_order(errors: jnp.ndarray, valid: jnp.ndarray, total_samples: int,
                       overhead_bits_per_order: jnp.ndarray) -> jnp.ndarray:
    """FLAC__lpc_compute_best_order (lpc.c:1353-1390): strict-< argmin of
    estimated total subframe bits over orders 1..max; ties keep the lower order.

    errors: [..., L]; overhead_bits_per_order: [...] (bps + qlp precision).
    Returns best order in 1..L as int32.
    """
    L = errors.shape[-1]
    orders = jnp.arange(1, L + 1, dtype=jnp.float64)
    bits = (expected_bits_per_residual_sample(errors, jnp.asarray(float(total_samples)))
            * (total_samples - orders)
            + orders * overhead_bits_per_order[..., None].astype(jnp.float64))
    bits = jnp.where(valid, bits, jnp.inf)
    return (jnp.argmin(bits, axis=-1) + 1).astype(jnp.int32)


def quantize_coefficients(lp_coeff: jnp.ndarray, order: jnp.ndarray, precision: jnp.ndarray,
                          max_order: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FLAC__lpc_quantize_coefficients (lpc.c:156-263), batched.

    lp_coeff: [..., max_order] float32 (row for this order candidate),
    order:    [...] int32 (dynamic order, <= max_order),
    precision:[...] int32 (total precision incl. sign bit).

    Returns (qlp [..., max_order] int32, shift [...] int32, ok [...] bool).
    Matches the reference's error-feedback loop, shift clamping to [.., 15],
    and the negative-shift fallback that scales coefficients down and reports
    shift 0.
    """
    c = lp_coeff.astype(jnp.float64)
    L = max_order
    jrange = jnp.arange(L)
    active = jrange < order[..., None]
    p = precision - 1  # drop sign bit (lpc.c:166)
    qmax = (1 << p) - 1
    qmin = -(1 << p)
    cmax = jnp.max(jnp.where(active, jnp.abs(c), 0.0), axis=-1)
    ok_nonzero = cmax > 0.0  # all-zero coeffs: "constant-detect didn't work" (ret 2)
    e = bitmath.frexp_exponent(jnp.where(ok_nonzero, cmax, 1.0))
    log2cmax = e - 1
    shift = p - log2cmax - 1
    max_shiftlimit = (1 << 4) - 1  # (1<<(QLP_SHIFT_LEN-1))-1 = 15
    min_shiftlimit = -max_shiftlimit - 1
    ok_shift = shift >= min_shiftlimit  # too-small shift: ret 1
    shift = jnp.minimum(shift, max_shiftlimit)
    # 2^shift, exact also for negative shift. Built from int64 shifts instead
    # of jnp.ldexp: XLA's TPU x64-rewriting can't lower ldexp's s64 bitcasts.
    # Out-of-range lanes (|shift| > 62) are already masked off by ok_shift /
    # the min() clamp, so clipping here never changes a surviving result.
    shift_c = jnp.clip(shift, -62, 62).astype(jnp.int64)
    scale = (jnp.where(shift_c >= 0, jnp.int64(1) << shift_c, 1).astype(jnp.float64)
             / jnp.where(shift_c < 0, jnp.int64(1) << (-shift_c), 1).astype(jnp.float64))
    err = jnp.zeros(c.shape[:-1], jnp.float64)
    qs = []
    for j in range(L):
        err_new = err + c[..., j] * scale
        q = jnp.where(err_new >= 0.0, jnp.floor(err_new + 0.5), jnp.ceil(err_new - 0.5))
        q = jnp.clip(q, qmin.astype(jnp.float64), qmax.astype(jnp.float64))
        is_act = active[..., j]
        qs.append(jnp.where(is_act, q, 0.0).astype(jnp.int32))
        err = jnp.where(is_act, err_new - q, err)
    qlp = jnp.stack(qs, axis=-1)
    shift_out = jnp.maximum(shift, 0)  # negative shift is a decoder NOP -> emit 0
    return qlp, shift_out.astype(jnp.int32), ok_nonzero & ok_shift


def lpc_residual(x: jnp.ndarray, qlp: jnp.ndarray, order: jnp.ndarray,
                 shift: jnp.ndarray, max_order: int,
                 narrow: bool = False) -> jnp.ndarray:
    """residual[t] = x[t] - (sum_{j=1..order} qlp[j-1] * x[t-j] >> shift).

    x: [..., T] int32; qlp: [..., max_order]; order/shift: [...].
    int64 accumulation covers both the reference's 32-bit and _wide paths
    exactly (lpc.c:265,531). Entries t < order are zeroed (warmup region).

    narrow=True keeps the accumulator in int32 — exact whenever
    bps + qlp precision + ilog2(order) <= 32, the same test the reference
    uses to pick its 32-bit datapath (stream_encoder.c:3592); the caller
    asserts this statically (the qlp-precision clamp enforces it for
    <=16-bit streams). Halves the op width on TPU.
    """
    T = x.shape[-1]
    dt = jnp.int32 if narrow else jnp.int64
    xw = x.astype(dt)
    acc = jnp.zeros_like(xw)
    for j in range(1, max_order + 1):
        coef = qlp[..., j - 1].astype(dt)
        lag = jnp.roll(xw, j, axis=-1)  # x[t-j]; wrapped t<order region masked below
        acc = acc + jnp.where((j <= order)[..., None], coef[..., None] * lag, 0)
    pred = jax.lax.shift_right_arithmetic(acc, shift[..., None].astype(dt))
    t = jnp.arange(T)
    res = jnp.where(t >= order[..., None], xw - pred, 0)
    return res.astype(jnp.int32)


def lpc_residual_limbs(x: jnp.ndarray, qlp: jnp.ndarray, order: jnp.ndarray,
                       shift: jnp.ndarray, max_order: int
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Wide-datapath residual via TWO INT32 LIMBS instead of emulated int64.

    The reference's _wide path (lpc.c:531) exists because the MAC
    sum_j qlp[j]*x[t-j] can exceed 32 bits even though x, qlp, and the
    final residual all fit in int32. TPUs emulate int64 as int32 pairs on
    every op; hand-limbing just the MAC halves that cost: split
    x = (x>>12)*2^12 + (x & 0xFFF) and accumulate the two partial dot
    products in int32 —

        acc = A_hi*2^12 + A_lo,  H = A_hi + (A_lo>>12),  r = A_lo & 0xFFF
        acc>>s = H >> (s-12)                    for s >= 12   (nested floor)
               = (H << (12-s)) + (r >> s)       for s <  12   (exact split)

    Exactness bound (the caller gates on it statically): per-tap products
    |qlp|*2^12 and |qlp|*|x>>12| summed over max_order taps must fit int32
    — holds for effective bps <= 25 with precision <= 15 and order <= 16,
    i.e. the whole 24-bit family (stream_encoder.c's use_wide dispatch at
    :888 with the same numerology).

    Returns (res [..., T] int32, ovf [...] bool): `ovf` marks candidates
    whose s < 12 prediction left int32 (astronomic-residual candidates a
    valid encode never selects — the reference evaluates them exactly and
    then discards them; here the caller masks them to INF bits instead).
    """
    T = x.shape[-1]
    x = x.astype(jnp.int32)
    xl = x & 0xFFF
    xh = x >> 12
    acc_lo = jnp.zeros(jnp.broadcast_shapes(x.shape, qlp.shape[:-1] + (T,)),
                       jnp.int32)
    acc_hi = jnp.zeros_like(acc_lo)
    for j in range(1, max_order + 1):
        coef = qlp[..., j - 1].astype(jnp.int32)
        active = (j <= order)[..., None]
        acc_lo = acc_lo + jnp.where(active,
                                    coef[..., None] * jnp.roll(xl, j, -1), 0)
        acc_hi = acc_hi + jnp.where(active,
                                    coef[..., None] * jnp.roll(xh, j, -1), 0)
    H = acc_hi + (acc_lo >> 12)
    r = acc_lo & 0xFFF
    s = shift[..., None].astype(jnp.int32)
    pred_ge = jax.lax.shift_right_arithmetic(H, jnp.maximum(s - 12, 0))
    pred_lt = (jax.lax.shift_left(H, jnp.maximum(12 - s, 0))
               + jax.lax.shift_right_logical(r, jnp.minimum(s, 12)))
    pred = jnp.where(s >= 12, pred_ge, pred_lt)
    t = jnp.arange(T)
    valid = t >= order[..., None]
    res = jnp.where(valid, x - pred, 0)
    # s < 12 overflow: |H| must fit in 31-(12-s) bits for H<<(12-s)
    ovf_t = (s < 12) & (jnp.abs(H) >= (jnp.int32(1) << jnp.minimum(19 + s, 30)))
    ovf = jnp.any(ovf_t & valid, axis=-1)
    return res, ovf


def lpc_restore(residual: jnp.ndarray, qlp: jnp.ndarray, order: jnp.ndarray,
                shift: jnp.ndarray, warmup: jnp.ndarray, max_order: int) -> jnp.ndarray:
    """Decode-side FLAC__lpc_restore_signal[_wide] (lpc.c:795,1061).

    residual: [B, T] int32 (entries t < order ignored), warmup: [B, max_order]
    (first `order` entries used), qlp: [B, max_order], order/shift: [B].
    Returns [B, T] int32.

    The truncating >> makes the recurrence nonlinear, so it runs as a
    lax.scan over time with the whole batch in each step; history is kept in
    a [B, max_order] rolling window (newest at index 0).
    """
    B, T = residual.shape
    res64 = residual.astype(jnp.int64)
    hist0 = jnp.zeros((B, max_order), jnp.int64)  # hist[:, j] = x[t-1-j]
    qlp64 = qlp.astype(jnp.int64)
    shift64 = shift.astype(jnp.int64)
    tgrid = jnp.arange(max_order)
    # warmup samples padded out to T so the scan can consume one column per step
    w_full = jnp.concatenate(
        [warmup.astype(jnp.int64),
         jnp.zeros((B, max(T - max_order, 0)), jnp.int64)], axis=1)[:, :T]

    def step(hist, inp):
        r_t, w_t, t = inp
        pred = jnp.sum(jnp.where(tgrid[None, :] < order[:, None], qlp64 * hist, 0), axis=1)
        pred = jax.lax.shift_right_arithmetic(pred, shift64)
        x_t = jnp.where(t < order, w_t, r_t + pred)
        new_hist = jnp.concatenate([x_t[:, None], hist[:, :-1]], axis=1)
        return new_hist, x_t

    _, xs = jax.lax.scan(step, hist0, (res64.T, w_full.T, jnp.arange(T)))
    return xs.T.astype(jnp.int32)
