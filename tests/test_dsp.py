"""Unit tests for the batched DSP kernels against simple numpy references."""

import jax
import numpy as np

from tests.conftest import make_signal

jnp = jax.numpy

from flac_tpu.dsp import bitmath, fixed, lpc, signal as sigutil  # noqa: E402
from flac_tpu.rice import fold_residual, rice_search  # noqa: E402


class TestBitmath:
    def test_bitlen(self):
        vals = np.array([0, 1, 2, 3, 4, 255, 256, (1 << 40) - 1, 1 << 40, (1 << 52)])
        got = np.asarray(bitmath.bitlen64(jnp.asarray(vals)))
        want = np.array([v.bit_length() for v in vals.tolist()])
        np.testing.assert_array_equal(got, want)

    def test_frexp_exponent(self):
        import math
        vals = np.array([1.0, 0.5, 0.25, 3.2, 1e-3, 12345.0, 0.9999])
        got = np.asarray(bitmath.frexp_exponent(jnp.asarray(vals)))
        want = np.array([math.frexp(v)[1] for v in vals])
        np.testing.assert_array_equal(got, want)


class TestFixed:
    def test_residual_restore_roundtrip(self):
        x = make_signal(512, 1, 16, kind="quiet")[:, 0][None, :]
        res_all = np.asarray(fixed.fixed_residuals_all_orders(jnp.asarray(x)))
        for o in range(5):
            res = res_all[:, o, o:]
            warm = x[:, :o]
            back = np.asarray(fixed.fixed_restore(jnp.asarray(res), jnp.asarray(warm), o))
            np.testing.assert_array_equal(back, x)

    def test_errors_match_reference_formula(self):
        x = make_signal(256, 1, 16, kind="sine")[:, 0][None, :].astype(np.int64)
        errs, order = fixed.fixed_errors(jnp.asarray(x), wide=True)
        errs = np.asarray(errs)[0]
        # direct difference cascade over data indices [4, T)
        want = [np.abs(np.diff(x[0], n=o)[4 - o:]).sum() for o in range(5)]
        np.testing.assert_array_equal(errs, want)


class TestLpc:
    def test_levinson_solves_normal_equations(self):
        rng = np.random.default_rng(0)
        x = np.cumsum(rng.normal(0, 100, 2048))
        xw = x.astype(np.float32)[None, :]
        autoc = np.asarray(lpc.autocorrelation(jnp.asarray(xw), 8))
        coeffs, errs, valid = lpc.levinson(jnp.asarray(autoc), 8)
        coeffs = np.asarray(coeffs)[0]
        a = autoc[0].astype(np.float64)
        # order-8 coefficients should approximately solve the Toeplitz system
        R = np.array([[a[abs(i - j)] for j in range(8)] for i in range(8)])
        want = np.linalg.solve(R, a[1:9])
        np.testing.assert_allclose(coeffs[7, :8], want, rtol=2e-3, atol=1e-3)
        assert np.all(np.asarray(valid)[0])

    def test_residual_restore_roundtrip(self):
        rng = np.random.default_rng(1)
        x = np.cumsum(rng.normal(0, 50, 1024)).astype(np.int32)[None, :]
        qlp = np.zeros((1, 8), np.int32)
        qlp[0, :4] = [1000, -500, 250, 100]
        order = np.array([4], np.int32)
        shift = np.array([10], np.int32)
        res = np.asarray(lpc.lpc_residual(jnp.asarray(x), jnp.asarray(qlp), jnp.asarray(order),
                                          jnp.asarray(shift), 8))
        warm = np.zeros((1, 8), np.int32)
        warm[0, :4] = x[0, :4]
        back = np.asarray(lpc.lpc_restore(jnp.asarray(res), jnp.asarray(qlp), jnp.asarray(order),
                                          jnp.asarray(shift), jnp.asarray(warm), 8))
        np.testing.assert_array_equal(back, x)

    def test_quantize_reconstruction(self):
        # quantized coeffs at precision p should approximate the float coeffs
        c = np.array([[0.9, -0.4, 0.2, 0.05, 0, 0, 0, 0]], np.float32)
        qlp, shift, ok = lpc.quantize_coefficients(
            jnp.asarray(c), jnp.asarray([4]), jnp.asarray([12]), 8)
        assert bool(np.asarray(ok)[0])
        approx = np.asarray(qlp)[0, :4] / (1 << int(np.asarray(shift)[0]))
        np.testing.assert_allclose(approx, c[0, :4], atol=2e-3)


class TestSignalUtil:
    def test_wasted_bits(self):
        x = np.array([[8, 16, 24, 0], [1, 2, 3, 4], [0, 0, 0, 0]], np.int32)
        got = np.asarray(sigutil.wasted_bits(jnp.asarray(x)))
        np.testing.assert_array_equal(got, [3, 0, 0])

    def test_mid_side_undo(self):
        rng = np.random.default_rng(2)
        L = rng.integers(-32768, 32768, 64).astype(np.int32)[None]
        R = rng.integers(-32768, 32768, 64).astype(np.int32)[None]
        m, s = sigutil.mid_side(jnp.asarray(L), jnp.asarray(R))
        l2, r2 = sigutil.undo_channel_assignment(m, s, jnp.asarray([3]))
        np.testing.assert_array_equal(np.asarray(l2), L)
        np.testing.assert_array_equal(np.asarray(r2), R)


class TestRice:
    def test_exact_bits_match_actual_encoding(self):
        """rice_search's exact bit count must equal the sum of codeword lengths
        of the chosen parameters — this is what the packer's layout uses."""
        rng = np.random.default_rng(3)
        T = 1024
        res = (rng.laplace(0, 60, (2, T))).astype(np.int64)
        order = np.array([2, 0], np.int32)
        t = np.arange(T)
        res[0, :2] = 0
        folded = np.where(res >= 0, res * 2, -res * 2 - 1)
        folded = np.where(t[None, :] >= order[:, None], folded, 0)
        absres = np.where(t[None, :] >= order[:, None], np.abs(res), 0)
        out = rice_search(jnp.asarray(absres), jnp.asarray(folded),
                          jnp.asarray(order), jnp.asarray([6, 6]), T, 0, 4, 15)
        po = np.asarray(out.partition_order)
        params = np.asarray(out.params_leaf)
        exact = np.asarray(out.exact_bits)
        for b in range(2):
            nparts = 1 << po[b]
            ps = T >> po[b]
            total = 2 + 4 + 4 * nparts
            for p in range(nparts):
                k = params[b, p * (16 >> po[b]) if po[b] <= 4 else 0]
                lo = max(p * ps, order[b])
                for t0 in range(lo, (p + 1) * ps):
                    total += (folded[b, t0] >> k) + 1 + k
            assert total == exact[b], (b, total, exact[b])
