"""The batched TPU frame encoder.

One jit-compiled pure function encodes a whole batch of frames: the
reference's nested per-frame loops (process_subframes_ /
process_subframe_ / evaluate_*_subframe_, stream_encoder.c:2920-3660)
become tensor axes:

  [B]atch of frames x [K] candidate channels (L, R, mid, side) x
  [M] model candidates (fixed orders, LPC (window x order x precision)) x
  [T] samples

reduced by the same strict-< argmin rules the reference uses, so the
*choices* (subframe type, order, partition order, Rice parameters, channel
assignment) track libFLAC's, while the bitstream is assembled by the
prefix-sum field packer (flac_tpu.encode.packer) instead of a sequential
bitwriter.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from flac_tpu import constants as C
from flac_tpu import crc as crc_mod
from flac_tpu import rice
from flac_tpu.dsp import fixed as dsp_fixed
from flac_tpu.dsp import lpc as dsp_lpc
from flac_tpu.dsp import signal as dsp_signal
from flac_tpu.dsp import windows as dsp_windows
from flac_tpu.encode import packer

INF_BITS = jnp.int64(1) << 40


@dataclass(frozen=True)
class EncoderConfig:
    """Resolved encoder settings — the analog of FLAC__StreamEncoderProtected
    after init-time validation/defaulting (stream_encoder.c:676-735)."""

    channels: int = 2
    bits_per_sample: int = 16
    sample_rate: int = 44100
    blocksize: int = 4096
    do_mid_side: bool = True
    loose_mid_side: bool = False
    max_lpc_order: int = 8
    qlp_coeff_precision: int = 0  # 0 = auto (resolved in from_level/resolve)
    do_qlp_coeff_prec_search: bool = False
    do_escape_coding: bool = False
    do_exhaustive_model_search: bool = False
    min_partition_order: int = 0
    max_partition_order: int = 5
    apodizations: tuple = (("tukey", 0.5),)
    streamable_subset: bool = True
    # debug flags mirroring the reference's undocumented --disable-* options
    # (src/flac/main.c:212-218)
    disable_constant_subframes: bool = False
    disable_fixed_subframes: bool = False
    disable_verbatim_subframes: bool = False

    # Compression presets 0-8 (stream_encoder.c:120-141):
    # (do_mid_side, loose_mid_side, max_lpc_order, qlp_precision,
    #  prec_search, escape, exhaustive, min_po, max_po, search_dist)
    PRESETS = (
        (False, False, 0, 0, False, False, False, 0, 3, 0),
        (True, True, 0, 0, False, False, False, 0, 3, 0),
        (True, False, 0, 0, False, False, False, 0, 3, 0),
        (False, False, 6, 0, False, False, False, 0, 4, 0),
        (True, True, 8, 0, False, False, False, 0, 4, 0),
        (True, False, 8, 0, False, False, False, 0, 5, 0),
        (True, False, 8, 0, False, False, False, 0, 6, 0),
        (True, False, 8, 0, False, False, True, 0, 6, 0),
        (True, False, 12, 0, False, False, True, 0, 6, 0),
    )

    @classmethod
    def from_level(cls, level: int, channels: int, bits_per_sample: int,
                   sample_rate: int, blocksize: int | None = None,
                   **overrides) -> "EncoderConfig":
        ms, loose, lpc, prec, psearch, esc, exh, minpo, maxpo, _dist = cls.PRESETS[level]
        cfg = cls(channels=channels, bits_per_sample=bits_per_sample,
                  sample_rate=sample_rate,
                  blocksize=blocksize if blocksize else 0,
                  do_mid_side=ms, loose_mid_side=loose, max_lpc_order=lpc,
                  qlp_coeff_precision=prec, do_qlp_coeff_prec_search=psearch,
                  do_escape_coding=esc, do_exhaustive_model_search=exh,
                  min_partition_order=minpo, max_partition_order=maxpo)
        cfg = dataclasses.replace(cfg, **overrides)
        return cfg.resolve()

    def resolve(self) -> "EncoderConfig":
        """Init-time defaulting/validation (stream_encoder.c:660-766)."""
        c = self
        if c.channels != 2 and (c.do_mid_side or c.loose_mid_side):
            c = dataclasses.replace(c, do_mid_side=False, loose_mid_side=False)
        if not c.do_mid_side and c.loose_mid_side:
            c = dataclasses.replace(c, loose_mid_side=False)
        if c.bits_per_sample >= 32 and c.do_mid_side:
            c = dataclasses.replace(c, do_mid_side=False, loose_mid_side=False)
        if c.blocksize == 0:
            c = dataclasses.replace(c, blocksize=1152 if c.max_lpc_order == 0 else 4096)
        if not (C.MIN_BLOCK_SIZE <= c.blocksize <= C.MAX_BLOCK_SIZE):
            raise ValueError(f"invalid blocksize {c.blocksize}")
        if c.blocksize < c.max_lpc_order:
            raise ValueError("blocksize too small for LPC order")
        if c.qlp_coeff_precision == 0:
            bs, bps = c.blocksize, c.bits_per_sample
            if bps < 16:
                prec = max(C.MIN_QLP_COEFF_PRECISION, 2 + bps // 2)
            elif bps == 16:
                for lim, p in ((192, 7), (384, 8), (576, 9), (1152, 10),
                               (2304, 11), (4608, 12)):
                    if bs <= lim:
                        prec = p
                        break
                else:
                    prec = 13
            else:
                prec = (C.MAX_QLP_COEFF_PRECISION - 2 if bs <= 384
                        else C.MAX_QLP_COEFF_PRECISION - 1 if bs <= 1152
                        else C.MAX_QLP_COEFF_PRECISION)
            c = dataclasses.replace(c, qlp_coeff_precision=prec)
        if c.streamable_subset:
            if not C.blocksize_is_subset(c.blocksize, c.sample_rate):
                raise ValueError("blocksize not subset-streamable")
            if not C.sample_rate_is_subset(c.sample_rate):
                raise ValueError("sample rate not subset-streamable")
            if c.max_partition_order > C.SUBSET_MAX_RICE_PARTITION_ORDER:
                raise ValueError("partition order not subset-streamable")
            if c.sample_rate <= 48000 and (c.blocksize > C.SUBSET_MAX_BLOCK_SIZE_48000HZ
                                           or c.max_lpc_order > C.SUBSET_MAX_LPC_ORDER_48000HZ):
                raise ValueError("blocksize/LPC order not subset-streamable at <=48kHz")
        maxpo = min(c.max_partition_order, (1 << C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ORDER_LEN) - 1)
        minpo = min(c.min_partition_order, maxpo)
        c = dataclasses.replace(c, max_partition_order=maxpo, min_partition_order=minpo)
        return c

    @property
    def rice_parameter_limit(self) -> int:
        """RICE2 escape space only for >16 bps streams (stream_encoder.c:3196)."""
        return (C.ENTROPY_CODING_METHOD_PARTITIONED_RICE2_ESCAPE_PARAMETER
                if self.bits_per_sample > 16
                else C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ESCAPE_PARAMETER)

    @property
    def loose_mid_side_frames(self) -> int:
        """Frames between full stereo searches in loose mode (stream_encoder.c:871)."""
        q = int(self.sample_rate * 0.4 / self.blocksize + 0.5)
        return max(q, 1)


def _suggested_param(rbps: jnp.ndarray, limit: int) -> jnp.ndarray:
    """estimator bits/sample -> suggested Rice parameter
    (stream_encoder.c:3250-3258): trunc(rbps + 0.5) + 1, clipped to limit-1."""
    p = jnp.where(rbps > 0, jnp.floor(rbps.astype(jnp.float64) + 0.5), 0.0).astype(jnp.int32) + 1
    return jnp.minimum(p, limit - 1)


def _utf8_fields(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched UTF-8-style coding of frame numbers into 7 byte fields
    (bitwriter.c:784). n: [B] int64. Returns values [B,7], nbits [B,7]."""
    thresholds = jnp.asarray([0x80, 0x800, 0x10000, 0x200000, 0x4000000,
                              0x80000000, 1 << 36], jnp.int64)
    length = 1 + jnp.sum(n[:, None] >= thresholds[None, :], axis=1)  # [B] in 1..7
    vals = []
    bits = []
    for s in range(7):
        is_lead = s == 0
        active = s < length
        if is_lead:
            lead_plain = n  # length == 1
            # lead byte for length l in 2..6: prefix (0x100 - 2^(8-l)) | top bits
            lead_multi = jnp.where(
                length == 7, 0xFE,
                (0x100 - (jnp.int64(1) << (8 - jnp.minimum(length, 6))))
                | (n >> (6 * (length - 1))))
            v = jnp.where(length == 1, lead_plain, lead_multi)
        else:
            shift = 6 * (length - 1 - s)
            v = 0x80 | ((n >> jnp.maximum(shift, 0)) & 0x3F)
        vals.append(jnp.where(active, v, 0))
        bits.append(jnp.where(active, 8, 0).astype(jnp.int32))
    return jnp.stack(vals, axis=1), jnp.stack(bits, axis=1)


def _header_static_codes(cfg: EncoderConfig, blocksize: int):
    """Static frame-header code decisions (stream_encoder_framing.c:238-310)."""
    bs_code = C.FRAME_HEADER_BLOCK_SIZE_CODES.get(blocksize)
    if bs_code is not None:
        bs_ext_bits, bs_ext_val = 0, 0
    elif blocksize <= 0x100:
        bs_code, bs_ext_bits, bs_ext_val = 6, 8, blocksize - 1
    else:
        bs_code, bs_ext_bits, bs_ext_val = 7, 16, blocksize - 1
    sr = cfg.sample_rate
    sr_code = C.FRAME_HEADER_SAMPLE_RATE_CODES.get(sr)
    if sr_code is not None:
        sr_ext_bits, sr_ext_val = 0, 0
    elif sr <= 255000 and sr % 1000 == 0:
        sr_code, sr_ext_bits, sr_ext_val = 12, 8, sr // 1000
    elif sr % 10 == 0:
        sr_code, sr_ext_bits, sr_ext_val = 14, 16, sr // 10
    elif sr <= 0xFFFF:
        sr_code, sr_ext_bits, sr_ext_val = 13, 16, sr
    else:
        sr_code, sr_ext_bits, sr_ext_val = 0, 0, 0
    bps_code = C.FRAME_HEADER_BPS_CODES.get(cfg.bits_per_sample, 0)
    return bs_code, bs_ext_bits, bs_ext_val, sr_code, sr_ext_bits, sr_ext_val, bps_code


def max_frame_bytes(cfg: EncoderConfig, blocksize: int) -> int:
    """Static output-buffer bound: generous margin over the verbatim frame."""
    T, Ch = blocksize, cfg.channels
    bps = cfg.bits_per_sample + 1  # side channel
    per_ch = 64 + 33 * (cfg.max_lpc_order * 2 + 8) + T * (bps + 2) + (1 << cfg.max_partition_order) * 5
    bits = 200 + Ch * per_ch + 64
    return (bits // 8 + 256 + 3) & ~3


# ---------------------------------------------------------------------------


def build_frame_encoder(cfg: EncoderConfig, blocksize: int | None = None,
                        packer_impl: str | None = None):
    """Resolve the packer choice (BOTH env knobs consulted at BUILD time, so
    they are part of the lru cache key — flipping them mid-process takes
    effect on the next build instead of being silently ignored).

    FLAC_TPU_PACKER=pallas|merged|xla is the one knob; FLAC_TPU_PACK=merged
    stays as a legacy alias for =merged. 'merged' is a TPU Mosaic kernel
    variant: off-TPU (CPU tests, dry runs) it falls back to the XLA packer
    instead of a failing pallas_call; 'pallas' remains a hard override (the
    interpret-mode tests rely on it)."""
    import os as _os

    if packer_impl is None:
        knob = _os.environ.get("FLAC_TPU_PACKER")
        if knob is None and _os.environ.get("FLAC_TPU_PACK") == "merged":
            knob = "merged"
        if knob == "xla":
            packer_impl = "xla"
        elif knob == "pallas":
            packer_impl = "pallas"
        elif knob == "merged":
            packer_impl = ("pallas-merged" if _pallas_platform_default()
                           else "xla")
    return _build_frame_encoder(cfg, blocksize, packer_impl)[0]


def build_frame_encoder_parts(cfg: EncoderConfig, blocksize: int | None = None,
                              packer_impl: str | None = None):
    """The split form of build_frame_encoder: (fields_fn, pack_fn), unjitted.

    fields_fn(pcm, fnos) -> (values, nbits, info) is the full candidate
    search + field assembly; pack_fn(values, nbits) -> (words, total_bits)
    is the pure per-frame pack (the only stage containing a Pallas kernel).
    The sharded driver jits each inside its own shard_map so varying-axes
    checking stays ON for the stage that carries the collectives."""
    return _build_frame_encoder(cfg, blocksize, packer_impl)[1:]


@functools.lru_cache(maxsize=64)
def _build_frame_encoder(cfg: EncoderConfig, blocksize: int | None = None,
                         packer_impl: str | None = None):
    """Returns (jitted full encoder, unjitted fields stage, unjitted pack
    stage) for a batch of equal-size frames.

    `blocksize` overrides cfg.blocksize for the stream's final partial frame;
    a partial ("fractional") block forces partition order 0
    (process_subframes_, stream_encoder.c:2929-2931).
    """
    T = blocksize or cfg.blocksize
    is_fractional = T != cfg.blocksize
    Ch = cfg.channels
    bps_stream = cfg.bits_per_sample
    use_ms = cfg.do_mid_side and Ch == 2
    K = 4 if use_ms else Ch
    limit = cfg.rice_parameter_limit
    max_fixed = min(C.MAX_FIXED_ORDER, max(T - 1, 0))
    maxord = min(cfg.max_lpc_order, T - 1)
    # the whole fixed/constant/LPC section is gated on blocksize >= 4
    # (process_subframe_, stream_encoder.c:3206)
    do_lpc = maxord > 0 and T >= C.MAX_FIXED_ORDER
    A = len(cfg.apodizations) if do_lpc else 0
    exhaustive = cfg.do_exhaustive_model_search
    n_lpc_orders = maxord if exhaustive else (1 if do_lpc else 0)
    use_wide = bps_stream + (T.bit_length() - 1) + 1 > 30  # stream_encoder.c:888
    # int32 two-limb wide datapath (dsp.lpc.lpc_residual_limbs): replaces the
    # emulated-int64 LPC MAC + [.., T]-sized |res|/fold passes when the limb
    # accumulators provably fit int32 — the whole 24-bit family. Residuals,
    # folds, and abs partition sums all stay int32-wide; only reductions
    # widen (mirroring the decode side's narrow-limb rework). Env
    # FLAC_TPU_WIDE=int64 restores the emulated path for A/B measurement.
    bps_worst = bps_stream + (1 if use_ms else 0)
    _pmax = C.MAX_QLP_COEFF_PRECISION
    wide_limbs = (use_wide and bps_worst <= 25 and maxord >= 1
                  and maxord * (1 << (_pmax + max(bps_worst - 14, 0))) < (1 << 31)
                  and maxord * (1 << (_pmax + 11)) < (1 << 31))
    if wide_limbs:
        import os as _os
        if _os.environ.get("FLAC_TPU_WIDE") == "int64":
            wide_limbs = False
    # [.., T]-sized elementwise math stays int32 whenever EITHER the whole
    # datapath is 32-bit OR the limb path bounds the values
    narrow_t = (not use_wide) or wide_limbs
    # rice partition orders (static range; per-frame predictor-order masking
    # happens inside rice_search)
    if is_fractional:
        max_po = 0
    else:
        max_po = min(C.max_rice_partition_order_from_blocksize(T), cfg.max_partition_order)
    min_po = min(cfg.min_partition_order, max_po)
    nleaf = 1 << max_po
    maxwarm = max(maxord, max_fixed)
    maxbytes = max_frame_bytes(cfg, T)
    maxwords = maxbytes // 4
    (bs_code, bs_ext_bits, bs_ext_val, sr_code, sr_ext_bits, sr_ext_val,
     bps_code) = _header_static_codes(cfg, T)

    window_bank = (jnp.asarray(dsp_windows.make_window_bank(cfg.apodizations, T))
                   if do_lpc else None)
    crc8_table = jnp.asarray(packer.xpow_table_np(1024, crc_mod.CRC8_POLY, 8))
    _wtbl, _winv = packer.crc16_word_tables(maxwords)
    crc16_wtbl = jnp.asarray(_wtbl)
    crc16_winv = jnp.asarray(_winv)
    loose_q = cfg.loose_mid_side_frames

    bps_cand_np = np.full(K, bps_stream, np.int32)
    if use_ms:
        bps_cand_np[3] += 1  # side channel
    bps_cand = jnp.asarray(bps_cand_np)

    def mask_to(v, nbits):
        return v & ((jnp.int64(1) << jnp.minimum(nbits.astype(jnp.int64), 63)) - 1)

    def encode(pcm: jnp.ndarray, frame_numbers: jnp.ndarray):
        """The candidate-search + field-assembly stage.

        pcm: [B, T, Ch] int32; frame_numbers: [B] int64 (global indices,
        batch aligned to loose_mid_side_frames when loose mode is on).

        Returns (values [B, F] int64, nbits [B, F] int32, info dict) —
        the packer input; `pack` below turns it into stream words. The
        total frame bit count equals nbits.sum(axis=1) (padding and the
        CRC-16 field are included), so stream placement needs only this
        stage's outputs."""
        B = pcm.shape[0]
        pcm = pcm.astype(jnp.int32)

        # --- candidate channels -------------------------------------------
        if use_ms:
            left, right = pcm[..., 0], pcm[..., 1]
            mid, side = dsp_signal.mid_side(left, right)
            cand = jnp.stack([left, right, mid, side], axis=1)  # [B, K, T]
        else:
            cand = jnp.moveaxis(pcm, -1, 1)
        w = dsp_signal.wasted_bits(cand)                         # [B, K]
        x = jax.lax.shift_right_arithmetic(cand, w[..., None])
        bps_eff = bps_cand[None, :] - w                          # [B, K]
        pre = (8 + w).astype(jnp.int64)  # zero-pad+type+wasted-flag+unary

        # --- verbatim / constant baselines --------------------------------
        verbatim_bits = pre + jnp.int64(T) * bps_eff
        if cfg.disable_verbatim_subframes and T >= C.MAX_FIXED_ORDER:
            verbatim_bits = jnp.full_like(verbatim_bits, INF_BITS)
        is_const = dsp_signal.is_constant(x)
        const_bits = jnp.where(is_const & (T >= C.MAX_FIXED_ORDER)
                               & (not cfg.disable_constant_subframes),
                               pre + bps_eff, INF_BITS)

        cand_bits = [verbatim_bits, const_bits]  # candidate axis list
        model_res = []      # int32 [B, K, T] residual per model candidate
        model_meta = []     # dicts of per-candidate arrays

        # --- fixed predictors ---------------------------------------------
        if T >= C.MAX_FIXED_ORDER and not (cfg.disable_fixed_subframes and cfg.max_lpc_order > 0):
            errs, guess_fixed = dsp_fixed.fixed_errors(x, use_wide)
            rbps_fixed = dsp_fixed.residual_bits_per_sample(errs, T - C.MAX_FIXED_ORDER)
            res_all = dsp_fixed.fixed_residuals_all_orders(x)    # [B, K, 5, T]
            orders5 = jnp.arange(5, dtype=jnp.int32)
            # narrow_t: order-4 differences of <=25-bit samples stay < 2^29,
            # so the [B,K,5,T] fold/abs planes can skip int64 emulation
            folded = rice.fold_residual(res_all, narrow=narrow_t)
            absres = (jnp.abs(res_all) if narrow_t
                      else jnp.abs(res_all.astype(jnp.int64)))
            tvec = jnp.arange(T)
            validt = tvec[None, None, None, :] >= orders5[None, None, :, None]
            absres = jnp.where(validt, absres, 0)
            folded = jnp.where(validt, folded, 0)
            sugg = _suggested_param(rbps_fixed, limit)
            rs = rice.rice_search(absres, folded, jnp.broadcast_to(orders5, errs.shape).astype(jnp.int32),
                                  sugg, T, min_po, max_po, limit,
                                  do_escape=cfg.do_escape_coding,
                                  compute_exact=False)
            bits = (pre[..., None] + orders5.astype(jnp.int64) * bps_eff[..., None]
                    + rs.approx_bits)
            if exhaustive:
                active = jnp.broadcast_to(orders5[None, None, :] <= max_fixed, bits.shape)
            else:
                active = orders5[None, None, :] == guess_fixed[..., None]
            active = active & (orders5[None, None, :] <= max_fixed)
            active = active & (rbps_fixed < bps_eff[..., None].astype(jnp.float32))
            active = active & ~is_const[..., None]
            bits = jnp.where(active, bits, INF_BITS)
            for o in range(5):
                cand_bits.append(bits[..., o])
                model_res.append(res_all[..., o, :])
                model_meta.append(dict(
                    type=C.SUBFRAME_TYPE_FIXED, order=jnp.full((B, K), o, jnp.int32),
                    po=rs.partition_order[..., o], params=rs.params_leaf[..., o, :],
                    raws=rs.raw_bits_leaf[..., o, :],
                    rice2=rs.is_rice2[..., o],
                    qlp=None, prec=None, shift=None))

        # --- LPC -----------------------------------------------------------
        if do_lpc:
            xw = x.astype(jnp.float32)[:, :, None, :] * window_bank[None, None, :, :]
            autoc = dsp_lpc.autocorrelation(xw, maxord)          # [B,K,A,maxord+1]
            autoc_ok = autoc[..., 0] != 0.0
            coeffs, lerr, lvalid = dsp_lpc.levinson(autoc, maxord)
            prec0 = cfg.qlp_coeff_precision
            overhead = (bps_eff[..., None]
                        + (C.MIN_QLP_COEFF_PRECISION if cfg.do_qlp_coeff_prec_search else prec0)
                        ).astype(jnp.float64)                    # [B,K,1] -> broadcast A
            guess_lpc = dsp_lpc.compute_best_order(
                lerr, lvalid, T, jnp.broadcast_to(overhead, lerr.shape[:-1]))
            if exhaustive:
                order_list = jnp.arange(1, maxord + 1, dtype=jnp.int32)  # [O]
                orders = jnp.broadcast_to(order_list, (B, K, A, maxord))
            else:
                orders = guess_lpc[..., None]                    # [B,K,A,1]
            O = orders.shape[-1]
            # per-candidate prediction error / estimator
            err_o = jnp.take_along_axis(lerr, (orders - 1).astype(jnp.int32), axis=-1)
            valid_o = jnp.take_along_axis(lvalid, (orders - 1), axis=-1)
            rbps_lpc = dsp_lpc.expected_bits_per_residual_sample(
                err_o, (T - orders).astype(jnp.float64))
            sugg = _suggested_param(rbps_lpc, limit)
            ilog2_o = _ilog2(orders)
            # coefficients for each candidate order
            coeff_rows = jnp.take_along_axis(
                coeffs, (orders - 1)[..., None], axis=-2)        # [B,K,A,O,maxord]
            # int32 accumulation is exact iff bps + precision + ilog2(order)
            # <= 32 — the reference's own 32-bit-datapath test
            # (stream_encoder.c:3592). Static worst case: side channel bps,
            # unclamped precision, max order. Under the -p precision search
            # the per-candidate caps (min(32-bps-order, 15) from the search
            # bound at stream_encoder.c:3341-3345 and the bps<=16 clamp at
            # :3583) keep bps_eff + prec + ilog2(order) <= 32 whenever
            # bps_eff <= 17, so narrowness depends only on bps there.
            if cfg.do_qlp_coeff_prec_search:
                narrow_lpc = (not use_wide
                              and bps_stream + (1 if use_ms else 0) <= 17)
            else:
                narrow_lpc = (not use_wide
                              and (bps_stream + (1 if use_ms else 0)
                                   + cfg.qlp_coeff_precision
                                   + (maxord.bit_length() - 1) <= 32))
            base_active = (autoc_ok[..., None] & valid_o & ~is_const[..., None, None]
                           & (rbps_lpc < bps_eff[..., None, None].astype(jnp.float64))
                           & (orders <= T - 1))

            def eval_precision(prec_arr):
                """Quantize + residual + Rice search at one precision field
                (evaluate_lpc_subframe_, stream_encoder.c:3555-3652, incl. the
                bps<=16 32-bit-datapath clamp at :3583)."""
                prec_c = jnp.where(bps_eff[..., None, None] <= 16,
                                   jnp.minimum(prec_arr,
                                               32 - bps_eff[..., None, None] - ilog2_o),
                                   prec_arr)
                qlp_p, shift_p, qok_p = dsp_lpc.quantize_coefficients(
                    coeff_rows, orders, prec_c, maxord)
                if wide_limbs:
                    res_p, ovf_p = dsp_lpc.lpc_residual_limbs(
                        x[:, :, None, None, :], qlp_p, orders, shift_p,
                        maxord)                                      # [B,K,A,O,T]
                    qok_p = qok_p & ~ovf_p
                else:
                    res_p = dsp_lpc.lpc_residual(
                        x[:, :, None, None, :], qlp_p, orders, shift_p, maxord,
                        narrow=narrow_lpc)                           # [B,K,A,O,T]
                folded_p = rice.fold_residual(res_p, narrow=narrow_t)
                absres_p = (jnp.abs(res_p) if narrow_t
                            else jnp.abs(res_p.astype(jnp.int64)))
                validt = jnp.arange(T) >= orders[..., None]
                absres_p = jnp.where(validt, absres_p, 0)
                folded_p = jnp.where(validt, folded_p, 0)
                rs_p = rice.rice_search(absres_p, folded_p, orders, sugg, T,
                                        min_po, max_po, limit,
                                        do_escape=cfg.do_escape_coding,
                                        compute_exact=False)
                bits_p = (pre[..., None, None] + 9
                          + orders.astype(jnp.int64)
                          * (prec_c + bps_eff[..., None, None]).astype(jnp.int64)
                          + rs_p.approx_bits)
                bits_p = jnp.where(base_active & qok_p, bits_p, INF_BITS)
                return bits_p, res_p, rs_p, qlp_p, prec_c, shift_p

            if cfg.do_qlp_coeff_prec_search:
                # Real -p sweep (stream_encoder.c:3336-3385): per (window,
                # order) candidate, evaluate every precision in
                # [MIN_QLP_COEFF_PRECISION, max], where for bps<=17 the upper
                # bound is min(32-bps-order, MAX) raised back to MIN. scan over
                # the precision axis keeps peak memory at one candidate plane;
                # strict-< in the reduction keeps the LOWEST winning precision,
                # matching the reference's first-strict-winner loop order.
                p_lo, p_hi = C.MIN_QLP_COEFF_PRECISION, C.MAX_QLP_COEFF_PRECISION
                maxp = jnp.where(
                    bps_eff[..., None, None] <= 17,
                    jnp.maximum(jnp.minimum(32 - bps_eff[..., None, None] - orders,
                                            p_hi), p_lo),
                    p_hi)                                           # [B,K,A,O]

                def prec_step(carry, p):
                    bits_p, res_p, rs_p, qlp_p, prec_c, shift_p = eval_precision(
                        jnp.full(orders.shape, p, jnp.int32))
                    bits_p = jnp.where(p <= maxp, bits_p, INF_BITS)
                    cand = (bits_p, res_p, rs_p.partition_order, rs_p.params_leaf,
                            rs_p.raw_bits_leaf, rs_p.is_rice2, qlp_p, prec_c,
                            shift_p)
                    better = bits_p < carry[0]
                    out = tuple(
                        jnp.where(better.reshape(
                            better.shape + (1,) * (c.ndim - better.ndim)), n, c)
                        for c, n in zip(carry, cand))
                    return out, None

                sh = orders.shape
                init = (jnp.full(sh, INF_BITS, jnp.int64),
                        jnp.zeros(sh + (T,), jnp.int32),
                        jnp.zeros(sh, jnp.int32),
                        jnp.zeros(sh + (nleaf,), jnp.int32),
                        jnp.zeros(sh + (nleaf,), jnp.int32),
                        jnp.zeros(sh, bool),
                        jnp.zeros(sh + (maxord,), jnp.int32),
                        jnp.zeros(sh, jnp.int32),
                        jnp.zeros(sh, jnp.int32))
                (bits, res, rs_po, rs_params, rs_raws, rs_rice2, qlp, prec,
                 shift), _ = jax.lax.scan(
                    prec_step, init,
                    jnp.arange(p_lo, p_hi + 1, dtype=jnp.int32))
            else:
                bits, res, rs, qlp, prec, shift = eval_precision(
                    jnp.full(orders.shape, prec0, jnp.int32))
                rs_po, rs_params = rs.partition_order, rs.params_leaf
                rs_raws, rs_rice2 = rs.raw_bits_leaf, rs.is_rice2
            for a in range(A):
                for oi in range(O):
                    cand_bits.append(bits[:, :, a, oi])
                    model_res.append(res[:, :, a, oi, :])
                    model_meta.append(dict(
                        type=C.SUBFRAME_TYPE_LPC, order=orders[:, :, a, oi],
                        po=rs_po[:, :, a, oi],
                        params=rs_params[:, :, a, oi, :],
                        raws=rs_raws[:, :, a, oi, :],
                        rice2=rs_rice2[:, :, a, oi],
                        qlp=qlp[:, :, a, oi, :], prec=prec[:, :, a, oi],
                        shift=shift[:, :, a, oi]))

        # --- pick the best subframe per candidate channel ------------------
        # evaluation priority mirrors the reference's loop order so strict-<
        # ties resolve identically (verbatim, constant, fixed asc, lpc asc)
        n_cand = len(cand_bits)
        bits_stack = jnp.stack(cand_bits, axis=-1)               # [B,K,n_cand]
        prio = jnp.arange(n_cand, dtype=jnp.int64)
        combined = bits_stack * 256 + prio
        best_idx = jnp.argmin(combined, axis=-1)                 # [B,K]
        best_bits_approx = jnp.take_along_axis(bits_stack, best_idx[..., None], axis=-1)[..., 0]
        # fall back to verbatim if everything is disabled/INF (stream_encoder.c:3391)
        fallback = best_bits_approx >= INF_BITS
        best_idx = jnp.where(fallback, 0, best_idx)
        best_bits_approx = jnp.where(fallback, pre + jnp.int64(T) * bps_eff, best_bits_approx)

        n_models = len(model_res)
        midx = best_idx - 2  # < 0 for verbatim/constant (no model selected)

        def gather_meta(key, default, dtype, extra_shape=()):
            # where-chain instead of stack+take_along_axis: XLA fuses the M
            # selects into one pass over the M inputs, instead of
            # materializing a [B,K,M,...] stack (for the residuals that
            # stack is B*K*M*T int32 — hundreds of MB per batch) and then
            # gathering from it. Non-model slots (midx < 0) get `default`;
            # every consumer masks those out with is_model/type tests.
            out = jnp.full((B, K) + extra_shape, default, dtype)
            sel_shape = (B, K) + (1,) * len(extra_shape)
            for i, m in enumerate(model_meta):
                v = m[key]
                if v is None:
                    continue
                out = jnp.where((midx == i).reshape(sel_shape),
                                jnp.broadcast_to(jnp.asarray(v, dtype),
                                                 (B, K) + extra_shape), out)
            return out

        is_model = best_idx >= 2
        sel_type = jnp.where(
            best_idx == 0, C.SUBFRAME_TYPE_VERBATIM,
            jnp.where(best_idx == 1, C.SUBFRAME_TYPE_CONSTANT,
                      gather_meta("type", 0, jnp.int32)))
        sel_order = jnp.where(is_model, gather_meta("order", 0, jnp.int32), 0)
        sel_po = jnp.where(is_model, gather_meta("po", 0, jnp.int32), 0)
        sel_params = gather_meta("params", 0, jnp.int32, (nleaf,))
        sel_raws = (gather_meta("raws", 0, jnp.int32, (nleaf,))
                    if cfg.do_escape_coding else None)
        sel_rice2 = is_model & gather_meta("rice2", False, bool)
        sel_qlp = gather_meta("qlp", 0, jnp.int32, (maxord,) if maxord else (1,))
        sel_prec = gather_meta("prec", 0, jnp.int32)
        sel_shift = gather_meta("shift", 0, jnp.int32)
        sel_res = jnp.zeros((B, K, T),
                            model_res[0].dtype if model_res else jnp.int32)
        for i, r in enumerate(model_res):
            sel_res = jnp.where((midx == i)[..., None], r, sel_res)

        # exact residual-coding bits, ONE [B,K,T] pass for the selected
        # candidate (rice_search skips its per-candidate exact pass, which
        # was an int64 [B,K,O,T] reduction per model plane)
        sel_folded = rice.fold_residual(sel_res, narrow=narrow_t)
        sel_exact_res = rice.rice_exact_bits(
            sel_folded, sel_params,
            sel_raws if cfg.do_escape_coding else None,
            sel_order, sel_po, T, max_po)

        # exact subframe bit count for the chosen candidate (layout)
        hdr_extra = jnp.where(sel_type == C.SUBFRAME_TYPE_LPC, 9, 0).astype(jnp.int64)
        body = jnp.where(
            sel_type == C.SUBFRAME_TYPE_VERBATIM, jnp.int64(T) * bps_eff,
            jnp.where(sel_type == C.SUBFRAME_TYPE_CONSTANT, bps_eff.astype(jnp.int64),
                      sel_order.astype(jnp.int64)
                      * (bps_eff + jnp.where(sel_type == C.SUBFRAME_TYPE_LPC, sel_prec, 0)).astype(jnp.int64)
                      + sel_exact_res))
        sel_exact_bits = pre + hdr_extra + body                  # [B,K]

        # --- channel assignment -------------------------------------------
        if use_ms:
            bL, bR, bM, bS = (best_bits_approx[:, i] for i in range(4))
            assign_bits = jnp.stack([bL + bR, bL + bS, bR + bS, bM + bS], axis=1)
            searched = jnp.argmin(assign_bits, axis=1).astype(jnp.int32)
            if cfg.loose_mid_side:
                is_search = (frame_numbers % loose_q) == 0
                anchor = (frame_numbers // loose_q) * loose_q - frame_numbers[0]
                anchor = jnp.clip(anchor, 0, B - 1).astype(jnp.int32)
                anchor_assign = searched[anchor]
                reuse = jnp.where(anchor_assign == C.CHANNEL_ASSIGNMENT_INDEPENDENT,
                                  C.CHANNEL_ASSIGNMENT_INDEPENDENT,
                                  C.CHANNEL_ASSIGNMENT_MID_SIDE)
                ca = jnp.where(is_search, searched, reuse)
            else:
                ca = searched
            src0 = jnp.asarray([0, 0, 3, 2], jnp.int32)[ca]
            src1 = jnp.asarray([1, 3, 1, 3], jnp.int32)[ca]
            ch_srcs = [src0, src1]
        else:
            ca = jnp.zeros(pcm.shape[0], jnp.int32)
            ch_srcs = [jnp.full((B,), c, jnp.int32) for c in range(Ch)]

        # --- assemble fields ----------------------------------------------
        values_blocks = []
        nbits_blocks = []

        # header: one combined 32-bit field, UTF-8 number, extensions, CRC-8
        if use_ms:
            # INDEPENDENT -> channels-1; LS/RS/MS -> 8/9/10 (framing.c:292-310)
            ca_code = jnp.where(ca == 0, Ch - 1, 7 + ca)
        else:
            ca_code = jnp.full((B,), Ch - 1, jnp.int32)
        f0 = ((C.FRAME_HEADER_SYNC << 18) | (bs_code << 12) | (sr_code << 8)
              | (bps_code << 1))
        f0 = jnp.full((B,), f0, jnp.int64) | (ca_code.astype(jnp.int64) << 4)
        values_blocks.append(f0[:, None]); nbits_blocks.append(jnp.full((B, 1), 32, jnp.int32))
        uv, ub = _utf8_fields(frame_numbers.astype(jnp.int64))
        values_blocks.append(uv); nbits_blocks.append(ub)
        values_blocks.append(jnp.full((B, 1), bs_ext_val, jnp.int64))
        nbits_blocks.append(jnp.full((B, 1), bs_ext_bits, jnp.int32))
        values_blocks.append(jnp.full((B, 1), sr_ext_val, jnp.int64))
        nbits_blocks.append(jnp.full((B, 1), sr_ext_bits, jnp.int32))
        crc8_slot = sum(v.shape[1] for v in values_blocks)  # index of the CRC-8 field
        values_blocks.append(jnp.zeros((B, 1), jnp.int64))
        nbits_blocks.append(jnp.full((B, 1), 8, jnp.int32))

        tvec = jnp.arange(T)
        # leaf index = t // (T >> max_po) (T need not be a power of two)
        leaf_of_t = jnp.minimum(tvec // max(T >> max_po, 1), nleaf - 1)

        for c, src in enumerate(ch_srcs):
            g = lambda arr: jnp.take_along_axis(
                arr, src.reshape((B, 1) + (1,) * (arr.ndim - 2)), axis=1)[:, 0]
            c_type = g(sel_type)
            c_order = g(sel_order).astype(jnp.int64)
            c_w = g(w).astype(jnp.int64)
            c_bps = g(bps_eff).astype(jnp.int64)
            c_x = g(x).astype(jnp.int64)                          # [B,T]
            c_po = g(sel_po)
            c_params = g(sel_params)                              # [B,nleaf]
            c_rice2 = g(sel_rice2)
            c_qlp = g(sel_qlp).astype(jnp.int64)
            c_prec = g(sel_prec).astype(jnp.int64)
            c_shift = g(sel_shift).astype(jnp.int64)
            c_res = g(sel_res)                                    # [B,T]
            c_folded = jnp.where(tvec >= c_order[:, None],
                                 rice.fold_residual(c_res), 0)

            is_fixed = c_type == C.SUBFRAME_TYPE_FIXED
            is_lpc = c_type == C.SUBFRAME_TYPE_LPC
            is_verb = c_type == C.SUBFRAME_TYPE_VERBATIM
            is_cst = c_type == C.SUBFRAME_TYPE_CONSTANT
            is_coded = is_fixed | is_lpc

            hdr = jnp.where(is_cst, C.SUBFRAME_TYPE_CONSTANT_BYTE_ALIGNED_MASK,
                  jnp.where(is_verb, C.SUBFRAME_TYPE_VERBATIM_BYTE_ALIGNED_MASK,
                  jnp.where(is_fixed, C.SUBFRAME_TYPE_FIXED_BYTE_ALIGNED_MASK | (c_order << 1),
                            C.SUBFRAME_TYPE_LPC_BYTE_ALIGNED_MASK | ((c_order - 1) << 1))))
            hdr = hdr | (c_w > 0)
            values_blocks.append(hdr[:, None]); nbits_blocks.append(jnp.full((B, 1), 8, jnp.int32))
            # wasted unary: (w-1) zeros + stop bit == w bits, value 1
            values_blocks.append(jnp.where(c_w > 0, 1, 0)[:, None])
            nbits_blocks.append(c_w[:, None].astype(jnp.int32))
            # constant value
            values_blocks.append(mask_to(c_x[:, :1], c_bps[:, None]) * is_cst[:, None])
            nbits_blocks.append((jnp.where(is_cst, c_bps, 0))[:, None].astype(jnp.int32))
            # warmup samples
            if maxwarm:
                jw = jnp.arange(maxwarm)
                warm_active = is_coded[:, None] & (jw[None, :] < c_order[:, None])
                wv = mask_to(c_x[:, :maxwarm], c_bps[:, None])
                values_blocks.append(jnp.where(warm_active, wv, 0))
                nbits_blocks.append(jnp.where(warm_active, c_bps[:, None], 0).astype(jnp.int32))
            # lpc precision/shift/coeffs
            values_blocks.append(jnp.where(is_lpc, c_prec - 1, 0)[:, None])
            nbits_blocks.append(jnp.where(is_lpc, 4, 0)[:, None].astype(jnp.int32))
            values_blocks.append(jnp.where(is_lpc, c_shift, 0)[:, None])
            nbits_blocks.append(jnp.where(is_lpc, 5, 0)[:, None].astype(jnp.int32))
            if maxord:
                jo = jnp.arange(maxord)
                co_active = is_lpc[:, None] & (jo[None, :] < c_order[:, None])
                cv = mask_to(c_qlp[:, :maxord], c_prec[:, None])
                values_blocks.append(jnp.where(co_active, cv, 0))
                nbits_blocks.append(jnp.where(co_active, c_prec[:, None], 0).astype(jnp.int32))
            # entropy coding method header: 2-bit type + 4-bit partition order
            ecm = (c_rice2.astype(jnp.int64) << 4) | c_po.astype(jnp.int64)
            values_blocks.append(jnp.where(is_coded, ecm, 0)[:, None])
            nbits_blocks.append(jnp.where(is_coded, 6, 0)[:, None].astype(jnp.int32))
            # Rice partition-parameter + codeword fields. Partition boundaries
            # can only fall on leaf starts (ps = T>>po is a multiple of
            # leafsz = T>>max_po), so parameter fields get one static slot per
            # LEAF, not per sample: [leaf0 param, leaf0 codewords..., leaf1
            # param, ...] — this halves the packer's field count vs the older
            # per-sample (param, codeword) interleave.
            ps = (jnp.int64(T) >> c_po.astype(jnp.int64))         # [B]
            plen = jnp.where(c_rice2, 5, 4).astype(jnp.int32)
            leafsz = max(T >> max_po, 1)
            leaf_start = jnp.arange(nleaf, dtype=jnp.int64) * leafsz  # [nleaf]
            # partition size T>>po need not be a power of two (e.g. 1152)
            at_boundary = (leaf_start[None, :] % ps[:, None]) == 0   # [B, nleaf]

            def leaf_to_samples(leaf_arr):
                if leafsz * nleaf == T:
                    # uniform leaves: broadcast+reshape instead of a [B,T]
                    # gather (the gather was one of the hottest encode ops)
                    return jnp.broadcast_to(leaf_arr[:, :, None],
                                            (B, nleaf, leafsz)).reshape(B, T).astype(jnp.int64)
                return jnp.take_along_axis(
                    leaf_arr, leaf_of_t[None, :].repeat(B, 0), axis=1).astype(jnp.int64)

            k_t = leaf_to_samples(c_params)
            k_leaf = c_params.astype(jnp.int64)                      # [B, nleaf]
            param_n = jnp.where(is_coded[:, None] & at_boundary, plen[:, None], 0)
            param_v = jnp.where(param_n > 0, k_leaf, 0)
            cw_n_coded = ((c_folded >> k_t) + 1 + k_t)
            cw_v_coded = (jnp.int64(1) << k_t) | (c_folded & ((jnp.int64(1) << k_t) - 1))
            if cfg.do_escape_coding:
                # escaped partitions: the boundary field becomes
                # <escape param><5-bit raw length>, and every codeword is the
                # residual at the raw width (stream_encoder_framing.c:478-537)
                raw_leaf = g(sel_raws).astype(jnp.int64)             # [B, nleaf]
                raw_t = leaf_to_samples(g(sel_raws))
                esc_t = raw_t > 0
                pesc_c = jnp.where(
                    c_rice2, C.ENTROPY_CODING_METHOD_PARTITIONED_RICE2_ESCAPE_PARAMETER,
                    C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ESCAPE_PARAMETER
                ).astype(jnp.int64)[:, None]
                esc_leaf = raw_leaf > 0
                param_n = jnp.where(param_n > 0,
                                    jnp.where(esc_leaf, param_n + 5, param_n), 0)
                param_v = jnp.where(param_n > 0,
                                    jnp.where(esc_leaf, (pesc_c << 5) | raw_leaf, k_leaf), 0)
                cw_n_coded = jnp.where(esc_t, raw_t, cw_n_coded)
                cw_v_coded = jnp.where(esc_t,
                                       mask_to(c_res.astype(jnp.int64), raw_t),
                                       cw_v_coded)
            valid_res = tvec[None, :] >= c_order[:, None]
            cw_n = jnp.where(is_coded[:, None] & valid_res, cw_n_coded,
                             jnp.where(is_verb[:, None], c_bps[:, None], 0))
            cw_v = jnp.where(is_coded[:, None] & valid_res, cw_v_coded,
                             jnp.where(is_verb[:, None], mask_to(c_x, c_bps[:, None]), 0))
            if leafsz * nleaf == T:
                inter_v = jnp.concatenate(
                    [param_v[:, :, None], cw_v.reshape(B, nleaf, leafsz)],
                    axis=2).reshape(B, nleaf * (1 + leafsz))
                inter_n = jnp.concatenate(
                    [param_n[:, :, None].astype(jnp.int32),
                     cw_n.reshape(B, nleaf, leafsz).astype(jnp.int32)],
                    axis=2).reshape(B, nleaf * (1 + leafsz))
            else:  # legal blocksizes always factor as nleaf*leafsz
                # (max_rice_partition_order_from_blocksize strips exactly the
                # blocksize's trailing-zero bits, format.c:528)
                raise AssertionError(
                    f"blocksize {T} does not factor into {nleaf} leaves")
            values_blocks.append(inter_v)
            nbits_blocks.append(inter_n)

        # tail: byte-align pad + CRC-16
        values = jnp.concatenate(values_blocks, axis=1)
        nbits = jnp.concatenate(nbits_blocks, axis=1)
        bits_so_far = jnp.sum(nbits.astype(jnp.int64), axis=1)
        pad_bits = ((8 - (bits_so_far & 7)) & 7).astype(jnp.int32)
        values = jnp.concatenate([values, jnp.zeros((B, 2), jnp.int64)], axis=1)
        nbits = jnp.concatenate(
            [nbits, pad_bits[:, None], jnp.full((B, 1), 16, jnp.int32)], axis=1)
        F = values.shape[1]

        # CRC-8 over the header bytes (fields before the crc8 slot)
        ends = jnp.cumsum(nbits, axis=1)
        hdr_msg_end = ends[:, crc8_slot] - 8
        fidx = jnp.arange(F)
        # only the (statically few) header fields feed the CRC-8 — slice
        # instead of masking the whole field array
        crc8_val = packer.crc_reduce(values[:, :crc8_slot], ends[:, :crc8_slot],
                                     hdr_msg_end,
                                     jnp.ones((1, crc8_slot), bool),
                                     crc8_table, crc_mod.CRC8_POLY, 8)
        values = values.at[:, crc8_slot].set(crc8_val)
        info = dict(assignment=ca, subframe_type=sel_type, order=sel_order,
                    partition_order=sel_po, wasted=w,
                    exact_subframe_bits=sel_exact_bits)
        return values, nbits, info

    def pack(values, nbits):
        """The PURE PER-FRAME pack stage: field words + CRC-16. No
        collectives and no cross-frame dataflow — the sharded driver runs
        this in its own (vma-unchecked) shard_map so the candidate-search
        stage's collectives keep full varying-axes checking
        (parallel/sharding.py)."""
        # CRC-16 over the whole frame: computed from the PACKED WORDS (the
        # reserved 16-bit field stays zero through packing), ~10x cheaper
        # than the per-field GF(2) reduction — see packer.crc16_from_words
        use_pallas = (_use_pallas_packer() if packer_impl is None
                      else packer_impl in ("pallas", "pallas-merged"))
        if use_pallas:
            if packer_impl == "pallas-merged":
                # merged-quad variant: byte-identical, measured within
                # noise of the banded kernel at level 5 (packer.py notes)
                words, total_bits = packer.pack_fields_pallas_merged(
                    values, nbits, maxwords)
            else:
                words, total_bits = packer.pack_fields_pallas(
                    values, nbits, maxwords)
        else:
            words, total_bits = packer.pack_fields(values, nbits, maxwords)
        crc16_val = packer.crc16_from_words(words, total_bits,
                                            crc16_wtbl, crc16_winv)
        words = packer.insert_crc16(words, total_bits, crc16_val)
        return words, total_bits

    def full(pcm, frame_numbers):
        values, nbits, info = encode(pcm, frame_numbers)
        words, total_bits = pack(values, nbits)
        info = dict(info, frame_bits=total_bits)
        return words, total_bits, info

    return jax.jit(full), encode, pack


from flac_tpu.dsp.bitmath import ilog2 as _ilog2  # noqa: E402


def _pallas_platform_default() -> bool:
    """True when the default device is a TPU (where the Mosaic kernels run)."""
    try:
        import jax as _jax
        dd = _jax.config.jax_default_device
        if dd is not None:  # tests pin CPU while the TPU plugin is loaded
            return getattr(dd, "platform", None) == "tpu"
        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_pallas_packer() -> bool:
    """The Pallas banded word-fill kernel is about 5x faster than the XLA
    formulation on TPU; elsewhere (CPU tests, TPU-less dry runs) the XLA
    path is used. Override with FLAC_TPU_PACKER=pallas|xla (resolved into
    packer_impl by build_frame_encoder; this platform probe is the
    packer_impl=None default inside the cached build)."""
    import os

    forced = os.environ.get("FLAC_TPU_PACKER")
    if forced == "pallas":
        return True
    if forced == "xla":
        return False
    return _pallas_platform_default()


@functools.lru_cache(maxsize=64)
def build_frame_encoder_dense(cfg: EncoderConfig):
    """Like build_frame_encoder, but the packed frames are also compacted
    into one dense word stream on device (packer.compact_stream_words), so a
    host consumer transfers only ~the compressed size instead of the padded
    per-frame word matrix. Returns a jitted fn:

        (pcm [B,T,Ch] int — int16 accepted, frame_numbers [B]) ->
        (stream [B*maxwords] uint32 (valid prefix; serialize with
         packer.stream_words_to_bytes), total_bytes [], total_bits [B],
         info dict)
    """
    from flac_tpu.encode import packer as _packer

    encode = build_frame_encoder(cfg)

    def encode_dense(pcm, frame_numbers):
        words, total_bits, info = encode(pcm, frame_numbers)
        stream, total = _packer.compact_stream_words(words, total_bits)
        return stream, total, total_bits, info

    import jax as _jax
    return _jax.jit(encode_dense)
