"""Partitioned-Rice parameter search, batched.

Re-expresses the reference's partition machinery as tensor reductions:

* precompute_partition_info_sums_ (stream_encoder.c:3774-3841): leaf sums at
  max partition order via reshape-sum, then pairwise merges upward — a
  segmented-reduction tree,
* per-partition parameter estimate k = smallest r with n*2^r >= sum
  (stream_encoder.c:4046-4048),
* the partition bit-count estimator count_rice_bits_in_partition_
  (stream_encoder.c:3940-3966): 4 + (1+k)*n + (k ? sum>>(k-1) : sum<<1) - n/2,
* find_best_partition_order_ (stream_encoder.c:3666-3763): descending order
  sweep keeping strictly-better totals (ties keep the higher order),
* plus an *exact* bit count for the chosen parameters — the packer needs
  exact codeword lengths for its prefix-sum layout, while candidate selection
  uses the reference's estimator to replicate its choices.

Escape codes are searched only when do_escape_coding is on (off in every
preset, stream_encoder.c:120-141); decode-side escape support lives in the
decoder.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from flac_tpu import constants as C


class RiceSearchResult(NamedTuple):
    approx_bits: jnp.ndarray   # [...] int64 — reference's estimator result (selection)
    exact_bits: jnp.ndarray    # [...] int64 — true emitted residual-coding bits (layout)
    partition_order: jnp.ndarray  # [...] int32
    params_leaf: jnp.ndarray   # [..., 2^max_po] int32, chosen params at leaf granularity
    is_rice2: jnp.ndarray      # [...] bool
    raw_bits_leaf: jnp.ndarray  # [..., 2^max_po] int32; >0 where the partition is escaped


from flac_tpu.dsp.bitmath import bitlen64 as _bitlen  # exact, TPU-legal


def fold_residual(res: jnp.ndarray, narrow: bool = False) -> jnp.ndarray:
    """Sign-fold to unsigned: (v<<1)^(v>>31) (bitwriter.c:561).

    narrow=True keeps the math in int32 (values wrap exactly like the
    reference's FLAC__uint32 fold) — valid whenever the residual datapath is
    32-bit (the encoder's !use_wide case); TPU emulates int64 as int32 pairs,
    so the narrow form halves the traffic of this [..., T]-sized op.
    """
    if narrow:
        r = res.astype(jnp.int32)
        return (r << 1) ^ (r >> 31)
    r = res.astype(jnp.int64)
    return jnp.where(r >= 0, r << 1, (-r << 1) - 1)


def rice_search(absres: jnp.ndarray, folded: jnp.ndarray, order: jnp.ndarray,
                suggested: jnp.ndarray, blocksize: int, min_po: int, max_po: int,
                rice_limit: int, do_escape: bool = False,
                compute_exact: bool = True) -> RiceSearchResult:
    """Search partition orders [min_po, max_po] for the best Rice coding.

    absres: [..., T] int64 |residual| (zeros at t < order) — the reference's
    partition sums are over abs values (stream_encoder.c:3815), NOT the
    sign-folded codeword values; parameter estimation and the bit estimator
    both consume these sums.
    folded: [..., T] int64 sign-folded residuals (bitwriter.c:561), zeros at
    t < order — used for the exact emitted-bits count.
    order: [...] predictor order. suggested: [...] the caller's estimator-based
    parameter (used for partition order 0, stream_encoder.c:3997-4032).
    Static: blocksize (== T), min_po/max_po (already limited by the blocksize
    factorization, format.c:538), rice_limit (15, or 31 when stream bps > 16).
    do_escape: search escaped (raw-bits) partitions too
    (precompute_partition_info_escapes_, stream_encoder.c:3844; escape
    selection in set_partitioned_rice_, :4012-4021). Off in every preset.
    """
    T = blocksize
    batch = folded.shape[:-1]
    nleaf = 1 << max_po
    ps_leaf = T >> max_po
    # absres/folded may arrive as int32 (the encoder's !use_wide datapath) —
    # keep the [..., T]-sized math in the input dtype and widen only the
    # reductions (int64 ops are emulated as int32 pairs on TPU). Narrow
    # folded values are uint32 BIT PATTERNS (the reference's FLAC__uint32
    # fold, bitwriter.c:561): shift/compare them as unsigned.
    narrow = folded.dtype == jnp.int32
    fu = folded.astype(jnp.uint32) if narrow else folded
    leaf_sums = absres.reshape(batch + (nleaf, ps_leaf)).sum(
        axis=-1, dtype=jnp.int64)

    sums_by_po: dict[int, jnp.ndarray] = {max_po: leaf_sums}
    for po in range(max_po - 1, -1, -1):
        prev = sums_by_po[po + 1]
        sums_by_po[po] = prev[..., 0::2] + prev[..., 1::2]

    if do_escape:
        # per-partition range mask rmax = OR(r >= 0 ? r : ~r) == OR(folded >> 1)
        # (stream_encoder.c:3867-3880); raw width = ilog2(rmax)+2, min 1.
        # max-reduce instead of OR: bitlen(max) == bitlen(OR) for non-negative
        # values, and only the bit length feeds the raw width.
        leaf_rmax = (fu >> 1).reshape(batch + (nleaf, ps_leaf)).max(axis=-1)
        rmax_by_po: dict[int, jnp.ndarray] = {max_po: leaf_rmax}
        for po in range(max_po - 1, -1, -1):
            prev = rmax_by_po[po + 1]
            rmax_by_po[po] = jnp.maximum(prev[..., 0::2], prev[..., 1::2])

    # Running-min selection across partition orders (descending, so strict-<
    # keeps the higher order on ties, matching find_best_partition_order_'s
    # `<` sweep, stream_encoder.c:3726). An earlier stack-over-po + argmin +
    # take_along_axis formulation materialized [..., n_po, nleaf] tensors
    # whose dynamic-update-slice/copy chains cost ~10 ms/batch on TPU in
    # small-trailing-dim layouts; the where-chain fuses instead.
    #
    # Layout: the per-partition tensors are tiny in their trailing dim
    # (nparts <= 2^max_po, typically 32) but huge in the flattened batch
    # (B*K*O ~ 10k); XLA:TPU has been observed assigning the 128-lane axis
    # to a 4-wide batch dim for them (32x lane padding). The loop therefore
    # runs PARTITION-MAJOR, [nparts, N]: the flattened batch occupies the
    # lane axis at full width, and nparts sits in sublanes.
    N = 1
    for d in batch:
        N *= d
    order_f = order.reshape(N)
    sugg_f = suggested.reshape(N)

    def pm(a):  # [..., nparts] -> [nparts, N] (partition-major)
        return jnp.moveaxis(a.reshape((N,) + a.shape[len(batch):]), 0, -1)

    best_total = None
    best_po = None
    params_leaf = None
    raw_leaf = None
    po_list = list(range(max_po, min_po - 1, -1))  # descending: ties keep higher po
    for po in po_list:
        nparts = 1 << po
        ps = T >> po
        sums = pm(sums_by_po[po])                        # [nparts, N]
        n_p = jnp.full((nparts, N), ps, jnp.int64)
        n_p = n_p.at[0].add(-order_f.astype(jnp.int64))
        if po == 0:
            k = sugg_f[None, :].astype(jnp.int32)
        else:
            # smallest k with n*2^k >= sum  <=>  bitlen(ceil(sum/n) - 1)
            q = (sums + n_p - 1) // jnp.maximum(n_p, 1)
            k = jnp.where(q <= 1, 0, _bitlen(q - 1))
            k = jnp.minimum(k, rice_limit - 1)
        k64 = k.astype(jnp.int64)
        part_bits = (C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_PARAMETER_LEN
                     + (1 + k64) * n_p
                     + jnp.where(k64 > 0, sums >> jnp.maximum(k64 - 1, 0), sums << 1)
                     - (n_p >> 1))
        if do_escape:
            # escape estimate: 5-bit RICE2 param + 5-bit raw length + raw
            # payload (stream_encoder.c:4012-4021); escape wins ties (<=)
            rmax = pm(rmax_by_po[po])
            rawb = jnp.where(rmax > 0, _bitlen(rmax) + 1, 1).astype(jnp.int64)
            esc_bits = (C.ENTROPY_CODING_METHOD_PARTITIONED_RICE2_PARAMETER_LEN
                        + C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_RAW_LEN
                        + rawb * n_p)
            use_esc = (esc_bits <= part_bits) & (rawb <= 31)  # must fit 5 bits
            part_bits = jnp.where(use_esc, esc_bits, part_bits)
            k = jnp.where(use_esc, 0, k)  # stored parameter is 0 when escaped
            raw_p = jnp.where(use_esc, rawb, 0).astype(jnp.int32)
            raw_po = jnp.repeat(raw_p, nleaf // nparts, axis=0)
        total = (C.ENTROPY_CODING_METHOD_TYPE_LEN
                 + C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ORDER_LEN
                 + part_bits.sum(axis=0))                # [N]
        # partition order invalid when a full partition is <= predictor order
        # (format.c:548; set_partitioned_rice_ returns false, :4010)
        invalid = (ps <= order_f) if po > 0 else (order_f >= T)
        total = jnp.where(invalid, jnp.int64(2**62), total)
        k_po = jnp.repeat(k, nleaf // nparts, axis=0)    # [nleaf, N]
        if best_total is None:
            best_total, params_leaf = total, k_po
            best_po = jnp.full(total.shape, po, jnp.int32)
            if do_escape:
                raw_leaf = raw_po
        else:
            better = total < best_total
            best_total = jnp.where(better, total, best_total)
            best_po = jnp.where(better, po, best_po)
            params_leaf = jnp.where(better[None, :], k_po, params_leaf)
            if do_escape:
                raw_leaf = jnp.where(better[None, :], raw_po, raw_leaf)

    # back to batch-major [..., nleaf] / [...]
    best_total = best_total.reshape(batch)
    best_po = best_po.reshape(batch)
    params_leaf = jnp.moveaxis(params_leaf, 0, -1).reshape(batch + (nleaf,))
    if raw_leaf is not None:
        raw_leaf = jnp.moveaxis(raw_leaf, 0, -1).reshape(batch + (nleaf,))

    approx_bits = best_total
    if raw_leaf is None:
        raw_leaf = jnp.zeros_like(params_leaf)

    is_rice2 = jnp.any(params_leaf >= C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ESCAPE_PARAMETER,
                       axis=-1)
    if compute_exact:
        exact = rice_exact_bits(folded, params_leaf,
                                raw_leaf if do_escape else None, order,
                                best_po, blocksize, max_po)
    else:
        # the frame encoder computes exact bits post-selection (one [..., T]
        # pass for the chosen candidate instead of one per candidate)
        exact = jnp.zeros_like(approx_bits)
    return RiceSearchResult(approx_bits=approx_bits, exact_bits=exact,
                            partition_order=best_po, params_leaf=params_leaf,
                            is_rice2=is_rice2, raw_bits_leaf=raw_leaf)


def rice_exact_bits(folded: jnp.ndarray, params_leaf: jnp.ndarray,
                    raw_leaf: jnp.ndarray | None, order: jnp.ndarray,
                    partition_order: jnp.ndarray, blocksize: int,
                    max_po: int) -> jnp.ndarray:
    """Exact emitted residual-coding bits for given partitioned-Rice
    parameters: sum over valid samples of (u >> k) + 1 + k (or the raw
    width in escaped partitions), plus the per-partition parameter fields
    (+5-bit raw length per escaped one). The packer needs this exact count
    for its prefix-sum layout.

    folded: [..., T] sign-folded residuals (int32 bit patterns or int64);
    params_leaf/raw_leaf: [..., 2^max_po] at leaf granularity; order /
    partition_order: [...]. Returns [...] int64.
    """
    T = blocksize
    nleaf = 1 << max_po
    ps_leaf = T >> max_po
    narrow = folded.dtype == jnp.int32
    fu = folded.astype(jnp.uint32) if narrow else folded
    t = jnp.arange(T)
    k_samp = jnp.repeat(params_leaf, ps_leaf, axis=-1).astype(fu.dtype)  # [..., T]
    valid = t >= order[..., None]
    cw_bits = jnp.where(valid, (fu >> k_samp) + 1 + k_samp, 0)
    if raw_leaf is not None:
        raw_samp = jnp.repeat(raw_leaf, ps_leaf, axis=-1).astype(fu.dtype)
        cw_bits = jnp.where(valid & (raw_samp > 0), raw_samp, cw_bits)
    is_rice2 = jnp.any(params_leaf >= C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ESCAPE_PARAMETER,
                       axis=-1)
    plen = jnp.where(is_rice2,
                     C.ENTROPY_CODING_METHOD_PARTITIONED_RICE2_PARAMETER_LEN,
                     C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_PARAMETER_LEN).astype(jnp.int64)
    nparts_chosen = (jnp.int64(1) << partition_order.astype(jnp.int64))
    exact = (C.ENTROPY_CODING_METHOD_TYPE_LEN
             + C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_ORDER_LEN
             + plen * nparts_chosen + cw_bits.sum(axis=-1, dtype=jnp.int64))
    if raw_leaf is not None:
        # 5-bit raw-length field per escaped partition; escaped leaves all
        # carry the same raw width, so count partitions via leaves >> (Δpo)
        n_esc_leaves = jnp.sum((raw_leaf > 0).astype(jnp.int64), axis=-1)
        n_esc = n_esc_leaves >> (max_po - partition_order).astype(jnp.int64)
        exact = exact + C.ENTROPY_CODING_METHOD_PARTITIONED_RICE_RAW_LEN * n_esc
    return exact
