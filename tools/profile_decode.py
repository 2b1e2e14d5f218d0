"""Stage-isolation profile of the batched device decoder (run on TPU).

Times, per batch of B frames at level -5 geometry:
  1. full frame decode (the bench kernel number's unit of work)
  2. residual/verbatim window scan only (restore + channel undo skipped)
  3. restore scan only (residual scan fed with precomputed residuals)
  4. refill gathers only (a scan doing just the 3-word refill per step)

Usage:  python tools/profile_decode.py [level]
Writes one line per stage; run after bench.py so compiles are warm-ish.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from bench import T, _assemble_stream, bench_encode, make_corpus
    from flac_tpu.decode.frame_decoder import (DecoderGeometry,
                                               build_frame_decoder,
                                               bytes_to_words)
    from flac_tpu.decode.stream import index_frames
    from flac_tpu.jaxcache import enable as enable_cache
    from flac_tpu.metadata import parse_metadata

    enable_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind if hasattr(dev, 'device_kind') else ''})")
    B = 512 if dev.platform == "tpu" else 32
    n = 2

    _, frames = bench_encode(level, B, n, reps=1)
    stream = _assemble_stream(frames, B * n, B * n * T)
    d = np.frombuffer(stream, np.uint8)
    blocks, audio_offset = parse_metadata(stream)
    offsets = index_frames(d, audio_offset, blocks[0])
    geom = DecoderGeometry(blocksize=T, channels=2, bits_per_sample=16,
                           sample_rate=44100,
                           max_lpc_order=8 if level == 5 else 12)
    jwords = jnp.asarray(bytes_to_words(d, bucket=True))
    starts = jnp.asarray(offsets[:B] * 8)
    jax.block_until_ready([jwords, starts])
    nsamples = B * T * 2

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best * 1e3:8.2f} ms   "
              f"{nsamples / best / 1e6:8.1f} Msamples/s")
        return best

    # 1. full decode, wide vs narrow residual scan
    import dataclasses

    dec = build_frame_decoder(dataclasses.replace(geom, scan_impl="wide"))
    pcm_w, _, _ = dec(jwords, starts)
    timeit("full decode (wide scan)", dec, jwords, starts)
    dec_n = build_frame_decoder(dataclasses.replace(geom, scan_impl="narrow"))
    pcm_n, _, meta_n = dec_n(jwords, starts)
    assert np.array_equal(np.asarray(pcm_w), np.asarray(pcm_n)), \
        "narrow scan output != wide scan output"
    assert not np.asarray(meta_n["unary_overflow"]).any()
    timeit("full decode (narrow scan)", dec_n, jwords, starts)

    # 2/3/4: rebuild the decoder's internals piecewise (mirrors
    # frame_decoder.py's scan structures on the same data)
    from flac_tpu.decode import frame_decoder as fd

    pos0 = starts.astype(jnp.int64)

    @jax.jit
    def gathers_only(words, start_bits):
        """The per-step refill gather traffic in isolation: NLOAD word
        gathers per scan step, same step count as one subframe scan."""
        pos = start_bits.astype(jnp.int64)
        nwords = jnp.int64(words.shape[0])
        U, NLOAD = 4, 3
        steps = -(-T // U)
        wpos0 = pos >> 5

        def step(state, _):
            wpos, acc = state
            for j in range(NLOAD):
                w = words[jnp.minimum(wpos + j, nwords - 1)].astype(jnp.int64)
                acc = acc ^ w
            return (wpos + NLOAD, acc), None

        (wp, acc), _ = jax.lax.scan(step, (wpos0, pos * 0), None, length=steps)
        return acc

    timeit("refill gathers only (1ch)", gathers_only, jwords, pos0)

    # restore-scan cost: decode once to get residual-equivalent inputs, then
    # time a standalone restore with the same shapes/ops (order-8 LPC)
    maxord = geom.max_lpc_order
    res = jnp.zeros((B, T), jnp.int64) + jnp.arange(T, dtype=jnp.int64)[None, :] % 7 - 3
    coeffs = jnp.tile(jnp.arange(1, maxord + 1, dtype=jnp.int64)[None, :], (B, 1))
    order = jnp.full((B,), maxord, jnp.int64)
    shift = jnp.full((B,), 10, jnp.int64)
    warm = jnp.zeros((B, maxord), jnp.int64)
    is_coded = jnp.ones((B,), bool)

    @jax.jit
    def restore_only(res, coeffs, order, shift, warm, is_coded):
        RU = 4
        Tpad = -(-T // RU) * RU
        hist0 = jnp.zeros((B, maxord), jnp.int64)
        jgrid = jnp.arange(maxord)
        cm = jnp.where(jgrid[None, :] < order[:, None], coeffs, 0)
        w_full = jnp.concatenate(
            [warm, jnp.zeros((B, max(T - maxord, 0)), jnp.int64)], axis=1)[:, :T]
        pad = ((0, 0), (0, Tpad - T))
        res_p = jnp.pad(res, pad).T.reshape(-1, RU, B)
        w_p = jnp.pad(w_full, pad).T.reshape(-1, RU, B)
        ts_p = jnp.arange(Tpad, dtype=jnp.int64).reshape(-1, RU)

        def step(hist, inp):
            r_ts, w_ts, ts = inp
            xs = []
            for j in range(RU):
                pred = jnp.sum(cm * hist, axis=1)
                pred = jax.lax.shift_right_arithmetic(pred, shift)
                x_t = jnp.where(is_coded,
                                jnp.where(ts[j] < order, w_ts[j], r_ts[j] + pred), 0)
                hist = jnp.concatenate([x_t[:, None], hist[:, :-1]], axis=1)
                xs.append(x_t)
            return hist, jnp.stack(xs)

        _, xs = jax.lax.scan(step, hist0, (res_p, w_p, ts_p))
        return xs.reshape(Tpad, B).T[:, :T]

    timeit("restore scan only (1ch)", restore_only, res, coeffs, order,
           shift, warm, is_coded)

    # residual window scan: full decode minus the restore = approximated by
    # a decoder built with max_lpc_order=1 on the same stream is NOT valid
    # (geometry mismatch); instead reuse the real decoder but report the
    # difference: full - 2*(restore_only) - header ~ window-scan share.
    print("(window-scan share ~= full - 2ch x restore - 2ch x gathers)")


if __name__ == "__main__":
    main()
