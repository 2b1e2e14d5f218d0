"""Stage-isolation profile of the batched device encoder (run on TPU).

Times, per batch of B frames at the given level's geometry:
  1. full encode_dense (the bench kernel number's unit of work)
  2. encode without stream compaction           -> compaction share
  3. encode with the word fill stubbed to zeros -> field assembly + pack
     share (XLA dead-code-eliminates the whole field-array build when the
     packer ignores its inputs; the cumsum layout + CRC-16 + compaction on
     zero words remain)
  4. model search only: same stub, plus info-only outputs (words unused)

Usage:  python tools/profile_encode.py [level] [B]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp

    from bench import T, make_corpus
    from flac_tpu.encode import packer
    from flac_tpu.encode.frame_encoder import (EncoderConfig,
                                               build_frame_encoder,
                                               build_frame_encoder_dense)
    from flac_tpu.jaxcache import enable as enable_cache

    enable_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}")
    B = int(sys.argv[2]) if len(sys.argv) > 2 else (512 if dev.platform == "tpu" else 32)

    cfg = EncoderConfig.from_level(level, channels=2, bits_per_sample=16,
                                   sample_rate=44100, blocksize=T)
    pcm = make_corpus(B * T, seed=7).reshape(B, T, 2).astype(np.int16)
    fno = np.arange(B, dtype=np.int64)
    jpcm = jax.device_put(pcm, dev)
    jfno = jax.device_put(fno, dev)
    jax.block_until_ready([jpcm, jfno])
    nsamples = B * T * 2

    def timeit(name, fn):
        out = fn(jpcm, jfno)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(jpcm, jfno)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {best * 1e3:8.2f} ms   "
              f"{nsamples / best / 1e6:8.1f} Msamples/s")
        return best

    t_full = timeit("full encode_dense", build_frame_encoder_dense(cfg))
    t_words = timeit("encode (no compaction)", build_frame_encoder(cfg))

    def stub_pack(values, nbits, maxwords, interpret=False):
        ends = jnp.cumsum(nbits, axis=-1)
        total_bits = ends[..., -1]
        B_ = nbits.shape[0]
        return jnp.zeros((B_, maxwords), jnp.int32), total_bits

    real_pallas, real_xla = packer.pack_fields_pallas, packer.pack_fields
    packer.pack_fields_pallas = stub_pack
    packer.pack_fields = stub_pack
    try:
        enc_stub = build_frame_encoder(cfg, packer_impl="stub")
        t_nopack = timeit("encode (pack+assembly stubbed)", enc_stub)
    finally:
        packer.pack_fields_pallas, packer.pack_fields = real_pallas, real_xla

    from flac_tpu import rice as rice_mod

    real_rice = rice_mod.rice_search

    def stub_rice(absres, folded, order, suggested, blocksize, min_po, max_po,
                  rice_limit, do_escape=False, compute_exact=True):
        batch = folded.shape[:-1]
        nleaf = 1 << max_po
        z32 = jnp.zeros(batch, jnp.int32)
        return rice_mod.RiceSearchResult(
            approx_bits=jnp.zeros(batch, jnp.int64),
            exact_bits=jnp.zeros(batch, jnp.int64),
            partition_order=z32, params_leaf=jnp.zeros(batch + (nleaf,), jnp.int32),
            is_rice2=jnp.zeros(batch, bool),
            raw_bits_leaf=jnp.zeros(batch + (nleaf,), jnp.int32))

    packer.pack_fields_pallas = stub_pack
    packer.pack_fields = stub_pack
    rice_mod.rice_search = stub_rice
    try:
        enc_stub2 = build_frame_encoder(cfg, packer_impl="stub-rice")
        t_norice = timeit("encode (pack+rice stubbed)", enc_stub2)
    finally:
        packer.pack_fields_pallas, packer.pack_fields = real_pallas, real_xla
        rice_mod.rice_search = real_rice

    print(f"\ncompaction share      {1e3 * (t_full - t_words):8.2f} ms")
    print(f"assembly+pack share   {1e3 * (t_words - t_nopack):8.2f} ms")
    print(f"rice-search share     {1e3 * (t_nopack - t_norice):8.2f} ms")
    print(f"dsp+selection share   {1e3 * t_norice:8.2f} ms")


if __name__ == "__main__":
    main()
