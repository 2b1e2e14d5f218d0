"""Wide-datapath (24-bit/96k -8) encode profile — xplane device time.

The 24-bit family is the encoder's wide datapath (use_wide,
stream_encoder.c:888). This probe traces ITERS steady-state batches of the
dense encoder so tools/parse_xplane.py can attribute device time; run it
twice to A/B the int32 two-limb MAC (default) against the emulated-int64
path:

    python tools/profile_wide.py [B] [logdir]
    FLAC_TPU_WIDE=int64 python tools/profile_wide.py [B] [logdir2]

Msamples/s = B*T*2*ITERS / total device time (host wall time is
untrustworthy through the dev tunnel — see docs/perf.md).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 6


def main() -> None:
    import jax

    from bench import T
    from flac_tpu.encode.frame_encoder import (EncoderConfig,
                                               build_frame_encoder_dense)
    from flac_tpu.jaxcache import enable as enable_cache

    enable_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}", flush=True)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else (256 if dev.platform == "tpu" else 8)
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wide_trace"

    rng = np.random.default_rng(7)
    t = np.arange(B * T, dtype=np.float64)
    base = (3.0e6 * np.sin(2 * np.pi * 220.0 * t / 96000.0)
            + 6.0e5 * np.sin(2 * np.pi * 1760.0 * t / 96000.0))
    am = 0.6 + 0.4 * np.sin(2 * np.pi * 0.37 * t / 96000.0)
    left = base * am + rng.normal(0, 4e4, B * T)
    right = 0.9 * base * am + rng.normal(0, 4e4, B * T)
    pcm = np.clip(np.stack([left, right], axis=-1),
                  -(1 << 23), (1 << 23) - 1).astype(np.int32).reshape(B, T, 2)

    cfg = EncoderConfig.from_level(8, channels=2, bits_per_sample=24,
                                   sample_rate=96000, blocksize=T)
    enc = build_frame_encoder_dense(cfg)
    jp = jax.device_put(pcm, dev)
    jf = jax.device_put(np.arange(B, dtype=np.int64), dev)
    jax.block_until_ready([jp, jf])

    out = enc(jp, jf)  # compile + warm
    jax.block_until_ready(out[1])
    total = int(out[1])
    print(f"compiled; {total} stream bytes "
          f"(ratio {total / (B * T * 2 * 3):.4f})", flush=True)

    with jax.profiler.trace(logdir):
        for _ in range(ITERS):
            out = enc(jp, jf)
        jax.block_until_ready(out[1])
    print(f"traced {ITERS} iters of B={B} 24-bit/96k -8 to {logdir}; "
          f"wide path: {os.environ.get('FLAC_TPU_WIDE', 'limbs(default)')}; "
          f"samples/iter={B * T * 2}", flush=True)


if __name__ == "__main__":
    main()
