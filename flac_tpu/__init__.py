"""flac_tpu — a TPU-native FLAC encode/decode engine built on JAX/XLA/Pallas.

A from-scratch reimplementation of the capability surface of the reference FLAC
project (libFLAC 1.2.1 + `flac` + `metaflac`; see /root/reference and SURVEY.md),
re-architected for TPU:

* frame-level DSP (windowing, autocorrelation, Levinson-Durbin, fixed/LPC
  residuals, stereo decorrelation search, Rice parameter search) runs as
  batched XLA/Pallas computations over many frames at once,
* the bitstream is assembled by a parallel prefix-sum "field packer" instead of
  a sequential bitwriter, and disassembled by a sync-scan + batched bit-gather
  decoder instead of a sequential bitreader,
* CRC-8/CRC-16 are computed as GF(2) reductions over packed words,
* large inputs shard frames across a `jax.sharding.Mesh` (ICI collectives for
  stream statistics, host-side ordered I/O for the byte stream and MD5).

Numerical contract: encode/decode are bit-exact lossless (decoded PCM and the
STREAMINFO MD5 match the reference `flac` binary's behavior at every
compression level).
"""

import jax

# The codec needs exact 64-bit integer arithmetic in several places (partition
# sums, sample counts, >32-bit accumulators in LPC paths — see e.g. reference
# src/libFLAC/lpc.c:531 FLAC__lpc_compute_residual_from_qlp_coefficients_wide).
# Hot paths still use explicit int32; x64 only widens where requested.
jax.config.update("jax_enable_x64", True)

from flac_tpu.version import __version__  # noqa: E402

__all__ = ["__version__"]
