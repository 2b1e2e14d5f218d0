"""The STREAMINFO MD5 contract.

The reference (src/libFLAC/md5.c:271-418 FLAC__MD5Accumulate) hashes the
decoded PCM with channels interleaved and each sample packed little-endian
at ``(bps + 7) // 8`` bytes. That byte format — not the container bytes — is
what the STREAMINFO md5sum covers. The hash itself is ordinary MD5 (hashlib);
the value of this module is the exact packing contract plus a streaming
accumulator, vectorized with numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np


def pack_samples(signal: np.ndarray, bps: int) -> bytes:
    """Pack [nsamples, nchannels] int32 PCM into the MD5 byte format.

    Interleaved channels, little-endian, (bps+7)//8 bytes per sample,
    two's complement (md5.c:271 format_input_).
    """
    if signal.ndim == 1:
        signal = signal[:, None]
    bytes_per_sample = (bps + 7) // 8
    flat = np.ascontiguousarray(signal, dtype=np.int32).reshape(-1)
    if bytes_per_sample == 1:
        return flat.astype(np.int8).tobytes()
    if bytes_per_sample == 2:
        return flat.astype("<i2").tobytes()
    if bytes_per_sample == 4:
        return flat.astype("<i4").tobytes()
    if bytes_per_sample == 3:
        le = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(le[:, :3]).tobytes()
    raise ValueError(f"unsupported bytes per sample: {bytes_per_sample}")


class MD5Context:
    """Streaming MD5 over the packed-sample format (FLAC__MD5Init/Accumulate/Final)."""

    def __init__(self) -> None:
        self._md5 = hashlib.md5()

    def accumulate(self, signal: np.ndarray, bps: int) -> None:
        self._md5.update(pack_samples(signal, bps))

    def digest(self) -> bytes:
        return self._md5.digest()


def md5_of_pcm(signal: np.ndarray, bps: int) -> bytes:
    ctx = MD5Context()
    ctx.accumulate(signal, bps)
    return ctx.digest()
