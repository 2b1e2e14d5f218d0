"""AIFF / AIFF-C reading and writing.

The analog of the reference's AIFF paths (src/flac/encode.c:674
get_sample_info_aiff, decode.c AIFF output): big-endian FORM/AIFF files with
COMM (channels, frames, sample size, 80-bit extended-float rate) and SSND
(offset, blockSize, PCM). AIFF-C compression types 'NONE' (big-endian PCM)
and 'sowt' (little-endian PCM) are accepted. AIFF 8-bit is SIGNED, unlike
WAV. Non-audio chunks are collected for --keep-foreign-metadata.
"""

from __future__ import annotations

import struct

import numpy as np

from flac_tpu.containers.wav import AudioBuffer


def _f80_decode(b: bytes) -> float:
    """IEEE 754 80-bit extended float → Python float (sample rates are small
    integers in practice)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _f80_encode(x: float) -> bytes:
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    mant = int(x)
    frac = x - mant
    # normalize so the top bit of the 64-bit mantissa is set
    while mant >= 1 << 64:
        mant >>= 1
        exp += 1
    while mant < 1 << 63:
        mant = (mant << 1) | (1 if frac >= 0.5 else 0)
        frac = (frac * 2) % 1.0
        exp -= 1
    return struct.pack(">HQ", sign | exp, mant)


def _decode_pcm_be(raw: bytes, bits: int, channels: int, little: bool = False) -> np.ndarray:
    bytes_per = (bits + 7) // 8
    n = len(raw) // (bytes_per * channels)
    raw = raw[: n * bytes_per * channels]
    order = "<" if little else ">"
    if bytes_per == 1:
        data = np.frombuffer(raw, dtype=np.int8).astype(np.int32)
    elif bytes_per == 2:
        data = np.frombuffer(raw, dtype=f"{order}i2").astype(np.int32)
    elif bytes_per == 3:
        u = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        if little:
            v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        else:
            v = (u[:, 0] << 16) | (u[:, 1] << 8) | u[:, 2]
        data = v.astype(np.int32)
        data = np.where(data >= 1 << 23, data - (1 << 24), data)
    elif bytes_per == 4:
        data = np.frombuffer(raw, dtype=f"{order}i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported AIFF sample width {bits}")
    if bits % 8:
        data = data >> (bytes_per * 8 - bits)
    return data.reshape(-1, channels)


def parse_aiff(data: bytes, ignore_chunk_sizes: bool = False,
               lazy: bool = False) -> AudioBuffer:
    if data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFF-C file")
    is_aifc = data[8:12] == b"AIFC"
    pos = 12
    comm = None
    pcm = None
    little = False
    foreign: list[tuple[bytes, bytes]] = []
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from(">I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"COMM":
            channels, nframes, bits = struct.unpack_from(">hIh", body, 0)
            rate = _f80_decode(body[8:18])
            if is_aifc and len(body) >= 22:
                comp = body[18:22]
                if comp == b"sowt":
                    little = True
                elif comp != b"NONE":
                    raise ValueError(f"unsupported AIFF-C compression {comp!r}")
            comm = (channels, nframes, bits, int(round(rate)))
        elif cid == b"SSND":
            if ignore_chunk_sizes:
                # sound data extends to EOF (--ignore-chunk-sizes)
                body = data[pos + 8 :]
            offset, _blocksize = struct.unpack_from(">II", body, 0)
            pcm = body[8 + offset :]
        elif cid == b"FVER" and is_aifc:
            pass  # format version, nothing to do
        else:
            foreign.append((bytes(cid), data[pos : pos + 8 + csize + (csize & 1)]))
        pos += 8 + csize + (csize & 1)
    if comm is None or pcm is None:
        raise ValueError("missing COMM or SSND chunk")
    channels, nframes, bits, rate = comm
    if lazy:
        from flac_tpu.containers.wav import LazyPCM
        samples = LazyPCM(pcm, bits, channels,
                          lambda raw: _decode_pcm_be(raw, bits, channels,
                                                     little=little))
    else:
        samples = _decode_pcm_be(pcm, bits, channels, little=little)
    if not ignore_chunk_sizes:
        samples = samples[:nframes]
    return AudioBuffer(samples=samples, sample_rate=rate, bits_per_sample=bits,
                       foreign_chunks=foreign)


def read_aiff(path: str) -> AudioBuffer:
    with open(path, "rb") as f:
        return parse_aiff(f.read())


def _aiff_pcm_bytes(buf: AudioBuffer) -> bytes:
    bits = buf.bits_per_sample
    bytes_per = (bits + 7) // 8
    flat = np.ascontiguousarray(buf.samples, dtype=np.int32).reshape(-1)
    # bps%8 streams store left-justified (decode.c:1094-1097) unless the
    # buffer is already at the padded width (ReplayGain path)
    shift = bytes_per * 8 - bits if (bits % 8 and not buf.left_justified) else 0
    shifted = flat << shift if shift else flat
    if bytes_per == 1:
        return shifted.astype(np.int8).tobytes()
    if bytes_per == 2:
        return shifted.astype(">i2").tobytes()
    if bytes_per == 3:
        be = shifted.astype(">i4").view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(be[:, 1:]).tobytes()
    if bytes_per == 4:
        return shifted.astype(">i4").tobytes()
    raise ValueError(f"unsupported bits per sample {bits}")


def aiff_header_bytes(nsamples: int, channels: int, bits_per_sample: int,
                      sample_rate: int, foreign=None) -> bytes:
    """Everything before the PCM payload — the streaming half of
    aiff_bytes (sizes derived from nsamples)."""
    bytes_per = (bits_per_sample + 7) // 8
    pcm_len = nsamples * channels * bytes_per
    comm = (struct.pack(">hIh", channels, nsamples, bits_per_sample)
            + _f80_encode(sample_rate))
    aligned = pcm_len + (pcm_len & 1)
    extra = foreign.extra_size() if foreign else 0
    out = bytearray()
    # decode.c:610: iff_size = 46 + foreign + aligned data
    out += b"FORM" + struct.pack(">I", 46 + extra + aligned) + b"AIFF"
    if foreign:
        out += foreign.chunks_before_format()
    out += b"COMM" + struct.pack(">I", len(comm)) + comm
    if foreign:
        out += foreign.chunks_between()
    out += b"SSND" + struct.pack(">I", pcm_len + 8) + struct.pack(">II", 0, 0)
    return bytes(out)


def aiff_trailer_bytes(nsamples: int, channels: int, bits_per_sample: int,
                       foreign=None) -> bytes:
    pcm_len = nsamples * channels * ((bits_per_sample + 7) // 8)
    out = b"\x00" if pcm_len & 1 else b""
    if foreign:
        out += foreign.chunks_after()
    return out


def aiff_bytes(buf: AudioBuffer, foreign=None) -> bytes:
    """Serialize to AIFF exactly as the reference decoder does
    (decode.c:733-782): FORM header [foreign before COMM] COMM [foreign
    between] SSND(offset=0,blockSize=0)+PCM (2-aligned) [foreign after].
    `foreign` is a cli.foreign.ForeignMetadata; the reference always
    restores with SSND offset 0 regardless of the stored offset bytes."""
    return (aiff_header_bytes(buf.nsamples, buf.channels, buf.bits_per_sample,
                              buf.sample_rate, foreign)
            + _aiff_pcm_bytes(buf)
            + aiff_trailer_bytes(buf.nsamples, buf.channels,
                                 buf.bits_per_sample, foreign))


def write_aiff(path: str, buf: AudioBuffer) -> None:
    with open(path, "wb") as f:
        f.write(aiff_bytes(buf))
