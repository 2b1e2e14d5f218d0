"""Headerless raw PCM reading/writing — the analog of the reference's
--force-raw-format path (src/flac/encode.c:181 get_sample_info_raw,
decode.c raw output) with the --endian/--sign/--channels/--bps/--sample-rate
option semantics."""

from __future__ import annotations

import numpy as np

from flac_tpu.containers.wav import AudioBuffer


def parse_raw(data: bytes, channels: int, bits_per_sample: int, sample_rate: int,
              is_big_endian: bool = False, is_unsigned: bool = False,
              skip_bytes: int = 0, lazy: bool = False) -> AudioBuffer:
    if lazy:
        from flac_tpu.containers.wav import LazyPCM
        view = memoryview(data)[skip_bytes:]
        samples = LazyPCM(
            view, bits_per_sample, channels,
            lambda raw: parse_raw(raw, channels, bits_per_sample, sample_rate,
                                  is_big_endian, is_unsigned).samples)
        return AudioBuffer(samples=samples, sample_rate=sample_rate,
                           bits_per_sample=bits_per_sample)
    bytes_per = (bits_per_sample + 7) // 8
    data = data[skip_bytes:]
    n = len(data) // (bytes_per * channels)
    data = data[: n * bytes_per * channels]
    order = ">" if is_big_endian else "<"
    if bytes_per == 1:
        v = np.frombuffer(data, np.uint8).astype(np.int32)
    elif bytes_per == 2:
        v = np.frombuffer(data, f"{order}u2").astype(np.int32)
    elif bytes_per == 3:
        u = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.uint32)
        if is_big_endian:
            v = ((u[:, 0] << 16) | (u[:, 1] << 8) | u[:, 2]).astype(np.int32)
        else:
            v = (u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)).astype(np.int32)
    elif bytes_per == 4:
        v = np.frombuffer(data, f"{order}u4").astype(np.int64).astype(np.int32)
    else:
        raise ValueError(f"unsupported raw sample width {bits_per_sample}")
    half = 1 << (bits_per_sample - 1)
    full = 1 << bits_per_sample
    if is_unsigned:
        v = (v & (full - 1)) - half
    elif bytes_per < 4:
        v = np.where((v & (full - 1)) >= half, (v & (full - 1)) - full, v & (full - 1))
    return AudioBuffer(samples=v.reshape(-1, channels), sample_rate=sample_rate,
                       bits_per_sample=bits_per_sample)


def read_raw(path: str, **kw) -> AudioBuffer:
    with open(path, "rb") as f:
        return parse_raw(f.read(), **kw)


def raw_bytes(buf: AudioBuffer, is_big_endian: bool = False,
              is_unsigned: bool = False) -> bytes:
    bits = buf.bits_per_sample
    bytes_per = (bits + 7) // 8
    flat = np.ascontiguousarray(buf.samples, np.int32).reshape(-1)
    if is_unsigned:
        flat = flat + (1 << (bits - 1))
    order = ">" if is_big_endian else "<"
    if bytes_per == 1:
        return flat.astype(np.uint8).tobytes()
    if bytes_per == 2:
        return (flat & 0xFFFF).astype(f"{order}u2").tobytes()
    if bytes_per == 3:
        u = (flat & 0xFFFFFF).astype(">u4" if is_big_endian else "<u4")
        b = u.view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(b[:, 1:] if is_big_endian else b[:, :3]).tobytes()
    if bytes_per == 4:
        return flat.astype(f"{order}i4").tobytes()
    raise ValueError(f"unsupported bits per sample {bits}")


def write_raw(path: str, buf: AudioBuffer, **kw) -> None:
    with open(path, "wb") as f:
        f.write(raw_bytes(buf, **kw))
