"""Sony Wave64 (.w64) reading and writing.

The analog of the reference's Wave64 input support (post-1.2.1 dev feature,
src/flac/encode.c get_sample_info_wave). Wave64 is RIFF/WAVE recast with
16-byte GUID chunk ids and little-endian 64-bit chunk sizes that INCLUDE the
24-byte chunk header; chunks are aligned to 8 bytes. The fmt/data payloads
are byte-identical to their RIFF counterparts.
"""

from __future__ import annotations

import struct

from flac_tpu.containers.wav import (
    WAVE_FORMAT_EXTENSIBLE,
    WAVE_FORMAT_PCM,
    AudioBuffer,
    _decode_pcm,
)

# On-disk GUID byte sequences exactly as the reference emits them
# (src/flac/decode.c:629-721); the first 4 bytes spell the RIFF fourcc.
GUID_RIFF = b"\x72\x69\x66\x66\x2E\x91\xCF\x11\xD6\xA5\x28\xDB\x04\xC1\x00\x00"
GUID_WAVE = b"\x77\x61\x76\x65\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"
GUID_FMT = b"\x66\x6D\x74\x20\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"
GUID_DATA = b"\x64\x61\x74\x61\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"

_HDR = 16 + 8  # GUID + int64 size (size includes this header)


def _align8(n: int) -> int:
    return (n + 7) & ~7


def parse_w64(data: bytes, lazy: bool = False) -> AudioBuffer:
    if data[:16] != GUID_RIFF or data[24:40] != GUID_WAVE:
        raise ValueError("not a Wave64 file")
    pos = 40
    fmt = None
    pcm = None
    mask = 0
    foreign: list[tuple[bytes, bytes]] = []
    while pos + _HDR <= len(data):
        guid = data[pos : pos + 16]
        (csize,) = struct.unpack_from("<Q", data, pos + 16)
        if csize < _HDR:
            raise ValueError("corrupt Wave64 chunk size")
        body = data[pos + _HDR : pos + csize]
        if guid == GUID_FMT:
            tag, channels, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == WAVE_FORMAT_EXTENSIBLE:
                valid_bits = struct.unpack_from("<H", body, 18)[0]
                mask = struct.unpack_from("<I", body, 20)[0]
                sub = struct.unpack_from("<H", body, 24)[0]
                if sub != WAVE_FORMAT_PCM:
                    raise ValueError("only PCM WAVE_FORMAT_EXTENSIBLE is supported")
                if mask == 0:
                    mask = {1: 0x0001, 2: 0x0003}.get(channels, 0)
                fmt = (channels, rate, bits, valid_bits or bits)
            elif tag == WAVE_FORMAT_PCM:
                fmt = (channels, rate, bits, bits)
            else:
                raise ValueError(f"unsupported Wave64 format tag {tag}")
        elif guid == GUID_DATA:
            pcm = body
        else:
            foreign.append((bytes(guid[:4]), data[pos : pos + _align8(csize)]))
        pos += _align8(csize)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, container_bits, valid_bits = fmt

    def conv(raw):
        s = _decode_pcm(raw, container_bits, channels)
        if valid_bits < container_bits:
            s = s >> (container_bits - valid_bits)
        return s

    if lazy:
        from flac_tpu.containers.wav import LazyPCM
        samples = LazyPCM(pcm, container_bits, channels, conv)
    else:
        samples = conv(pcm)
    return AudioBuffer(samples=samples, sample_rate=rate, bits_per_sample=valid_bits,
                       foreign_chunks=foreign, channel_mask=mask)


def read_w64(path: str) -> AudioBuffer:
    with open(path, "rb") as f:
        return parse_w64(f.read())


def w64_bytes(buf: AudioBuffer, foreign=None, channel_mask: int = 0) -> bytes:
    """Serialize to Wave64 exactly as the reference decoder does
    (decode.c:536-737): GUID header [foreign before fmt] fmt [foreign
    between] data+PCM (8-aligned) [foreign after]. Chunk size fields
    include the 24-byte header; `foreign` is a cli.foreign.ForeignMetadata.
    """
    from flac_tpu.containers.wav import _wav_pcm_bytes

    return (w64_header_bytes(buf.nsamples, buf.channels, buf.bits_per_sample,
                             buf.sample_rate, foreign, channel_mask)
            + _wav_pcm_bytes(buf)
            + w64_trailer_bytes(buf.nsamples, buf.channels,
                                buf.bits_per_sample, foreign))


def w64_header_bytes(nsamples: int, channels: int, bits_per_sample: int,
                     sample_rate: int, foreign=None,
                     channel_mask: int = 0) -> bytes:
    """Everything before the PCM payload — the streaming half of w64_bytes
    (sizes derived from nsamples)."""
    from flac_tpu.containers.wav import _fmt_chunk_body

    pcm_len = nsamples * channels * ((bits_per_sample + 7) // 8)
    aligned = _align8(pcm_len)
    fmt_body, _ext = _fmt_chunk_body(channels, sample_rate, bits_per_sample,
                                     channel_mask)
    extra = foreign.extra_size() if foreign else 0
    # decode.c:608: header + WAVE GUID + fmt chunk + data chunk header
    iff_size = (16 + 8) + 16 + (16 + 8 + len(fmt_body)) + (16 + 8) \
        + extra + aligned
    out = bytearray()
    out += GUID_RIFF + struct.pack("<Q", iff_size) + GUID_WAVE
    if foreign:
        out += foreign.chunks_before_format()
    out += GUID_FMT + struct.pack("<Q", _HDR + len(fmt_body)) + fmt_body
    if foreign:
        out += foreign.chunks_between()
    out += GUID_DATA + struct.pack("<Q", _HDR + pcm_len)
    return bytes(out)


def w64_trailer_bytes(nsamples: int, channels: int, bits_per_sample: int,
                      foreign=None) -> bytes:
    pcm_len = nsamples * channels * ((bits_per_sample + 7) // 8)
    out = b"\x00" * (_align8(pcm_len) - pcm_len)
    if foreign:
        out += foreign.chunks_after()
    return bytes(out)


def write_w64(path: str, buf: AudioBuffer) -> None:
    with open(path, "wb") as f:
        f.write(w64_bytes(buf))
