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


def parse_w64(data: bytes) -> AudioBuffer:
    if data[:16] != GUID_RIFF or data[24:40] != GUID_WAVE:
        raise ValueError("not a Wave64 file")
    pos = 40
    fmt = None
    pcm = None
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
                sub = struct.unpack_from("<H", body, 24)[0]
                if sub != WAVE_FORMAT_PCM:
                    raise ValueError("only PCM WAVE_FORMAT_EXTENSIBLE is supported")
                fmt = (channels, rate, bits, valid_bits or bits)
            elif tag == WAVE_FORMAT_PCM:
                fmt = (channels, rate, bits, bits)
            else:
                raise ValueError(f"unsupported Wave64 format tag {tag}")
        elif guid == GUID_DATA:
            pcm = body
        else:
            foreign.append((guid[:4], data[pos : pos + _align8(csize)]))
        pos += _align8(csize)
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, container_bits, valid_bits = fmt
    samples = _decode_pcm(pcm, container_bits, channels)
    if valid_bits < container_bits:
        samples = samples >> (container_bits - valid_bits)
    return AudioBuffer(samples=samples, sample_rate=rate, bits_per_sample=valid_bits,
                       foreign_chunks=foreign)


def read_w64(path: str) -> AudioBuffer:
    with open(path, "rb") as f:
        return parse_w64(f.read())


def w64_bytes(buf: AudioBuffer) -> bytes:
    from flac_tpu.containers.wav import wav_bytes

    # reuse the RIFF PCM serializer for the payloads
    riff = wav_bytes(buf)
    # riff layout: RIFF(12) fmt hdr(8)+16 data hdr(8)+pcm
    fmt_body = riff[20:36]
    (data_size,) = struct.unpack_from("<I", riff, 40)
    pcm = riff[44 : 44 + data_size]

    def chunk(guid: bytes, body: bytes) -> bytes:
        size = _HDR + len(body)
        pad = _align8(size) - size
        return guid + struct.pack("<Q", size) + body + b"\x00" * pad

    fmt_chunk = chunk(GUID_FMT, fmt_body)
    data_chunk = chunk(GUID_DATA, pcm)
    total = 16 + 8 + 16 + len(fmt_chunk) + len(data_chunk)
    return GUID_RIFF + struct.pack("<Q", total) + GUID_WAVE + fmt_chunk + data_chunk


def write_w64(path: str, buf: AudioBuffer) -> None:
    with open(path, "wb") as f:
        f.write(w64_bytes(buf))
