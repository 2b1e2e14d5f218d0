"""RIFF WAVE (and RF64) reading/writing.

The analog of the reference's WAV paths: input parsing
(src/flac/encode.c:195 get_sample_info_wave, including RF64 'ds64' handling)
and output writing (src/flac/decode.c write_headers). PCM integer formats
only (8-bit unsigned, 12/16/20/24/32-bit signed little-endian), standard and
WAVE_FORMAT_EXTENSIBLE fmt chunks.

Returns samples as an int32 [nsamples, channels] array in FLAC's canonical
signed representation (8-bit WAV is unsigned and is re-centered by -128, as
the reference does in format_input_, encode.c).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


@dataclass
class AudioBuffer:
    """Canonical in-memory PCM: int32 samples [n, channels], plus stream params."""

    samples: np.ndarray  # int32 [nsamples, channels]
    sample_rate: int
    bits_per_sample: int
    # foreign chunks for --keep-foreign-metadata (chunk id -> raw bytes, in order)
    foreign_chunks: list[tuple[bytes, bytes]] = field(default_factory=list)
    # WAVEFORMATEXTENSIBLE channel mask of the source (0 = none/unknown);
    # carried into a WAVEFORMATEXTENSIBLE_CHANNEL_MASK tag by the CLI
    channel_mask: int = 0
    # Samples are right-justified at bits_per_sample; writers left-justify
    # bps%8 streams into the padded byte width themselves (the on-disk layout
    # the reference decoder emits, decode.c:962,1094-1097). The ReplayGain
    # path instead produces values already at the padded width
    # (decode.c:1108 passes target_bps=bps+shift to apply_gain) — it sets
    # this flag so writers skip the shift while headers keep the true bps.
    left_justified: bool = False

    @property
    def nsamples(self) -> int:
        return self.samples.shape[0]

    @property
    def channels(self) -> int:
        return self.samples.shape[1]


class LazyPCM:
    """Array-like view over a container's PCM bytes that converts slices on
    access. Lets the CLI feed a multi-GB input to the (already chunked)
    stream encoder in bounded memory: the int32 expansion of the whole file
    never materializes, only the slice being processed. Supports the
    operations the encode path uses — shape/len/size, unit-step row
    slicing, and np.asarray — and materializes for anything else."""

    ndim = 2
    dtype = np.dtype(np.int32)

    def __init__(self, raw, bits: int, channels: int, convert) -> None:
        self._raw = memoryview(raw)
        self.bits = bits
        self.channels = channels
        self._convert = convert  # (buffer) -> np.int32 [n, channels]
        self._fw = ((bits + 7) // 8) * channels
        self._n = len(self._raw) // self._fw

    @property
    def shape(self) -> tuple[int, int]:
        return (self._n, self.channels)

    @property
    def size(self) -> int:
        return self._n * self.channels

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx):
        if isinstance(idx, slice) and idx.step in (None, 1):
            a, b, _ = idx.indices(self._n)
            return LazyPCM(self._raw[a * self._fw : max(b, a) * self._fw],
                           self.bits, self.channels, self._convert)
        return self.materialize()[idx]

    def materialize(self) -> np.ndarray:
        return self._convert(self._raw)

    def __array__(self, dtype=None, copy=None):
        a = self.materialize()
        if dtype is not None and np.dtype(dtype) != a.dtype:
            return a.astype(dtype)
        return a


def _decode_pcm(raw: bytes, bits: int, channels: int) -> np.ndarray:
    bytes_per = (bits + 7) // 8
    n = len(raw) // (bytes_per * channels)
    raw = raw[: n * bytes_per * channels]
    if bytes_per == 1:
        # 8-bit WAV is unsigned; recenter to signed (reference encode.c format_input_)
        data = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif bytes_per == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bytes_per == 3:
        u = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.uint32)
        v = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
        data = v.astype(np.int32)
        data = np.where(data >= 1 << 23, data - (1 << 24), data)
    elif bytes_per == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported WAV sample width {bits}")
    if bits not in (8, 16, 24, 32) and bits % 8 != 0:
        # e.g. 12- or 20-bit samples stored right-justified in 2/3 bytes
        data = data >> (bytes_per * 8 - bits)
    return data.reshape(-1, channels)


def read_wav(path: str) -> AudioBuffer:
    with open(path, "rb") as f:
        data = f.read()
    return parse_wav(data)


_SUPPORTED_CHANNEL_MASKS = frozenset([
    0x0001, 0x0003, 0x0007, 0x0033, 0x0603, 0x0037, 0x0607, 0x003F, 0x060F,
])  # the FLAC-order-compatible WAVEFORMATEXTENSIBLE masks (encode.c:487-500)


def parse_wav(data: bytes, ignore_chunk_sizes: bool = False,
              strict_channel_mask: bool = False,
              lazy: bool = False) -> AudioBuffer:
    """`ignore_chunk_sizes`: treat the data chunk as extending to EOF — the
    reference's --ignore-chunk-sizes for streams with bogus RIFF sizes
    (encode.c get_sample_info_wave). `strict_channel_mask`: apply the
    reference ENCODER's channel-mask validation (encode.c:413,487-505;
    lifted by --channel-map=none). Off by default: the reference's own
    decoder writes mask 0 for 7/8-channel files, so a general-purpose
    reader must accept unassigned masks. `lazy`: samples become a LazyPCM
    view (bounded-memory encoding of huge inputs); `data` may then be any
    buffer object, e.g. a numpy memmap wrapped in a memoryview."""
    if data[:4] not in (b"RIFF", b"RF64"):
        raise ValueError("not a RIFF/RF64 file")
    is_rf64 = data[:4] == b"RF64"
    if data[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    pos = 12
    fmt = None
    pcm = None
    data_size_rf64 = None
    foreign: list[tuple[bytes, bytes]] = []
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csize = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"ds64" and is_rf64:
            # RF64 64-bit size chunk (reference encode.c RF64 support)
            _riff_size, data_size_rf64, _ = struct.unpack_from("<QQQ", body, 0)[:3]
        elif cid == b"fmt ":
            tag, channels, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == WAVE_FORMAT_EXTENSIBLE:
                valid_bits = struct.unpack_from("<H", body, 18)[0]
                mask = struct.unpack_from("<I", body, 20)[0]
                sub_format = struct.unpack_from("<H", body, 24)[0]
                if sub_format != WAVE_FORMAT_PCM:
                    raise ValueError("only PCM WAVE_FORMAT_EXTENSIBLE is supported")
                if mask == 0:  # fake the mask for mono/stereo (encode.c:444-449)
                    mask = {1: 0x0001, 2: 0x0003}.get(channels, 0)
                if strict_channel_mask and mask not in _SUPPORTED_CHANNEL_MASKS:
                    raise ValueError(
                        f"WAVEFORMATEXTENSIBLE chunk with unsupported channel "
                        f"mask=0x{mask:04X}; use --channel-map=none to store "
                        f"channels in current order")
                if strict_channel_mask and bin(mask).count("1") != channels:
                    raise ValueError(
                        f"channel mask 0x{mask:04X} does not assign exactly "
                        f"{channels} channels")
                fmt = (channels, rate, bits, valid_bits or bits, mask)
            elif tag == WAVE_FORMAT_PCM:
                if channels > 2 and strict_channel_mask:
                    raise ValueError(
                        "WAVE has >2 channels but is not WAVE_FORMAT_EXTENSIBLE; "
                        "cannot assign channels (use --channel-map=none)")
                fmt = (channels, rate, bits, bits)
            else:
                raise ValueError(f"unsupported WAVE format tag {tag}")
        elif cid == b"data":
            if ignore_chunk_sizes:
                body = data[pos + 8 :]
                csize = len(body)
            elif is_rf64 and csize == 0xFFFFFFFF and data_size_rf64 is not None:
                body = data[pos + 8 : pos + 8 + data_size_rf64]
                csize = data_size_rf64
            pcm = body
            if ignore_chunk_sizes:
                if fmt is None:
                    raise ValueError("missing fmt chunk before data")
                break
        else:
            foreign.append((bytes(cid), data[pos : pos + 8 + csize + (csize & 1)]))
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    channels, rate, container_bits, valid_bits = fmt[:4]

    def conv(raw):
        s = _decode_pcm(raw, container_bits, channels)
        if valid_bits != container_bits and valid_bits < container_bits:
            s = s >> (container_bits - valid_bits)
        return s

    # LazyPCM's row width follows the CONTAINER storage width (valid_bits
    # only narrows the values, not the layout)
    samples = (LazyPCM(pcm, container_bits, channels, conv) if lazy
               else conv(pcm))
    mask = fmt[4] if len(fmt) > 4 else 0
    return AudioBuffer(samples=samples, sample_rate=rate, bits_per_sample=valid_bits,
                       foreign_chunks=foreign, channel_mask=mask)


def write_wav(path: str, buf: AudioBuffer) -> None:
    with open(path, "wb") as f:
        f.write(wav_bytes(buf))


def _wav_pcm_bytes(buf: AudioBuffer) -> bytes:
    bits = buf.bits_per_sample
    bytes_per = (bits + 7) // 8
    flat = np.ascontiguousarray(buf.samples, dtype=np.int32).reshape(-1)
    if bits % 8 and not buf.left_justified:
        # bps%8 streams store left-justified in the padded byte width
        # (reference decode.c:962,1094-1097; oracle-verified byte layout)
        flat = flat << (bytes_per * 8 - bits)
    if bytes_per == 1:
        return (flat + 128).astype(np.uint8).tobytes()
    if bytes_per == 2:
        return flat.astype("<i2").tobytes()
    if bytes_per == 3:
        le = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(le[:, :3]).tobytes()
    if bytes_per == 4:
        return flat.astype("<i4").tobytes()
    raise ValueError(f"unsupported bits per sample {bits}")


# KSDATAFORMAT_SUBTYPE_PCM (decode.c:816)
_SUBTYPE_PCM_GUID = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def _fmt_chunk_body(channels: int, sample_rate: int, bits: int,
                    channel_mask: int) -> tuple[bytes, bool]:
    """fmt body + whether it is WAVEFORMATEXTENSIBLE. Extensible exactly when
    the reference decoder would emit it: mask==2 or mask>3 or bps%8 or >2ch
    (decode.c:545-551, write_riff_wave_fmt_chunk_body:785-818)."""
    bytes_per = (bits + 7) // 8
    if channel_mask == 0:
        # defaults the reference picks per channel count (decode.c:350-377)
        channel_mask = {1: 0x0001, 2: 0x0003, 3: 0x0007, 4: 0x0033,
                        5: 0x0607, 6: 0x060F}.get(channels, 0)
    ext = (channel_mask == 2 or channel_mask > 3 or bits % 8 != 0
           or channels > 2)
    body = struct.pack("<HHIIHH",
                       WAVE_FORMAT_EXTENSIBLE if ext else WAVE_FORMAT_PCM,
                       channels, sample_rate,
                       sample_rate * channels * bytes_per,
                       channels * bytes_per, bytes_per * 8)
    if ext:
        body += struct.pack("<HHI", 22, bits, channel_mask) + _SUBTYPE_PCM_GUID
    return body, ext


def rf64_bytes(buf: AudioBuffer, foreign=None, channel_mask: int = 0) -> bytes:
    """RF64 output (decode --force-rf64-format): 'RF64' form with size
    sentinels 0xFFFFFFFF and the 64-bit sizes carried in a ds64 chunk
    (reference decode.c:597-718)."""
    return wav_bytes(buf, foreign=foreign, channel_mask=channel_mask,
                     rf64=True)


def wav_header_bytes(nsamples: int, channels: int, bits_per_sample: int,
                     sample_rate: int, foreign=None, channel_mask: int = 0,
                     rf64: bool = False) -> bytes:
    """Everything before the PCM payload (sizes derived from nsamples) —
    the streaming half of wav_bytes, so a long decode can write headers
    first and stream blocks through _wav_pcm_bytes without assembling the
    whole file (the reference decoder writes its headers up front too,
    decode.c:536-737)."""
    bytes_per = (bits_per_sample + 7) // 8
    pcm_len = nsamples * channels * bytes_per
    aligned = pcm_len + (pcm_len & 1)
    fmt, _ext = _fmt_chunk_body(channels, sample_rate, bits_per_sample,
                                channel_mask)
    extra = foreign.extra_size() if foreign else 0
    iff_size = 4 + (36 if rf64 else 0) + 8 + len(fmt) + 8 + extra + aligned
    if not rf64 and iff_size >= 0xFFFFFFF4:
        raise ValueError("stream is too big to fit in a single WAVE file")
    out = bytearray()
    if rf64:
        out += b"RF64" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
        out += b"ds64" + struct.pack("<IQQQI", 28, iff_size, pcm_len,
                                     nsamples, 0)
    else:
        out += b"RIFF" + struct.pack("<I", iff_size) + b"WAVE"
    if foreign:
        out += foreign.chunks_before_format()
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if foreign:
        out += foreign.chunks_between()
    out += b"data" + struct.pack("<I", 0xFFFFFFFF if rf64 else pcm_len)
    return bytes(out)


def wav_trailer_bytes(nsamples: int, channels: int, bits_per_sample: int,
                      foreign=None) -> bytes:
    pcm_len = nsamples * channels * ((bits_per_sample + 7) // 8)
    out = b"\x00" if pcm_len & 1 else b""
    if foreign:
        out += foreign.chunks_after()
    return out


def wav_bytes(buf: AudioBuffer, foreign=None, channel_mask: int = 0,
              rf64: bool = False) -> bytes:
    """Serialize to RIFF WAVE (or RF64) exactly as the reference decoder
    does (decode.c:536-737 write_iff_headers): RIFF header [+ds64]
    [foreign chunks before fmt] fmt [foreign between] data+PCM (2-aligned)
    [foreign after]. `foreign` is a cli.foreign.ForeignMetadata."""
    return (wav_header_bytes(buf.nsamples, buf.channels, buf.bits_per_sample,
                             buf.sample_rate, foreign, channel_mask, rf64)
            + _wav_pcm_bytes(buf)
            + wav_trailer_bytes(buf.nsamples, buf.channels,
                                buf.bits_per_sample, foreign))
