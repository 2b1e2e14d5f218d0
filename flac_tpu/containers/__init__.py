"""Audio container readers/writers (WAV/RF64/Wave64/AIFF/AIFF-C/raw).

The analog of the reference's src/flac/encode.c input readers
(get_sample_info_wave/aiff/raw, encode.c:181-902) and src/flac/decode.c
output writers.
"""

from flac_tpu.containers.wav import (  # noqa: F401
    AudioBuffer,
    parse_wav,
    read_wav,
    rf64_bytes,
    wav_bytes,
    wav_header_bytes,
    wav_trailer_bytes,
    write_wav,
)
from flac_tpu.containers.aiff import (  # noqa: F401
    aiff_bytes,
    aiff_header_bytes,
    aiff_trailer_bytes,
    parse_aiff,
    read_aiff,
    write_aiff,
)
from flac_tpu.containers.w64 import (  # noqa: F401
    parse_w64,
    read_w64,
    w64_bytes,
    w64_header_bytes,
    w64_trailer_bytes,
    write_w64,
)
from flac_tpu.containers.raw import (  # noqa: F401
    parse_raw,
    raw_bytes,
    read_raw,
    write_raw,
)


def sniff_format(data: bytes) -> str:
    """Identify a container by its magic — the analog of the reference's
    input-type detection (src/flac/main.c format-by-header + extension).
    Returns one of 'wav', 'rf64', 'w64', 'aiff', 'flac', 'ogg', 'raw'."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RF64" and data[8:12] == b"WAVE":
        return "rf64"
    if data[:8] == b"\x72\x69\x66\x66\x2E\x91\xCF\x11":
        return "w64"
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if data[:4] == b"fLaC" or data[:3] == b"ID3":
        return "flac"
    if data[:4] == b"OggS":
        return "ogg"
    return "raw"


def read_audio(path: str, **raw_kw) -> AudioBuffer:
    """Read any supported container, dispatching on the file's magic."""
    with open(path, "rb") as f:
        data = f.read()
    kind = sniff_format(data)
    if kind in ("wav", "rf64"):
        return parse_wav(data)
    if kind == "w64":
        return parse_w64(data)
    if kind == "aiff":
        return parse_aiff(data)
    if kind == "raw":
        return parse_raw(data, **raw_kw)
    raise ValueError(f"cannot read {kind} with read_audio")
