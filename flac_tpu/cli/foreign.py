"""Foreign-metadata preservation for --keep-foreign-metadata.

Interoperable re-design of the reference CLI's foreign_metadata engine
(src/flac/foreign_metadata.c): the original container's chunks are stored
one-per-APPLICATION-block (ids "riff"/"aiff"/"w64 ") in file order —

* block 0 is the container header itself (12-byte `RIFF<size>WAVE` /
  `FORM<size>AIFF`, or the 40-byte Wave64 RIFF+size+WAVE GUID preamble),
* every other chunk is stored whole (header + padded body), EXCEPT the
  audio chunk, which is stored header-only (the PCM lives in FLAC frames):
  8 bytes for WAV `data`, 24 bytes for Wave64 `data` (GUID + size), and
  8+8+offset_size bytes for AIFF `SSND` (header + offset/blockSize words +
  the offset filler, foreign_metadata.c:147-162).

On restore the decoder writes its own header/ds64/fmt(or COMM)/data(or
SSND) chunks and splices the remaining stored chunks verbatim into three
positions: between header and format chunk, between format and audio
chunks, and after the audio data (write_to_iff_, foreign_metadata.c:645;
decode.c:536-782 write_iff_headers). Because the storage format matches
the reference's byte-for-byte, files encoded here restore correctly under
the reference `flac` binary and vice versa.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

APPLICATION_IDS = {"wav": b"riff", "rf64": b"riff", "aiff": b"aiff",
                   "w64": b"w64 "}

# Wave64 on-disk GUIDs (first 4 bytes spell the RIFF fourcc)
_W64_RIFF = b"\x72\x69\x66\x66\x2E\x91\xCF\x11\xD6\xA5\x28\xDB\x04\xC1\x00\x00"
_W64_WAVE = b"\x77\x61\x76\x65\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"
_W64_FMT = b"\x66\x6D\x74\x20\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"
_W64_DATA = b"\x64\x61\x74\x61\xF3\xAC\xD3\x11\xD1\x8C\x00\xC0\x4F\x8E\xDB\x8A"


class ForeignError(ValueError):
    pass


@dataclass
class ForeignMetadata:
    """Ordered raw chunk blocks plus the format/audio chunk positions."""

    app_id: bytes                       # b"riff" | b"aiff" | b"w64 "
    blocks: list[bytes] = field(default_factory=list)
    format_block: int = 0               # index of fmt /COMM chunk
    audio_block: int = 0                # index of data/SSND chunk
    is_rf64: bool = False
    ssnd_offset_size: int = 0

    # --- restore-side segment accessors (write_to_iff_ semantics) ---------

    def chunks_before_format(self) -> bytes:
        """Chunks between the container header (and ds64) and fmt/COMM."""
        first = 2 if self.is_rf64 else 1
        return b"".join(self.blocks[first:self.format_block])

    def chunks_between(self) -> bytes:
        return b"".join(self.blocks[self.format_block + 1:self.audio_block])

    def chunks_after(self) -> bytes:
        return b"".join(self.blocks[self.audio_block + 1:])

    def extra_size(self) -> int:
        """Total spliced bytes — the reference's foreign_metadata_size
        (decode.c:588-592)."""
        return (len(self.chunks_before_format()) + len(self.chunks_between())
                + len(self.chunks_after()))


# --------------------------------------------------------------------------
# container -> ForeignMetadata (encode side)
# --------------------------------------------------------------------------

def scan_wave(data: bytes) -> ForeignMetadata:
    """Chunk map of a RIFF/RF64 WAVE file (read_from_wave_,
    foreign_metadata.c:187-329)."""
    if len(data) < 12 or data[:4] not in (b"RIFF", b"RF64") or data[8:12] != b"WAVE":
        raise ForeignError("unsupported RIFF layout")
    fm = ForeignMetadata(app_id=b"riff", is_rf64=data[:4] == b"RF64")
    fm.blocks.append(data[:12])
    riff_size = struct.unpack_from("<I", data, 4)[0]
    eof_offset = None if fm.is_rf64 and riff_size == 0xFFFFFFFF else 8 + riff_size
    ds64_data_size = None
    pos = 12
    while pos < len(data):
        if pos + 8 > len(data):
            raise ForeignError("invalid WAVE file: truncated chunk header")
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        padded = size + (size & 1)
        if cid == b"fmt ":
            if fm.format_block:
                raise ForeignError('invalid WAVE file: multiple "fmt " chunks')
            if fm.audio_block:
                raise ForeignError('invalid WAVE file: "data" before "fmt "')
            fm.format_block = len(fm.blocks)
        elif cid == b"data":
            if fm.audio_block:
                raise ForeignError('invalid WAVE file: multiple "data" chunks')
            if not fm.format_block:
                raise ForeignError('invalid WAVE file: "data" before "fmt "')
            fm.audio_block = len(fm.blocks)
            if fm.is_rf64 and len(fm.blocks) < 2:
                raise ForeignError('invalid RF64 file: "data" before "ds64"')
        stored = 8 if cid == b"data" else 8 + padded
        if pos + stored > len(data):
            raise ForeignError("invalid WAVE file: truncated chunk body")
        fm.blocks.append(data[pos:pos + stored])
        if fm.is_rf64 and len(fm.blocks) == 2:
            if cid != b"ds64":
                raise ForeignError('invalid RF64 file: "ds64" chunk must '
                                   'immediately follow the "WAVE" marker')
            if size != 28:
                raise ForeignError('unsupported RF64 "ds64" chunk size')
            body = data[pos + 8:pos + 8 + 28]
            riff64, data64 = struct.unpack_from("<QQ", body, 0)
            if struct.unpack_from("<I", body, 24)[0]:
                raise ForeignError('RF64 "ds64" extra size table unsupported')
            ds64_data_size = data64 + (data64 & 1)
            eof_offset = 8 + riff64
            pos += 8 + padded
        elif cid == b"data" and fm.is_rf64 and size == 0xFFFFFFFF:
            if ds64_data_size is None:
                raise ForeignError('invalid RF64 file: missing "ds64" sizes')
            pos += 8 + ds64_data_size
        else:
            pos += 8 + padded
    if eof_offset is None:
        raise ForeignError("invalid RF64 file: all RIFF sizes are -1")
    if eof_offset != pos:
        raise ForeignError("invalid WAVE file: unexpected EOF")
    if not fm.format_block:
        raise ForeignError('invalid WAVE file: missing "fmt " chunk')
    if not fm.audio_block:
        raise ForeignError('invalid WAVE file: missing "data" chunk')
    return fm


def scan_wave64(data: bytes) -> ForeignMetadata:
    """Chunk map of a Wave64 file (read_from_wave64_,
    foreign_metadata.c:331-421)."""
    if len(data) < 40 or data[:16] != _W64_RIFF or data[24:40] != _W64_WAVE:
        raise ForeignError("unsupported Wave64 layout")
    fm = ForeignMetadata(app_id=b"w64 ")
    fm.blocks.append(data[:40])
    eof_offset = struct.unpack_from("<Q", data, 16)[0]
    pos = 40
    while pos < len(data):
        if pos + 24 > len(data):
            raise ForeignError("invalid Wave64 file: truncated chunk header")
        guid = data[pos:pos + 16]
        size = struct.unpack_from("<Q", data, pos + 16)[0]  # includes header
        padded = (size + 7) & ~7
        if guid == _W64_FMT:
            if fm.format_block:
                raise ForeignError('invalid Wave64 file: multiple "fmt " chunks')
            if fm.audio_block:
                raise ForeignError('invalid Wave64 file: "data" before "fmt "')
            fm.format_block = len(fm.blocks)
        elif guid == _W64_DATA:
            if fm.audio_block:
                raise ForeignError('invalid Wave64 file: multiple "data" chunks')
            if not fm.format_block:
                raise ForeignError('invalid Wave64 file: "data" before "fmt "')
            fm.audio_block = len(fm.blocks)
        stored = 24 if guid == _W64_DATA else padded
        if pos + stored > len(data):
            raise ForeignError("invalid Wave64 file: truncated chunk body")
        fm.blocks.append(data[pos:pos + stored])
        pos += padded
    if eof_offset != pos:
        raise ForeignError("invalid Wave64 file: unexpected EOF")
    if not fm.format_block:
        raise ForeignError('invalid Wave64 file: missing "fmt " chunk')
    if not fm.audio_block:
        raise ForeignError('invalid Wave64 file: missing "data" chunk')
    return fm


def scan_aiff(data: bytes) -> ForeignMetadata:
    """Chunk map of an AIFF/AIFF-C file (read_from_aiff_,
    foreign_metadata.c:97-185). The SSND block stores header + offset/
    blockSize + the offset filler bytes; the unaligned tail is NOT saved
    (the reference's 'cast in stone' WATCHOUT)."""
    if (len(data) < 12 or data[:4] != b"FORM"
            or data[8:12] not in (b"AIFF", b"AIFC")):
        raise ForeignError("unsupported FORM layout")
    fm = ForeignMetadata(app_id=b"aiff")
    fm.blocks.append(data[:12])
    eof_offset = 8 + struct.unpack_from(">I", data, 4)[0]
    pos = 12
    while pos < len(data):
        if pos + 8 > len(data):
            raise ForeignError("invalid AIFF file: truncated chunk header")
        cid = data[pos:pos + 4]
        size = struct.unpack_from(">I", data, pos + 4)[0]
        padded = size + (size & 1)
        if cid == b"COMM":
            if fm.format_block:
                raise ForeignError('invalid AIFF file: multiple "COMM" chunks')
            if fm.audio_block:
                raise ForeignError('invalid AIFF file: "SSND" before "COMM"')
            fm.format_block = len(fm.blocks)
        elif cid == b"SSND":
            if fm.audio_block:
                raise ForeignError('invalid AIFF file: multiple "SSND" chunks')
            if not fm.format_block:
                raise ForeignError('invalid AIFF file: "SSND" before "COMM"')
            fm.audio_block = len(fm.blocks)
            fm.ssnd_offset_size = struct.unpack_from(">I", data, pos + 8)[0]
        stored = (8 + 8 + fm.ssnd_offset_size) if cid == b"SSND" else 8 + padded
        if pos + stored > len(data):
            raise ForeignError("invalid AIFF file: truncated chunk body")
        fm.blocks.append(data[pos:pos + stored])
        pos += 8 + padded
    if eof_offset != pos:
        raise ForeignError("invalid AIFF file: unexpected EOF")
    if not fm.format_block:
        raise ForeignError('invalid AIFF file: missing "COMM" chunk')
    if not fm.audio_block:
        raise ForeignError('invalid AIFF file: missing "SSND" chunk')
    return fm


def scan_container(data: bytes, kind: str) -> ForeignMetadata:
    if kind in ("wav", "rf64"):
        return scan_wave(data)
    if kind == "w64":
        return scan_wave64(data)
    if kind == "aiff":
        return scan_aiff(data)
    raise ForeignError(f"--keep-foreign-metadata unsupported for {kind} input")


# --------------------------------------------------------------------------
# FLAC APPLICATION blocks <-> ForeignMetadata (decode side)
# --------------------------------------------------------------------------

def from_application_blocks(datas: list[bytes], kind: str) -> ForeignMetadata:
    """Rebuild the chunk map from APPLICATION block payloads (app id already
    stripped), mirroring read_from_flac_ (foreign_metadata.c:477-643)."""
    app_id = APPLICATION_IDS[kind]
    fm = ForeignMetadata(app_id=app_id)
    for raw in datas:
        tag = raw[:4]
        if not fm.blocks:  # first block must be the container header
            fm.is_rf64 = tag == b"RF64"
            ok = ((app_id == b"riff" and (tag == b"RIFF" or fm.is_rf64))
                  or (app_id == b"w64 " and tag == b"riff")
                  or (app_id == b"aiff" and tag == b"FORM"))
            if not ok:
                raise ForeignError("unsupported foreign metadata found, may "
                                   "need newer FLAC decoder")
        elif app_id == b"riff":
            if tag == b"fmt ":
                _claim_format(fm, "WAVE", '"fmt "', '"data"')
            elif tag == b"data":
                _claim_audio(fm, "WAVE", '"fmt "', '"data"')
            elif fm.is_rf64 and len(fm.blocks) == 1 and tag != b"ds64":
                raise ForeignError('invalid RF64 metadata: second chunk is '
                                   'not "ds64"')
        elif app_id == b"w64 ":
            if tag == b"fmt ":
                _claim_format(fm, "Wave64", '"fmt "', '"data"')
            elif tag == b"data":
                _claim_audio(fm, "Wave64", '"fmt "', '"data"')
        else:  # aiff
            if tag == b"COMM":
                _claim_format(fm, "AIFF", '"COMM"', '"SSND"')
            elif tag == b"SSND":
                _claim_audio(fm, "AIFF", '"COMM"', '"SSND"')
                fm.ssnd_offset_size = struct.unpack_from(">I", raw, 8)[0]
        fm.blocks.append(raw)
    if not fm.blocks:
        raise ForeignError("no foreign metadata found")
    if not fm.format_block:
        raise ForeignError("invalid foreign metadata: missing format chunk")
    if not fm.audio_block:
        raise ForeignError("invalid foreign metadata: missing audio chunk")
    return fm


def _claim_format(fm: ForeignMetadata, what: str, fmt: str, aud: str) -> None:
    if fm.format_block:
        raise ForeignError(f"invalid {what} metadata: multiple {fmt} chunks")
    if fm.audio_block:
        raise ForeignError(f"invalid {what} metadata: {aud} before {fmt}")
    fm.format_block = len(fm.blocks)


def _claim_audio(fm: ForeignMetadata, what: str, fmt: str, aud: str) -> None:
    if fm.audio_block:
        raise ForeignError(f"invalid {what} metadata: multiple {aud} chunks")
    if not fm.format_block:
        raise ForeignError(f"invalid {what} metadata: {aud} before {fmt}")
    fm.audio_block = len(fm.blocks)
