"""flacdiff equivalent (src/utils/flacdiff/main.cpp): locate the first byte
difference between two FLAC streams and report it with frame context from
each stream's frame index, for differential debugging.

Usage: python -m flac_tpu.cli.flacdiff a.flac b.flac
"""

from __future__ import annotations

import sys

import numpy as np


def first_difference(a: bytes, b: bytes) -> int | None:
    n = min(len(a), len(b))
    av = np.frombuffer(a[:n], np.uint8)
    bv = np.frombuffer(b[:n], np.uint8)
    diff = np.flatnonzero(av != bv)
    if len(diff):
        return int(diff[0])
    return None if len(a) == len(b) else n


def frame_context(data: bytes, offset: int) -> str:
    """Describe where `offset` falls: metadata region or frame number."""
    try:
        from flac_tpu.decode.host_decoder import HostDecoder
        dec = HostDecoder(data, check_md5=False)
    except Exception:
        return "(unparseable stream)"
    if offset < dec.audio_offset:
        return f"in metadata (audio starts at {dec.audio_offset})"
    pos = dec.audio_offset
    fno = 0
    while pos <= offset:
        try:
            _pcm, fi = dec.decode_frame_at(pos)
        except Exception:
            return f"in frame ~{fno} (frame parse failed at {pos})"
        if pos + fi.size > offset:
            return (f"in frame {fno} (frame offset {pos}, byte {offset - pos} "
                    f"of {fi.size})")
        pos += fi.size
        fno += 1
    return "past last frame"


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("usage: flacdiff <file1.flac> <file2.flac>", file=sys.stderr)
        return 1
    with open(argv[0], "rb") as f:
        a = f.read()
    with open(argv[1], "rb") as f:
        b = f.read()
    off = first_difference(a, b)
    if off is None:
        print(f"files are identical ({len(a)} bytes)")
        return 0
    print(f"first difference at byte {off} (0x{off:x})")
    print(f"  {argv[0]}: {frame_context(a, off)}")
    print(f"  {argv[1]}: {frame_context(b, off)}")
    if len(a) != len(b):
        print(f"  sizes differ: {len(a)} vs {len(b)}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
