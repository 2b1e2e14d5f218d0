"""Time/position specification parsing for --skip/--until/--cue — the analog
of src/flac/utils.c:54-290 (parse_skip_until_specification,
parse_cue_specification and their canonicalizers)."""

from __future__ import annotations

import re
from dataclasses import dataclass

from flac_tpu.metadata import CueSheet


@dataclass
class SkipUntilSpec:
    is_relative: bool = False
    value_is_samples: bool = True
    samples: int = 0
    seconds: float = 0.0

    def canonicalize(self, sample_rate: int) -> "SkipUntilSpec":
        if not self.value_is_samples:
            self.samples = int(self.seconds * sample_rate)
            self.value_is_samples = True
        return self


def parse_skip_until(s: str) -> SkipUntilSpec:
    """[+|-] (samplenumber | mm:ss.sss) — utils.c:170."""
    spec = SkipUntilSpec()
    neg = False
    if s.startswith("-"):
        neg = spec.is_relative = True
        s = s[1:]
    elif s.startswith("+"):
        spec.is_relative = True
        s = s[1:]
    if re.fullmatch(r"\d+", s):
        spec.samples = -int(s) if neg else int(s)
        return spec
    m = re.fullmatch(r"(\d+):(\d*[.,]?\d*)", s)
    if not m or not m.group(2):
        raise ValueError(f"invalid time specification {s!r}")
    seconds = int(m.group(1)) * 60.0 + float(m.group(2).replace(",", "."))
    spec.value_is_samples = False
    spec.seconds = -seconds if neg else seconds
    return spec


def resolve_skip_until(skip_s: str | None, until_s: str | None, sample_rate: int,
                       total_samples: int) -> tuple[int, int]:
    """Returns absolute (skip, until) sample positions following the
    reference's canonicalization rules (encode.c:1088-1143): --until may be
    +N (relative to skip) or -N (relative to end-of-stream)."""
    skip = 0
    if skip_s:
        sp = parse_skip_until(skip_s)
        if sp.is_relative:
            raise ValueError("--skip cannot be relative")
        sp.canonicalize(sample_rate)
        skip = sp.samples
    until = total_samples
    if until_s:
        up = parse_skip_until(until_s).canonicalize(sample_rate)
        if up.is_relative:
            until = (skip + up.samples) if up.samples >= 0 else (total_samples + up.samples)
        else:
            until = up.samples
    if not (0 <= skip <= total_samples):
        raise ValueError("--skip is past the end of input")
    if until < skip or until > total_samples:
        raise ValueError("--until is out of range")
    return skip, until


@dataclass
class CueSpec:
    has_start: bool = False
    start_track: int = 0
    start_index: int = 0
    has_end: bool = False
    end_track: int = 0
    end_index: int = 0


def parse_cue(s: str) -> CueSpec:
    """"[#.#][-[#.#]]" track.index ranges — utils.c:220."""
    spec = CueSpec()

    def parse_point(p: str) -> tuple[int, int]:
        m = re.fullmatch(r"(\d+)(?:\.(\d+))?", p)
        if not m:
            raise ValueError(f"invalid cue point {p!r}")
        return int(m.group(1)), int(m.group(2) or 1)

    if "-" in s:
        start_s, end_s = s.split("-", 1)
    else:
        start_s, end_s = s, ""
    if start_s:
        spec.start_track, spec.start_index = parse_point(start_s)
        spec.has_start = True
    if end_s:
        spec.end_track, spec.end_index = parse_point(end_s)
        spec.has_end = True
    return spec


def _find_closest_cue(cs: CueSheet, track: int, index: int, total_samples: int,
                      look_forward: bool) -> int:
    """local__find_closest_cue_ (utils.c:121)."""
    if look_forward:
        for t in cs.tracks:
            for ix in t.indices:
                if t.number > track or (t.number == track and ix.number >= index):
                    return t.offset + ix.offset
        return total_samples
    for t in reversed(cs.tracks):
        for ix in reversed(t.indices):
            if t.number < track or (t.number == track and ix.number <= index):
                return t.offset + ix.offset
    return 0


def resolve_cue(spec: CueSpec, cuesheet: CueSheet, total_samples: int) -> tuple[int, int]:
    skip = (_find_closest_cue(cuesheet, spec.start_track, spec.start_index,
                              total_samples, False) if spec.has_start else 0)
    until = (_find_closest_cue(cuesheet, spec.end_track, spec.end_index,
                               total_samples, True) if spec.has_end else total_samples)
    return skip, until
