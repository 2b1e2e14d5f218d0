"""Analysis mode (`flac -a`) — emits the same human-readable per-frame /
per-subframe dump as src/flac/analyze.c:54-150, so outputs can be diffed
against the reference binary's `.ana` files."""

from __future__ import annotations

import numpy as np

from flac_tpu import constants as C
from flac_tpu.decode.host_decoder import FrameInfo, SubframeInfo

SUBFRAME_TYPE_STRING = {
    C.SUBFRAME_TYPE_CONSTANT: "CONSTANT",
    C.SUBFRAME_TYPE_VERBATIM: "VERBATIM",
    C.SUBFRAME_TYPE_FIXED: "FIXED",
    C.SUBFRAME_TYPE_LPC: "LPC",
}
CHANNEL_ASSIGNMENT_STRING = {
    C.CHANNEL_ASSIGNMENT_INDEPENDENT: "INDEPENDENT",
    C.CHANNEL_ASSIGNMENT_LEFT_SIDE: "LEFT_SIDE",
    C.CHANNEL_ASSIGNMENT_RIGHT_SIDE: "RIGHT_SIDE",
    C.CHANNEL_ASSIGNMENT_MID_SIDE: "MID_SIDE",
}


def analyze_frame(frame: FrameInfo, frame_number: int, out,
                  residual_text: bool = False) -> None:
    out.write("frame=%u\toffset=%u\tbits=%u\tblocksize=%u\tsample_rate=%u\t"
              "channels=%u\tchannel_assignment=%s\n"
              % (frame_number, frame.offset, frame.size * 8, frame.blocksize,
                 frame.sample_rate, frame.channels,
                 CHANNEL_ASSIGNMENT_STRING[frame.channel_assignment]))
    for ch, sf in enumerate(frame.subframes):
        _analyze_subframe(sf, ch, frame.blocksize, out, residual_text)


def _analyze_subframe(sf: SubframeInfo, channel: int, blocksize: int, out,
                      residual_text: bool) -> None:
    out.write("\tsubframe=%u\twasted_bits=%u\ttype=%s"
              % (channel, sf.wasted_bits, SUBFRAME_TYPE_STRING[sf.type]))
    if sf.type == C.SUBFRAME_TYPE_CONSTANT:
        out.write("\tvalue=%d\n" % sf.constant_value)
        return
    if sf.type == C.SUBFRAME_TYPE_VERBATIM:
        out.write("\n")
        return
    rtype = "RICE2" if sf.is_rice2 else "RICE"
    if sf.type == C.SUBFRAME_TYPE_FIXED:
        out.write("\torder=%u\tresidual_type=%s\tpartition_order=%u\n"
                  % (sf.order, rtype, sf.partition_order))
    else:  # LPC
        out.write("\torder=%u\tqlp_coeff_precision=%u\tquantization_level=%d\t"
                  "residual_type=%s\tpartition_order=%u\n"
                  % (sf.order, sf.qlp_precision, sf.quantization_level,
                     rtype, sf.partition_order))
        for i, qc in enumerate(sf.qlp_coeff):
            out.write("\t\tqlp_coeff[%u]=%d\n" % (i, qc))
    for i, w in enumerate(sf.warmup):
        out.write("\t\twarmup[%u]=%d\n" % (i, w))
    for i, (param, raw) in enumerate(zip(sf.rice_params, sf.raw_bits)):
        if param < 0:
            out.write("\t\tparameter[%u]=ESCAPE, raw_bits=%u\n" % (i, raw))
        else:
            out.write("\t\tparameter[%u]=%u\n" % (i, param))
    if residual_text and sf.residual is not None:
        for i, r in enumerate(np.asarray(sf.residual)):
            out.write("\t\tresidual[%u]=%d\n" % (i, r))


class ResidualStats:
    """Residual distribution statistics for --residual-gnuplot — the analog
    of analyze.c's subframe_stats_t / dump_stats (analyze.c:181-240): a
    residual-value histogram plus mean/stddev markers, written as a gnuplot
    script with inline data."""

    def __init__(self) -> None:
        self.counts: dict[int, int] = {}
        self.n = 0
        self.sum = 0.0
        self.sos = 0.0

    def update(self, residual) -> None:
        vals, cnts = np.unique(np.asarray(residual), return_counts=True)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            self.counts[v] = self.counts.get(v, 0) + c
        self.n += int(cnts.sum())
        self.sum += float(np.sum(np.asarray(residual, np.float64)))
        self.sos += float(np.sum(np.asarray(residual, np.float64) ** 2))

    def merge(self, other: "ResidualStats") -> None:
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.n += other.n
        self.sum += other.sum
        self.sos += other.sos

    def dump(self, filename: str) -> None:
        if self.n == 0:
            return
        mean = self.sum / self.n
        var = max(self.sos / self.n - mean * mean, 0.0)
        s = var ** 0.5
        peak = max(self.counts.values())
        with open(filename, "w") as f:
            f.write("plot '-' title 'PDF', '-' title 'mean' with impulses, "
                    "'-' title '1-stddev' with histeps, '-' title '2-stddev' "
                    "with histeps, '-' title '3-stddev' with histeps, "
                    "'-' title '4-stddev' with histeps, '-' title '5-stddev' "
                    "with histeps, '-' title '6-stddev' with histeps\n")
            for v in sorted(self.counts):
                f.write("%d %u\n" % (v, self.counts[v]))
            f.write("e\n")
            f.write("%f %f\ne\n" % (mean, float(peak)))
            for k in range(1, 7):
                h = peak * (0.9 - 0.1 * k)
                f.write("%f %f\n%f %f\ne\n" % (mean - k * s, h, mean + k * s, h))
