"""Aggregate per-op device time from a JAX profiler xplane trace.

Usage: python tools/parse_xplane.py /tmp/jaxtrace [top_n]
Prints the top-N XLA ops by total device time on the TPU plane — the tool
behind the encode/decode stage attributions in docs/perf.md (the bundled
tensorboard plugin's converter is incompatible with the installed TF, so
this reads the XSpace proto directly).
"""

import collections
import glob
import sys


def main() -> None:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        tot = collections.Counter()
        cnt = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue  # the per-op line; others double-count
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                tot[name] += dur
                cnt[name] += 1
                plane_total += dur
        if not tot:
            continue
        print(f"== plane: {plane.name}  (sum of line-event time {plane_total:.1f} ms,"
              f" lines: {[l.name for l in plane.lines]})")
        for name, ms in tot.most_common(top_n):
            print(f"  {ms:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
