"""flactimer equivalent (src/utils/flactimer/main.cpp): run a command and
report wall/CPU time — handy for timing codec runs.

Usage: python -m flac_tpu.cli.flactimer <command> [args...]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: flactimer <command> [args...]", file=sys.stderr)
        return 1
    t0 = time.perf_counter()
    c0 = time.process_time()
    r0 = os.times()
    proc = subprocess.run(argv)
    r1 = os.times()
    wall = time.perf_counter() - t0
    child_cpu = (r1.children_user - r0.children_user) + (r1.children_system - r0.children_system)
    print(f"real time  = {wall:.3f} s", file=sys.stderr)
    print(f"cpu time   = {child_cpu:.3f} s (child user+sys)", file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
