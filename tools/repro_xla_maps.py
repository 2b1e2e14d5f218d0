"""Minimal repro pinning the XLA:CPU compile flake to vm.max_map_count.

docs/flaky.md mode 3: long-lived compile-heavy processes segfault (or die
with `LLVM compilation error: Cannot allocate memory`) after ~100+ large
compilations, on a different test each run. Round 2 measured the
mechanism candidate — retained executables hold ~3 mmap regions each and
LLVM's JIT maps thousands transiently at compile peak, so a process
eventually trips the box-wide `vm.max_map_count` sysctl (65530 default
here), where mmap returns ENOMEM and XLA paths that don't check crash.

This tool makes that a DETERMINISTIC repro:

  measure mode (default, safe):
      python tools/repro_xla_maps.py
    compiles N distinct jitted functions in-process and prints the
    /proc/self/maps growth per retained executable.

  pin mode (root only; briefly lowers the sysctl for the whole box —
  do NOT run while a TPU client or test suite is active):
      python tools/repro_xla_maps.py --pin
    forks a child, lowers vm.max_map_count to (child's current maps +
    margin), runs the compile loop, and expects the child to die with
    the exact failure shape from docs/flaky.md (LLVM ENOMEM / SIGSEGV)
    within a bounded number of compiles; the original sysctl value is
    restored in a finally. Exit 0 = mechanism confirmed.

Upstream reporting is not possible from this environment (no network
egress); this repro plus docs/flaky.md IS the issue text to file:
"XLA:CPU segfaults instead of erroring when mmap returns ENOMEM under
vm.max_map_count pressure (LLVM JIT + retained executables)".
"""

from __future__ import annotations

import os
import subprocess
import sys

SYSCTL = "/proc/sys/vm/max_map_count"


def n_maps(pid="self") -> int:
    with open(f"/proc/{pid}/maps") as f:
        return sum(1 for _ in f)


def compile_loop(n: int, report_every: int = 25) -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        from jax._src import xla_bridge as _xb
        if "axon" in getattr(_xb, "_backend_factories", {}):
            _xb._backend_factories.pop("axon")
            import jax
            jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax
    import jax.numpy as jnp
    import numpy as np

    start = n_maps()
    print(f"maps at start: {start}", flush=True)
    kept = []
    x = jnp.arange(4096, dtype=jnp.float32)
    for i in range(n):
        k = i + 2  # distinct constant -> distinct executable, kept alive

        def f(v, k=k):
            return jnp.sort((v * k + jnp.roll(v, k)).reshape(64, 64),
                            axis=i % 2).sum()

        g = jax.jit(f)
        g(x).block_until_ready()
        kept.append(g)
        if (i + 1) % report_every == 0:
            cur = n_maps()
            print(f"after {i + 1:4d} compiles: {cur} maps "
                  f"(+{(cur - start) / (i + 1):.2f}/executable)", flush=True)
    cur = n_maps()
    print(f"RESULT: {n} retained executables grew the map count "
          f"{start} -> {cur} ({(cur - start) / n:.2f} maps/executable); "
          "LLVM's compile-peak transients come on top — a compile-heavy "
          "process monotonically approaches vm.max_map_count "
          f"({open(SYSCTL).read().strip()} on this box)", flush=True)


def _clean_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p)
    return env


def pin() -> int:
    if os.geteuid() != 0:
        sys.exit("--pin needs root (writes vm.max_map_count)")
    orig = open(SYSCTL).read().strip()
    # child's interpreter+jax baseline is ~1000-1500 maps; give it a little
    # headroom so ONLY a map-hungry process (the child mid-compile) can trip
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp\n"
         "jax.jit(lambda v: v + 1)(jnp.zeros(8)).block_until_ready()\n"
         "print(sum(1 for _ in open('/proc/self/maps')))"],
        capture_output=True, text=True, timeout=300, env=_clean_env())
    if not probe.stdout.strip():
        sys.exit(f"probe failed: {probe.stderr[-500:]}")
    base = int(probe.stdout.strip().splitlines()[-1])
    limit = base + 400
    print(f"child baseline {base} maps; lowering {SYSCTL} "
          f"{orig} -> {limit} for the repro window", flush=True)
    try:
        with open(SYSCTL, "w") as f:
            f.write(str(limit))
        r = subprocess.run(
            [sys.executable, __file__, "--loop", "400"],
            capture_output=True, text=True, timeout=900, env=_clean_env())
    finally:
        with open(SYSCTL, "w") as f:
            f.write(orig)
        print(f"restored {SYSCTL} = {orig}", flush=True)
    tail = (r.stdout + r.stderr)[-2000:]
    print("--- child tail ---\n" + tail)
    died_like_flake = (r.returncode != 0
                       and ("Cannot allocate memory" in tail
                            or "Segmentation fault" in tail
                            or r.returncode < 0))
    if died_like_flake:
        print(f"PINNED: child died (rc={r.returncode}) with the "
              "docs/flaky.md failure shape once map headroom ran out — "
              "the flake is vm.max_map_count exhaustion, not codec code")
        return 0
    print(f"NOT REPRODUCED under limit {limit} (rc={r.returncode}); "
          "raise --loop or lower the margin")
    return 1


def main() -> int:
    if "--pin" in sys.argv:
        return pin()
    n = 400
    if "--loop" in sys.argv:
        n = int(sys.argv[sys.argv.index("--loop") + 1])
    compile_loop(n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
