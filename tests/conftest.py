"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(jax.sharding.Mesh over 8 devices) are exercised without TPU hardware, per
the single-host multi-device simulation strategy (SURVEY.md §4).
"""

import os
import subprocess
from pathlib import Path

# Tests are CPU-only by design (the real-TPU path is exercised by bench.py).
# The axon TPU plugin is registered by a sitecustomize.py at interpreter
# startup whenever /root/.axon_site is on PYTHONPATH, it overrides
# JAX_PLATFORMS=cpu, and its backend init hangs indefinitely at jax.devices()
# when its network tunnel is unreachable. Three defenses, all needed:
os.environ["JAX_PLATFORMS"] = "cpu"

# 1. for THIS process: deregister the already-registered plugin before the
#    first backend init. sitecustomize already imported jax to register it,
#    so jax's config captured JAX_PLATFORMS=axon at interpreter startup and
#    the env write above is too late for it — update the live config too.
try:  # pragma: no cover - only present under the axon environment
    from jax._src import xla_bridge as _xb

    if "axon" in _xb._backend_factories:
        _xb._backend_factories.pop("axon")
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# 2. for every subprocess the tests spawn: strip the sitecustomize dir from
#    PYTHONPATH (keeping the repo importable) and drop the plugin trigger env
import sys  # noqa: E402

sys.path = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
     if p and ".axon_site" not in p]
    + [str(Path(__file__).resolve().parent.parent)])
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize's gate
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if jax.devices()[0].platform != "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

# persistent compilation cache: the suite compiles many (level, blocksize,
# channels, bps) encoder variants; reruns should not pay that again.
# Keyed per machine feature set — loading an executable cached by a
# different machine can segfault (see flac_tpu/jaxcache.py). The 30 s
# threshold caches only the expensive encoder builds: XLA:CPU's executable
# (de)serializer has segfaulted on some of the many small per-stream
# decoder variants, and those recompile in seconds anyway.
from flac_tpu.jaxcache import enable as _enable_jax_cache  # noqa: E402

_enable_jax_cache(min_compile_secs=30.0)

# The XLA:CPU compile crash (docs/flaky.md mode 3) is PINNED to
# vm.max_map_count exhaustion: a compile-heavy worker accumulates ~13 mmap
# regions per retained executable plus LLVM's transient compile-peak maps,
# trips the default 65530 ceiling, and XLA segfaults (or raises
# MemoryError) instead of erroring on the ENOMEM
# (tools/repro_xla_maps.py --pin reproduces it deterministically). The box
# has >100 GB free RAM; raising the sysctl is the actual fix. Root-only
# and best-effort — the crash-rerun rescheduler below stays as a belt for
# unprivileged environments.
try:  # pragma: no cover - environment setup
    with open("/proc/sys/vm/max_map_count") as _f:
        _mmc = int(_f.read())
    if _mmc < 1048576:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("1048576")
except (OSError, ValueError):
    pass


def cpu_devices():
    return jax.devices("cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
ORACLE_SCRIPT = REPO_ROOT / "tools" / "build_reference_oracle.sh"


def _build_oracle() -> Path | None:
    """Build (or locate) the reference `flac` binary used as differential oracle."""
    out = Path(os.environ.get("ORACLE_DIR", "/tmp/flacoracle"))
    if (out / "flac").exists():
        return out / "flac"
    try:
        r = subprocess.run(["bash", str(ORACLE_SCRIPT)], capture_output=True, text=True,
                           timeout=300)
        if r.returncode == 0:
            return Path(r.stdout.strip().splitlines()[-1])
    except Exception:
        pass
    return None


_ORACLE = None
_ORACLE_TRIED = False


def oracle_path() -> Path | None:
    global _ORACLE, _ORACLE_TRIED
    if not _ORACLE_TRIED:
        _ORACLE = _build_oracle()
        _ORACLE_TRIED = True
    return _ORACLE


@pytest.fixture(scope="session")
def oracle():
    """Path to the reference flac binary; skips the test when unavailable."""
    p = oracle_path()
    if p is None:
        pytest.skip("reference flac oracle not available")
    return p


@pytest.fixture(scope="session")
def metaflac_oracle():
    p = oracle_path()
    mf = p.parent / "metaflac" if p else None
    if mf is None or not mf.exists():
        pytest.skip("reference metaflac oracle not available")
    return mf


def make_signal(n: int, channels: int, bps: int, seed: int = 0, kind: str = "sine") -> np.ndarray:
    """Deterministic test signals in the spirit of the reference's test_streams
    generator (src/test_streams/main.c:217-967)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    amp = (1 << (bps - 1)) - 1
    out = np.zeros((n, channels), dtype=np.int32)
    for c in range(channels):
        if kind == "sine":
            f1, f2 = 441.0 * (c + 1), 1234.5 + 100 * c
            x = 0.6 * np.sin(2 * np.pi * f1 * t / 44100) + 0.3 * np.sin(2 * np.pi * f2 * t / 44100)
            out[:, c] = np.round(x * amp * 0.8).astype(np.int32)
        elif kind == "noise":
            out[:, c] = rng.integers(-amp - 1, amp + 1, size=n, dtype=np.int64).astype(np.int32)
        elif kind == "quiet":  # low-amplitude correlated signal, LPC-friendly
            x = np.cumsum(rng.normal(0, 30, size=n))
            out[:, c] = np.clip(np.round(x), -amp - 1, amp).astype(np.int32)
        elif kind == "constant":
            out[:, c] = (c * 1000 - 7)
        elif kind == "wasted":  # all samples share trailing zero bits
            x = rng.integers(-(amp >> 4), (amp >> 4), size=n, dtype=np.int64) << 4
            out[:, c] = x.astype(np.int32)
        else:
            raise ValueError(kind)
    return out


# -- xdist crash retry --------------------------------------------------------
# XLA:CPU's compiler segfaults flakily after many large compilations in one
# process (a different test each run; minimal-repro attempts are logged in
# docs/flaky.md). When a worker dies, reschedule its test once on a fresh
# worker instead of reporting a phantom failure — loudly, so a crash can
# never silently reduce coverage.
_crash_retried: set = set()


def pytest_handlecrashitem(crashitem, report, sched):
    if crashitem not in _crash_retried:
        _crash_retried.add(crashitem)
        try:
            sched.mark_test_pending(crashitem)
        except NotImplementedError:
            return  # scheduler can't reschedule: keep the failure report
        report.outcome = "rerun"
        sys.stderr.write(
            f"\n[conftest] xdist worker CRASHED on {crashitem}; "
            f"rescheduled once on a fresh worker "
            f"(crash-rerun #{len(_crash_retried)} this session)\n")
    else:
        sys.stderr.write(
            f"\n[conftest] xdist worker crashed AGAIN on {crashitem}; "
            f"reporting the failure (no second rerun)\n")


# Crash-rerun BUDGET: the rescheduler absorbs the known XLA:CPU compile
# flake (docs/flaky.md — pinned to vm.max_map_count exhaustion by
# tools/repro_xla_maps.py), but it must never normalize a real regression:
# more than this many worker crashes in one run fails the run even if
# every rerun passed.
_CRASH_RERUN_BUDGET = 4


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if _crash_retried:
        terminalreporter.write_sep(
            "=", f"xdist crash-reruns: {len(_crash_retried)}"
                 f" (budget {_CRASH_RERUN_BUDGET})", yellow=True)
        for item in sorted(_crash_retried):
            terminalreporter.write_line(f"  crashed+rescheduled: {item}")
        terminalreporter.write_line(
            "  (XLA:CPU flaky compile crash — see docs/flaky.md; a rerun "
            "pass rescheduled each exactly once)")


def pytest_sessionfinish(session, exitstatus):
    if len(_crash_retried) > _CRASH_RERUN_BUDGET and session.exitstatus == 0:
        session.exitstatus = 1
        sys.stderr.write(
            f"\n[conftest] {len(_crash_retried)} crash-reruns exceed the "
            f"budget of {_CRASH_RERUN_BUDGET}: failing the run — this is "
            "beyond the known flake's rate (docs/flaky.md)\n")
