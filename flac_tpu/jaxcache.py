"""Persistent JAX compilation-cache configuration.

The cache directory is keyed by the host's CPU feature set: XLA:CPU
executables are compiled for the build machine's ISA extensions, and
deserializing an executable cached by a DIFFERENT machine can SIGILL or
segfault outright (cpu_aot_loader machine-feature mismatch). A per-feature-
set directory makes foreign entries unreachable instead of fatal.
"""

from __future__ import annotations

import hashlib
import os


def cache_dir(base: str = "/tmp/jaxcache-flac-tpu") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = hashlib.sha256(line.encode()).hexdigest()[:12]
                    break
            else:
                key = "nocpuflags"
    except OSError:
        key = "nocpuinfo"
    return f"{base}-{key}"


def enable(min_compile_secs: float = 1.0) -> None:
    """Point JAX's persistent compilation cache at the per-machine dir."""
    import jax

    path = cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
