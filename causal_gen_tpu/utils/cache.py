"""Persistent XLA compilation cache setup.

Big-config compiles through the tunneled backend take 20-40 minutes; the
persistent cache makes warm reruns start in seconds. Called by every CLI
entry point (the reference has no equivalent — torch eager doesn't pay
whole-program compiles).

The cache directory is keyed by a HOST FINGERPRINT (CPU feature flags +
jax version): XLA:CPU entries are AOT-compiled for the exact machine that
wrote them, and loading them on a different host emits
cpu_aot_loader.cc machine-feature-mismatch errors ("could lead to SIGILL")
— that poisoned-cache failure class nulled the round-4 driver bench
(BENCH_r04 rc=124). A per-host subdir means a run on a new machine starts
with an empty cache instead of a poisoned one.
"""

from __future__ import annotations

import hashlib
import os
import platform

import jax

_BASE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def host_fingerprint() -> str:
    """Stable id for this machine's compile target: CPU flags + jax version."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    ident = f"{platform.machine()}|{flags.strip()}|{jax.__version__}"
    return hashlib.sha1(ident.encode()).hexdigest()[:12]


def setup_compilation_cache(path: str | None = None) -> str:
    base = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _BASE_DIR
    cache_dir = os.path.join(base, host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
