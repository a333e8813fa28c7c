"""Persistent XLA compilation cache setup.

Big-config compiles through the tunneled backend take 20-40 minutes; the
persistent cache makes warm reruns start in seconds. Called by every CLI
entry point (the reference has no equivalent — torch eager doesn't pay
whole-program compiles).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def setup_compilation_cache(path: str | None = None) -> str:
    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
