#!/usr/bin/env python
"""Profiler-derived device timing for micro-benchmarks on the tunneled TPU.

Wall-clock micro-timing through the tunneled runtime is untrustworthy:
dispatches pipeline, block_until_ready can return optimistically on
inference outputs, and windowed (N+1 minus 1) differences are biased LOW
under shared-pool contention (queue wait inflates the subtracted single-call
term; best-of-windows then selects exactly the most-biased window — that is
how an early counterfactual bench "measured" a physically impossible 85k
cf/s at 192 squared). Whole-epoch wall timing over many steps is fine; tens
of iterations are not.

Ground truth: the chip's own tracer. jax.profiler.trace records per-module
device durations on the 'XLA Modules' plane line. Caveats handled here:
- 'XLA Modules' and 'XLA Ops' lines EACH total the full window; never sum
  across lines (double count).
- The host-readback sync contributes its own modules (jit_reshape, copy);
  the measured callable is wrapped in a uniquely named function so only its
  module's events are summed.
Validation: an elementwise bf16 add control op measured this way hits the
chip's known ~680 GB/s effective HBM bandwidth (664 measured); the same op
wall-clocked through the tunnel reads 2-3x off in either direction.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def readback_sync(y) -> float:
    """1-element host readback: forces the dispatched chain to complete
    before a profiler trace closes (block_until_ready alone may not)."""
    flat = jax.tree_util.tree_leaves(y)[0]
    return float(np.asarray(jax.device_get(flat.reshape(-1)[0])))


def module_ms(trace_dir: str, module_prefix: str) -> float:
    """Total device ms of XLA modules named jit_<module_prefix>* in a trace."""
    from tools.trace_ops import load_xspaces

    total_ps = 0
    for xs in load_xspaces(trace_dir):
        for plane in xs.planes:
            if "TPU" not in plane.name or "Host" in plane.name:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    name = (md.display_name or md.name) if md else ""
                    if name.startswith(f"jit_{module_prefix}"):
                        total_ps += ev.duration_ps
    return total_ps / 1e9


def device_ms_per_iter(dispatch, iters: int = 10, windows: int = 2,
                       module_prefix: str = "", tag: str = "op") -> float:
    """Device ms per iteration of `dispatch(i) -> output`, best of windows.

    `dispatch` must enqueue exactly one execution of the jitted function
    whose XLA module name starts with jit_<module_prefix> (name the function
    before jax.jit — lambdas all collide on 'jit__lambda'). Device durations
    are contention-free (co-tenant work never appears in our trace), so two
    windows suffice; a zero-event window (tracer hiccup) is discarded.
    """
    assert module_prefix, "module_prefix is required (see docstring)"
    y = dispatch(0)
    readback_sync(y)
    best = float("inf")
    for w in range(windows):
        tdir = tempfile.mkdtemp(prefix=f"devtime_{tag}_")
        try:
            with jax.profiler.trace(tdir):
                for i in range(iters):
                    y = dispatch(1 + w * iters + i)
                readback_sync(y)
            ms = module_ms(tdir, module_prefix) / iters
            if ms > 0:
                best = min(best, ms)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
    if not np.isfinite(best):
        raise RuntimeError(
            f"no jit_{module_prefix} module events captured in any window"
        )
    return best
