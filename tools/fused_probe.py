#!/usr/bin/env python
"""One-block probe of the VMEM cross-conv fusion ceiling (VERDICT r2 item 6).

RESULTS.md's space-to-depth retirement left one lever open: the plain light
block runs AT its HBM traffic floor (3C+2b channel-bytes/pixel), so the only
way down is to move fewer bytes — fuse both convs in one kernel and hold the
bottleneck mid tensor + residual operand in VMEM (2C bytes/pixel, ~1.75x
ceiling at C=32,b=8). ops/fused_block.py implements that kernel (rolling-DMA
rows, batch-on-lanes layout); this probe measures it against the plain XLA
body on the exact ukbb192/mimic192 hot shapes, prices the NHWC->flat layout
boundary separately, and verifies f32 exactness on-chip.

Timing: PROFILER-DERIVED device time. Wall-clock through the tunneled
runtime is untrustworthy at sub-ms scale — both block_until_ready and
1-element readbacks produced "measurements" 5-7x below the op's own HBM
traffic floor (see /tmp/fused_probe*.log history): the tunnel pipelines
chained dispatches and acks readbacks optimistically. jax.profiler traces
record on-device op durations (the same xplane source tools/mfu.py used to
find the round-2 traffic bugs), so each op is timed by summing its device
plane events over a counted iteration window.

Run on the TPU: python tools/fused_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.ops.fused_block import (
    flat_to_nhwc,
    fused_light_block,
    nhwc_to_flat,
    pack_weights,
)

HBM_GBPS = 680.0  # measured effective elementwise bandwidth on this chip


def _sync(y):
    # host readback: forces the chain to complete before the trace closes
    return float(np.asarray(jax.device_get(y.reshape(-1)[0])))


def _device_ms(trace_dir: str) -> float:
    """Total device-plane op time (ms) recorded under trace_dir."""
    from tools.trace_ops import load_xspaces

    total_ps = 0
    for xs in load_xspaces(trace_dir):
        for plane in xs.planes:
            if "TPU" not in plane.name or "Host" in plane.name:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                if line.name.startswith("Steps"):
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    if md is None or not md.name:
                        continue
                    total_ps += ev.duration_ps
    return total_ps / 1e9


def per_op_ms(f, x, iters=20, tag="op"):
    """Device ms/iter from a profiler trace over a counted window.

    The chained-dispatch wall-clock methodology is a liar here (see module
    docstring); device-plane event durations are measured by the chip's own
    tracer and are contention- and tunnel-latency-free.
    """
    import shutil
    import tempfile

    y = x
    for _ in range(3):
        y = f(y)
    _sync(y)
    best = float("inf")
    for _ in range(2):  # two windows; device time should be stable
        tdir = tempfile.mkdtemp(prefix=f"fused_probe_{tag}_")
        try:
            with jax.profiler.trace(tdir):
                y = x
                for _ in range(iters):
                    y = f(y)
                _sync(y)
            best = min(best, _device_ms(tdir) / iters)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    wc = int(os.environ.get("FUSED_WC", "8"))
    cases = [  # (B, H, width, bottleneck) — the ukbb192/mimic192 hot stages
        (128, 192, 32, 8),
        (128, 96, 64, 16),
    ]
    for (b, h, ci, cb) in cases:
        w1 = jnp.asarray(
            rng.standard_normal((3, 3, ci, cb)) / np.sqrt(9 * ci), jnp.float32)
        w2 = jnp.asarray(
            rng.standard_normal((3, 3, cb, ci)) / np.sqrt(9 * cb), jnp.float32)
        dn = jax.lax.conv_dimension_numbers(
            (b, h, h, ci), w1.shape, ("NHWC", "HWIO", "NHWC"))

        def make_plain(w1c, w2c):
            conv = lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn)

            def body(x):
                out = jax.nn.relu(x)
                out = conv(out, w1c)
                out = jax.nn.relu(out)
                out = conv(out, w2c)
                return x + out

            return jax.jit(body)

        # f32 on-chip exactness at reduced H=W=96 (f32 rings scale with W and
        # exceed VMEM at W=192; B must stay 128 for lane alignment).
        # Full-shape exactness lives in tests/test_fused_block.py interpret
        # mode — this checks the MOSAIC lowering on the real chip.
        h_chk = 96
        x32 = jnp.asarray(rng.standard_normal((b, h_chk, h_chk, ci)),
                          jnp.float32)
        t1f, t2f = pack_weights(w1, w2)
        dn_chk = jax.lax.conv_dimension_numbers(
            (b, h_chk, h_chk, ci), w1.shape, ("NHWC", "HWIO", "NHWC"))
        conv_chk = lambda v, w: jax.lax.conv_general_dilated(
            v, w, (1, 1), "SAME", dimension_numbers=dn_chk)
        y_ref = x32 + conv_chk(
            jax.nn.relu(conv_chk(jax.nn.relu(x32), w1)), w2)
        y_fused = flat_to_nhwc(
            fused_light_block(nhwc_to_flat(x32), t1f, t2f, B=b, WC=wc), b)
        err = float(jnp.max(jnp.abs(y_ref - y_fused))
                    / (jnp.max(jnp.abs(y_ref)) + 1e-9))

        # bf16 timing
        x = x32.astype(jnp.bfloat16)
        xf = nhwc_to_flat(x)
        w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
        t1, t2 = pack_weights(w1b, w2b)
        body = make_plain(w1b, w2b)
        fused = jax.jit(lambda z: fused_light_block(z, t1, t2, B=b, WC=wc))
        to_flat = jax.jit(nhwc_to_flat)
        t_plain = per_op_ms(body, x, tag="plain")
        t_fused = per_op_ms(fused, xf, tag="fused")
        t_trans = per_op_ms(
            lambda z: to_flat(flat_to_nhwc(z, b)), xf, tag="trans") / 2

        # control: elementwise op with known traffic (read+write = 2x nbytes)
        # validates both the tracer and the HBM_GBPS constant in-run
        ctrl = jax.jit(lambda z: z + jnp.bfloat16(1.0))
        t_ctrl = per_op_ms(ctrl, x, tag="ctrl")
        ctrl_gbps = 2 * x.size * 2 / (t_ctrl * 1e6) if t_ctrl > 0 else 0.0

        n_px = b * h * h
        floor_plain = (3 * ci + 2 * cb) * n_px * 2 / (HBM_GBPS * 1e6)
        floor_fused = 2 * ci * n_px * 2 / (HBM_GBPS * 1e6)
        print(json.dumps({
            "case": f"{b}x{h}^2 w={ci} bneck={cb} (WC={wc})",
            "plain_ms": round(t_plain, 3),
            "plain_floor_ms": round(floor_plain, 3),
            "fused_ms": round(t_fused, 3),
            "fused_floor_ms": round(floor_fused, 3),
            "speedup": round(t_plain / t_fused, 3),
            "transpose_tax_ms_oneway": round(t_trans, 3),
            "ctrl_elementwise_gbps": round(ctrl_gbps, 1),
            "f32_rel_err": err,
        }))


if __name__ == "__main__":
    main()
