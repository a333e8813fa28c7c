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
find the round-2 traffic bugs), so each op is timed by summing its own XLA
module's device-plane events over a counted iteration window (the 'XLA
Modules' line only — 'XLA Ops' duplicates the same time — and filtered by
module name so the sync readback's reshape/copy don't pollute the sum; an
in-run elementwise control op validates the method against known traffic).

Run on the TPU: python tools/fused_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from causal_gen_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()  # per-host fingerprinted dir (poisoned-cache fix)

import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.ops.fused_block import (
    flat_to_nhwc,
    fused_light_block,
    nhwc_to_flat,
    pack_weights,
)

HBM_GBPS = 680.0  # measured effective elementwise bandwidth on this chip


def per_op_ms(f, x, iters=20, tag="op"):
    """Device ms/iter via the chip's own tracer (tools/device_time.py).

    The chained-dispatch wall-clock methodology is a liar here (see module
    docstring); device-plane module durations are contention- and
    tunnel-latency-free.
    """
    from tools.device_time import device_ms_per_iter

    def probe_target(z):
        return f(z)

    g = jax.jit(probe_target)
    holder = {"y": x}

    def dispatch(i):
        holder["y"] = g(holder["y"])
        return holder["y"]

    return device_ms_per_iter(dispatch, iters=iters,
                              module_prefix="probe_target", tag=tag)


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
        print(f"exactness done (err={err:.2e}); timing plain...", flush=True)
        t_plain = per_op_ms(body, x, tag="plain")
        print(f"plain {t_plain:.3f} ms; timing fused...", flush=True)
        t_fused = per_op_ms(fused, xf, tag="fused")
        print(f"fused {t_fused:.3f} ms; timing transpose...", flush=True)
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
