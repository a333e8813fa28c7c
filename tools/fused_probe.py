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

Timing: chained (y=f(y)) + difference (N+1 minus 1) per the methodology note
in RESULTS.md. Run on the TPU: python tools/fused_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

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


def per_op_ms(f, x, iters=20):
    y = x
    for _ in range(3):
        y = f(y)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):  # best-of-windows (shared pool)
        t0 = time.perf_counter()
        y1 = f(x)
        jax.block_until_ready(y1)
        t1 = time.perf_counter() - t0
        y = x
        t0 = time.perf_counter()
        for _ in range(iters + 1):
            y = f(y)
        jax.block_until_ready(y)
        tn = time.perf_counter() - t0
        best = min(best, (tn - t1) / iters)
    return best * 1e3


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

        # f32 on-chip exactness first
        x32 = jnp.asarray(rng.standard_normal((b, h, h, ci)), jnp.float32)
        t1f, t2f = pack_weights(w1, w2)
        y_ref = make_plain(w1, w2)(x32)
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
        t_plain = per_op_ms(body, x)
        t_fused = per_op_ms(fused, xf)
        t_trans = per_op_ms(lambda z: to_flat(flat_to_nhwc(z, b)), xf) / 2

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
            "f32_rel_err": err,
        }))


if __name__ == "__main__":
    main()
