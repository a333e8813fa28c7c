"""Microbenchmark: space-to-depth conv reparameterization on the real chip.

The ukbb192/mimic192 "light" blocks run 3x3 convs with 8-64 channels at
96-192^2 — contraction and output dims far below the 128-lane MXU, which is
the diagnosed MFU ceiling (RESULTS.md "trace-driven push"). An exact
reparameterization packs 2x2 spatial phases into channels:

    x (B,H,W,C) -> P (B,H/2,W/2,4C)   [reshape+transpose, a permutation]
    conv3x3(Ci->Co) on x  ==  conv3x3(4Ci->4Co) on P with a sparse kernel
    built from the compact (3,3,Ci,Co) weights (4x FLOPs, but both matmul
    dims 4x wider -> up to ~4x MXU time win when Ci,Co << 128).

This probe measures the full "light" block body (relu-conv-relu-conv +
residual) plain vs STAGE-PACKED (pack/unpack fully amortized out of the
loop) for the exact shapes the ukbb192/mimic192 steps run, checks f32
equivalence, and reports the HBM traffic floor for context.

MEASURED VERDICT (v5e, see RESULTS.md "space-to-depth pay-or-retire"):
stage-packed loses 2-2.5x at every shape, because the plain light block
already runs AT its HBM traffic floor — the narrow channels cost no
bandwidth (measured ~680 GB/s effective at C=8 and C=128 alike) and XLA's
conv lowering already folds kernel spatial into the contraction, so the 4x
FLOP inflation buys nothing. ops/s2d.py is kept as the validated-exact
reparameterization + this probe as the evidence; it is NOT wired into the
model.

Timing methodology: dispatches through the tunneled runtime pipeline
asynchronously and block_until_ready can return optimistically, so
back-to-back independent calls under-measure wildly (we measured a
"46 TB/s" elementwise op that way). This probe therefore (a) CHAINS the op
(y = f(y)) so device execution serializes, and (b) times by DIFFERENCE
(N+1 calls minus 1 call) so per-dispatch tunnel latency cancels.

Run on the TPU:  python tools/s2d_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from causal_gen_tpu.ops.s2d import (
    pack_kernel_3x3,
    pack_space_to_depth,
    unpack_depth_to_space,
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


def make_bodies(rng, h, ci, cb, dtype):
    w1 = jnp.asarray(
        rng.standard_normal((3, 3, ci, cb), dtype=np.float32) / np.sqrt(9 * ci),
        dtype,
    )
    w2 = jnp.asarray(
        rng.standard_normal((3, 3, cb, ci), dtype=np.float32) / np.sqrt(9 * cb),
        dtype,
    )
    dn = jax.lax.conv_dimension_numbers(
        (1, h, h, ci), w1.shape, ("NHWC", "HWIO", "NHWC")
    )
    conv = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn
    )

    def body(x):  # the "light" block body (blocks.py Block version="light")
        out = jax.nn.relu(x)
        out = conv(out, w1)
        out = jax.nn.relu(out)
        out = conv(out, w2)
        return x + out

    wp1, wp2 = pack_kernel_3x3(w1), pack_kernel_3x3(w2)

    def body_packed(p):  # same block, input/output stay in packed layout
        out = jax.nn.relu(p)
        out = conv(out, wp1)
        out = jax.nn.relu(out)
        out = conv(out, wp2)
        return p + out

    return jax.jit(body), jax.jit(body_packed)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    cases = [  # (B, H, width, bottleneck) — the ukbb192/mimic192 hot stages
        (128, 192, 32, 8),
        (128, 96, 64, 16),
        (128, 48, 96, 24),
    ]
    for (b, h, ci, cb) in cases:
        x32 = rng.standard_normal((b, h, h, ci), dtype=np.float32)
        body32, packed32 = make_bodies(rng, h, ci, cb, jnp.float32)
        y0 = body32(jnp.asarray(x32))
        y1 = unpack_depth_to_space(packed32(pack_space_to_depth(jnp.asarray(x32))))
        err = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-9))

        x = jnp.asarray(x32, jnp.bfloat16)
        body, body_packed = make_bodies(rng, h, ci, cb, jnp.bfloat16)
        p = pack_space_to_depth(x)
        t_plain = per_op_ms(body, x)
        t_packed = per_op_ms(body_packed, p)
        # traffic floor: read x (conv1), write+read bottleneck, write out,
        # read x again (residual) — relu/add fuse into the convs
        bytes_total = (3 * b * h * h * ci + 2 * b * h * h * cb) * 2
        floor_ms = bytes_total / (HBM_GBPS * 1e6)
        print(
            f"lightblock {b}x{h}^2 w={ci} bneck={cb}: plain {t_plain:.3f} ms "
            f"(traffic floor {floor_ms:.3f}), stage-packed {t_packed:.3f} ms "
            f"({t_plain / t_packed:.2f}x) f32 err {err:.1e}"
        )


if __name__ == "__main__":
    main()
