"""Fused "light" residual block as one Pallas kernel (the VMEM cross-conv
fusion probe RESULTS.md 'space-to-depth pay-or-retire' left open).

The light block body (models/blocks.py Block version="light"; reference
src/vae.py:33-84 'ukbb' variant) is

    y = x + conv3x3[b->C](relu(conv3x3[C->b](relu(x))))

XLA runs it as two conv customs at the HBM traffic floor: per pixel it moves
3C + 2b channel-bytes (read x, write+read the bottleneck mid, read x again
for the residual, write y). Fusing both convs in one kernel holds the mid
tensor and the residual operand in VMEM, cutting traffic to 2C — a
theoretical ~1.75x for (C=32, b=8).

Kernel design (TPU v5e, see tools/fused_probe.py for the measured verdict):
- Layout (H, C, W*B) with the batch innermost: B=128 exactly fills the lane
  dimension, so every w-window slice [w0*B : (w0+k)*B] is a lane-tile-aligned
  VMEM slice and no relayout is ever needed (ring slots ride the UNTILED
  leading dim — Mosaic rejects size-1 slices along a tiled dim). The probe
  measures the transpose tax from NHWC separately.
- A rolling window over H with manual DMA: 4-slot input ring and mid ring,
  2-slot output row buffer. Each input row is DMA'd from HBM exactly once
  (no halo re-reads), each output row written once — the kernel moves the
  theoretical minimum 2C bytes/pixel.
- Each conv as 9 accumulated MXU dots (one per kernel tap) directly on ring
  slices — zero patch-assembly copies, at the cost of K-padding (K=C_in pads
  to the 128-deep MXU pass: 4x effective FLOPs for conv1, 16x for conv2 —
  conv2's real FLOPs are 4x smaller so the padded cost is the same).
- Both ReLUs are applied on operand read; the residual add rides the conv2
  accumulator. Everything accumulates in f32 and stores bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_weights(w1: jax.Array, w2: jax.Array):
    """(3,3,C,b), (3,3,b,C) HWIO conv kernels -> per-tap dot operands
    (9,b,C), (9,C,b): wN_taps[s=dh*3+dw][co, ci] = wN[dh, dw, ci, co]."""
    t1 = jnp.transpose(w1.reshape(9, w1.shape[2], w1.shape[3]), (0, 2, 1))
    t2 = jnp.transpose(w2.reshape(9, w2.shape[2], w2.shape[3]), (0, 2, 1))
    return t1, t2


def _fused_light_block_kernel(
    x_hbm, w1_ref, w2_ref, y_hbm,  # ins/outs
    in_ring, mid_ring, out_buf, in_sem, out_sem,  # scratch
    *, C, CB, H, W, B, WC,
):
    """See module docstring. Ring pixel p lives at cols [(p+1)B, (p+2)B)
    (one zero-pad pixel each side); ring slot for row r is r mod 4 and rides
    the leading (untiled) dim of each ring buffer."""
    WB = W * B
    n_chunks = W // WC

    def in_dma(row):
        slot = jax.lax.rem(row, 4)
        return pltpu.make_async_copy(
            x_hbm.at[row], in_ring.at[slot, :, pl.ds(B, WB)],
            in_sem.at[slot],
        )

    def out_dma(row):
        slot = jax.lax.rem(row, 2)
        return pltpu.make_async_copy(
            out_buf.at[slot], y_hbm.at[row], out_sem.at[slot],
        )

    def conv_row(ring, w_ref, n_out, row0, write):
        """3x3 'SAME' conv producing output row row0 from ring rows
        row0-1..row0+1; write(w0, acc_f32) consumes each (n_out, WC*B)
        chunk. ReLU applied on read."""

        def chunk(wc, carry):
            w0 = wc * WC
            acc = jnp.zeros((n_out, WC * B), jnp.float32)
            for s in range(9):
                dh, dw = s // 3, s % 3
                slot = jax.lax.rem(row0 + dh - 1 + 4, 4)
                rhs = jnp.maximum(
                    ring[slot, :, pl.ds((w0 + dw) * B, WC * B)], 0
                )
                acc = acc + jax.lax.dot_general(
                    w_ref[s], rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            write(w0, acc)
            return carry

        jax.lax.fori_loop(0, n_chunks, chunk, 0)

    def mid_row(r):
        """mid(r) = conv1(relu(x rows r-1..r+1)) into mid ring slot r%4."""
        slot = jax.lax.rem(r, 4)

        def write(w0, acc):
            mid_ring[slot, :, pl.ds(B + w0 * B, WC * B)] = (
                acc.astype(mid_ring.dtype)
            )

        conv_row(in_ring, w1_ref, CB, r, write)

    # --- prologue ----------------------------------------------------------
    # zero the rings once: the W pads (cols [0,B) and [(W+1)B,(W+2)B)) stay
    # zero forever; slot 3 doubles as the virtual x(-1)/mid(-1) zero row.
    in_ring[...] = jnp.zeros(in_ring.shape, in_ring.dtype)
    mid_ring[...] = jnp.zeros(mid_ring.shape, mid_ring.dtype)
    for r in range(3):  # rows 0,1,2
        in_dma(r).start()
    in_dma(0).wait()
    in_dma(1).wait()
    mid_row(0)  # reads slot 3 = zeros as x(-1)

    # --- steady state ------------------------------------------------------
    def step(h, carry):
        # x(h+2) must be resident to produce mid(h+1)
        @pl.when(h + 2 < H)
        def _():
            in_dma(h + 2).wait()

        @pl.when(h + 2 == H)  # virtual zero row below the image
        def _():
            in_ring[jax.lax.rem(h + 2, 4)] = jnp.zeros(
                (C, (W + 2) * B), in_ring.dtype
            )

        @pl.when(h + 1 < H)
        def _():
            mid_row(h + 1)

        @pl.when(h + 1 == H)  # virtual zero mid row below the image
        def _():
            mid_ring[jax.lax.rem(h + 1, 4)] = jnp.zeros(
                (CB, (W + 2) * B), mid_ring.dtype
            )

        # the slot x(h+3) lands in held x(h-1), no longer read
        @pl.when(h + 3 < H)
        def _():
            in_dma(h + 3).start()

        # out(h) = x(h) + conv2(relu(mid rows h-1..h+1))
        @pl.when(h >= 2)
        def _():
            out_dma(h - 2).wait()  # slot h%2 about to be reused

        oslot = jax.lax.rem(h, 2)
        xslot = jax.lax.rem(h, 4)

        def write(w0, acc):
            res = in_ring[xslot, :, pl.ds(B + w0 * B, WC * B)]
            out_buf[oslot, :, pl.ds(w0 * B, WC * B)] = (
                acc + res.astype(jnp.float32)
            ).astype(out_buf.dtype)

        conv_row(mid_ring, w2_ref, C, h, write)
        out_dma(h).start()
        return carry

    jax.lax.fori_loop(0, H, step, 0)
    out_dma(H - 2).wait()
    out_dma(H - 1).wait()


@functools.partial(jax.jit, static_argnames=("B", "WC", "interpret"))
def fused_light_block(x_flat: jax.Array, w1_taps: jax.Array,
                      w2_taps: jax.Array, *, B: int = 128,
                      WC: int = 8, interpret: bool = False) -> jax.Array:
    """y = x + conv2(relu(conv1(relu(x)))) on (H, C, W*B)-flat input.

    x_flat: (H, C, W*B) — NHWC x transposed to (H,C,W,B) with the last two
    dims flattened (tools/fused_probe.py does this outside the timed region
    and prices the transpose separately).
    w1_taps/w2_taps: from :func:`pack_weights`.
    """
    H, C, WB = x_flat.shape
    W = WB // B
    CB = w1_taps.shape[1]
    assert W % WC == 0 and w1_taps.shape == (9, CB, C)

    kernel = functools.partial(
        _fused_light_block_kernel, C=C, CB=CB, H=H, W=W, B=B, WC=WC,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, C, WB), x_flat.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 taps
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, C, (W + 2) * B), x_flat.dtype),   # input ring
            pltpu.VMEM((4, CB, (W + 2) * B), x_flat.dtype),  # mid ring
            pltpu.VMEM((2, C, W * B), x_flat.dtype),         # out rows
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # rings + row buffers exceed the default 16M scoped-vmem budget
            # in f32 (the exactness-check dtype); size the limit to the
            # actual buffers + stack headroom
            vmem_limit_bytes=min(
                int(1.5 * (6 * C + 8 * CB) * (W + 2) * B
                    * x_flat.dtype.itemsize) + (8 << 20),
                100 << 20,
            ),
        ),
        interpret=interpret,
    )(x_flat, w1_taps, w2_taps)


def nhwc_to_flat(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (H,C,W*B)."""
    b, h, w, c = x.shape
    return jnp.transpose(x, (1, 3, 2, 0)).reshape(h, c, w * b)


def flat_to_nhwc(y: jax.Array, B: int) -> jax.Array:
    """(H,C,W*B) -> (B,H,W,C)."""
    h, c, wb = y.shape
    return jnp.transpose(y.reshape(h, c, wb // B, B), (3, 0, 2, 1))
