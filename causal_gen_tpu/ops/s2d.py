"""Space-to-depth conv reparameterization for narrow-channel stages.

Motivation (measured, RESULTS.md "trace-driven push"): the 192^2/96^2 "light"
blocks of ukbb192/mimic192 run 3x3 convs with 8-64 channels. On the 128-lane
MXU both the contraction (C_in) and output (C_out) dims pad to the lane
granularity, so these convs execute at ~(C_in/128)*(C_out/128) efficiency.
Packing 2x2 spatial phases into channels makes both dims 4x wider at only 4x
the FLOPs — a net MXU-time win approaching 4x when C_in, C_out << 128.

The reparameterization is EXACT (a permutation of the data layout plus a
sparse embedding of the compact kernel), so it is a pure execution-layout
choice: parameters, checkpoints, gradients, and model semantics are
unchanged. No reference counterpart (the reference is single-GPU PyTorch;
this is TPU lane-geometry work).

Math. Pack x(B,H,W,C) -> P(B,H/2,W/2,4C) with packed channel (ph*C + c),
phase ph = 2*(y%2) + (x%2). For a SAME 3x3 conv y = conv(x, W):

    y[2Y+py, 2X+px, co] = sum_{dy,dx,ci} x[2Y+py+dy-1, 2X+px+dx-1, ci]
                                         * W[dy, dx, ci, co]

write iy = 2Y+py+dy-1 = 2(Y+qy) + ry with (qy, ry) = divmod(py+dy-1, 2),
qy in {-1,0,1}: every tap lands in the 3x3 packed neighborhood, so

    conv3x3(C->C') on x  ==  conv3x3(4C->4C') on P

with packed kernel Wp[qy+1, qx+1, (2ry+rx)*C:+C, (2py+px)*C':+C'] = W[dy,dx].
Each original tap fills exactly one packed slot (36 slots of 144 -> the 4x
FLOP inflation); SAME padding on the packed layout reproduces the original
zero padding exactly (iy = -1 maps to packed row -1 phase 1, never row -2).

1x1 convs pack to a block-diagonal (4C, 4C') kernel (phase-preserving).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array


def pack_space_to_depth(x: Array, factor: int = 2) -> Array:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C), channel index (phase*C + c)."""
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/f, W/f, fy, fx, C)
    return x.reshape(b, h // f, w // f, f * f * c)


def unpack_depth_to_space(p: Array, factor: int = 2) -> Array:
    """Inverse of :func:`pack_space_to_depth`."""
    b, hh, ww, cc = p.shape
    f = factor
    c = cc // (f * f)
    p = p.reshape(b, hh, ww, f, f, c)
    p = p.transpose(0, 1, 3, 2, 4, 5)
    return p.reshape(b, hh * f, ww * f, c)


def pack_kernel_3x3(w: Array) -> Array:
    """Embed a compact (3, 3, Ci, Co) kernel into the packed (3, 3, 4Ci, 4Co)
    kernel. Differentiable (pure scatter of W into a zero tensor), so the
    compact kernel stays the parameter and gradients are exact."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3), w.shape
    wp = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(3):
                for dx in range(3):
                    qy, ry = divmod(py + dy - 1, 2)
                    qx, rx = divmod(px + dx - 1, 2)
                    ph_in = 2 * ry + rx
                    ph_out = 2 * py + px
                    wp = wp.at[
                        qy + 1, qx + 1,
                        ph_in * ci:(ph_in + 1) * ci,
                        ph_out * co:(ph_out + 1) * co,
                    ].set(w[dy, dx])
    return wp


def pack_kernel_1x1(w: Array) -> Array:
    """(1, 1, Ci, Co) -> (1, 1, 4Ci, 4Co) block-diagonal over phases."""
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (1, 1), w.shape
    wp = jnp.zeros((1, 1, 4 * ci, 4 * co), w.dtype)
    for ph in range(4):
        wp = wp.at[0, 0, ph * ci:(ph + 1) * ci, ph * co:(ph + 1) * co].set(
            w[0, 0]
        )
    return wp


_DIMS = ("NHWC", "HWIO", "NHWC")


def s2d_conv(
    x: Array,
    w: Array,
    bias: Optional[Array] = None,
    packed_in: bool = False,
    packed_out: bool = False,
) -> Array:
    """SAME stride-1 conv via the space-to-depth layout; exact equivalent of
    ``lax.conv_general_dilated(x, w, (1,1), 'SAME')`` (+ bias).

    ``packed_in``/``packed_out`` skip the pack/unpack permutations when the
    caller already holds / wants the packed layout (stage-level packing).
    ``w`` is always the compact kernel (the checkpointed parameter).
    """
    k = w.shape[0]
    if k == 3:
        wp = pack_kernel_3x3(w)
    elif k == 1:
        wp = pack_kernel_1x1(w)
    else:
        raise ValueError(f"s2d_conv supports 1x1/3x3 kernels, got {w.shape}")
    p = x if packed_in else pack_space_to_depth(x)
    dims = jax.lax.conv_dimension_numbers(p.shape, wp.shape, _DIMS)
    out = jax.lax.conv_general_dilated(
        p, wp.astype(p.dtype), (1, 1), "SAME", dimension_numbers=dims
    )
    if bias is not None:
        # packed channel index is (phase*Co + c): tile the bias over phases
        out = out + jnp.tile(bias.astype(out.dtype), 4)
    return out if packed_out else unpack_depth_to_space(out)
