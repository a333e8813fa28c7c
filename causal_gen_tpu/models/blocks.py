"""Conv building blocks for the HVAE image mechanism (Flax linen, NHWC).

Port targets: Block (reference src/vae.py:33-84), Encoder (vae.py:87-134).
TPU-native choices:
- NHWC layout throughout (flax Conv default) so XLA tiles channels onto the
  128-lane dimension; the reference is NCHW.
- Static architecture: stages come pre-parsed from Config (config.py), so jit
  sees a fixed unrolled graph.
- Parents are carried as (B, context_dim) vectors and broadcast lazily at the
  consumption site (XLA fuses the broadcast into the conv); the reference
  materializes (B, C, H, W) parent maps up front (trainer.py:20).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def scaled_init(scale: float):
    """Lecun-normal kernel init scaled by a constant (replaces the reference's
    post-hoc ``weight.data *= scale`` at vae.py:122, 303-308)."""
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class Block(nn.Module):
    """Bottlenecked residual conv block (reference vae.py:33-84).

    version=None: GELU 1x1 -> 3x3 -> 3x3 -> 1x1 body ("morphomnist" variant).
    version="light": ReLU kxk -> kxk two-conv body (lower memory, "ukbb").
    """

    in_width: int
    bottleneck: int
    out_width: int
    kernel_size: int = 3
    residual: bool = True
    down_rate: Optional[int] = None
    version: Optional[str] = None
    last_scale: float = 1.0  # scale of final conv kernel init (0.0 => zeros)
    dtype: Optional[Any] = None  # compute dtype (bf16 puts convs on the MXU
    # at full rate; params stay f32 — flax casts per-op)
    spatial_dims: int = 2  # 2 = NHWC images, 3 = NDHWC volumes

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        nd = self.spatial_dims
        conv = lambda w, kk, **kw: nn.Conv(
            w, (kk,) * nd, padding="SAME" if kk > 1 else "VALID",
            dtype=self.dtype, **kw,
        )
        last_init = (
            nn.initializers.zeros if self.last_scale == 0.0 else scaled_init(self.last_scale)
        )
        if self.version == "light":
            out = nn.relu(x)
            out = conv(self.bottleneck, k)(out)
            out = nn.relu(out)
            out = conv(self.out_width, k, kernel_init=last_init)(out)
        else:
            out = nn.gelu(x, approximate=False)
            out = conv(self.bottleneck, 1)(out)
            out = nn.gelu(out, approximate=False)
            out = conv(self.bottleneck, k)(out)
            out = nn.gelu(out, approximate=False)
            out = conv(self.bottleneck, k)(out)
            out = nn.gelu(out, approximate=False)
            out = conv(self.out_width, 1, kernel_init=last_init)(out)
        if self.residual:
            if x.shape[-1] != out.shape[-1]:
                # width projection exists when downsampling or narrowing
                # (reference vae.py:70-71)
                x = nn.Conv(self.out_width, (1,) * nd, name="width_proj",
                            dtype=self.dtype)(x)
            out = x + out
        if self.down_rate:
            d = int(self.down_rate)
            out = nn.avg_pool(out, (d,) * nd, strides=(d,) * nd)
        return out


class Encoder(nn.Module):
    """Bottom-up encoder producing activations keyed by spatial resolution
    (reference vae.py:87-134)."""

    stages: Tuple  # Tuple[EncStage, ...] from config.parse_enc_arch
    widths: Tuple[int, ...]
    bottleneck: int
    input_channels: int
    version: Optional[str] = None
    dtype: Optional[Any] = None
    remat: bool = False  # nn.remat each block (jax.checkpoint)
    remat_min_res: int = 0  # only remat blocks at res >= this (see Config)
    spatial_dims: int = 2

    def setup(self):
        # flatten stage spec into per-block (width, down_rate, res) like
        # vae.py:111-113; res is the block's input resolution (stage res)
        flat = []
        stem_width, stem_stride = self.widths[0], 1
        for i, stage in enumerate(self.stages):
            if i == 0 and stage.n_blocks == 0 and stage.down_rate is None:
                stem_width, stem_stride = self.widths[1], 2
                continue
            flat += [(self.widths[i], None, stage.res) for _ in range(stage.n_blocks)]
            if stage.down_rate is not None:
                flat += [(self.widths[i + 1], stage.down_rate, stage.res)]
        self._flat = tuple(flat)
        nd = self.spatial_dims
        self.stem = nn.Conv(stem_width, (7,) * nd, strides=(stem_stride,) * nd,
                            padding=3, dtype=self.dtype)
        blocks = []
        n = len(flat)
        for i, (width, d, res) in enumerate(flat):
            prev_width = flat[max(0, i - 1)][0]
            BlockCls = (
                nn.remat(Block)
                if self.remat and res >= self.remat_min_res
                else Block
            )
            blocks.append(
                BlockCls(
                    in_width=prev_width,
                    bottleneck=prev_width // self.bottleneck,
                    out_width=width,
                    down_rate=d,
                    version=self.version,
                    last_scale=float(np.sqrt(1.0 / n)),
                    dtype=self.dtype,
                    spatial_dims=nd,
                )
            )
        self.blocks = blocks

    def __call__(self, x: Array) -> Dict[int, Array]:
        x = self.stem(x)
        acts: Dict[int, Array] = {}
        nd = self.spatial_dims
        for block in self.blocks:
            x = block(x)
            res = x.shape[1]
            if res % 2 and res > 1:  # pad odd resolutions (reference vae.py:131-132)
                pad = ((0, 0),) + ((0, 1),) * nd + ((0, 0),)
                x = jnp.pad(x, pad)
            acts[x.shape[1]] = x
        return acts


def upsample_nearest(x: Array, target_res: int) -> Array:
    """Nearest-neighbor upsample all spatial dims of N(D)HWC to target_res.

    Matches F.interpolate(..., mode='nearest') for integer scale factors
    (reference vae.py:253, 259); implemented as repeat so XLA lowers it to a
    cheap broadcast-reshape instead of a gather. Works for 2-D images and
    3-D volumes (cubic: every spatial dim shares one resolution).
    """
    h = x.shape[1]
    if target_res == h:
        return x
    if target_res % h == 0:
        f = target_res // h
        for ax in range(1, x.ndim - 1):
            x = jnp.repeat(x, f, axis=ax)
        return x
    shape = (x.shape[0],) + (target_res,) * (x.ndim - 2) + (x.shape[-1],)
    return jax.image.resize(x, shape, method="nearest")
