"""Neural nets used inside the PGMs (Flax linen, NHWC).

Port targets: MLP/CNN predictors (reference src/pgm/layers.py:46-104),
DenseNN context nets (pyro.nn.DenseNN used at flow_pgm.py:148-157, 331-333,
561-563), GroupNorm ResNet-18 with dropout blocks and a shared trunk
(src/pgm/resnet.py:9-239, wiring at flow_pgm.py:571-597).

TPU-native redesign note: the reference MLP/CNN use BatchNorm, which couples
examples across the batch and forces cross-replica stat syncs under data
parallelism. We use LayerNorm (MLP) / GroupNorm (CNN) instead — the exact
choice the reference itself makes for its ResNet-18 (resnet.py:228 GroupNorm)
— keeping every example independent so the predictors shard cleanly over the
'data' mesh axis with zero extra collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


def _gn(c: int) -> nn.GroupNorm:
    # reference norm_layer: GroupNorm(min(32, c//4), c) (flow_pgm.py:577)
    return nn.GroupNorm(num_groups=max(1, min(32, c // 4)))


class MLP(nn.Module):
    """3-layer MLP head (reference layers.py:46-61; BatchNorm -> LayerNorm)."""

    width: int = 32
    num_outputs: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for _ in range(2):
            x = nn.Dense(self.width, use_bias=False)(x)
            x = nn.LayerNorm()(x)
            x = nn.leaky_relu(x, 0.01)
        return nn.Dense(self.num_outputs)(x)


class CNN(nn.Module):
    """Small conv encoder (reference layers.py:64-104; BatchNorm -> GroupNorm).

    Topology parity: 7x7 stride-(2 if res>64 else 1) stem, optional maxpool
    for res>32, then stride-2/1 3x3 pairs doubling width, global mean pool,
    context concat, 2-layer head.
    """

    input_res: int = 192
    width: int = 16
    num_outputs: int = 1
    context_dim: int = 0

    @nn.compact
    def __call__(self, x: Array, y: Optional[Array] = None) -> Array:
        w = self.width
        s = 2 if self.input_res > 64 else 1
        act = lambda v: nn.leaky_relu(v, 0.01)
        x = nn.Conv(w, (7, 7), strides=(s, s), padding=3, use_bias=False)(x)
        x = act(_gn(w)(x))
        if self.input_res > 32:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(2 * w, (3, 3), strides=(2, 2), padding=1, use_bias=False)(x)
        x = act(_gn(2 * w)(x))
        x = nn.Conv(2 * w, (3, 3), strides=(1, 1), padding=1, use_bias=False)(x)
        x = act(_gn(2 * w)(x))
        x = nn.Conv(4 * w, (3, 3), strides=(2, 2), padding=1, use_bias=False)(x)
        x = act(_gn(4 * w)(x))
        x = nn.Conv(4 * w, (3, 3), strides=(1, 1), padding=1, use_bias=False)(x)
        x = act(_gn(4 * w)(x))
        x = nn.Conv(8 * w, (3, 3), strides=(2, 2), padding=1, use_bias=False)(x)
        x = act(_gn(8 * w)(x))
        x = jnp.mean(x, axis=(1, 2))  # global avg pool
        if y is not None:
            x = jnp.concatenate([x, y], axis=-1)
        x = nn.Dense(8 * w, use_bias=False)(x)
        x = act(nn.LayerNorm()(x))
        return nn.Dense(self.num_outputs)(x)


class DenseNN(nn.Module):
    """Context net emitting multiple parameter heads (pyro.nn.DenseNN).

    Used for conditional affine flows: hidden widths then one Dense per
    param_dim (reference flow_pgm.py:148-157: DenseNN(2, args.widths, [1,1],
    LeakyReLU)); activation configurable ('leaky_relu' | 'gelu' | 'sigmoid').
    """

    hidden: Sequence[int]
    param_dims: Sequence[int]
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        act = {
            "leaky_relu": lambda v: nn.leaky_relu(v, 0.1),
            "gelu": lambda v: nn.gelu(v, approximate=False),
            "sigmoid": nn.sigmoid,
        }[self.activation]
        for hdim in self.hidden:
            x = act(nn.Dense(hdim)(x))
        outs = tuple(nn.Dense(d)(x) for d in self.param_dims)
        return outs if len(outs) > 1 else outs[0]


class ResBlock(nn.Module):
    """GroupNorm basic block with dropout (reference resnet.py:9-59)."""

    planes: int
    stride: int = 1
    p_dropout: float = 0.2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False,
        )(x)
        out = nn.relu(_gn(self.planes)(out))
        out = nn.Dropout(self.p_dropout, deterministic=not train)(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False)(out)
        out = _gn(self.planes)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample",
            )(x)
            identity = _gn(self.planes)(identity)
        return nn.relu(out + identity)


class ResNet18Trunk(nn.Module):
    """Shared GroupNorm ResNet-18 trunk up to global pool
    (reference resnet.py:62-209 with layers=[2,2,2,2], widths=[64,...,512])."""

    widths: Tuple[int, ...] = (64, 128, 256, 512)
    layers: Tuple[int, ...] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        w0 = self.widths[0]
        x = nn.Conv(w0, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.relu(_gn(w0)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (w, n) in enumerate(zip(self.widths, self.layers)):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                x = ResBlock(planes=w, stride=stride)(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # (B, widths[-1])


class ResNet18Head(nn.Module):
    """Linear head over trunk features + optional context concat
    (reference resnet.py:212-239)."""

    num_outputs: int
    context_dim: int = 0

    @nn.compact
    def __call__(self, feats: Array, y: Optional[Array] = None) -> Array:
        if y is not None:
            feats = jnp.concatenate([feats, y], axis=-1)
        return nn.Dense(self.num_outputs)(feats)
