"""Batched host-side image augmentations (numpy, NHWC).

The reference augments per-sample with torchvision transforms inside
DataLoader workers (datasets.py:276-289, 358-366, 102-120). TPU-native
redesign: whole batches are augmented at once with vectorized numpy (pad +
gather for random crops, flip by stride), so the host input pipeline keeps up
with the accelerator without a worker pool. All ops take an explicit
np.random.Generator for reproducibility (replaces global torch RNG).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pad_reflect_or_zero(x: np.ndarray, pad_h: int, pad_w: int) -> np.ndarray:
    """Zero-pad NHWC batch spatially (matches torchvision default fill=0)."""
    return np.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))


def random_crop(
    rng: np.random.Generator,
    x: np.ndarray,
    size: Tuple[int, int],
    padding: Tuple[int, int] = (0, 0),
) -> np.ndarray:
    """Per-sample random crop after zero padding (TF.RandomCrop semantics,
    reference datasets.py:279-281, 106-109 where padding=[2*pad, pad] means
    (left/right, top/bottom) = (2*pad, pad) in torchvision order: the
    sequence [a, b] pads left/right by a and top/bottom by b)."""
    ph, pw = padding
    if ph or pw:
        x = pad_reflect_or_zero(x, ph, pw)
    n, h, w, c = x.shape
    th, tw = size
    if th == h and tw == w:
        return x
    ys = rng.integers(0, h - th + 1, size=n)
    xs = rng.integers(0, w - tw + 1, size=n)
    rows = ys[:, None, None] + np.arange(th)[None, :, None]  # (N, th, 1)
    cols = xs[:, None, None] + np.arange(tw)[None, None, :]  # (N, 1, tw)
    batch = np.arange(n)[:, None, None]
    return x[batch, rows, cols]  # (N, th, tw, C)


def random_hflip(rng: np.random.Generator, x: np.ndarray, p: float) -> np.ndarray:
    """Per-sample horizontal flip with probability p (TF.RandomHorizontalFlip)."""
    if p <= 0:
        return x
    flip = rng.random(x.shape[0]) < p
    out = x.copy()
    out[flip] = out[flip, :, ::-1]
    return out


def center_pad(x: np.ndarray, pad: int) -> np.ndarray:
    """Symmetric zero pad (TF.Pad eval transform, datasets.py:284-288)."""
    return pad_reflect_or_zero(x, pad, pad)


def resize_nearest(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor batched resize (stand-in for TF.Resize bilinear when
    exact interpolation parity is not required, e.g. thumbnails already at
    target res)."""
    n, h, w, c = x.shape
    th, tw = size
    if (h, w) == (th, tw):
        return x
    rows = (np.arange(th) * (h / th)).astype(np.int64)
    cols = (np.arange(tw) * (w / tw)).astype(np.int64)
    return x[:, rows][:, :, cols]
