"""Differentiable morphometry surrogates (soft-EDT thickness, soft intensity).

The measured counterfactual-effectiveness protocol re-measures generated
images with non-differentiable tools (eval/morphometrics.py: Zhang–Suen
thinning + EDT, the notebook's cell-9 protocol). Counterfactual fine-tuning
on the predictor ELBO alone improves *predicted* parent accuracy while the
*measured* thickness regresses (round-1 ablations: eps/duration/alpha are
not the knobs). This module provides a differentiable thickness estimate so
the regression can be penalised inside the Lagrangian itself.

Method (validated r=0.97, fit MAE 0.11 px against the measured tool on real
Morpho-MNIST): bilinear x4 upsample (the measured protocol upscales too —
native strokes are only 1-3 px wide), sharp soft binarisation at the relative
0.5 threshold, then a soft Euclidean distance transform by erosion-survival
counting: each 3x3 min-pool erosion peels one pixel per side, so

    mean depth over foreground = Σ_k area(erode^k(fg)) / area(fg) ≈ t·s/4

for a ribbon of thickness t at upscale s; an affine calibration fitted
against the measured morphometrics on real training images (host, once)
absorbs the scale. All ops are fixed-iteration reduce_window/elementwise —
XLA fuses them onto the VPU; no data-dependent control flow.

No reference counterpart: the reference has no measured-morphometry training
signal (its train_cf.py:152-218 objective is predictor ELBO + ELBO
constraint only); this is a TPU-native extension addressing the documented
fidelity/effectiveness tradeoff.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def _min3_along(x: Array, axis: int) -> Array:
    """SAME-padded 3-tap sliding minimum along one axis via shifted
    ``jnp.minimum`` — identical forward values to a reduce_window min-pool,
    but its VJP is elementwise selects (reduce_window's backward lowers to
    Select-and-Scatter, which the TPU backend rejects for (1, 3, 3) windows:
    "less than 2 inactive dims is not implemented")."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, constant_values=jnp.inf)
    n = x.shape[axis]
    sl = lambda s: jax.lax.slice_in_dim(xp, s, s + n, axis=axis)
    return jnp.minimum(jnp.minimum(sl(0), sl(1)), sl(2))


def soft_erode(x: Array) -> Array:
    """3x3 min-pool over the trailing two spatial dims of (N, H, W).

    The 3x3 square structuring element is separable: min over rows then
    columns."""
    return _min3_along(_min3_along(x, 1), 2)


def soft_binarize(x01: Array, threshold: float = 0.5, temp: float = 0.02) -> Array:
    """Differentiable relative-threshold foreground mask for (N, H, W) in
    [0, 1] (the measured protocol binarizes at min + 0.5*(max-min)).

    ``temp`` must be sharp: at 0.1 the sigmoid's background floor
    (sigmoid(-5) ≈ 0.7%) summed over ~16k background pixels swamps thin
    strokes and *inverts* the thickness correlation (measured: r=-0.78 at
    temp 0.1 vs r=+0.97 at 0.02).
    """
    lo = jax.lax.stop_gradient(x01.min(axis=(1, 2), keepdims=True))
    hi = jax.lax.stop_gradient(x01.max(axis=(1, 2), keepdims=True))
    thr = lo + (hi - lo) * threshold
    return jax.nn.sigmoid((x01 - thr) / temp)


def soft_thickness_raw(
    x01: Array, scale: int = 4, iters: int = 12, temp: float = 0.02
) -> Array:
    """Uncalibrated per-image mean erosion-survival depth for (N, H, W)."""
    n, h, w = x01.shape
    up = jax.image.resize(x01, (n, h * scale, w * scale), "linear")
    fg = soft_binarize(up, temp=temp)
    area = fg.sum(axis=(1, 2))
    e = fg
    acc = jnp.zeros_like(area)
    for _ in range(iters):
        e = soft_erode(e)
        acc = acc + e.sum(axis=(1, 2))
    return acc / jnp.clip(area, min=1.0)


def soft_thickness(
    x01: Array, calib: Tuple[float, float] = (1.0, 0.0),
    scale: int = 4, iters: int = 12, temp: float = 0.02,
) -> Array:
    """Calibrated thickness estimate: a * raw + b."""
    a, b = calib
    return a * soft_thickness_raw(x01, scale=scale, iters=iters, temp=temp) + b


def soft_intensity(x255: Array, temp: float = 5.1) -> Array:
    """Differentiable stand-in for the measured intensity (median of bright
    pixels, morphometrics.get_intensity): foreground-weighted mean, on the
    0..255 scale the protocol measures in."""
    fg = soft_binarize(x255 / 255.0, temp=temp / 255.0)
    num = (x255 * fg).sum(axis=(1, 2))
    den = jnp.clip(fg.sum(axis=(1, 2)), min=1.0)
    return num / den


def fit_calibration(raw: np.ndarray, measured: np.ndarray) -> Tuple[float, float]:
    """Least-squares affine fit measured ~ a*raw + b (host-side, once)."""
    A = np.stack([np.asarray(raw, np.float64), np.ones_like(raw, np.float64)], 1)
    coef, *_ = np.linalg.lstsq(A, np.asarray(measured, np.float64), rcond=None)
    return float(coef[0]), float(coef[1])


def calibrate_soft_thickness(
    images01: np.ndarray, scale: int = 4, iters: int = 12, temp: float = 0.02
) -> Tuple[Tuple[float, float], float]:
    """Fit (a, b) on real images against the measured morphometrics.

    images01: (N, H, W) in [0, 1]. Returns ((a, b), mae_of_fit).
    """
    from causal_gen_tpu.eval.morphometrics import measure_thickness

    raw = np.asarray(
        jax.jit(
            lambda x: soft_thickness_raw(x, scale=scale, iters=iters, temp=temp)
        )(jnp.asarray(images01, jnp.float32))
    )
    measured = measure_thickness(np.asarray(images01) * 255.0)
    keep = measured > 0  # skip degenerate/empty measurements
    a, b = fit_calibration(raw[keep], measured[keep])
    mae = float(np.abs(a * raw[keep] + b - measured[keep]).mean())
    return (a, b), mae
