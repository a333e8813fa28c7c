"""Attribute/pixel normalization helpers.

Port targets: reference src/utils.py:43-55 (normalize, log_standardize),
src/datasets.py:89-98 (UKBB attribute ranges), src/datasets.py:230-233
(Morpho-MNIST morphometric ranges). These constants are load-bearing for
checkpoint compatibility across mechanisms (SURVEY.md §7 "Cross-mechanism
normalization shims") and must not drift.

All functions are numpy/jnp polymorphic (host-side dataset preprocessing uses
numpy; in-graph renormalization uses jnp arrays).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# UKBB attribute (max, min) stats (reference datasets.py:89-98)
UKBB_ATTR_MAX_MIN = {
    "age": (73.0, 44.0),
    "brain_volume": (1629520.0, 841919.0),
    "ventricle_volume": (157075.0, 7613.27001953125),
}

# Morpho-MNIST morphometric [min, max] (reference datasets.py:230-233)
MORPHOMNIST_MIN_MAX = {
    "thickness": (0.87598526, 6.255515),
    "intensity": (66.601204, 254.90317),
}


def get_attr_max_min(attr: str) -> Tuple[float, float]:
    """(max, min) for UKBB attributes (reference datasets.py:89-98)."""
    if attr not in UKBB_ATTR_MAX_MIN:
        raise NotImplementedError(attr)
    return UKBB_ATTR_MAX_MIN[attr]


def normalize(x, x_min: Optional[float] = None, x_max: Optional[float] = None,
              zero_one: bool = False):
    """Min-max normalize to [0,1] or [-1,1] (reference utils.py:43-51)."""
    if x_min is None:
        x_min = x.min()
    if x_max is None:
        x_max = x.max()
    x = (x - x_min) / (x_max - x_min)
    return x if zero_one else 2 * x - 1


def unnormalize(x, x_min: float, x_max: float, zero_one: bool = False):
    """Inverse of ``normalize`` for metric reporting (train_pgm.py:206-218)."""
    if not zero_one:
        x = (x + 1) / 2
    return x * (x_max - x_min) + x_min


def log_standardize(x):
    """log then standardize to mean 0 / std 1 (reference utils.py:54-55)."""
    log_x = np.log(np.clip(x, 1e-12, None))
    std = max(float(log_x.std()), 1e-12)
    return (log_x - log_x.mean()) / std
