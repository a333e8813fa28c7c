"""PGM plotting + numeric guards.

Port target: reference src/pgm/utils_pgm.py (check_nan 31-38, plot_joint
58-90, plot_cf counterfactual panels 93-286). Plots are optional observability
artifacts: matplotlib/seaborn are imported lazily and every function degrades
to a no-op (returning None) when unavailable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def check_nan(tree: Dict[str, Any]) -> int:
    """Count NaNs across a dict of arrays (reference utils_pgm.py:31-38).
    Host-side variant for loop guards; the jitted paths use branchless
    jnp.isnan selects instead."""
    nans = 0
    for k, v in tree.items():
        if v is None:
            continue
        n = int(np.isnan(np.asarray(v)).sum())
        if n:
            print(f"Found {n} nan(s) in {k}, skipping step.")
        nans += n
    return nans


def plot_joint(
    thickness: np.ndarray,
    intensity: np.ndarray,
    title: str,
    save_path: Optional[str] = None,
):
    """Joint scatter of two morphometrics (reference utils_pgm.py:58-90)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import pandas as pd
        import seaborn as sns
    except Exception:
        return None
    plt.close("all")
    df = pd.DataFrame({"thickness": np.ravel(thickness), "intensity": np.ravel(intensity)})
    g = sns.jointplot(data=df, x="thickness", y="intensity")
    plt.suptitle(title)
    plt.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path)
    return g


def plot_cf(
    x: np.ndarray,
    cf_x: np.ndarray,
    var_cf_x: Optional[np.ndarray] = None,
    num_images: int = 8,
    save_path: Optional[str] = None,
):
    """Counterfactual panel: obs / cf / direct effect (cf - obs) /
    uncertainty rows (reference utils_pgm.py:93-286, simplified layout)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    plt.close("all")
    x = np.asarray(x)[:num_images]
    cf_x = np.asarray(cf_x)[:num_images]
    n = x.shape[0]
    n_rows = 3 + (1 if var_cf_x is not None else 0)
    fig, axes = plt.subplots(n_rows, n, figsize=(n * 1.6, n_rows * 1.8))
    if n == 1:
        axes = axes[:, None]
    row_titles = ["observation", "counterfactual", "direct effect"]
    rows = [x, cf_x, cf_x - x]
    if var_cf_x is not None:
        rows.append(np.asarray(var_cf_x)[:num_images])
        row_titles.append("uncertainty")
    for r, (row, title) in enumerate(zip(rows, row_titles)):
        for j in range(n):
            img = row[j]
            img = img[..., 0] if img.ndim == 3 and img.shape[-1] == 1 else img
            cmap = "RdBu_r" if title == "direct effect" else (
                "jet" if title == "uncertainty" else "Greys_r"
            )
            axes[r, j].imshow(img, cmap=cmap)
            axes[r, j].axis("off")
        axes[r, 0].set_title(title, loc="left", fontsize=8)
    plt.tight_layout()
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path, dpi=120)
    return fig
