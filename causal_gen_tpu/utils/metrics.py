"""Evaluation metrics (numpy; no sklearn dependency).

Port target: the metric suite of reference train_pgm.py:174-249 and
train_cf.py:63-108 (per-variable ROC-AUC / accuracy / MAE with
unnormalization). ROC-AUC is the rank-statistic (Mann-Whitney U) estimator,
equivalent to sklearn.roc_auc_score for binary labels; multiclass is
one-vs-rest macro averaged.
"""

from __future__ import annotations

import numpy as np


def roc_auc_binary(targets: np.ndarray, scores: np.ndarray) -> float:
    """AUC via the Mann-Whitney U statistic with tie correction."""
    t = np.asarray(targets).ravel()
    s = np.asarray(scores, np.float64).ravel()
    pos = s[t == 1]
    neg = s[t == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([neg, pos]), kind="mergesort")
    ranks = np.empty(len(order), np.float64)
    sorted_vals = np.concatenate([neg, pos])[order]
    # average ranks for ties
    ranks[order] = np.arange(1, len(order) + 1)
    uniq, inv, counts = np.unique(sorted_vals, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    avg_rank = (cum - (counts - 1) / 2.0)[inv]
    all_ranks = np.empty(len(order), np.float64)
    all_ranks[order] = avg_rank
    r_pos = all_ranks[len(neg):].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2.0
    return float(u / (len(pos) * len(neg)))


def roc_auc_ovr_macro(targets_onehot: np.ndarray, probs: np.ndarray) -> float:
    """One-vs-rest macro AUC for one-hot targets (sklearn multi_class='ovr')."""
    aucs = []
    for k in range(targets_onehot.shape[-1]):
        t = targets_onehot[:, k]
        if t.sum() == 0 or t.sum() == len(t):
            continue
        aucs.append(roc_auc_binary(t, probs[:, k]))
    return float(np.mean(aucs)) if aucs else float("nan")


def accuracy_binary(targets: np.ndarray, probs: np.ndarray) -> float:
    t = np.asarray(targets).ravel()
    p = np.round(np.asarray(probs).ravel())
    return float((t == p).mean())


def accuracy_onehot(targets_onehot: np.ndarray, probs: np.ndarray) -> float:
    return float(
        (targets_onehot.argmax(-1) == np.asarray(probs).argmax(-1)).mean()
    )


def mae(targets: np.ndarray, preds: np.ndarray) -> float:
    return float(np.abs(np.asarray(targets) - np.asarray(preds)).mean())
