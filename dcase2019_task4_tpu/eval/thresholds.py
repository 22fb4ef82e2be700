"""Per-class threshold support.

The reference accepts per-class binarization thresholds in the tagging
metric (get_f_measure_by_class thresholds_,
evaluation_measures.py:60-66: binarization_type='class_threshold') but
ships no way to choose them. This module provides both halves:

  * tune_weak_thresholds — vectorized grid search of the per-class clip
    threshold maximizing per-class F1 on validation probabilities;
  * decode.binarize_and_median accepts a per-class threshold vector
    (threshold comparison broadcasts over the class axis).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def tune_weak_thresholds(
    weak_probs: np.ndarray,
    weak_targets: np.ndarray,
    grid: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Grid-search per-class thresholds on clip-level probabilities.

    weak_probs [N, C] in [0, 1]; weak_targets [N, C] (0/1 or [N, T, C]
    strong grids, maxed over time). Returns (thresholds [C], f1 [C]) —
    the threshold per class maximizing F1 (ties → lower threshold).
    """
    probs = np.asarray(weak_probs)
    y = np.asarray(weak_targets)
    if y.ndim == 3:
        y = y.max(axis=1)
    y = (y > 0.5).astype(np.int32)
    if grid is None:
        grid = np.linspace(0.05, 0.95, 19)
    # [G, N, C] comparisons, vectorized over the grid
    est = probs[None, :, :] > grid[:, None, None]
    tp = (est & (y[None] == 1)).sum(axis=1).astype(np.float64)
    fp = (est & (y[None] == 0)).sum(axis=1).astype(np.float64)
    fn = ((~est) & (y[None] == 1)).sum(axis=1).astype(np.float64)
    denom = 2 * tp + fp + fn
    f1 = np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-12), 0.0)  # [G, C]
    best = f1.argmax(axis=0)
    return grid[best], f1[best, np.arange(probs.shape[1])]
