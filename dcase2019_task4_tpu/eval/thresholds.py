"""Per-class threshold support.

The reference accepts per-class binarization thresholds in the tagging
metric (get_f_measure_by_class thresholds_,
evaluation_measures.py:60-66: binarization_type='class_threshold') but
ships no way to choose them, and its EVENT decode is hard-wired to the
global 0.5 + median(5) (get_predictions, evaluation_measures.py:203-231).
This module provides all the halves:

  * tune_weak_thresholds — vectorized grid search of the per-class clip
    threshold maximizing per-class clip-tagging F1;
  * tune_event_thresholds — grid search of the per-class STRONG-decode
    threshold (and optionally the median window) maximizing per-class
    event-based F1 through the full decode→collar-matching chain — the
    symmetry the reference lacks, where real systems harvest easy F1;
  * decode.binarize_and_median accepts a per-class threshold vector
    (threshold comparison broadcasts over the class axis).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

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


def decode_events_per_class(
    strong_probs: np.ndarray,
    filenames: List[str],
    codec,
    sample_rate: int,
    hop_length: int,
    pooling_time_ratio: int,
    thresholds,
    windows,
):
    """Host-side decode with PER-CLASS thresholds AND median windows.

    decode.decode_batch covers scalar/vector thresholds but a single window;
    the tuner may pick different windows per class, so this twin applies the
    scipy-exact median per window group (class channels are independent
    through the whole decode chain — binarize, median, run-length — which is
    also why per-class tuning decomposes coordinate-wise)."""
    from scipy.ndimage import median_filter

    from dcase2019_task4_tpu.eval.decode import grids_to_dataframe

    probs = np.asarray(strong_probs)
    th = np.broadcast_to(np.asarray(thresholds, np.float64), (probs.shape[-1],))
    win = np.broadcast_to(np.asarray(windows, np.int64), (probs.shape[-1],))
    binary = (probs > th).astype(np.float32)
    out = np.empty_like(binary)
    for w in np.unique(win):
        cols = np.nonzero(win == w)[0]
        out[..., cols] = median_filter(binary[..., cols], size=(1, int(w), 1))
    return grids_to_dataframe(
        out, filenames, codec, sample_rate, hop_length, pooling_time_ratio
    )


def tune_event_thresholds(
    strong_probs: np.ndarray,
    filenames: List[str],
    groundtruth_df,
    codec,
    sample_rate: int = 44100,
    hop_length: int = 511,
    pooling_time_ratio: int = 8,
    grid: Optional[np.ndarray] = None,
    median_windows: Optional[Sequence[int]] = None,
    t_collar: float = 0.200,
    percentage_of_length: float = 0.2,
) -> Dict:
    """Grid-search per-class STRONG-decode thresholds (and optionally the
    median window) maximizing per-class event-based F1 on validation.

    strong_probs [N, T', C] frame probabilities for N clips; filenames [N];
    groundtruth_df the set's reference events (seconds). Every (threshold,
    window) grid point runs the full decode (binarize → scipy median →
    run-length → seconds) and collar-matched scoring, so the objective IS
    the reported metric. Class channels are independent end-to-end, so the
    per-class argmax over a shared decode equals per-class tuning (ties →
    lower threshold, then smaller window — closest to the reference's
    0.5/5 defaults in spirit).

    Returns {"thresholds" [C], "windows" [C], "f1" [C], "macro_f1",
    "default_macro_f1", "default_f1" [C]} with classes in codec.labels
    order. (Reference twin: per-class thresholds exist only for tagging,
    evaluation_measures.py:19-83 — this completes the symmetry.)
    """
    from dcase2019_task4_tpu.eval.sed_scores import event_based_metrics

    if grid is None:
        grid = np.linspace(0.1, 0.9, 17)
    if median_windows is None:
        median_windows = [5]
    labels = list(codec.labels)
    C = len(labels)
    best_f1 = np.zeros(C)
    best_th = np.full(C, 0.5)
    best_win = np.full(C, int(median_windows[0]), np.int64)

    def _score(g, w):
        df = decode_events_per_class(
            strong_probs, filenames, codec, sample_rate, hop_length,
            pooling_time_ratio, g, w,
        )
        m = event_based_metrics(groundtruth_df, df, t_collar, percentage_of_length)
        return np.asarray([
            m.counts[c].f_measure if c in m.counts else 0.0 for c in labels
        ])

    # the reference's fixed decode (0.5 / median 5) as the baseline row
    default_f1 = _score(0.5, 5)
    for w in sorted(int(x) for x in median_windows):
        for g in grid:
            f1 = _score(float(g), w)
            # strict > : ties keep the earlier (lower-threshold /
            # smaller-window) candidate
            better = f1 > best_f1 + 1e-12
            best_f1 = np.where(better, f1, best_f1)
            best_th = np.where(better, float(g), best_th)
            best_win = np.where(better, w, best_win)
    tuned_df = decode_events_per_class(
        strong_probs, filenames, codec, sample_rate, hop_length,
        pooling_time_ratio, best_th, best_win,
    )
    tuned = event_based_metrics(
        groundtruth_df, tuned_df, t_collar, percentage_of_length
    )
    macro = float(np.mean([
        tuned.counts[c].f_measure if c in tuned.counts else 0.0 for c in labels
    ]))
    return {
        "thresholds": best_th,
        "windows": best_win,
        "f1": best_f1,
        "macro_f1": macro,
        "default_f1": default_f1,
        "default_macro_f1": float(np.mean(default_f1)),
    }
