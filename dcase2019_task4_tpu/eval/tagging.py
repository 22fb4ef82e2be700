"""Clip-level (weak) tagging metrics.

Re-design of the reference's audio-tagging F1 path
(get_f_measure_by_class / intermediate_at_measures / macro_f_measure,
evaluation_measures.py:19-102,185-200): binarize weak probabilities at a
global 0.5 threshold (or per-class thresholds), accumulate per-class
tp/fp/fn/tn confusion counts, then F = 2tp/(2tp+fp+fn) with zero-count
classes scored 0. The counts are computed with one vectorized reduction per
batch instead of per-clip Python.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd


def binarize(probs: np.ndarray, thresholds=0.5) -> np.ndarray:
    """Global or per-class thresholding (dcase_util
    ProbabilityEncoder.binarization contract: strictly greater)."""
    t = np.asarray(thresholds)
    return (np.asarray(probs) > t).astype(np.int32)


def confusion_counts(ref: np.ndarray, est: np.ndarray):
    """Per-class (tp, fp, fn, tn) like intermediate_at_measures
    (evaluation_measures.py:86-102)."""
    ref = np.asarray(ref)
    est = np.asarray(est)
    tp = ((est + ref) == 2).sum(axis=0)
    fp = ((est - ref) == 1).sum(axis=0)
    fn = ((ref - est) == 1).sum(axis=0)
    tn = ((est + ref) == 0).sum(axis=0)
    return tp, fp, fn, tn


def macro_f_measure(tp, fp, fn) -> np.ndarray:
    """Per-class F1, zero where 2tp+fp+fn == 0
    (evaluation_measures.py:185-200)."""
    tp = np.asarray(tp, dtype=np.float64)
    denom = 2 * tp + np.asarray(fp) + np.asarray(fn)
    f = np.zeros(tp.shape[-1])
    mask = denom != 0
    f[mask] = 2 * tp[mask] / denom[mask]
    return f


class TaggingF1:
    """Streaming accumulator over batches of (weak_probs, weak_targets)."""

    def __init__(self, nclass: int, thresholds=0.5):
        self.thresholds = thresholds
        self.tp = np.zeros(nclass)
        self.fp = np.zeros(nclass)
        self.fn = np.zeros(nclass)
        self.tn = np.zeros(nclass)

    def update(self, weak_probs, weak_targets):
        """weak_targets may be a [B, T, C] strong grid (max over time, then
        0.5-binarized, evaluation_measures.py:53-57) or a [B, C] k-hot."""
        y = np.asarray(weak_targets)
        if y.ndim == 3:
            y = y.max(axis=1)
        y = (y > 0.5).astype(np.int32)
        p = np.asarray(weak_probs)
        if p.ndim == 3:
            p = p.max(axis=1)
        est = binarize(p, self.thresholds)
        tp, fp, fn, tn = confusion_counts(y, est)
        self.tp += tp
        self.fp += fp
        self.fn += fn
        self.tn += tn

    def per_class_f1(self) -> np.ndarray:
        return macro_f_measure(self.tp, self.fp, self.fn)

    def macro_f1(self) -> float:
        return float(np.mean(self.per_class_f1()))


def weak_labels_from_df(df: pd.DataFrame, classes: Sequence[str]) -> np.ndarray:
    """Per unique filename, k-hot of present classes — the df-vs-df tagging
    comparison path (audio_tagging_results, evaluation_measures.py:259-294)."""
    cindex = {c: i for i, c in enumerate(classes)}
    files = list(df["filename"].drop_duplicates())
    findex = {f: i for i, f in enumerate(files)}
    y = np.zeros((len(files), len(classes)), dtype=np.int32)
    if "event_label" in df.columns:
        for row in df.itertuples(index=False):
            lab = row.event_label
            if lab is not None and not (isinstance(lab, float) and np.isnan(lab)):
                if lab in cindex:
                    y[findex[row.filename], cindex[lab]] = 1
    elif "event_labels" in df.columns:
        for row in df.itertuples(index=False):
            labs = row.event_labels
            if isinstance(labs, str) and labs:
                for lab in labs.split(","):
                    if lab in cindex:
                        y[findex[row.filename], cindex[lab]] = 1
    return y


def audio_tagging_results(reference: pd.DataFrame, estimated: pd.DataFrame) -> pd.Series:
    """Macro tagging F1 per class between two event dataframes, aligned on
    the union of filenames (missing side = all-zero), mirroring
    audio_tagging_results (evaluation_measures.py:259-294)."""
    classes: List[str] = sorted(
        set(
            reference["event_label"].dropna().unique()
            if "event_label" in reference.columns
            else reference["event_labels"].str.split(",", expand=True).unstack().dropna().unique()
        )
    )
    files = list(
        pd.concat([reference["filename"], estimated["filename"]]).drop_duplicates()
    )
    def khot(df):
        y_part = weak_labels_from_df(df, classes)
        part_files = list(df["filename"].drop_duplicates())
        out = np.zeros((len(files), len(classes)), dtype=np.int32)
        for i, f in enumerate(part_files):
            out[files.index(f)] = y_part[i]
        return out

    ref = khot(reference)
    est = khot(estimated)
    tp, fp, fn, _ = confusion_counts(ref, est)
    return pd.Series(macro_f_measure(tp, fp, fn), index=classes)
