"""Self-contained SED scoring: event-based and segment-based macro F1.

The reference delegates scoring to the external `sed_eval` package
(evaluation_measures.py:124-182): EventBasedMetrics with a 200 ms onset
collar and an offset collar of max(200 ms, 20 % of the reference event
length), and SegmentBasedMetrics at 1 s resolution. This module implements
the same definitions natively so the framework has no unpackaged
dependencies; it is the scoring oracle for training-time validation and the
evaluate CLI.

Definitions implemented (matching the sed_eval conventions the reference
relies on):

  * Event-based, class-wise: within each file and class, a reference event
    matches an estimated event iff |onset_ref − onset_est| ≤ t_collar AND
    |offset_ref − offset_est| ≤ max(t_collar, percentage_of_length ·
    (offset_ref − onset_ref)). Matching is one-to-one (maximum bipartite
    matching over the hit graph). Per class: P = tp/n_sys, R = tp/n_ref,
    F = 2PR/(P+R); undefined → 0 (the reference's
    empty_system_output_handling='zero_score'). Macro F averages over the
    class list (union of reference and estimated labels, like
    evaluation_measures.py:138-141).
  * Segment-based: time is cut into `time_resolution` segments up to the
    max offset seen in either list for the file; a class is active in a
    segment if any of its events overlaps it; per-class tp/fp/fn accumulate
    over files.

Both accept dataframes with columns [filename, onset, offset, event_label]
(seconds), the exact shape produced by eval.decode and read from the
groundtruth TSVs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np
import pandas as pd


# ---------------------------------------------------------------- helpers


def _events_by_file_class(df: pd.DataFrame) -> Dict:
    """{filename: {class: [(onset, offset), ...]}}"""
    out: Dict = {}
    if df.empty:
        return out
    for row in df.itertuples(index=False):
        label = getattr(row, "event_label", None)
        if label is None or (isinstance(label, float) and np.isnan(label)):
            continue
        out.setdefault(row.filename, {}).setdefault(label, []).append(
            (float(row.onset), float(row.offset))
        )
    return out


def _max_matching(hits: np.ndarray) -> int:
    """Maximum bipartite matching size on a boolean [n_ref, n_est] hit
    matrix (augmenting paths — deterministic, optimal 1-1 pairing)."""
    n_ref, n_est = hits.shape
    match_est = np.full(n_est, -1)

    def try_assign(r, seen):
        for e in range(n_est):
            if hits[r, e] and not seen[e]:
                seen[e] = True
                if match_est[e] == -1 or try_assign(match_est[e], seen):
                    match_est[e] = r
                    return True
        return False

    count = 0
    for r in range(n_ref):
        if try_assign(r, np.zeros(n_est, dtype=bool)):
            count += 1
    return count


@dataclasses.dataclass
class ClassCounts:
    tp: float = 0.0
    n_ref: float = 0.0
    n_sys: float = 0.0

    @property
    def precision(self):
        return self.tp / self.n_sys if self.n_sys > 0 else 0.0

    @property
    def recall(self):
        return self.tp / self.n_ref if self.n_ref > 0 else 0.0

    @property
    def f_measure(self):
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) > 0 else 0.0

    @property
    def fp(self):
        return self.n_sys - self.tp

    @property
    def fn(self):
        return self.n_ref - self.tp


class SedMetrics:
    """Accumulated class-wise counts + report (sed_eval-style interface:
    `results_class_wise_average_metrics()['f_measure']['f_measure']` is the
    macro F1 the reference's SaveBest criterion reads, main.py:347-349)."""

    def __init__(self, classes: List[str], name: str):
        self.classes = list(classes)
        self.name = name
        self.counts = {c: ClassCounts() for c in self.classes}

    def class_wise_f_measure(self) -> Dict[str, float]:
        return {c: self.counts[c].f_measure for c in self.classes}

    def macro_f_measure(self) -> float:
        if not self.classes:
            return 0.0
        return float(np.mean([self.counts[c].f_measure for c in self.classes]))

    def results_class_wise_average_metrics(self):
        f = self.macro_f_measure()
        p = float(np.mean([self.counts[c].precision for c in self.classes])) if self.classes else 0.0
        r = float(np.mean([self.counts[c].recall for c in self.classes])) if self.classes else 0.0
        return {"f_measure": {"f_measure": f, "precision": p, "recall": r}}

    def results(self):
        return {
            "class_wise_average": self.results_class_wise_average_metrics(),
            "class_wise": {
                c: {
                    "f_measure": self.counts[c].f_measure,
                    "precision": self.counts[c].precision,
                    "recall": self.counts[c].recall,
                    "tp": self.counts[c].tp,
                    "n_ref": self.counts[c].n_ref,
                    "n_sys": self.counts[c].n_sys,
                }
                for c in self.classes
            },
        }

    def __str__(self):
        lines = [f"{self.name} metrics", f"  macro F1: {100*self.macro_f_measure():.2f}%"]
        for c in self.classes:
            cc = self.counts[c]
            lines.append(
                f"  {c:<28s} F1 {100*cc.f_measure:6.2f}%  P {100*cc.precision:6.2f}%  "
                f"R {100*cc.recall:6.2f}%  (ref {int(cc.n_ref)}, sys {int(cc.n_sys)})"
            )
        return "\n".join(lines)


# ----------------------------------------------------------- event-based


def event_based_metrics(
    reference: pd.DataFrame,
    estimated: pd.DataFrame,
    t_collar: float = 0.200,
    percentage_of_length: float = 0.2,
) -> SedMetrics:
    """Collar-matched event scoring over all files in `reference`
    (evaluation_measures.py:124-157 contract)."""
    classes = sorted(
        set(reference["event_label"].dropna().unique())
        | set(estimated["event_label"].dropna().unique() if not estimated.empty else [])
    )
    metrics = SedMetrics(classes, "Event-based")
    ref_map = _events_by_file_class(reference)
    est_map = _events_by_file_class(estimated)
    for fname in reference["filename"].unique():
        ref_classes = ref_map.get(fname, {})
        est_classes = est_map.get(fname, {})
        for c in classes:
            ref_evs = ref_classes.get(c, [])
            est_evs = est_classes.get(c, [])
            cc = metrics.counts[c]
            cc.n_ref += len(ref_evs)
            cc.n_sys += len(est_evs)
            if not ref_evs or not est_evs:
                continue
            hits = np.zeros((len(ref_evs), len(est_evs)), dtype=bool)
            for i, (r_on, r_off) in enumerate(ref_evs):
                off_collar = max(t_collar, percentage_of_length * (r_off - r_on))
                for j, (e_on, e_off) in enumerate(est_evs):
                    hits[i, j] = (
                        abs(r_on - e_on) <= t_collar and abs(r_off - e_off) <= off_collar
                    )
            cc.tp += _max_matching(hits)
    return metrics


# --------------------------------------------------------- segment-based


def segment_based_metrics(
    reference: pd.DataFrame,
    estimated: pd.DataFrame,
    time_resolution: float = 1.0,
) -> SedMetrics:
    """Fixed-grid segment scoring (evaluation_measures.py:160-182 contract)."""
    classes = sorted(
        set(reference["event_label"].dropna().unique())
        | set(estimated["event_label"].dropna().unique() if not estimated.empty else [])
    )
    metrics = SedMetrics(classes, "Segment-based")
    cindex = {c: i for i, c in enumerate(classes)}
    ref_map = _events_by_file_class(reference)
    est_map = _events_by_file_class(estimated)
    for fname in reference["filename"].unique():
        ref_classes = ref_map.get(fname, {})
        est_classes = est_map.get(fname, {})
        max_off = 0.0
        for evs in list(ref_classes.values()) + list(est_classes.values()):
            for _, off in evs:
                max_off = max(max_off, off)
        n_seg = int(np.ceil(max_off / time_resolution))
        if n_seg == 0:
            continue
        ref_act = np.zeros((n_seg, len(classes)), dtype=bool)
        est_act = np.zeros((n_seg, len(classes)), dtype=bool)
        for act, cmap in [(ref_act, ref_classes), (est_act, est_classes)]:
            for c, evs in cmap.items():
                ci = cindex[c]
                for on, off in evs:
                    lo = int(np.floor(on / time_resolution))
                    hi = int(np.ceil(off / time_resolution))
                    act[max(0, lo) : min(n_seg, hi), ci] = True
        for c in classes:
            ci = cindex[c]
            cc = metrics.counts[c]
            cc.tp += float(np.sum(ref_act[:, ci] & est_act[:, ci]))
            cc.n_ref += float(np.sum(ref_act[:, ci]))
            cc.n_sys += float(np.sum(est_act[:, ci]))
    return metrics


def compute_strong_metrics(predictions: pd.DataFrame, valid_df: pd.DataFrame, logger=None):
    """Event+segment scoring with the reference's parameters
    (compute_strong_metrics, evaluation_measures.py:234-246); returns the
    event-based metrics object (the SaveBest criterion source)."""
    metric_event = event_based_metrics(valid_df, predictions, 0.200, 0.2)
    metric_segment = segment_based_metrics(valid_df, predictions, 1.0)
    if logger is not None:
        logger.info(str(metric_event))
        logger.info(str(metric_segment))
    return metric_event
