"""Capture frozen sed_eval fixtures for the native-scorer parity suite.

The challenge's ground-truth scorer is the `sed_eval` package
(/root/reference/baseline/evaluation_measures.py:124-182). It cannot be
installed in the build sandbox (zero egress), so parity evidence there is
hand-traced fixtures (tests/test_sed_eval_derived.py) plus differential
fuzzing (tests/test_sed_fuzz.py). THIS script is the missing third leg,
runnable the moment any environment has the real package:

    pip install sed_eval           # needs network
    python tools/capture_sed_eval_fixtures.py [--n 10] [--out tests/fixtures/sed_eval]

It generates the SAME seeded random event-list cases as the fuzz suite
(tests/test_sed_fuzz.make_case — overlaps, duplicates, zero-length and
touching events, NaN rows), scores each with the REAL sed_eval (event-based
200 ms collar / 20 % offset collar, segment-based 1 s — the reference's
exact constructor arguments), and freezes inputs + expected numbers as JSON
under tests/fixtures/sed_eval/. tests/test_sed_eval_fixtures.py picks them
up automatically (it skips while the directory is empty), turning the
captured numbers into a permanent regression oracle for the native scorer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def df_to_rows(df):
    rows = []
    for r in df.itertuples(index=False):
        lab = r.event_label
        nan = isinstance(lab, float) and np.isnan(lab)
        rows.append([
            r.filename,
            None if nan else float(r.onset),
            None if nan else float(r.offset),
            None if nan else str(lab),
        ])
    return rows


def event_list(df, fname):
    """Per-file event list of dicts, mirroring the reference's
    get_event_list_current_file (evaluation_measures.py:105-121): NaN-label
    rows become a bare {'filename': f} entry."""
    out = []
    sub = df[df["filename"] == fname]
    for r in sub.itertuples(index=False):
        lab = r.event_label
        if isinstance(lab, float) and np.isnan(lab):
            out.append({"filename": fname})
        else:
            out.append({
                "filename": fname,
                "event_label": str(lab),
                "onset": float(r.onset),
                "offset": float(r.offset),
            })
    return out


def score_with_sed_eval(ref_df, est_df):
    import sed_eval

    classes = sorted(
        set(ref_df["event_label"].dropna().unique())
        | set(est_df["event_label"].dropna().unique() if not est_df.empty else [])
    )
    # the reference's exact constructions (evaluation_measures.py:124-182)
    ev = sed_eval.sound_event.EventBasedMetrics(
        event_label_list=classes,
        t_collar=0.200,
        percentage_of_length=0.2,
        empty_system_output_handling="zero_score",
    )
    seg = sed_eval.sound_event.SegmentBasedMetrics(
        event_label_list=classes, time_resolution=1.0
    )
    for fname in ref_df["filename"].unique():
        r = event_list(ref_df, fname)
        e = event_list(est_df, fname)
        ev.evaluate(reference_event_list=r, estimated_event_list=e)
        seg.evaluate(reference_event_list=r, estimated_event_list=e)

    def pack(m):
        cw = m.results_class_wise_metrics()
        return {
            "macro_f1": m.results_class_wise_average_metrics()["f_measure"]["f_measure"],
            "overall": m.results_overall_metrics(),
            "class_wise": {
                c: {
                    "f_measure": cw[c]["f_measure"]["f_measure"],
                    "precision": cw[c]["f_measure"]["precision"],
                    "recall": cw[c]["f_measure"]["recall"],
                    "n_ref": cw[c]["count"]["Nref"],
                    "n_sys": cw[c]["count"]["Nsys"],
                }
                for c in classes
            },
        }

    return pack(ev), pack(seg), getattr(sed_eval, "__version__", "unknown")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10, help="number of cases")
    ap.add_argument("--seed_base", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "tests", "fixtures", "sed_eval"))
    args = ap.parse_args(argv)
    try:
        import sed_eval  # noqa: F401
    except ImportError:
        print(
            "sed_eval is not importable here. Run this script in any "
            "environment with `pip install sed_eval` and copy the emitted "
            "tests/fixtures/sed_eval/*.json back into the repo.",
            file=sys.stderr,
        )
        return 1
    from test_sed_fuzz import make_case  # the fuzz suite's generator

    os.makedirs(args.out, exist_ok=True)
    for k in range(args.n):
        seed = args.seed_base + k
        ref, est = make_case(seed)
        ev, seg, version = score_with_sed_eval(ref, est)
        path = os.path.join(args.out, f"case_{seed:04d}.json")
        with open(path, "w") as f:
            json.dump(
                {
                    "seed": seed,
                    "sed_eval_version": version,
                    "reference": df_to_rows(ref),
                    "estimated": df_to_rows(est),
                    "event_based": ev,
                    "segment_based": seg,
                },
                f,
                indent=1,
            )
        print(f"wrote {path}  (event macro F1 {ev['macro_f1']:.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
