"""Semi-supervised value ablation: does the Mean-Teacher consistency term
actually do work? (VERDICT r2 item 3 — the recipe's reason-to-exist,
embodied in the reference's consistency loss, main.py:93-145, must be
demonstrated rather than assumed: a regression that silently neutered the
consistency term would otherwise pass every test.)

Three arms at an EQUAL LABELED BUDGET (same --subpart cap on the weak and
synthetic manifests, same split seeds):

  supervised  labeled streams only (the simple-CRNN recipe: 1/2 weak +
              1/2 synthetic batches, no teacher) — main_simple_CRNN.py
  mt          Mean-Teacher with the unlabeled stream added
              (1/4 weak + 1/2 unlabeled + 1/4 synthetic) — main.py
  mt_cc0      identical to `mt` but max_consistency_cost = 0: the
              teacher/EMA machinery runs, the consistency gradient is
              exactly zero. Any mt-vs-mt_cc0 gap is the consistency term.
  mt_nv       `mt` with the teacher consuming an INDEPENDENT nuisance
              render of each clip (Experiment(paired_teacher_view=True));
              mt_nv - mt_cc0 isolates the consistency gradient when its
              view perturbation spans the data nuisance — measured
              +0.199 event F1, 4/4 seeds, under --nuisance_shift 0.4,0.6
              (RESULTS.md round 5; gaussian views: -0.033).

Each arm trains --epochs epochs with per-epoch validation (synthetic
audio → hermetic, deterministic per seed) and reports the BEST validation
event-based macro F1 and weak tagging F1 over the run (the SaveBest view).
Arms are averaged over --seeds seeds.

Exit status: 0 if the semi-supervised value check passes (mean best event
F1 of `mt` > that of `supervised` + --margin: the unlabeled stream must be
worth something at equal labeled budget), else 1. The mt-vs-mt_cc0 gap —
the consistency GRADIENT's isolated contribution (the two arms are
identical in batch layout, BN statistics, steps/epoch, and teacher
machinery) — is always reported; --strict_consistency additionally
requires mt >= mt_cc0 - --tolerance.

Round 3 measured the DETERMINISTIC tone-bank source (--variability 0) and
found it structurally unable to reward perturbation invariance: every clip
renders identically every time, so the teacher's noise view carries no
invariance worth learning and zeroing the consistency gradient HELPED
(RESULTS.md round-3 section). Round 4 therefore defaults --variability 1.0:
per-clip noise floor/gain spread and per-event timbre/detune/wobble
(audio_io.synth_clip) put real nuisance variation in the data distribution
— the thing input-perturbation consistency exists to smooth over
(reference main.py:93-145).

Two scale requirements learned the hard way (round-4 diagnosis,
tools/diag_mt_var.py): the reference's EMA schedule
alpha = min(1 - 1/(step+1), 0.999) (main.py:45-49) means that for total
step budgets <= 1000 the cap NEVER binds and the teacher is exactly the
uniform arithmetic mean of the whole student trajectory INCLUDING random
init — at 800 steps the teacher scored weak F1 0.00 and the consistency
loss (weight ramping to 2) dragged the student toward it. The recipe needs
(a) a total step budget of >= ~3000 so alpha caps early and the teacher
becomes a trailing average of a converged student (reference scale: ~21k
steps, cap binds at step 1000 = 5%), and (b) an unlabeled:labeled ratio
near the real dataset's ~5:1 (14412 unlabeled vs 3623 labeled files) —
a single subpart cap applied to all three manifests starves MT of
unlabeled data (120 unlabeled vs 192 labeled train clips). Hence
--epochs 250 --eval_every 10 --subpart_unlabeled 600 defaults.

Run (TPU): python tools/ablate_ssl.py --seeds 4
Run (CPU fallback): DCASE_PLATFORM=cpu python tools/ablate_ssl.py ...
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

from dcase2019_task4_tpu.cli import _apply_platform_override  # noqa: E402

_apply_platform_override()


def run_arm(name, mean_teacher, max_cc, subpart, epochs, seed, store_root,
            variability=0.0, subpart_unlabeled=None, eval_every=1,
            device_cache=True, labeled_band=None, paired_view=False):
    import numpy as np

    from dcase2019_task4_tpu.config import Config, TrainConfig
    from dcase2019_task4_tpu.train.experiment import Experiment

    cfg = Config(train=TrainConfig(
        n_epoch=epochs,
        max_consistency_cost=max_cc,
        checkpoint_epochs=0,  # no per-epoch snapshots; metrics.jsonl is the record
    ))
    # nuisance shift: labeled TRAIN streams confined to a narrow quantile
    # band of the nuisance distribution; the unlabeled stream and both
    # validation streams keep the full band (audio_io.synth_clip)
    bands = None
    if labeled_band is not None:
        bands = {"weak": labeled_band, "synthetic": labeled_band}
    exp = Experiment(
        cfg, mean_teacher=mean_teacher, subpart_data=subpart,
        subpart_unlabeled=subpart_unlabeled,
        synthetic_audio=True, synthetic_variability=variability, seed=seed,
        synthetic_bands=bands,
        device_cache=device_cache,
        paired_teacher_view=paired_view,
    )
    store = os.path.join(store_root, f"{name}_s{seed}")
    if os.path.exists(store):  # leftover from an interrupted run: start clean
        import shutil

        shutil.rmtree(store)
    t0 = time.time()
    exp.run(store_dir=store, n_epoch=epochs, eval_every=eval_every)
    wall = time.time() - t0
    # best-over-run validation numbers from the structured history
    best_event, best_weak, best_global = 0.0, 0.0, 0.0
    hist_path = os.path.join(store, "metrics.jsonl")
    with open(hist_path) as f:
        for line in f:
            rec = json.loads(line)
            best_event = max(best_event, rec.get("event_macro_f1", 0.0))
            best_weak = max(best_weak, rec.get("weak_macro_f1", 0.0))
            best_global = max(best_global, rec.get("global_valid", 0.0))
    n_labeled = sum(
        len(s) for s in exp.pipeline.streams if s.name in ("weak", "synthetic")
    )
    n_unlabeled = sum(len(s) for s in exp.pipeline.streams if s.name == "unlabeled")
    return {
        "arm": name, "seed": seed,
        "best_event_macro_f1": round(best_event, 4),
        "best_weak_macro_f1": round(best_weak, 4),
        "best_global_valid": round(best_global, 4),
        "steps_per_epoch": len(exp.pipeline),
        "n_labeled_clips": n_labeled, "n_unlabeled_clips": n_unlabeled,
        "wall_s": round(wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subpart", type=int, default=120,
                    help="per-manifest file cap = the labeled budget knob")
    ap.add_argument("--epochs", type=int, default=250,
                    help="with 16 steps/epoch at the default geometry this "
                         "is a 4000-step budget — enough for the EMA alpha "
                         "cap to bind at 25% of training (see module doc)")
    ap.add_argument("--subpart_unlabeled", type=int, default=600,
                    help="separate cap for the unlabeled manifest "
                         "(~5:1 unlabeled:labeled, the real dataset's ratio)")
    ap.add_argument("--eval_every", type=int, default=10,
                    help="validate every Nth epoch (host-side decode+scoring "
                         "dominates wall-clock at this tiny geometry)")
    ap.add_argument("--no_device_cache", action="store_true", default=False,
                    help="stream batches per step instead of pinning the "
                         "set in HBM (slow through the tunnel; A/B only)")
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--seed_base", type=int, default=0,
                    help="first seed (run seeds [base, base+seeds)) — lets a "
                         "second invocation add independent seeds without "
                         "re-running the first")
    ap.add_argument("--margin", type=float, default=0.02,
                    help="mt must beat supervised by this much (event F1)")
    ap.add_argument("--strict_consistency", action="store_true",
                    help="also require mt >= mt_cc0 - tolerance")
    ap.add_argument("--tolerance", type=float, default=0.0,
                    help="mt may trail mt_cc0 by this much under "
                         "--strict_consistency")
    ap.add_argument("--variability", type=float, default=1.0,
                    help="synthetic-source nuisance variation strength "
                         "(audio_io.synth_clip). The deterministic 0.0 "
                         "source is structurally unable to reward "
                         "perturbation invariance (RESULTS.md round 3); "
                         "the default 1.0 makes the consistency term's "
                         "job learnable.")
    ap.add_argument("--nuisance_shift", default=None, metavar="LO,HI",
                    help="confine the LABELED train streams (weak+synthetic) "
                         "to this quantile band of the nuisance distribution "
                         "while unlabeled + validation span the full (0,1) "
                         "band (audio_io.synth_clip nuisance_band) — the "
                         "regime where input-perturbation invariance is "
                         "learnable only through the unlabeled data, i.e. "
                         "where the consistency GRADIENT (mt - mt_cc0) "
                         "should turn positive. E.g. --nuisance_shift 0.4,0.6")
    ap.add_argument("--store", default="/tmp/ablate_ssl")
    ap.add_argument("--out", default=os.path.join(REPO, "ABLATION_ssl.json"))
    ap.add_argument("--arms", default="supervised,mt,mt_cc0")
    args = ap.parse_args()
    labeled_band = None
    if args.nuisance_shift:
        lo, hi = (float(x) for x in args.nuisance_shift.split(","))
        labeled_band = (lo, hi)

    arm_defs = {
        "supervised": dict(mean_teacher=False, max_cc=2.0),
        "mt": dict(mean_teacher=True, max_cc=2.0),
        "mt_cc0": dict(mean_teacher=True, max_cc=0.0),
        # paired-teacher-view probe: the teacher featurizes an INDEPENDENT
        # nuisance render of each clip (Experiment(paired_teacher_view=True))
        # — the consistency term now enforces invariance ACROSS the nuisance
        # distribution rather than across gaussian input noise. If the
        # consistency gradient has a positive regime on this source, this is
        # it: mt_nv - mt_cc0 measures the gradient when the view
        # perturbation actually spans the nuisance the validation set varies
        # over (gaussian noise, the reference's perturbation, is nearly
        # orthogonal to the timbre/detune/gain nuisance axes).
        "mt_nv": dict(mean_teacher=True, max_cc=2.0, paired=True),
    }
    results = []
    if os.path.exists(args.out):  # accumulate across same-config invocations
        with open(args.out) as f:
            prev = json.load(f)
        prev_cfg = (prev.get("subpart"), prev.get("epochs"),
                    prev.get("variability", 0.0),
                    prev.get("subpart_unlabeled"), prev.get("eval_every", 1),
                    prev.get("nuisance_shift"))
        if prev_cfg == (args.subpart, args.epochs, args.variability,
                        args.subpart_unlabeled, args.eval_every,
                        args.nuisance_shift):
            results = prev.get("runs", [])
            done = {(r["arm"], r["seed"]) for r in results}
            if done:
                print(f"resuming: {len(done)} arm-runs already in {args.out}")
        else:
            # never silently overwrite another config's accumulated runs
            print(f"ERROR: {args.out} holds results for (subpart, epochs, "
                  f"variability, subpart_unlabeled, eval_every)={prev_cfg}, "
                  f"requested {(args.subpart, args.epochs, args.variability, args.subpart_unlabeled, args.eval_every)}. "
                  "Pass a different --out (or matching config flags).",
                  file=sys.stderr)
            sys.exit(2)

    def mean_of(arm, key):
        vals = [r[key] for r in results if r["arm"] == arm]
        return sum(vals) / len(vals) if vals else None

    def write_doc():
        # summarize every arm present in the accumulated runs (an
        # invocation adding seeds for a subset must not drop the others)
        arms_present = list(dict.fromkeys(
            list(args.arms.split(",")) + [r["arm"] for r in results]))
        summary = {a: {
            "event_f1": mean_of(a, "best_event_macro_f1"),
            "weak_f1": mean_of(a, "best_weak_macro_f1"),
        } for a in arms_present}
        doc = {"subpart": args.subpart, "epochs": args.epochs,
               "variability": args.variability,
               "subpart_unlabeled": args.subpart_unlabeled,
               "eval_every": args.eval_every,
               "nuisance_shift": args.nuisance_shift,
               "seeds": len({r["seed"] for r in results}),
               "summary": summary, "runs": results}
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        return summary

    for seed in range(args.seed_base, args.seed_base + args.seeds):
        for arm in args.arms.split(","):
            if any(r["arm"] == arm and r["seed"] == seed for r in results):
                continue  # already done in a previous invocation
            d = arm_defs[arm]
            print(f"=== arm {arm} seed {seed} ===", flush=True)
            r = run_arm(arm, d["mean_teacher"], d["max_cc"],
                        args.subpart, args.epochs, seed, args.store,
                        variability=args.variability,
                        subpart_unlabeled=args.subpart_unlabeled,
                        eval_every=args.eval_every,
                        device_cache=not args.no_device_cache,
                        labeled_band=labeled_band,
                        paired_view=d.get("paired", False))
            print(json.dumps(r), flush=True)
            results.append(r)
            write_doc()  # crash-safe: partial results land after every arm

    summary = write_doc()
    print("\n=== ablation summary (best validation F1, mean over seeds) ===")
    for a, s in summary.items():
        ev = "n/a" if s["event_f1"] is None else f"{s['event_f1']:.4f}"
        wk = "n/a" if s["weak_f1"] is None else f"{s['weak_f1']:.4f}"
        print(f"  {a:<11s} event {ev}  weak {wk}")

    def _have(*arms):
        return all(a in summary and summary[a]["event_f1"] is not None
                   for a in arms)

    ok = True
    if _have("mt", "supervised"):
        gain = summary["mt"]["event_f1"] - summary["supervised"]["event_f1"]
        ssl_ok = gain > args.margin
        ok = ok and ssl_ok
        print(f"semi-supervised value (mt - supervised event F1): {gain:+.4f}")
        print("CHECK", "PASS" if ssl_ok else "FAIL",
              ": the unlabeled stream",
              "is worth real F1 at equal labeled budget" if ssl_ok
              else "adds nothing — the Mean-Teacher recipe is broken")
    if _have("mt", "mt_cc0"):
        gap = summary["mt"]["event_f1"] - summary["mt_cc0"]["event_f1"]
        print(f"consistency-GRADIENT contribution (mt - mt_cc0 event F1): {gap:+.4f}")
        if args.strict_consistency:
            c_ok = gap >= -args.tolerance
            ok = ok and c_ok
            print("STRICT CHECK", "PASS" if c_ok else "FAIL",
                  ": zeroing the consistency weight",
                  "degrades (or ties)" if c_ok else "IMPROVES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
