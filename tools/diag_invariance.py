"""Direct nuisance-invariance measurement — the mechanism check behind the
paired-teacher-view result (RESULTS.md round 5; tools/ablate_ssl.py mt_nv).

The causal story under test: consistency across nuisance views (mt_nv)
=> the student learns nuisance-INVARIANT features => better F1 on the
full-band validation set. ablate_ssl measures the endpoints (F1); this
tool measures the middle directly: render the SAME validation clips under
K independent nuisance draws (distinct synth salts, full band, identical
event content/labels — audio_io.synth_clip) and quantify how much each
trained checkpoint's predictions move across renders.

Reported per checkpoint:
  strong_std   mean over (clip, frame, class) of the std of the strong
               (frame-level) probability across the K renders
  weak_std     same for the clip-level (attention-pooled) probabilities
  flip_rate    fraction of (clip, frame, class) cells whose 0.5-threshold
               decision is NOT unanimous across renders — the dispersion
               that actually costs event F1

Prediction: dispersion(mt_nv) < dispersion(mt_cc0) ~ dispersion(mt);
supervised (narrow-band labeled data only) highest. If mt_nv's F1 win
came from anything OTHER than learned invariance, this ordering breaks.

Run (after an ablate_ssl --nuisance_shift run; stores in /tmp):
  python tools/diag_invariance.py \
    --ckpt supervised=/tmp/ablate_shift/supervised_s0/model/baseline_best \
    --ckpt mt=/tmp/ablate_shift/mt_s0/model/baseline_best \
    --ckpt mt_cc0=/tmp/ablate_shift/mt_cc0_s0/model/baseline_best \
    --ckpt mt_nv=/tmp/ablate_shift_nv/mt_nv_s0/model/baseline_best \
    --out DIAG_invariance.json
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

from dcase2019_task4_tpu.cli import _apply_platform_override  # noqa: E402

_apply_platform_override()


def measure(ckpt_path: str, renders: int, subpart: int, variability: float):
    import numpy as np

    from dcase2019_task4_tpu.data.audio_io import SyntheticAudioSource
    from dcase2019_task4_tpu.data.manifests import (
        load_manifest,
        split_synthetic,
        subpart_manifest,
    )
    from dcase2019_task4_tpu.data.pipeline import Stream, iter_eval_batches
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    ev = CheckpointEvaluator(ckpt_path, synthetic_audio=True)
    cfg = ev.cfg
    d, t = cfg.dsp, cfg.train
    # the ablation's validation synthetic split, reproduced exactly
    # (experiment.py build(): subpart seed, then 80/20 split seed 26)
    synth_m = subpart_manifest(load_manifest(cfg.paths.synthetic), subpart,
                               t.subpart_seed)
    _, valid_m = split_synthetic(synth_m, 1 - t.valid_fraction, t.split_seed)

    probs_s, probs_w = [], []  # per render: [N, T', C] / [N, C]
    for k in range(renders):
        salt = "desed-synth" if k == 0 else f"desed-synth/diag{k}"
        src = SyntheticAudioSource(
            valid_m, ev.codec.labels, d.sample_rate, d.max_len_seconds,
            variability=variability, seed_salt=salt,
        )
        stream = Stream("diag", valid_m, src, ev.codec, d.sample_rate,
                        d.hop_length, ev.meta["pooling_time_ratio"])
        ss, ww = [], []
        for batch in iter_eval_batches(stream, t.batch_size, d.max_samples,
                                       d.n_window, d.hop_length, d.max_frames):
            feats = ev.eval_features(batch["audio"], batch["frames"])
            s, w = ev.predict(ev.state.params, ev.state.bn_state, feats)
            n = batch["n_valid"]
            ss.append(np.asarray(s)[:n])
            ww.append(np.asarray(w)[:n])
        probs_s.append(np.concatenate(ss))
        probs_w.append(np.concatenate(ww))
    S = np.stack(probs_s)  # [K, N, T', C]
    W = np.stack(probs_w)  # [K, N, C]
    dec = S >= 0.5
    unanimous = np.all(dec == dec[:1], axis=0)
    return {
        "n_clips": int(S.shape[1]),
        "renders": renders,
        "strong_std": float(S.std(axis=0, ddof=0).mean()),
        "weak_std": float(W.std(axis=0, ddof=0).mean()),
        "flip_rate": float(1.0 - unanimous.mean()),
        "epoch": ev.meta.get("epoch"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", action="append", required=True, metavar="NAME=PATH",
                    help="checkpoint to measure (repeatable)")
    ap.add_argument("--renders", type=int, default=4,
                    help="independent nuisance renders per clip")
    ap.add_argument("--subpart", type=int, default=120,
                    help="synthetic-manifest cap (match the ablation run)")
    ap.add_argument("--variability", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join(REPO, "DIAG_invariance.json"))
    args = ap.parse_args()

    results = {}
    if os.path.exists(args.out):  # accumulate (crash-safe across arms)
        with open(args.out) as f:
            prev = json.load(f)
        if (prev.get("renders"), prev.get("subpart"),
                prev.get("variability")) == (args.renders, args.subpart,
                                             args.variability):
            results = prev.get("checkpoints", {})

    for spec in args.ckpt:
        name, path = spec.split("=", 1)
        if name in results:
            print(f"{name}: already measured, skipping")
            continue
        print(f"=== {name}: {path}", flush=True)
        results[name] = measure(path, args.renders, args.subpart,
                                args.variability)
        print(json.dumps({name: results[name]}), flush=True)
        with open(args.out, "w") as f:
            json.dump({"renders": args.renders, "subpart": args.subpart,
                       "variability": args.variability,
                       "checkpoints": results}, f, indent=1)

    print("\n=== prediction dispersion across nuisance renders ===")
    print(f"{'ckpt':<14s} {'strong_std':>10s} {'weak_std':>9s} {'flip_rate':>9s}")
    for name, r in results.items():
        print(f"{name:<14s} {r['strong_std']:>10.4f} {r['weak_std']:>9.4f} "
              f"{r['flip_rate']:>9.4f}")


if __name__ == "__main__":
    main()
