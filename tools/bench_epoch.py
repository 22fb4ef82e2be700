"""Full-epoch wall-clock split at flagship config (VERDICT r3 #6).

bench.py times the device-resident train step and tools/bench_eval.py the
serving forward; this tool reports what a full TRAINING EPOCH costs — the
number a 100-epoch user plans around (reference main.py:316-331 runs
train + validation every epoch) — split into:

  * train:        the jitted Mean-Teacher step over every batch
                  (host pipeline + device step, as Experiment.train_epoch)
  * eval_forward: featurize + CRNN forward on the validation streams
                  (device) including the device->host fetch of the probs
  * host_decode:  threshold -> median -> run-length -> TSV dataframes
  * host_score:   event/segment SED scoring + weak tagging F1 (host)

Measured on a --subpart slice (synthetic audio, hermetic) and extrapolated
to the full DESED manifest sizes by per-step / per-batch / per-clip rates
(the rates are what's measured; the full-epoch number is rate x count,
stated as such). Writes EPOCH_BENCH.json and prints a RESULTS.md-ready row.

Run (TPU): python tools/bench_epoch.py
     (CPU): DCASE_PLATFORM=cpu python tools/bench_epoch.py --subpart 48
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

from dcase2019_task4_tpu.cli import _apply_platform_override  # noqa: E402

_apply_platform_override()

import jax  # noqa: E402

from dcase2019_task4_tpu.config import Config, ModelConfig, TrainConfig  # noqa: E402
from dcase2019_task4_tpu.data.pipeline import iter_eval_batches  # noqa: E402
from dcase2019_task4_tpu.eval.decode import decode_batch, predictions_to_tsv  # noqa: E402
from dcase2019_task4_tpu.eval.sed_scores import compute_strong_metrics  # noqa: E402
from dcase2019_task4_tpu.eval.tagging import TaggingF1  # noqa: E402
from dcase2019_task4_tpu.train.experiment import Experiment  # noqa: E402

# full DESED manifest sizes (dataset_metadata/train/*.tsv rows; 80% train
# split on weak/synthetic) for the extrapolation
FULL_WEAK_TRAIN = 1262        # 1578 * 0.8
FULL_UNLABEL = 14412
FULL_SYNTH_TRAIN = 1636      # 2045 * 0.8
FULL_VALID_SYNTH = 409       # 2045 * 0.2
FULL_VALID_WEAK = 316        # 1578 * 0.2


def timed_validation(exp):
    """Experiment.validate's exact work, with the device / host phases
    timed separately. Returns (splits dict, n_batches per stream)."""
    d = exp.cfg.dsp
    t_fwd = t_dec = t_score = 0.0
    params, bn = exp._eval_params()

    import pandas as pd

    dfs, n_synth_batches = [], 0
    for batch in iter_eval_batches(
        exp.valid_synth_stream, exp.pipeline.batch_size, d.max_samples,
        d.n_window, d.hop_length, d.max_frames,
    ):
        t0 = time.perf_counter()
        x = exp.eval_features(batch["audio"], batch["frames"])
        strong, _ = exp.predict_step(params, bn, x)
        strong = np.asarray(strong)  # device->host fetch counts as forward
        t_fwd += time.perf_counter() - t0
        t0 = time.perf_counter()
        dfs.append(decode_batch(
            strong[: batch["n_valid"]], batch["filenames"], exp.codec,
            d.sample_rate, d.hop_length, exp.cfg.model.pooling_time_ratio,
            threshold=0.5, median_window=exp.cfg.train.median_window,
        ))
        t_dec += time.perf_counter() - t0
        n_synth_batches += 1
    t0 = time.perf_counter()
    predictions = predictions_to_tsv(pd.concat(dfs, ignore_index=True), None)
    compute_strong_metrics(predictions, exp.valid_synth_df, exp.log)
    t_score += time.perf_counter() - t0

    acc = TaggingF1(len(exp.classes))
    n_weak_batches = 0
    for batch in iter_eval_batches(
        exp.valid_weak_stream, exp.pipeline.batch_size, d.max_samples,
        d.n_window, d.hop_length, d.max_frames,
    ):
        t0 = time.perf_counter()
        x = exp.eval_features(batch["audio"], batch["frames"])
        _, weak = exp.predict_step(params, bn, x)
        weak = np.asarray(weak)
        t_fwd += time.perf_counter() - t0
        t0 = time.perf_counter()
        acc.update(weak[: batch["n_valid"]], batch["target"][: batch["n_valid"]])
        t_score += time.perf_counter() - t0
        n_weak_batches += 1
    t0 = time.perf_counter()
    float(np.mean(acc.per_class_f1()))
    t_score += time.perf_counter() - t0
    return ({"eval_forward_s": t_fwd, "host_decode_s": t_dec,
             "host_score_s": t_score},
            n_synth_batches + n_weak_batches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subpart", type=int, default=240)
    ap.add_argument("--bf16", action="store_true", default=False)
    ap.add_argument("--batch_size", type=int, default=24,
                    help="reference parity batch (config.py:27); bench.py's "
                         "flagship throughput row uses 96")
    ap.add_argument("--device_cache", action="store_true", default=False,
                    help="measure the device-resident epoch mode (whole set "
                         "pinned in HBM, one scan dispatch per epoch) "
                         "instead of the streamed host feed")
    ap.add_argument("--out", default=None,
                    help="default EPOCH_BENCH.json "
                         "(EPOCH_BENCH_device.json with --device_cache)")
    args = ap.parse_args()
    if args.out is None:
        name = "EPOCH_BENCH_device.json" if args.device_cache else "EPOCH_BENCH.json"
        args.out = os.path.join(REPO, name)

    cfg = Config(
        model=ModelConfig(
            compute_dtype="bfloat16" if args.bf16 else "float32"),
        train=TrainConfig(batch_size=args.batch_size, n_epoch=2,
                          checkpoint_epochs=0, save_best=False),
    )
    exp = Experiment(cfg, mean_teacher=True, subpart_data=args.subpart,
                     synthetic_audio=True, seed=0,
                     device_cache=args.device_cache)
    exp.build()
    B = exp.pipeline.batch_size

    # epoch 0: compile warmup for every shape (train + both eval streams)
    exp.train_epoch(0)
    timed_validation(exp)

    # epoch 1: the timed epoch
    t0 = time.perf_counter()
    exp.train_epoch(1)
    train_s = time.perf_counter() - t0
    splits, n_eval_batches = timed_validation(exp)
    n_steps = len(exp.pipeline)

    valid_s = sum(splits.values())
    n_valid_clips = len(exp.valid_synth_stream) + len(exp.valid_weak_stream)
    # rate x full-dataset counts (stated extrapolation, not a measurement)
    full_steps = min(FULL_WEAK_TRAIN // (B // 4), FULL_UNLABEL // (B // 2),
                     FULL_SYNTH_TRAIN // (B // 4))
    full_valid_clips = FULL_VALID_SYNTH + FULL_VALID_WEAK
    full_epoch_s = (train_s / n_steps * full_steps
                    + valid_s / n_valid_clips * full_valid_clips)

    doc = {
        "batch_size": B,
        "bf16": args.bf16,
        "device_cache": args.device_cache,
        "subpart": args.subpart,
        "steps_per_epoch": n_steps,
        "train_s": round(train_s, 3),
        "train_s_per_step": round(train_s / n_steps, 4),
        **{k: round(v, 3) for k, v in splits.items()},
        "valid_s": round(valid_s, 3),
        "valid_clips": n_valid_clips,
        "valid_s_per_clip": round(valid_s / n_valid_clips, 4),
        "epoch_s_measured": round(train_s + valid_s, 3),
        "full_desed_extrapolation": {
            "steps_per_epoch": full_steps,
            "valid_clips": full_valid_clips,
            "epoch_s": round(full_epoch_s, 1),
            "run_100_epochs_h": round(full_epoch_s * 100 / 3600, 2),
        },
        "backend": jax.default_backend(),
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
