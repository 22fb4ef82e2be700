"""Diagnose the MT-arm collapse at variability=1.0 (round-4 SSL ablation).

Observed: at --variability 1.0, the mt/mt_cc0 arms' best VALID weak F1 is
0.05-0.17 while the supervised arm reaches ~0.40 — yet mt training losses
are healthy (weak BCE 0.26 at epoch 79). This script dissects the trained
mt_s0 checkpoint without re-training:

  1. student, eval-mode BN (running stats)  == what the ablation measured
  2. student, batch-stats BN                == isolates BN running-stat skew
  3. teacher (EMA), eval-mode BN            == is the teacher healthier?
  4. scaler moments per arm                 == normalization differences
  5. train-weak-stream weak F1              == train/valid generalization gap

Usage: DCASE_PLATFORM=cpu DCASE_SCALER_CACHE=/tmp/scaler_cache \
           python tools/diag_mt_var.py [--ckpt_root /tmp/ablate_ssl_var]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

from dcase2019_task4_tpu.cli import _apply_platform_override  # noqa: E402

_apply_platform_override()

import jax  # noqa: E402

from dcase2019_task4_tpu.config import Config, ModelConfig, TrainConfig  # noqa: E402
from dcase2019_task4_tpu.data.pipeline import iter_eval_batches  # noqa: E402
from dcase2019_task4_tpu.eval.tagging import TaggingF1  # noqa: E402
from dcase2019_task4_tpu.train import checkpoints as ckpt  # noqa: E402
from dcase2019_task4_tpu.train.experiment import Experiment  # noqa: E402


def weak_f1_variant(exp, stream, params, bn, mode: str) -> float:
    """Weak tagging F1 with explicit (params, bn) and BN mode."""
    d = exp.cfg.dsp
    acc = TaggingF1(len(exp.classes))
    rng = jax.random.PRNGKey(0)
    for batch in iter_eval_batches(
        stream, exp.pipeline.batch_size, d.max_samples, d.n_window,
        d.hop_length, d.max_frames,
    ):
        x = exp.eval_features(batch["audio"], batch["frames"])
        if mode == "eval":
            strong, weak, _ = exp.model.apply(params, bn, x, train=False)
        else:  # batch-stats BN, dropout off via rng but dropout=0.5 in cfg...
            # train=True applies dropout; to isolate BN use a model cfg copy
            strong, weak, _ = exp.model.apply(
                params, bn, x, train=True, rng=rng)
        nv = batch["n_valid"]
        acc.update(np.asarray(weak)[:nv], batch["target"][:nv])
    return float(np.mean(acc.per_class_f1()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_root", default="/tmp/ablate_ssl_var")
    ap.add_argument("--subpart", type=int, default=120)
    ap.add_argument("--variability", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # ---- scaler moments per arm (straight from checkpoint metadata)
    for arm in ("supervised", "mt", "mt_cc0"):
        path = os.path.join(args.ckpt_root, f"{arm}_s{args.seed}",
                            "model", "baseline_best")
        if not os.path.exists(path):
            continue
        meta = ckpt.read_metadata(path)
        sc = meta["scaler"]
        m = np.asarray(sc["mean_"])
        s = np.sqrt(np.maximum(np.asarray(sc["mean_of_square_"]) - m**2, 0))
        print(f"[scaler] {arm}_s{args.seed}: mean [{m.min():+.2f},{m.max():+.2f}] "
              f"avg {m.mean():+.2f} | std [{s.min():.2f},{s.max():.2f}] "
              f"avg {s.mean():.2f} | best epoch {meta['epoch']} "
              f"valid {meta['valid_metric']}")

    # ---- build the mt experiment shape and restore the mt checkpoint
    # dropout 0 so train=True isolates BATCH-STATS BN (no dropout noise)
    cfg = Config(model=ModelConfig(dropout=0.0),
                 train=TrainConfig(n_epoch=80, checkpoint_epochs=0))
    exp = Experiment(cfg, mean_teacher=True, subpart_data=args.subpart,
                     synthetic_audio=True,
                     synthetic_variability=args.variability, seed=args.seed)
    exp.build()
    mt_path = os.path.join(args.ckpt_root, f"mt_s{args.seed}",
                           "model", "baseline_best")
    meta = exp.restore(mt_path)
    print(f"[restore] {mt_path} epoch {meta['epoch']} "
          f"valid {meta['valid_metric']}")

    st = exp.state
    names = [s.name for s in exp.pipeline.streams]
    train_weak = exp.pipeline.streams[names.index("weak")]

    rows = [
        ("student/eval-BN/valid", st.params, st.bn_state, exp.valid_weak_stream, "eval"),
        ("student/batch-BN/valid", st.params, st.bn_state, exp.valid_weak_stream, "train"),
        ("teacher/eval-BN/valid", st.ema_params, st.ema_bn_state, exp.valid_weak_stream, "eval"),
        ("student/eval-BN/TRAIN-weak", st.params, st.bn_state, train_weak, "eval"),
        ("student/batch-BN/TRAIN-weak", st.params, st.bn_state, train_weak, "train"),
    ]
    for label, p, b, stream, mode in rows:
        f1 = weak_f1_variant(exp, stream, p, b, mode)
        print(f"[weak-F1] {label:28s} {f1:.4f}")

    # ---- BN running stats sanity: compare magnitude per conv block
    for k, v in exp.state.bn_state.items():
        flat, _ = jax.tree_util.tree_flatten_with_path(v)
        for path, leaf in flat:
            a = np.asarray(leaf)
            print(f"[bn] {k}{jax.tree_util.keystr(path)}: "
                  f"shape {a.shape} min {a.min():+.3f} max {a.max():+.3f} "
                  f"mean {a.mean():+.3f}")


if __name__ == "__main__":
    main()
