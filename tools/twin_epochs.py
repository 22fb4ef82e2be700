"""Epoch-scale torch-twin parity through both FULL pipelines (VERDICT r3 #5).

The 50-step dynamics test (tests/test_training_dynamics.py) pins the loop
body on precomputed identical feature batches at reduced geometry. This tool
extends the pin to the scale where BatchNorm momentum, the dataset scaler,
and the featurization frontend interact: both frameworks train at FLAGSHIP
model geometry on the same synthetic-audio clip stream, each through its
OWN featurization —

  ours: packed int16 audio -> fused on-device STFT->mel->dB (ops/mel.py) ->
        device-fitted scaler -> jitted Mean-Teacher step (train/steps.py)
  twin: the same int16 audio -> torch.stft configured like the reference's
        librosa call (DatasetDcase2019Task4.py:209-218) -> Slaney mel ->
        amplitude_to_db -> its own host scaler fit -> the reference loop
        body (main.py:52-165) in torch

Shared by construction: initial weights (copied leaf-for-leaf), batch order
and stream composition (the deterministic multi-stream sampler), loss
masks, rampup schedule, Adam/EMA hyperparameters, decode + SED scoring
(host-side, framework-independent, pinned vs sed_eval elsewhere).
Independent by design: featurization numerics (<=0.15 dB, tests/test_mel.py)
and the teacher-noise PRNG (each framework draws its own |N(0, 0.25)| mel
noise). Dropout is 0 in both twins (different PRNGs would add pure noise;
dropout parity is pinned in the fused-block tests).

Two modes:
  * fresh (default): E epochs from identical random init -> per-epoch mean
    losses must track; decoded metrics compared at the end (near zero this
    early -- the loss trajectories carry the signal).
  * --init_checkpoint CKPT: import a TRAINED checkpoint into both twins,
    compare decoded event/weak F1 at a quality-bearing operating point
    (each framework featurizes + normalizes with its own stack), then
    continue training E epochs and compare the drift.

Writes --out JSON; exits 1 if the twins diverge beyond tolerance.

Run (CPU; the jax side honors DCASE_PLATFORM):
  DCASE_PLATFORM=cpu python tools/twin_epochs.py --epochs 4
  DCASE_PLATFORM=cpu python tools/twin_epochs.py \
      --init_checkpoint /tmp/ablate_ssl_var/mt_s0/model/baseline_best \
      --variability 1.0 --epochs 2
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
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

from dcase2019_task4_tpu.cli import _apply_platform_override  # noqa: E402

_apply_platform_override()

import jax  # noqa: E402
import torch  # noqa: E402

if jax.default_backend() == "cpu":
    # this jax build defaults matmuls to bf16-level precision even for f32
    # inputs (CLAUDE.md); the torch twin computes in standard f32
    jax.config.update("jax_default_matmul_precision", "highest")

from dcase2019_task4_tpu.config import Config, ModelConfig, TrainConfig  # noqa: E402
from dcase2019_task4_tpu.data.pipeline import iter_eval_batches  # noqa: E402
from dcase2019_task4_tpu.eval.decode import decode_batch, predictions_to_tsv  # noqa: E402
from dcase2019_task4_tpu.eval.sed_scores import compute_strong_metrics  # noqa: E402
from dcase2019_task4_tpu.eval.tagging import TaggingF1  # noqa: E402
from dcase2019_task4_tpu.ops.mel import mel_filterbank  # noqa: E402
from dcase2019_task4_tpu.train.experiment import Experiment  # noqa: E402
from dcase2019_task4_tpu.train.ramps import sigmoid_rampup  # noqa: E402
from tests.test_crnn_parity import TorchCRNN, copy_params_to_torch  # noqa: E402


# --------------------------------------------------------------- twin DSP


class TorchFrontend:
    """The reference's featurization semantics in torch/numpy: librosa-style
    STFT (hamming, center=True, reflect) -> Slaney mel (htk=False,
    norm=None) -> per-clip amplitude_to_db (amin/top_db) -> zeroed padding
    frames. Consumes the pipeline's packed int16 audio (reflect-padded for
    the device frontend; the padding is stripped and torch.stft re-applies
    its own centering, so the twin runs the exact reference framing)."""

    def __init__(self, dsp):
        self.dsp = dsp
        self.fb = mel_filterbank(
            dsp.sample_rate, dsp.n_window, dsp.n_mels, dsp.f_min, dsp.f_max
        ).astype(np.float32)
        self.win = torch.from_numpy(np.hamming(dsp.n_window).astype(np.float32))

    def linear_mel(self, audio_i16: np.ndarray) -> np.ndarray:
        d = self.dsp
        p = d.n_window // 2
        x = audio_i16.astype(np.float32) / 32768.0
        x = x[:, p:p + d.max_samples]
        s = torch.stft(
            torch.from_numpy(x), n_fft=d.n_window, hop_length=d.hop_length,
            window=self.win, center=True, pad_mode="reflect",
            return_complex=True,
        )
        mag = s.abs().numpy().transpose(0, 2, 1)[:, : d.max_frames]
        return mag @ self.fb  # [B, T, M]

    def db(self, mel: np.ndarray, frames: np.ndarray) -> np.ndarray:
        d = self.dsp
        out = np.zeros(mel.shape, np.float32)
        for i in range(mel.shape[0]):
            nv = int(frames[i])
            dbi = 20.0 * np.log10(np.maximum(d.amin, mel[i, :nv]))
            out[i, :nv] = np.maximum(dbi, dbi.max() - d.top_db)
        return out

    def features(self, batch, noise_std: float = 0.0, rng=None):
        """(student, teacher) normalized like log_mel_pair: the teacher adds
        |N(0, std)| on the LINEAR mel (reference DataLoad.py:283-287)."""
        mel = self.linear_mel(batch["audio"])
        student = self.db(mel, batch["frames"])
        if not noise_std:
            return student, student
        noisy = mel + np.abs(rng.normal(0, noise_std, mel.shape)).astype(np.float32)
        return student, self.db(noisy, batch["frames"])


def fit_torch_scaler(exp, fe: TorchFrontend):
    """The reference Scaler fit (equal weight per clip, clean features)
    through the twin featurization over all training streams."""
    d = exp.cfg.dsp
    total, total_sq, count = None, None, 0
    for stream in exp.pipeline.streams:
        for batch in iter_eval_batches(
            stream, exp.pipeline.batch_size, d.max_samples, d.n_window,
            d.hop_length, d.max_frames,
        ):
            nv = batch["n_valid"]
            x = fe.db(fe.linear_mel(batch["audio"]), batch["frames"])[:nv]
            x = x.astype(np.float64)
            m = x.mean(axis=1).sum(axis=0)
            msq = (x**2).mean(axis=1).sum(axis=0)
            total = m if total is None else total + m
            total_sq = msq if total_sq is None else total_sq + msq
            count += nv
    mean = total / count
    std = np.sqrt(np.maximum(total_sq / count - mean**2, 0.0))
    return mean.astype(np.float32), std.astype(np.float32)


# ------------------------------------------------------------- torch loop


class TorchTwin:
    """The reference Mean-Teacher loop (main.py:52-165) at flagship
    geometry, fed by the SAME pipeline batches as the jax experiment but
    through its own featurization + scaler."""

    def __init__(self, exp, noise_seed: int = 1234):
        mcfg = exp.cfg.model
        self.exp = exp
        self.fe = TorchFrontend(exp.cfg.dsp)
        t0 = time.time()
        self.scaler_mean, self.scaler_std = fit_torch_scaler(exp, self.fe)
        print(f"[twin] torch scaler fit in {time.time() - t0:.1f}s")
        self.model = copy_params_to_torch(
            exp.state.params, exp.state.bn_state, TorchCRNN(mcfg), mcfg)
        self.ema = copy_params_to_torch(
            exp.state.ema_params, exp.state.ema_bn_state, TorchCRNN(mcfg), mcfg)
        for p in self.ema.parameters():
            p.detach_()  # main.py:286-287
        self.opt = torch.optim.Adam(
            self.model.parameters(), lr=exp.cfg.train.lr,
            betas=(exp.cfg.train.beta1, exp.cfg.train.beta2),
            eps=exp.cfg.train.adam_eps)
        self.global_step = int(exp.state.step)
        self.rampup_len = len(exp.pipeline) * exp.cfg.train.n_epoch // 2
        self.noise_rng = np.random.default_rng(noise_seed)
        self.bce = torch.nn.BCELoss()
        self.mse = torch.nn.MSELoss()

    def _norm(self, feats: np.ndarray) -> torch.Tensor:
        x = (feats - self.scaler_mean) / self.scaler_std
        return torch.from_numpy(x.astype(np.float32)[:, None])

    def train_epoch(self, epoch: int):
        exp, t = self.exp, self.exp.cfg.train
        ws, ss = exp.weak_slice, exp.strong_slice
        self.model.train()
        self.ema.train()
        sums = {"loss": 0.0, "weak_class_loss": 0.0, "strong_class_loss": 0.0,
                "consistency_strong": 0.0, "consistency_weak": 0.0}
        n = 0
        for batch in exp.pipeline.iter_epoch(epoch, prefetch=0):
            feats, feats_t = self.fe.features(
                batch, noise_std=t.noise_std, rng=self.noise_rng)
            xs, xt = self._norm(feats), self._norm(feats_t)
            target = torch.from_numpy(np.asarray(batch["target"], np.float32))
            with torch.no_grad():
                sp_e, wp_e = self.ema(xt)
            sp, wp = self.model(xs)
            target_weak = target.max(-2)[0]
            wl = self.bce(wp[ws], target_weak[ws])
            sl = self.bce(sp[ss], target[ss])
            rampup = float(sigmoid_rampup(
                np.float32(self.global_step), self.rampup_len))
            cc = t.max_consistency_cost * rampup
            cs = cc * self.mse(sp, sp_e)
            cw = cc * self.mse(wp, wp_e)
            loss = wl + sl + cs + cw
            self.opt.zero_grad()
            loss.backward()
            self.opt.step()
            g = self.global_step + 1  # post-increment EMA (main.py:155-157)
            alpha = min(1.0 - 1.0 / (g + 1), t.ema_alpha)
            with torch.no_grad():
                for ep_, p_ in zip(self.ema.parameters(), self.model.parameters()):
                    ep_.mul_(alpha).add_(p_, alpha=1.0 - alpha)
                # BN running stats follow the teacher's own train-mode
                # forward above, like the jax twin's ema_bn_state
            self.global_step = g
            sums["loss"] += float(loss)
            sums["weak_class_loss"] += float(wl)
            sums["strong_class_loss"] += float(sl)
            sums["consistency_strong"] += float(cs)
            sums["consistency_weak"] += float(cw)
            n += 1
        return {k: v / n for k, v in sums.items()}

    def validate(self):
        import pandas as pd

        exp, d = self.exp, self.exp.cfg.dsp
        self.model.eval()
        dfs = []
        for batch in iter_eval_batches(
            exp.valid_synth_stream, exp.pipeline.batch_size, d.max_samples,
            d.n_window, d.hop_length, d.max_frames,
        ):
            x = self._norm(self.fe.db(self.fe.linear_mel(batch["audio"]),
                                      batch["frames"]))
            with torch.no_grad():
                strong, _ = self.model(x)
            dfs.append(decode_batch(
                strong.numpy()[: batch["n_valid"]], batch["filenames"],
                exp.codec, d.sample_rate, d.hop_length,
                exp.cfg.model.pooling_time_ratio, threshold=0.5,
                median_window=exp.cfg.train.median_window,
            ))
        predictions = predictions_to_tsv(pd.concat(dfs, ignore_index=True), None)
        ev = compute_strong_metrics(predictions, exp.valid_synth_df, exp.log)
        event_f1 = ev.results_class_wise_average_metrics()["f_measure"]["f_measure"]

        acc = TaggingF1(len(exp.classes))
        for batch in iter_eval_batches(
            exp.valid_weak_stream, exp.pipeline.batch_size, d.max_samples,
            d.n_window, d.hop_length, d.max_frames,
        ):
            x = self._norm(self.fe.db(self.fe.linear_mel(batch["audio"]),
                                      batch["frames"]))
            with torch.no_grad():
                _, weak = self.model(x)
            nv = batch["n_valid"]
            acc.update(weak.numpy()[:nv], batch["target"][:nv])
        return float(event_f1), float(np.mean(acc.per_class_f1()))


# ------------------------------------------------------------------ main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--subpart", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variability", type=float, default=1.0)
    ap.add_argument("--init_checkpoint", default=None,
                    help="start both twins from this trained checkpoint "
                         "(compares decoded F1 at a quality-bearing point)")
    ap.add_argument("--loss_tol", type=float, default=0.15,
                    help="max per-epoch relative gap in mean total loss")
    ap.add_argument("--f1_tol", type=float, default=0.10,
                    help="max abs gap in final event/weak F1")
    ap.add_argument("--out", default=os.path.join(REPO, "TWIN_EPOCHS.json"))
    args = ap.parse_args()

    cfg = Config(
        model=ModelConfig(dropout=0.0),
        train=TrainConfig(n_epoch=args.epochs, checkpoint_epochs=0,
                          save_best=False),
    )
    exp = Experiment(cfg, mean_teacher=True, subpart_data=args.subpart,
                     synthetic_audio=True,
                     synthetic_variability=args.variability, seed=args.seed)
    t0 = time.time()
    exp.build()
    print(f"[jax] built in {time.time() - t0:.1f}s; "
          f"{len(exp.pipeline)} steps/epoch")
    if args.init_checkpoint:
        meta = exp.restore(args.init_checkpoint)
        print(f"[jax] restored {args.init_checkpoint} (epoch {meta['epoch']})")

    twin = TorchTwin(exp)
    jm, js = exp.scaler.mean_std_f32
    scaler_gap = {
        "mean_max_abs": float(np.max(np.abs(jm - twin.scaler_mean))),
        "std_max_abs": float(np.max(np.abs(js - twin.scaler_std))),
    }
    print(f"[scaler] device-fit vs torch-fit moment gaps: {scaler_gap}")

    doc = {"epochs": args.epochs, "subpart": args.subpart,
           "seed": args.seed, "variability": args.variability,
           "init_checkpoint": args.init_checkpoint,
           "steps_per_epoch": len(exp.pipeline),
           "scaler_gap": scaler_gap, "per_epoch": []}

    if args.init_checkpoint:
        ours0 = exp.validate(-1)
        t_ev0, t_wk0 = twin.validate()
        doc["restored_eval"] = {
            "ours": {"event_f1": ours0["event_macro_f1"],
                     "weak_f1": ours0["weak_macro_f1"]},
            "torch": {"event_f1": t_ev0, "weak_f1": t_wk0},
        }
        print(f"[restored] ours event {ours0['event_macro_f1']:.4f} "
              f"weak {ours0['weak_macro_f1']:.4f} | "
              f"torch event {t_ev0:.4f} weak {t_wk0:.4f}")

    start_epoch = 0 if not args.init_checkpoint else int(exp.state.step) // max(len(exp.pipeline), 1)
    for e in range(start_epoch, start_epoch + args.epochs):
        tj = time.time()
        meters = exp.train_epoch(e)
        ours = {k: m.avg for k, m in meters.meters.items()}
        tj = time.time() - tj
        tt = time.time()
        theirs = twin.train_epoch(e)
        tt = time.time() - tt
        row = {"epoch": e, "ours": ours, "torch": theirs,
               "wall_s": {"ours": round(tj, 1), "torch": round(tt, 1)}}
        doc["per_epoch"].append(row)
        gap = abs(ours["loss"] - theirs["loss"]) / max(ours["loss"], theirs["loss"])
        print(f"[epoch {e}] loss ours {ours['loss']:.4f} "
              f"torch {theirs['loss']:.4f} (rel gap {gap:.3f}) "
              f"[{tj:.0f}s jax, {tt:.0f}s torch]")

    ours_v = exp.validate(start_epoch + args.epochs - 1)
    t_ev, t_wk = twin.validate()
    doc["final_eval"] = {
        "ours": {"event_f1": ours_v["event_macro_f1"],
                 "weak_f1": ours_v["weak_macro_f1"]},
        "torch": {"event_f1": t_ev, "weak_f1": t_wk},
    }
    print(f"[final] ours event {ours_v['event_macro_f1']:.4f} "
          f"weak {ours_v['weak_macro_f1']:.4f} | "
          f"torch event {t_ev:.4f} weak {t_wk:.4f}")

    ok = True
    for row in doc["per_epoch"]:
        a, b = row["ours"]["loss"], row["torch"]["loss"]
        if abs(a - b) / max(a, b) > args.loss_tol:
            print(f"FAIL: epoch {row['epoch']} loss gap "
                  f"{abs(a - b) / max(a, b):.3f} > {args.loss_tol}")
            ok = False
    evals = [doc["final_eval"]] + ([doc["restored_eval"]]
                                   if "restored_eval" in doc else [])
    for ev in evals:
        for k in ("event_f1", "weak_f1"):
            if abs(ev["ours"][k] - ev["torch"][k]) > args.f1_tol:
                print(f"FAIL: {k} gap "
                      f"{abs(ev['ours'][k] - ev['torch'][k]):.4f} > {args.f1_tol}")
                ok = False
    doc["ok"] = ok
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}; ok={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
