import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import numpy as np, jax, jax.numpy as jnp, optax, time

from dcase2019_task4_tpu.config import Config, ModelConfig, scaled_config
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.ops import gru as gru_mod
from dcase2019_task4_tpu.ops.mel import MelFrontend
from dcase2019_task4_tpu.train.steps import init_train_state, make_train_step
from dcase2019_task4_tpu.utils.profiling import trace, top_device_ops


def _flag_val(name, default=None, cast=str):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


batch = _flag_val("--batch", 96, int)
# --entry_block / --crows: profile with a merged entry-block kernel
# (ops/fused_entry_block.py / ops/crows_block.py) instead of the
# entry-conv + fused-block pair
# --scaled: the BASELINE.json config-5 geometry (128 mels / 128-ch convs /
# 128-cell BiGRU / SpecAugment) — VERDICT r3 item 2's profile target
# --unroll N: override the GRU scan unroll (sweep at the scaled H=128)
entry_block = "--entry_block" in sys.argv
crows = "--crows" in sys.argv
use_scaled = "--scaled" in sys.argv
# --no_dropout: rate=0 skips the in-kernel PRNG + mask entirely (trace-time
# constant) — measures the hardware-PRNG share of the fused-block chain
no_dropout = "--no_dropout" in sys.argv
unroll = _flag_val("--unroll", None, int)
if unroll is not None:
    gru_mod.SCAN_UNROLL = unroll
if use_scaled:
    import dataclasses
    cfg = scaled_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, entry_block_pallas=entry_block, entry_block_crows=crows,
        **({"dropout": 0.0} if no_dropout else {})))
else:
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16",
                                   entry_block_pallas=entry_block,
                                   entry_block_crows=crows,
                                   **({"dropout": 0.0} if no_dropout else {})))
print("entry_block_pallas:", entry_block, "entry_block_crows:", crows,
      "scaled:", use_scaled, "batch:", batch,
      "unroll:", "auto" if gru_mod.SCAN_UNROLL is None else gru_mod.SCAN_UNROLL)
d, t = cfg.dsp, cfg.train
model = CRNN(cfg.model)
frontend = MelFrontend(
    sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
    n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
    compute_dtype="bfloat16",
)
print('frontend mode:', frontend.stft_mode)
optimizer = optax.adam(t.lr, b1=t.beta1, b2=t.beta2, eps=t.adam_eps)
q = batch // 4
sa_cfg = None
if t.spec_augment:  # the scaled config trains with SpecAugment on
    sa_cfg = dict(time_masks=t.sa_time_masks, max_time_width=t.sa_max_time_width,
                  freq_masks=t.sa_freq_masks, max_freq_width=t.sa_max_freq_width)
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
rng = jax.random.PRNGKey(1)
Lp = d.sample_rate * 10 + d.n_window
rngn = np.random.default_rng(0)
batchd = {
    "audio": jax.device_put(jnp.asarray((rngn.standard_normal((batch, Lp)) * 5000).astype(np.int16))),
    "frames": jax.device_put(jnp.full((batch,), d.max_frames, jnp.int32)),
    "target": jax.device_put(jnp.zeros((batch, d.max_frames // 8, 10), jnp.float32)),
}
acc = step.zero_metrics()
state, m, acc = step(state, batchd, rng, acc)
jax.block_until_ready(state)
# timed
t0 = time.perf_counter()
for _ in range(20):
    state, m, acc = step(state, batchd, rng, acc)
print('ms/step:', (lambda _: (time.perf_counter() - t0) / 20 * 1e3)(float(m["loss"])))

td = "/tmp/trace_step"
with trace(td):
    for _ in range(5):
        state, m, acc = step(state, batchd, rng, acc)
    float(m["loss"])
ops = top_device_ops(td, top=400)
tot = sum(ms for _, ms, _ in ops) / 5
print(f"total device ms/step: {tot:.2f}")
import re, collections
groups = collections.defaultdict(float)
for name, ms, cat in ops:
    g = re.sub(r"[.\d]+$", "", name)
    groups[g] += ms / 5
for g, ms in sorted(groups.items(), key=lambda kv: -kv[1])[:14]:
    print(f"{ms:8.3f} ms  {g}")
print('--- top ops ---')
for name, ms, cat in ops[:30]:
    print(f"{ms/5:8.3f} ms  {cat[:130]}")
