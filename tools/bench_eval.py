"""Inference/serving throughput: featurize → CRNN forward → on-device
decode inputs, chained over N dependent batches with one scalar fetch
(the timing protocol from CLAUDE.md). Reports clips/s/chip for the
device-resident path — the serving-side companion to bench.py's training
number. The reference's eval loop is per-clip batch-1 torch
(evaluation_measures.py:203-231)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dcase2019_task4_tpu.config import Config, ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.ops.mel import MelFrontend
from dcase2019_task4_tpu.train.steps import dequantize_audio, init_train_state

B = int(os.environ.get("DCASE_EVAL_BATCH", "96"))
N = 20

cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
d = cfg.dsp
model = CRNN(cfg.model)
import optax
state = init_train_state(model, optax.adam(1e-3), jax.random.PRNGKey(0), with_ema=False)
frontend = MelFrontend(
    sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
    n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
    compute_dtype="bfloat16",
)
rng = np.random.default_rng(0)
Lp = d.max_samples + d.n_window
audio = jax.device_put(jnp.asarray((rng.standard_normal((B, Lp)) * 5000).astype(np.int16)))
frames = jax.device_put(jnp.full((B,), d.max_frames, jnp.int32))


@jax.jit
def run(audio, frames, params, bn):
    def step(a, _):
        x = frontend.log_mel(dequantize_audio(a), frames)
        s, w = model.apply(params, bn, x, train=False)[:2]
        # chain: perturb the int16 audio by a tiny function of the output
        probe = (jnp.sum(s.astype(jnp.float32)) * 1e-20).astype(jnp.int16)
        return a + probe, jnp.max(w)

    final, ws = lax.scan(step, audio, None, length=N)
    return ws[-1]


out = run(audio, frames, state.params, state.bn_state)
jax.block_until_ready(out)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    out = run(audio, frames, state.params, state.bn_state)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / N)
print(f"eval forward: {best*1e3:.2f} ms/batch (B={B}) = "
      f"{B/best:.0f} clips/s/chip device-resident")
