"""Time the shard_map (mesh size 1) step vs the plain jit step on the TPU."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import time
import numpy as np
import jax, jax.numpy as jnp
import optax
from dcase2019_task4_tpu.config import Config, ModelConfig, DSPConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.ops.mel import MelFrontend
from dcase2019_task4_tpu.train.steps import init_train_state, make_train_step
from jax.sharding import Mesh

cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
d = cfg.dsp
model = CRNN(cfg.model)
fe = MelFrontend(sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
                 n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
                 compute_dtype="bfloat16")
opt = optax.adam(1e-3)
B = 96
rngn = np.random.default_rng(0)
Lp = d.max_samples + d.n_window
batch = {
    "audio": jax.device_put(jnp.asarray((rngn.standard_normal((B, Lp)) * 5000).astype(np.int16))),
    "frames": jax.device_put(jnp.full((B,), d.max_frames, jnp.int32)),
    "target": jax.device_put(jnp.zeros((B, d.max_frames // 8, 10), jnp.float32)),
}

def run(mesh, label):
    step = make_train_step(model, opt, slice(0, B // 4), slice(3 * B // 4, B),
                           mean_teacher=True, rampup_length=1000, frontend=fe,
                           scaler_mean=np.zeros(64, np.float32), scaler_std=np.ones(64, np.float32),
                           mesh=mesh)
    state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=True)
    if mesh is not None:
        from dcase2019_task4_tpu.parallel.mesh import replicate_state, batch_sharding
        state = replicate_state(state, mesh)
        b = jax.device_put(batch, batch_sharding(mesh))
    else:
        b = batch
    acc = step.zero_metrics()
    rng = jax.random.PRNGKey(1)
    state, m, acc = step(state, b, rng, acc)
    jax.block_until_ready(state.params)
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            state, m, acc = step(state, b, rng, acc)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{label} trial {trial}: {dt:.2f} ms/step")

run(None, "plain jit")
run(Mesh(np.array(jax.devices()[:1]), ("data",)), "shard_map mesh=1")
