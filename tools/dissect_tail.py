"""Dissect the flagship step's ~4 ms "losses/Adam/EMA/heads" tail
(docs/PERF.md "What the profile says now"; VERDICT r4 item 4).

The tail never shows up as nameable kernels — XLA fuses the BCE/MSE maths,
the ~40-leaf Adam chains and the EMA lerps into anonymous `fusion.N` ops —
so this tool measures each component's MARGINAL device cost by timing the
full step against structurally-reduced variants (chained dependent steps +
one scalar fetch, the only timing protocol that works under the tunnel,
CLAUDE.md). Variants are built by monkeypatching at trace time; product
code is untouched:

  full        the production Mean-Teacher step (bench.py flagship config)
  ema_id      EMA lerp replaced by identity (marginal cost of the lerp)
  sgd         optax.sgd instead of adam (marginal cost of Adam's moment
              updates + bias correction; state shrinks by 2 trees)
  no_tmetric  teacher-side eval BCEs (weak_ema/strong_ema, steps.py:263-266)
              replaced by constants at trace time (2nd+ call counting —
              the student-side BCEs inside loss_fn trace FIRST)
  no_mt       mean_teacher=False (upper bound on the whole teacher side:
              teacher fwd + consistency MSEs + EMA + teacher metrics; NOT
              additive with the rows above)

Each variant reports ms/step over chained steps; deltas vs `full` are the
component costs. Run on the TPU: python tools/dissect_tail.py [--steps 40]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from dcase2019_task4_tpu.config import Config, ModelConfig  # noqa: E402
from dcase2019_task4_tpu.models.crnn import CRNN  # noqa: E402
from dcase2019_task4_tpu.ops.mel import MelFrontend  # noqa: E402
from dcase2019_task4_tpu.train import losses as losses_mod  # noqa: E402
from dcase2019_task4_tpu.train import steps as steps_mod  # noqa: E402


def build_step(optimizer=None, mean_teacher=True):
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16"))
    d, t = cfg.dsp, cfg.train
    model = CRNN(cfg.model)
    frontend = MelFrontend(
        sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
        n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
        compute_dtype="bfloat16",
    )
    if optimizer is None:
        optimizer = optax.adam(t.lr, b1=t.beta1, b2=t.beta2, eps=t.adam_eps)
    batch = 96
    q = batch // 4
    step = steps_mod.make_train_step(
        model, optimizer, slice(0, q), slice(3 * q, batch),
        mean_teacher=mean_teacher, rampup_length=100 * 300,
        frontend=frontend,
        scaler_mean=np.zeros(d.n_mels, np.float32),
        scaler_std=np.ones(d.n_mels, np.float32),
        noise_std=t.noise_std,
    )
    state = steps_mod.init_train_state(
        model, optimizer, jax.random.PRNGKey(0), with_ema=mean_teacher)
    Lp = d.sample_rate * 10 + d.n_window
    rngn = np.random.default_rng(0)
    batchd = {
        "audio": jax.device_put(jnp.asarray(
            (rngn.standard_normal((batch, Lp)) * 5000).astype(np.int16))),
        "frames": jax.device_put(jnp.full((batch,), d.max_frames, jnp.int32)),
        "target": jax.device_put(jnp.zeros((batch, d.max_frames // 8, 10),
                                           jnp.float32)),
    }
    return step, state, batchd


def time_step(step, state, batchd, n_steps):
    rng = jax.random.PRNGKey(1)
    acc = step.zero_metrics()
    state, m, acc = step(state, batchd, rng, acc)
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(3):  # best-of-3 windows (tunnel variance, CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m, acc = step(state, batchd, rng, acc)
        float(m["loss"])  # one scalar fetch closes the chain
        best = min(best, (time.perf_counter() - t0) / n_steps * 1e3)
    return best


class _NthCallConst:
    """Wraps a loss fn; from call number `start` on (1-based, trace-time
    order), returns a constant instead — used to null ONLY the teacher-side
    metric BCEs, which trace after the student-side ones inside loss_fn."""

    def __init__(self, fn, start):
        self.fn, self.start, self.calls = fn, start, 0

    def __call__(self, *a, **k):
        self.calls += 1
        if self.calls >= self.start:
            return jnp.float32(0.0)
        return self.fn(*a, **k)


def main():
    n_steps = 40
    if "--steps" in sys.argv:
        n_steps = int(sys.argv[sys.argv.index("--steps") + 1])
    cfgT = Config().train

    results = {}

    step, state, batchd = build_step()
    results["full"] = time_step(step, state, batchd, n_steps)
    print(f"full        {results['full']:7.3f} ms/step", flush=True)

    # EMA lerp → identity
    orig_ema = steps_mod.ema_update
    steps_mod.ema_update = lambda p, e, s, a=0.999: e
    try:
        step, state, batchd = build_step()
        results["ema_id"] = time_step(step, state, batchd, n_steps)
    finally:
        steps_mod.ema_update = orig_ema
    print(f"ema_id      {results['ema_id']:7.3f} ms/step   "
          f"(EMA lerp ≈ {results['full'] - results['ema_id']:+.3f})", flush=True)

    # Adam → SGD
    step, state, batchd = build_step(optimizer=optax.sgd(cfgT.lr))
    results["sgd"] = time_step(step, state, batchd, n_steps)
    print(f"sgd         {results['sgd']:7.3f} ms/step   "
          f"(Adam marginal ≈ {results['full'] - results['sgd']:+.3f})", flush=True)

    # teacher-side metric BCEs → constants (calls 2+ of each loss fn)
    orig_w, orig_s = losses_mod.weak_bce, losses_mod.strong_bce
    losses_mod.weak_bce = _NthCallConst(orig_w, 2)
    losses_mod.strong_bce = _NthCallConst(orig_s, 2)
    try:
        step, state, batchd = build_step()
        results["no_tmetric"] = time_step(step, state, batchd, n_steps)
    finally:
        losses_mod.weak_bce, losses_mod.strong_bce = orig_w, orig_s
    print(f"no_tmetric  {results['no_tmetric']:7.3f} ms/step   "
          f"(teacher eval BCEs ≈ {results['full'] - results['no_tmetric']:+.3f})",
          flush=True)

    # whole teacher side off (bound, not additive)
    step, state, batchd = build_step(mean_teacher=False)
    results["no_mt"] = time_step(step, state, batchd, n_steps)
    print(f"no_mt       {results['no_mt']:7.3f} ms/step   "
          f"(teacher fwd+cons+EMA+metrics ≈ {results['full'] - results['no_mt']:+.3f})",
          flush=True)

    import json
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
