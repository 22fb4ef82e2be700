"""Reproducibility: identical seeds ⇒ identical batches, steps, metrics.

The reference relies on global torch/numpy seeding (DataLoad.py:21-22);
here determinism is structural — explicitly keyed PRNGs everywhere — so it
can be asserted exactly."""

import numpy as np
import optax

import jax

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.data.sampler import MultiStreamSampler
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.train.steps import init_train_state, make_train_step
from dcase2019_task4_tpu.utils.profiling import Throughput

TINY = ModelConfig(nclass=3, nb_filters=(8, 8, 8), n_rnn_cell=8, dropout=0.5)


def _run_two_steps(seed):
    model = CRNN(TINY)
    opt = optax.adam(1e-3)
    step = make_train_step(model, opt, slice(0, 2), slice(6, 8), mean_teacher=True,
                           rampup_length=100, donate=False)
    state = init_train_state(model, opt, jax.random.PRNGKey(seed), with_ema=True)
    rng = np.random.default_rng(0)
    batch = {
        "features": rng.standard_normal((8, 64, 64)).astype(np.float32),
        "target": np.zeros((8, 8, 3), np.float32),
    }
    losses = []
    key = jax.random.PRNGKey(seed)
    for _ in range(2):
        key, sub = jax.random.split(key)
        state, m, _ = step(state, batch, sub, step.zero_metrics())
        losses.append(float(m["loss"]))
    return losses


def test_train_steps_bitwise_reproducible():
    assert _run_two_steps(7) == _run_two_steps(7)


def test_different_seed_differs():
    assert _run_two_steps(7) != _run_two_steps(8)


def test_sampler_epochs_reproducible_across_instances():
    a = MultiStreamSampler([50, 80], [2, 4], seed=3).epoch_batches(5)
    b = MultiStreamSampler([50, 80], [2, 4], seed=3).epoch_batches(5)
    np.testing.assert_array_equal(a, b)


def test_throughput_meter():
    t = Throughput(warmup=2)
    for _ in range(5):
        t.update(10)
    assert t.items == 30  # 3 post-warmup updates
    assert t.items_per_sec > 0
