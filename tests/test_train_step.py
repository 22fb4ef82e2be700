"""Train-step unit tests: loss masking, EMA schedule, rampup, learning.

Uses the precomputed-features mode and a tiny CRNN so the compiled program
is small; semantics follow main.py:52-165 (Mean-Teacher) and
main_simple_CRNN.py:31-82 (supervised)."""

import numpy as np
import optax
import pytest

import jax
import jax.flatten_util  # noqa: F401 — enables jax.flatten_util.ravel_pytree
import jax.numpy as jnp

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.train.ramps import sigmoid_rampup
from dcase2019_task4_tpu.train.steps import (
    ema_update,
    init_train_state,
    make_train_step,
)
from dcase2019_task4_tpu.train import losses

TINY = ModelConfig(nclass=3, nb_filters=(8, 8, 8), n_rnn_cell=8, dropout=0.0)
T_IN, F_IN = 64, 64  # → 8 pooled frames, freq 1
T_OUT = 8
BATCH = 8
WEAK = slice(0, 2)
STRONG = slice(6, 8)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((BATCH, T_IN, F_IN)).astype(np.float32)
    target = np.zeros((BATCH, T_OUT, 3), np.float32)
    target[0:2, :, 0] = 1.0  # weak stream: class 0 everywhere
    target[2:6] = -1.0  # unlabeled sentinel
    target[6:8, 2:5, 1] = 1.0  # strong stream: class 1 event
    return {"features": feats, "target": target}


@pytest.fixture()
def mt_setup():
    # function-scoped: the step donates its input state buffers
    # (donate_argnums), so a shared state would be dead after the first test
    model = CRNN(TINY)
    opt = optax.adam(1e-3)
    step = make_train_step(
        model, opt, WEAK, STRONG, mean_teacher=True, rampup_length=100,
        max_consistency_cost=2.0,
    )
    state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=True)
    return model, opt, step, state


def test_metrics_and_loss_composition(mt_setup):
    _, _, step, state = mt_setup
    state2, m, acc = step(state, _batch(), jax.random.PRNGKey(1), step.zero_metrics())
    total = (
        float(m["weak_class_loss"])
        + float(m["strong_class_loss"])
        + float(m["consistency_strong"])
        + float(m["consistency_weak"])
    )
    np.testing.assert_allclose(float(m["loss"]), total, rtol=1e-5)
    assert int(state2.step) == 1


def test_rampup_weight_schedule(mt_setup):
    # step 0: weight = 2·exp(−5) (sigmoid_rampup(0, L)), main.py:75-79,124
    _, _, step, state = mt_setup
    _, m, _acc = step(state, _batch(), jax.random.PRNGKey(1), step.zero_metrics())
    np.testing.assert_allclose(float(m["consistency_weight"]), 2 * np.exp(-5.0), rtol=1e-5)
    assert float(sigmoid_rampup(jnp.float32(100), 100)) == pytest.approx(1.0)


def test_ema_warmup_alpha():
    # g=step+1: alpha at step 0 = min(1−1/2, .999) = 0.5 (main.py:45-49)
    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    out = ema_update(p, e, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.5)
    out2 = ema_update(p, e, jnp.int32(10_000))
    np.testing.assert_allclose(np.asarray(out2["w"]), 1 - 0.999, rtol=1e-4)


def test_unlabeled_sentinel_never_in_class_loss():
    # fill unlabeled slots with absurd targets; class losses must not change
    model = CRNN(TINY)
    opt = optax.adam(0.0)
    # donate=False: this test reuses the same state for two step calls
    step = make_train_step(model, opt, WEAK, STRONG, mean_teacher=False, donate=False)
    state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=False)
    b1 = _batch()
    b2 = _batch()
    b2["target"][2:6] = -1e6
    _, m1, _ = step(state, b1, jax.random.PRNGKey(1), step.zero_metrics())
    _, m2, _ = step(state, b2, jax.random.PRNGKey(1), step.zero_metrics())
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_supervised_step_learns():
    model = CRNN(TINY)
    opt = optax.adam(3e-3)
    step = make_train_step(model, opt, WEAK, STRONG, mean_teacher=False)
    state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=False)
    batch = _batch()
    losses_seen = []
    rng = jax.random.PRNGKey(2)
    for i in range(30):
        rng, sub = jax.random.split(rng)
        state, m, _ = step(state, batch, sub, step.zero_metrics())
        losses_seen.append(float(m["loss"]))
    assert losses_seen[-1] < losses_seen[0] * 0.7


def test_mean_teacher_ema_converges_to_student(mt_setup):
    model, opt, step, state = mt_setup
    batch = _batch()
    rng = jax.random.PRNGKey(3)
    d0 = float(
        jnp.linalg.norm(
            jax.flatten_util.ravel_pytree(state.params)[0]
            - jax.flatten_util.ravel_pytree(state.ema_params)[0]
        )
    )
    for _ in range(5):
        rng, sub = jax.random.split(rng)
        state, _, _ = step(state, batch, sub, step.zero_metrics())
    d5 = float(
        jnp.linalg.norm(
            jax.flatten_util.ravel_pytree(state.params)[0]
            - jax.flatten_util.ravel_pytree(state.ema_params)[0]
        )
    )
    assert d5 < d0 * 0.2  # alpha warmup pulls the teacher in quickly


def test_metric_accumulator_equals_per_step_sums():
    """The on-device accumulator (carried through the step, fetched once)
    must equal summing each step's host-fetched metrics — the property the
    per-epoch exact means in Experiment.train_epoch rely on."""
    model = CRNN(TINY)
    opt = optax.adam(1e-3)
    step = make_train_step(model, opt, WEAK, STRONG, mean_teacher=True,
                           rampup_length=100, donate=False)
    state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=True)
    acc = step.zero_metrics()
    host_sums = {k: 0.0 for k in step.metric_keys}
    rng = jax.random.PRNGKey(4)
    for i in range(4):
        rng, sub = jax.random.split(rng)
        state, m, acc = step(state, _batch(i), sub, acc)
        for k in step.metric_keys:
            host_sums[k] += float(m[k])
    fetched = jax.device_get(acc)
    for k in step.metric_keys:
        np.testing.assert_allclose(float(fetched[k]), host_sums[k], rtol=1e-6, err_msg=k)


def test_bce_matches_torch_bceloss():
    import torch

    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, (4, 5)).astype(np.float32)
    y = (rng.random((4, 5)) > 0.5).astype(np.float32)
    ours = float(losses.bce(jnp.asarray(p), jnp.asarray(y)))
    ref = float(torch.nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_flat_param_update_identical(monkeypatch):
    """DCASE_FLAT_OPT=1 (single-buffer Adam/EMA tail) runs the same
    element-wise math over raveled params: one step must match the per-leaf
    pytree path BIT-EXACTLY (measured: step 1 exact, step 2 differs by one
    ulp from fusion boundaries, then batch-norm chaos amplifies — so
    multi-step trajectory comparison would only test sensitivity, not
    semantics)."""

    def run():
        model = CRNN(TINY)
        opt = optax.adam(1e-3)
        step = make_train_step(
            model, opt, WEAK, STRONG, mean_teacher=True, rampup_length=100,
            max_consistency_cost=2.0,
        )
        state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=True)
        state, m, _ = step(state, _batch(0), jax.random.PRNGKey(10), step.zero_metrics())
        return state, m

    monkeypatch.delenv("DCASE_FLAT_OPT", raising=False)
    s_tree, m_tree = run()
    monkeypatch.setenv("DCASE_FLAT_OPT", "1")
    s_flat, m_flat = run()

    assert float(m_tree["loss"]) == float(m_flat["loss"])
    for a, b in zip(jax.tree.leaves(s_tree.params), jax.tree.leaves(s_flat.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_tree.ema_params), jax.tree.leaves(s_flat.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # flat mode really flattened: Adam moments are single vectors
    mu_leaves = jax.tree.leaves(s_flat.opt_state[0].mu)
    assert len(mu_leaves) == 1 and mu_leaves[0].ndim == 1
    assert len(jax.tree.leaves(s_tree.opt_state[0].mu)) > 1


def test_paired_view_audio2_reaches_teacher_inside_step():
    """Paired-teacher-view wiring at the STEP level, by exact equality:
    with noise_std=0, a batch whose audio2 EQUALS its audio must
    reproduce the audio2-free step's consistency losses bitwise (the
    teacher's mel is the same tensor either way), while a genuinely
    different second view must CHANGE them — together these prove the
    batch's audio2 is what the teacher featurizes inside the jitted
    step (magnitudes are deliberately not asserted: at init the tiny
    model is nearly input-invariant and the loss is dominated by
    grad-vs-nograd fp noise ~1e-7)."""
    import optax

    from dcase2019_task4_tpu.ops.mel import MelFrontend

    hop, n_fft, T = 12, 32, 64
    fe = MelFrontend(sample_rate=16000, n_window=n_fft, hop_length=hop,
                     n_mels=F_IN, f_min=0.0, f_max=8000.0, max_frames=T)
    model = CRNN(TINY)
    opt = optax.adam(1e-3)
    step = make_train_step(
        model, opt, WEAK, STRONG, mean_teacher=True, rampup_length=100,
        max_consistency_cost=2.0, frontend=fe, noise_std=0.0,
    )
    rng = np.random.default_rng(5)
    L = T * hop + n_fft
    audio = (rng.standard_normal((BATCH, L)) * 9000).astype(np.int16)
    audio2 = (rng.standard_normal((BATCH, L)) * 9000).astype(np.int16)
    base = {
        "audio": jnp.asarray(audio),
        "frames": jnp.full((BATCH,), T, jnp.int32),
        "target": jnp.asarray(_batch()["target"]),
    }
    key = jax.random.PRNGKey(7)

    def run(batch):
        state = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=True)
        _, m, _ = step(state, batch, key, step.zero_metrics())
        return float(m["consistency_strong"]) + float(m["consistency_weak"])

    c_none = run(dict(base))
    c_same = run(dict(base, audio2=jnp.asarray(audio)))
    c_diff = run(dict(base, audio2=jnp.asarray(audio2)))
    assert c_same == c_none  # identical view == no second view, bitwise
    assert c_diff != c_none  # a different view reaches the teacher
