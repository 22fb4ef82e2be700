"""Multi-step training-dynamics parity vs a torch twin (VERDICT r2 item 2).

Round-2 tests pinned each link individually (forward parity ≤2e-5, BCE/MSE
losses, custom-VJP grads vs jnp autodiff, one BN train-mode step). This file
pins the JOINT dynamics: identical initial weights imported into both
frameworks, identical precomputed feature batches, ≥50 optimizer steps of
the reference's exact loop semantics run side by side —

  * Mean-Teacher: main.py:52-165 — teacher fwd (train-mode BN, detached
    params/outputs), student fwd, weak BCE on the weak slice of
    max-over-time targets (main.py:95-97), strong BCE on the synthetic
    slice (main.py:113-114), full-batch MSE consistency for both heads
    weighted by max_consistency_cost · sigmoid_rampup(step, rampup_length)
    (main.py:73-78,124-145), Adam(lr=1e-3, betas=(0.9, 0.999))
    (main.py:289-290), post-increment EMA lerp with
    α = min(1 − 1/(g+1), 0.999) (main.py:45-49,155-157).
  * Supervised: main_simple_CRNN.py:30-76 — weak + strong BCE, Adam.

Asserted: per-step loss trajectories within float tolerance, final student
params, final EMA (teacher) params, and final BN running statistics all
close. Dropout is 0 in both twins (torch and jax sample dropout masks from
different PRNGs — everything else about the step is deterministic).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.train.steps import init_train_state, make_train_step
from tests.test_crnn_parity import TorchCRNN, copy_params_to_torch

# Small-but-real geometry: every component of the flagship (3 GLU conv
# blocks, 2-layer BiGRU, attention heads) at reduced width, dropout off.
CFG = ModelConfig(nclass=10, nb_filters=(16, 16, 16), n_rnn_cell=16,
                  dropout=0.0)
B, T, F = 12, 96, 64
WEAK = slice(0, 6)
STRONG = slice(6, 12)
N_STEPS = 50
RAMPUP = 20           # short enough that the ramp SWEEPS over the 50 steps
MAX_CC = 2.0
LR = 1e-3


def _make_batches(seed, n_steps, teacher_noise=True):
    """Precomputed-feature batches: (student_x, teacher_x, target). The
    teacher input is student + Gaussian noise, built HERE so both
    frameworks consume byte-identical arrays (AugmentGaussianNoise
    semantics live in the frontend, tested elsewhere)."""
    rng = np.random.default_rng(seed)
    batches = []
    t_out = T // 8  # pooling_time_ratio
    for _ in range(n_steps):
        x = rng.standard_normal((B, T, F)).astype(np.float32)
        x_ema = (x + rng.normal(0, 0.25, x.shape)).astype(np.float32) if teacher_noise else x
        y = (rng.random((B, t_out, CFG.nclass)) < 0.25).astype(np.float32)
        # make weak-slice rows clip-level (constant over time), like weak data
        y[WEAK] = y[WEAK].max(axis=1, keepdims=True)
        batches.append((x, x_ema, y))
    return batches


def _sigmoid_rampup_np(current, rampup_length):
    if rampup_length == 0:
        return 1.0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def _torch_train(tm, tm_ema, batches, mean_teacher):
    """The reference loop body, exactly (main.py:52-165 /
    main_simple_CRNN.py:30-76)."""
    opt = torch.optim.Adam(
        filter(lambda p: p.requires_grad, tm.parameters()),
        lr=LR, betas=(0.9, 0.999))
    bce = torch.nn.BCELoss()
    mse = torch.nn.MSELoss()
    tm.train()
    if tm_ema is not None:
        tm_ema.train()
        for p in tm_ema.parameters():
            p.detach_()  # main.py:286-287
    losses = []
    for i, (x, x_ema, y) in enumerate(batches):
        xs = torch.from_numpy(x[:, None])
        target = torch.from_numpy(y)
        if mean_teacher:
            sp_e, wp_e = tm_ema(torch.from_numpy(x_ema[:, None]))
            sp_e, wp_e = sp_e.detach(), wp_e.detach()
        sp, wp = tm(xs)
        target_weak = target.max(-2)[0]
        loss = bce(wp[WEAK], target_weak[WEAK]) + bce(sp[STRONG], target[STRONG])
        if mean_teacher:
            rampup = _sigmoid_rampup_np(i, RAMPUP) if i < RAMPUP else 1.0
            cc = MAX_CC * rampup
            loss = loss + cc * mse(sp, sp_e) + cc * mse(wp, wp_e)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if mean_teacher:
            g = i + 1  # main.py:155 increments before the EMA update
            alpha = min(1.0 - 1.0 / (g + 1), 0.999)
            with torch.no_grad():
                for ep, p in zip(tm_ema.parameters(), tm.parameters()):
                    ep.mul_(alpha).add_(p, alpha=1.0 - alpha)
        losses.append(float(loss))
    return np.asarray(losses)


def _jax_train(model, state, batches, mean_teacher):
    opt = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    step = make_train_step(
        model, opt, WEAK, STRONG, mean_teacher=mean_teacher,
        rampup_length=RAMPUP, max_consistency_cost=MAX_CC, ema_alpha=0.999,
        frontend=None, donate=False)
    acc = step.zero_metrics()
    rng = jax.random.PRNGKey(0)  # dropout=0: consumed but inert
    losses = []
    for x, x_ema, y in batches:
        batch = {"features": jnp.asarray(x), "target": jnp.asarray(y)}
        if mean_teacher:
            batch["features_teacher"] = jnp.asarray(x_ema)
        state, m, acc = step(state, batch, rng, acc)
        losses.append(float(m["loss"]))
    return state, np.asarray(losses)


def _is_gauge_key(k):
    """conv biases (cnn.{4i}.bias) and the BN running means that absorb
    them. A conv bias followed by BatchNorm is a GAUGE direction: the batch
    -mean subtraction cancels it exactly, so its analytic gradient is zero
    and Adam turns each framework's independent fp noise into a ±lr random
    walk (observed ±0.012 over 50 steps). The walk is function-invariant —
    pinned instead by the train-mode forward parity check below."""
    parts = k.split(".")
    if len(parts) == 3 and parts[0] == "cnn" and parts[1].isdigit():
        idx = int(parts[1])
        if idx % 4 == 0 and parts[2] == "bias":
            return True
        if idx % 4 == 1 and parts[2] == "running_mean":
            return True
    return False


def _assert_params_close(our_params, our_bn, tm, atol):
    """Compare our final pytree with the torch twin's state dict by pushing
    ours through the same layout mapping the forward-parity tests use."""
    probe = copy_params_to_torch(our_params, our_bn, TorchCRNN(CFG), CFG)
    sd_ours, sd_torch = probe.state_dict(), tm.state_dict()
    assert set(sd_ours) == set(sd_torch)
    for k in sd_torch:
        if k.endswith("num_batches_tracked"):
            continue
        a = sd_ours[k].detach().numpy()
        b = sd_torch[k].detach().numpy()
        tol = dict(atol=atol, rtol=1e-3)
        if _is_gauge_key(k):
            tol = dict(atol=0.05, rtol=0.0)  # bounded noise walk, see above
        elif k.startswith("dense_softmax."):
            # softmax over classes is invariant to a constant logit shift:
            # the class-mean of this head's weight rows / bias is a gauge
            # direction (zero gradient, Adam noise walk) — project it out.
            # The remaining components sit behind clamp(softmax, 1e-7, 1):
            # saturated classes have ~zero true gradient (and the clamp
            # boundary flips the gradient off at 1-ulp differences), so
            # Adam noise-walks them too — hence the looser atol; the
            # function-space check below is the tight pin for this head.
            a = a - a.mean(axis=0)
            b = b - b.mean(axis=0)
            tol = dict(atol=2e-3, rtol=0.0)
        np.testing.assert_allclose(a, b, err_msg=k, **tol)


def _assert_function_space_close(model, our_params, our_bn, tm, x, atol):
    """Train-mode forward of the FINAL models on a fresh batch: batch-stat
    BN makes this exactly invariant to the conv-bias gauge, so it pins
    'the two frameworks learned the same function' with no escape hatch."""
    strong, weak, _ = jax.jit(
        lambda p, s, xx: model.apply(p, s, xx, train=True,
                                     rng=jax.random.PRNGKey(0))
    )(our_params, our_bn, jnp.asarray(x))
    tm.train()
    with torch.no_grad():
        ts, tw = tm(torch.from_numpy(x[:, None]))
    np.testing.assert_allclose(np.asarray(strong), ts.numpy(), atol=atol, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(weak), tw.numpy(), atol=atol, rtol=1e-3)


def _init_pair(seed, mean_teacher):
    model = CRNN(CFG)
    opt = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
    state = init_train_state(model, opt, jax.random.PRNGKey(seed),
                             with_ema=mean_teacher)
    tm = copy_params_to_torch(state.params, state.bn_state, TorchCRNN(CFG), CFG)
    tm_ema = None
    if mean_teacher:
        tm_ema = copy_params_to_torch(state.ema_params, state.ema_bn_state,
                                      TorchCRNN(CFG), CFG)
    return model, state, tm, tm_ema


def test_mean_teacher_dynamics_match_torch_50_steps():
    batches = _make_batches(seed=1, n_steps=N_STEPS)
    model, state, tm, tm_ema = _init_pair(seed=3, mean_teacher=True)

    torch_losses = _torch_train(tm, tm_ema, batches, mean_teacher=True)
    final_state, our_losses = _jax_train(model, state, batches, mean_teacher=True)

    # losses must MOVE (the optimizer is doing work) and stay matched
    assert torch_losses[-1] < torch_losses[0]
    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-4)

    _assert_params_close(final_state.params, final_state.bn_state, tm, atol=1e-4)
    # EMA teacher params + its train-mode BN running stats follow the same
    # lerp + forward dynamics
    _assert_params_close(final_state.ema_params, final_state.ema_bn_state,
                         tm_ema, atol=1e-4)
    probe = _make_batches(seed=99, n_steps=1)[0][0]
    _assert_function_space_close(model, final_state.params,
                                 final_state.bn_state, tm, probe, atol=5e-4)
    _assert_function_space_close(model, final_state.ema_params,
                                 final_state.ema_bn_state, tm_ema, probe,
                                 atol=5e-4)


def test_supervised_dynamics_match_torch_50_steps():
    batches = _make_batches(seed=5, n_steps=N_STEPS, teacher_noise=False)
    model, state, tm, _ = _init_pair(seed=7, mean_teacher=False)

    torch_losses = _torch_train(tm, None, batches, mean_teacher=False)
    final_state, our_losses = _jax_train(model, state, batches, mean_teacher=False)

    assert torch_losses[-1] < torch_losses[0]
    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3, atol=2e-4)
    _assert_params_close(final_state.params, final_state.bn_state, tm, atol=1e-4)
    probe = _make_batches(seed=98, n_steps=1)[0][0]
    _assert_function_space_close(model, final_state.params,
                                 final_state.bn_state, tm, probe, atol=5e-4)
