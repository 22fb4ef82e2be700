"""Optimizer hyperparameter schedules.

The reference defines (but leaves commented out at main.py:81) an Adam
schedule driven by rampup/rampdown values (adjust_learning_rate,
main.py:32-42):

  lr   = rampup · rampdown · max_learning_rate
  β1   = rampdown · β1_before + (1 − rampdown) · β1_after
  β2   = (1 − rampup) · β2_during + rampup · β2_after
  wd   = (1 − rampup) · wd_during + rampup · wd_after

Provided here as a first-class optax transform (inject_hyperparams) so the
"large-minibatch warmup" recipe the reference imports from the
mean-teacher paper is actually usable, scheduled per step under jit.
"""

from __future__ import annotations

import optax

from dcase2019_task4_tpu.train.ramps import sigmoid_rampup, cosine_rampdown


def meanteacher_adam(
    total_steps: int,
    rampup_steps: int,
    rampdown_steps: int | None = None,
    max_learning_rate: float = 1e-3,
    beta1_before_rampdown: float = 0.9,
    beta1_after_rampdown: float = 0.5,
    beta2_during_rampup: float = 0.99,
    beta2_after_rampup: float = 0.999,
    weight_decay_during_rampup: float = 0.99,
    weight_decay_after_rampup: float = 0.999,
    eps: float = 1e-8,
):
    """Adam with the reference's ramped hyperparameters (constants from
    config.py:27-37). `weight_decay` here follows the mean-teacher paper's
    EMA-style decay toward zero (decoupled, (1−wd)·θ per step)."""
    rampdown_steps = rampdown_steps or total_steps

    def lr_fn(step):
        up = sigmoid_rampup(step, rampup_steps)
        down = cosine_rampdown(step, rampdown_steps)
        return up * down * max_learning_rate

    def b1_fn(step):
        down = cosine_rampdown(step, rampdown_steps)
        return down * beta1_before_rampdown + (1.0 - down) * beta1_after_rampdown

    def b2_fn(step):
        up = sigmoid_rampup(step, rampup_steps)
        return (1.0 - up) * beta2_during_rampup + up * beta2_after_rampup

    @optax.inject_hyperparams
    def make(learning_rate, b1, b2):
        return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)

    return make(learning_rate=lr_fn, b1=b1_fn, b2=b2_fn)
