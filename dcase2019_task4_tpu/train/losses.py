"""Losses for the Mean-Teacher semi-supervised objective.

The reference computes (main.py:93-145):
  * weak BCE on the weak slice of the batch: BCE(weak_pred, max_t target)
  * strong BCE on the synthetic slice: BCE(strong_pred, target)
  * MSE consistency between student and (stopped-gradient) teacher on the
    FULL batch, for both strong and weak heads, weighted by
    max_consistency_cost · sigmoid_rampup(step, len·n_epoch/2)

All reductions are means, like torch's BCELoss/MSELoss defaults. Stream
masking is done with *static* batch slices (the fixed multi-stream batch
layout), so there is no dynamic shape anywhere under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def bce(pred, target):
    """Binary cross-entropy on probabilities, mean reduction (torch BCELoss).
    Predictions are sigmoid outputs; clamp like torch for stability."""
    p = jnp.clip(pred, EPS, 1.0 - EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def weak_bce(weak_pred, target, weak_slice: slice):
    """target is the [B, T, C] strong grid; weak target = max over time
    (main.py:96: `target.max(-2)[0]`)."""
    target_weak = target.max(axis=-2)
    return bce(weak_pred[weak_slice], target_weak[weak_slice])


def strong_bce(strong_pred, target, strong_slice: slice):
    return bce(strong_pred[strong_slice], target[strong_slice])


def consistency(strong_pred, weak_pred, strong_teacher, weak_teacher, weight):
    """weight · (MSE_strong + MSE_weak) over the whole batch
    (main.py:124-145). Teacher tensors must already be stop_gradient'ed."""
    return weight * mse(strong_pred, strong_teacher) + weight * mse(weak_pred, weak_teacher)
