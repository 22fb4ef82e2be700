"""Hyperparameter ramp schedules.

Same curves as the reference's utils/ramps.py (sigmoid/linear rampup,
cosine/sigmoid rampdown) expressed as jnp-traceable functions so they can
live inside the jitted training step (the step counter is a traced scalar,
not Python state)."""

from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(−5·(1−t)²) rampup; 1.0 when rampup_length == 0."""
    if rampup_length == 0:
        return jnp.asarray(1.0)
    t = jnp.clip(current / rampup_length, 0.0, 1.0)
    phase = 1.0 - t
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    if rampup_length == 0:
        return jnp.asarray(1.0)
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    return 0.5 * (jnp.cos(jnp.pi * jnp.clip(current / rampdown_length, 0.0, 1.0)) + 1.0)


def sigmoid_rampdown(current, rampdown_length):
    if rampdown_length == 0:
        return jnp.asarray(1.0)
    t = jnp.clip(current / rampdown_length, 0.0, 1.0)
    phase = 1.0 - t
    return jnp.exp(-12.5 * phase * phase)
