"""SpecAugment: random time/frequency masking on log-mel features.

New capability for the scaled training config (BASELINE.json config 5:
"Scaled CRNN (128 mels, wider conv/GRU) with SpecAugment"). Follows the
standard SpecAugment recipe (Park et al., 2019): per clip, `n` contiguous
time masks of width ~ U[0, max_time_width] and `m` frequency masks of width
~ U[0, max_freq_width], filled with the mask value (0 = the mean of
standardized features). Fully vectorized jnp — runs inside the jitted train
step on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_mask(rng, batch: int, size: int, n_masks: int, max_width: int):
    """[B, size] boolean: True where masked."""
    r_start, r_width = jax.random.split(rng)
    starts = jax.random.randint(r_start, (batch, n_masks), 0, size)
    widths = jax.random.randint(r_width, (batch, n_masks), 0, max_width + 1)
    idx = jnp.arange(size)[None, None, :]
    m = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
    return m.any(axis=1)


def spec_augment(
    rng,
    x: jnp.ndarray,
    time_masks: int = 2,
    max_time_width: int = 64,
    freq_masks: int = 2,
    max_freq_width: int = 16,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """x: [B, T, F] features → masked features (same shape)."""
    B, T, F = x.shape
    r_t, r_f = jax.random.split(rng)
    masked = x
    if time_masks > 0:
        tm = _axis_mask(r_t, B, T, time_masks, max_time_width)
        masked = jnp.where(tm[:, :, None], mask_value, masked)
    if freq_masks > 0:
        fm = _axis_mask(r_f, B, F, freq_masks, max_freq_width)
        masked = jnp.where(fm[:, None, :], mask_value, masked)
    return masked
