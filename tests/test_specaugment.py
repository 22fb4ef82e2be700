"""SpecAugment tests (scaled config capability, BASELINE.json config 5)."""

import numpy as np

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.ops.specaugment import spec_augment


def _x(B=4, T=100, F=64):
    return jnp.asarray(np.random.default_rng(0).standard_normal((B, T, F)).astype(np.float32) + 5.0)


def test_masks_zero_contiguous_regions():
    x = _x()
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), x, 2, 30, 2, 16))
    assert out.shape == x.shape
    assert (out == 0).any()  # something masked (x is offset by +5, never 0)
    # unmasked entries unchanged
    changed = out != np.asarray(x)
    assert np.all(np.asarray(x)[~changed] == out[~changed])


def test_time_mask_spans_all_freqs():
    x = _x()
    out = np.asarray(spec_augment(jax.random.PRNGKey(1), x, 1, 30, 0, 0))
    masked_frames = (out == 0).all(axis=2)  # [B, T]
    # a time mask kills whole frames
    assert masked_frames.any()
    per_clip = (out == 0).any(axis=(1, 2))
    for b in range(x.shape[0]):
        cols = np.where(masked_frames[b])[0]
        if len(cols):
            assert np.all(np.diff(cols) == 1)  # contiguous


def test_freq_mask_spans_all_frames():
    x = _x()
    out = np.asarray(spec_augment(jax.random.PRNGKey(2), x, 0, 0, 1, 16))
    masked_bins = (out == 0).all(axis=1)  # [B, F]
    assert masked_bins.any()


def test_deterministic_given_key_and_varies_by_key():
    x = _x()
    a = np.asarray(spec_augment(jax.random.PRNGKey(3), x))
    b = np.asarray(spec_augment(jax.random.PRNGKey(3), x))
    c = np.asarray(spec_augment(jax.random.PRNGKey(4), x))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_no_masks_is_identity():
    x = _x()
    out = spec_augment(jax.random.PRNGKey(0), x, 0, 0, 0, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_scaled_config_shapes():
    from dcase2019_task4_tpu.config import scaled_config

    cfg = scaled_config()
    assert cfg.dsp.n_mels == 128
    assert cfg.model.nb_filters == (128, 128, 128)
    assert cfg.model.pooling_time_ratio == 8
    # freq collapses to 1: 128 / (4·4·8)
    f = cfg.dsp.n_mels
    for _, pf in cfg.model.pooling:
        f //= pf
    assert f == 1
    assert cfg.train.spec_augment
