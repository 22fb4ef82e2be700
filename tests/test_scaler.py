"""Scaler moment/normalization tests (reference utils/Scaler.py:9-130)."""

import numpy as np

from dcase2019_task4_tpu.utils.scaler import Scaler


def _clips(n=10, t=20, f=8, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal((t, f)) * 3 + 1 for _ in range(n)]


def _reference_moments(clips):
    # reference Scaler.means: per-clip mean over all axes but last, equal
    # weight per clip (utils/Scaler.py:34-87)
    mean = np.mean([c.mean(axis=0) for c in clips], axis=0)
    msq = np.mean([(c**2).mean(axis=0) for c in clips], axis=0)
    return mean, msq


def test_fit_iter_matches_reference_math():
    clips = _clips()
    s = Scaler().fit_iter(clips)
    mean, msq = _reference_moments(clips)
    np.testing.assert_allclose(s.mean_, mean)
    np.testing.assert_allclose(s.mean_of_square_, msq)
    np.testing.assert_allclose(s.std_, np.sqrt(msq - mean**2))


def test_fit_batched_matches_fit_iter():
    clips = _clips(12)
    a = Scaler().fit_iter(clips)
    batches = [np.stack(clips[:5]), np.stack(clips[5:9]), np.stack(clips[9:])]
    b = Scaler().fit_batched(batches)
    np.testing.assert_allclose(a.mean_, b.mean_)
    np.testing.assert_allclose(a.std_, b.std_)


def test_fit_accepts_feature_label_tuples():
    clips = _clips(4)
    s = Scaler().fit_iter([(c, None) for c in clips])
    s2 = Scaler().fit_iter(clips)
    np.testing.assert_allclose(s.mean_, s2.mean_)


def test_normalize():
    clips = _clips(6)
    s = Scaler().fit_iter(clips)
    z = s.normalize(clips[0])
    np.testing.assert_allclose(z, (clips[0] - s.mean_) / s.std_)


def test_state_dict_json_roundtrip(tmp_path):
    s = Scaler().fit_iter(_clips(3))
    p = tmp_path / "scaler.json"
    s.save(p)
    s2 = Scaler().load(p)
    np.testing.assert_allclose(s2.mean_, s.mean_)
    np.testing.assert_allclose(s2.std_, s.std_)
    assert set(s.state_dict()) == {"mean_", "mean_of_square_"}


def test_device_scaler_stats_tail_mask():
    """make_scaler_stats masks the repeated-tail padding rows on device: a
    padded batch with n_valid=k must reduce exactly like the first k rows
    alone (the single code path replacing the old host tail recompute)."""
    import jax.numpy as jnp

    from dcase2019_task4_tpu.ops.mel import MelFrontend, host_reflect_pad
    from dcase2019_task4_tpu.train.steps import make_scaler_stats

    sr, n_fft, hop, n_mels, max_frames = 8000, 256, 200, 16, 40
    fe = MelFrontend(sample_rate=sr, n_window=n_fft, hop_length=hop,
                     n_mels=n_mels, f_min=0, f_max=sr // 2, max_frames=max_frames)
    stats = make_scaler_stats(fe)
    rng = np.random.default_rng(0)
    clips = [rng.standard_normal(sr).astype(np.float32) * 0.1 for _ in range(3)]
    max_samples = sr
    padded, frames = host_reflect_pad(clips + [clips[-1]], max_samples, n_fft, hop, max_frames)
    s_masked, sq_masked = stats(jnp.asarray(padded), jnp.asarray(frames), jnp.int32(3))
    padded3, frames3 = host_reflect_pad(clips, max_samples, n_fft, hop, max_frames)
    s_full, sq_full = stats(jnp.asarray(padded3), jnp.asarray(frames3), jnp.int32(3))
    np.testing.assert_allclose(np.asarray(s_masked), np.asarray(s_full), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sq_masked), np.asarray(sq_full), rtol=1e-6)
