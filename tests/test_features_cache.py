"""Feature cache tests: reference-style .npy layout, missing-audio drop."""

import os

import numpy as np
import pandas as pd
import pytest

from dcase2019_task4_tpu.config import Config, DSPConfig
from dcase2019_task4_tpu.data.audio_io import WavAudioSource, write_wav
from dcase2019_task4_tpu.data.features_cache import (
    NpyFeatureSource,
    cache_dir_name,
    drop_missing_audio,
    precompute_features,
)
from dcase2019_task4_tpu.data.manifests import manifest_from_df

CFG = Config(dsp=DSPConfig(max_len_seconds=1.0))


def _setup(tmp_path, n=3, missing=0):
    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        name = f"clip{i}.wav"
        write_wav(str(tmp_path / name), rng.standard_normal(CFG.dsp.max_samples).astype(np.float32) * 0.1, 44100)
        names.append(name)
    for i in range(missing):
        names.append(f"missing{i}.wav")
    m = manifest_from_df(pd.DataFrame({"filename": names}))
    src = WavAudioSource(str(tmp_path), 44100)
    return m, src


def test_cache_dir_name_reference_scheme():
    assert cache_dir_name(CFG.dsp) == "sr44100_win2048_hop511_mels64"
    assert cache_dir_name(CFG.dsp, save_log_feature=False).endswith("_nolog")


def test_precompute_and_read_back(tmp_path):
    m, src = _setup(tmp_path, n=3)
    done = precompute_features(m, src, CFG, base_feature_dir=str(tmp_path / "feat"), batch_size=2)
    assert sorted(done) == sorted(m.filenames)
    reader = NpyFeatureSource(CFG, base_feature_dir=str(tmp_path / "feat"))
    f = reader.get_features("clip0.wav")
    n_frames = 1 + CFG.dsp.max_samples // CFG.dsp.hop_length
    assert f.shape == (n_frames, 64)
    # matches the on-device frontend output for the same clip
    import jax.numpy as jnp

    from dcase2019_task4_tpu.ops.mel import MelFrontend, host_reflect_pad

    d = CFG.dsp
    fe = MelFrontend(sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
                     n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames)
    padded, frames = host_reflect_pad([src.get_audio("clip0.wav")], d.max_samples,
                                      d.n_window, d.hop_length, d.max_frames)
    ref = np.asarray(fe.log_mel(jnp.asarray(padded), jnp.asarray(frames)))[0, : frames[0]]
    np.testing.assert_allclose(f, ref, atol=1e-5)


def test_precompute_skips_missing_with_log(tmp_path):
    m, src = _setup(tmp_path, n=2, missing=1)
    done = precompute_features(m, src, CFG, base_feature_dir=str(tmp_path / "feat"))
    assert len(done) == 2


def test_drop_missing_audio(tmp_path):
    m, src = _setup(tmp_path, n=2, missing=2)
    filtered = drop_missing_audio(m, src)
    assert len(filtered) == 2
    assert all(not f.startswith("missing") for f in filtered.filenames)
    # no-op when everything is present
    assert drop_missing_audio(filtered, src) is filtered
