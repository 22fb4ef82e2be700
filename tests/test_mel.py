"""Mel frontend parity tests.

Ground truth comes from two independent sources:
  * torch.stft (center=True, pad_mode='reflect', hamming window) — validates
    the framing + window + FFT path against a battle-tested implementation
    configured exactly like the reference's librosa call
    (DatasetDcase2019Task4.py:209-218).
  * a straight-line numpy re-derivation of the Slaney mel filterbank and
    amplitude_to_db conventions (librosa htk=False, norm=None, amin=1e-5,
    top_db=80) written independently in this test file.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dcase2019_task4_tpu.ops.mel import (
    MelFrontend,
    dft_bases,
    hamming_window,
    host_reflect_pad,
    median_filter_binary,
    mel_filterbank,
    num_frames,
    reflect_pad_audio,
)

SR, NFFT, HOP, NMELS, T = 44100, 2048, 511, 64, 864
L = 441000


def _rand_audio(batch, length=L, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, length)) * 0.1).astype(np.float32)


def torch_stft_mag(audio):
    """|STFT| with the reference's librosa settings via torch."""
    x = torch.from_numpy(audio.astype(np.float64))
    win = torch.from_numpy(np.hamming(NFFT))
    s = torch.stft(
        x, n_fft=NFFT, hop_length=HOP, window=win, center=True,
        pad_mode="reflect", return_complex=True,
    )
    return s.abs().numpy().transpose(0, 2, 1)  # [B, T, bins]


def test_hamming_matches_numpy():
    np.testing.assert_allclose(hamming_window(NFFT), np.hamming(NFFT), rtol=1e-6)


def test_num_frames():
    assert num_frames(L, HOP) == T  # 1 + 441000//511 = 864 (config.py:22)


def test_stft_fft_mode_matches_torch():
    audio = _rand_audio(1, seed=7)
    fe = MelFrontend(stft_mode="fft")
    padded = reflect_pad_audio(jnp.asarray(audio), NFFT)
    mag = np.asarray(fe.stft_magnitude(padded))
    ref = torch_stft_mag(audio)[:, :T]
    np.testing.assert_allclose(mag, ref, rtol=1e-3, atol=2e-4)


def test_stft_matmul_mode_matches_torch():
    audio = _rand_audio(2)
    fe = MelFrontend(stft_mode="matmul")
    padded = reflect_pad_audio(jnp.asarray(audio), NFFT)
    mag = np.asarray(fe.stft_magnitude(padded))
    ref = torch_stft_mag(audio)[:, :T]
    # f32 MXU accumulation over 2048-tap windows: ~1e-2 absolute on
    # magnitudes spanning [0, ~100]; the downstream mel+log path is
    # insensitive at this level
    np.testing.assert_allclose(mag, ref, rtol=2e-2, atol=5e-2)


def test_stft_chunked_mode_matches_matmul_and_torch():
    """The gather-free hop-chunked DFT computes the same sums as the framed
    matmul path (different accumulation grouping only)."""
    audio = _rand_audio(2, seed=11)
    padded = reflect_pad_audio(jnp.asarray(audio), NFFT)
    mag_c = np.asarray(MelFrontend(stft_mode="chunked").stft_magnitude(padded))
    mag_m = np.asarray(MelFrontend(stft_mode="matmul").stft_magnitude(padded))
    np.testing.assert_allclose(mag_c, mag_m, rtol=1e-4, atol=1e-3)
    ref = torch_stft_mag(audio)[:, :T]
    np.testing.assert_allclose(mag_c, ref, rtol=2e-2, atol=5e-2)


def test_mel_filterbank_properties():
    fb = mel_filterbank(SR, NFFT, NMELS, 0.0, 22050.0)  # [bins, mels]
    assert fb.shape == (1025, NMELS)
    assert fb.min() >= 0.0
    # Slaney scale: linear spacing below 1 kHz → first filters peak ~66.7 Hz apart
    peaks_hz = np.linspace(0, SR / 2, 1025)[fb.argmax(axis=0)]
    spacing = np.diff(peaks_hz[:10])
    # mean spacing ≈ 66.7 Hz; individual argmax peaks quantize to ±1 bin
    assert abs(spacing.mean() - 200.0 / 3) < SR / NFFT
    # every filter has nonzero support; un-normalized (norm=None) peak ≈ 1
    assert (fb.sum(axis=0) > 0).all()
    assert 0.5 < fb.max() <= 1.0


def _numpy_amplitude_to_db(S):
    # librosa amplitude_to_db(ref=1, amin=1e-5, top_db=80), per clip
    db = 20.0 * np.log10(np.maximum(1e-5, S))
    return np.maximum(db, db.max() - 80.0)


def test_log_mel_full_pipeline_vs_numpy():
    audio = _rand_audio(2, seed=1)
    fe = MelFrontend()
    padded = reflect_pad_audio(jnp.asarray(audio), NFFT)
    ours = np.asarray(fe.log_mel(padded, jnp.full(2, T, dtype=jnp.int32)))
    # independent numpy pipeline
    mag = torch_stft_mag(audio)[:, :T]
    fb = mel_filterbank(SR, NFFT, NMELS, 0.0, 22050.0)
    mel = mag @ fb.astype(np.float64)
    ref = np.stack([_numpy_amplitude_to_db(m) for m in mel])
    # ≤0.15 dB absolute from f32 DFT accumulation — inaudible downstream
    np.testing.assert_allclose(ours, ref, rtol=5e-3, atol=0.15)


def test_log_mel_variable_length_pads_zero():
    short = np.random.default_rng(2).standard_normal(220500).astype(np.float32) * 0.1
    padded, frames = host_reflect_pad([short], L, NFFT, HOP, T)
    fe = MelFrontend()
    out = np.asarray(fe.log_mel(jnp.asarray(padded), jnp.asarray(frames)))
    nv = int(frames[0])
    assert nv == 1 + 220500 // HOP
    assert np.all(out[0, nv:] == 0.0)  # PadOrTrunc zeros after log
    assert np.any(out[0, :nv] != 0.0)


def test_host_reflect_pad_matches_librosa_convention():
    short = np.arange(5000, dtype=np.float32)
    padded, frames = host_reflect_pad([short], L, NFFT, HOP, T)
    p = NFFT // 2
    # left reflection around sample 0
    np.testing.assert_array_equal(padded[0, :p], short[1 : p + 1][::-1])
    np.testing.assert_array_equal(padded[0, p : p + 5000], short)


def test_log_mel_pair_student_clean_teacher_noisy():
    import jax

    audio = _rand_audio(2, seed=3)
    fe = MelFrontend()
    padded = reflect_pad_audio(jnp.asarray(audio), NFFT)
    nvf = jnp.full(2, T, dtype=jnp.int32)
    student, teacher = fe.log_mel_pair(padded, nvf, jax.random.PRNGKey(0))
    clean = fe.log_mel(padded, nvf)
    np.testing.assert_allclose(np.asarray(student), np.asarray(clean), atol=1e-6)
    # additive |noise| on linear mel ⇒ teacher dB ≥ student dB (pre-clamp),
    # and they must differ
    assert not np.allclose(np.asarray(teacher), np.asarray(student))


@pytest.mark.parametrize("window", [3, 5, 7])
def test_median_filter_matches_scipy(window):
    import scipy.ndimage

    rng = np.random.default_rng(4)
    x = (rng.random((108, 10)) > 0.5).astype(np.float32)
    ours = np.asarray(median_filter_binary(jnp.asarray(x), window))
    ref = scipy.ndimage.median_filter(x, size=(window, 1))
    np.testing.assert_array_equal(ours, ref)


def test_median_filter_batched():
    import scipy.ndimage

    rng = np.random.default_rng(5)
    x = (rng.random((4, 108, 10)) > 0.5).astype(np.float32)
    ours = np.asarray(median_filter_binary(jnp.asarray(x), 5))
    for b in range(4):
        np.testing.assert_array_equal(ours[b], scipy.ndimage.median_filter(x[b], size=(5, 1)))
