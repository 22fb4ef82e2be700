"""Fused Pallas STFT→mel kernel (ops/fused_mel.py) correctness.

CPU tests run the kernel in interpret mode on a tiny DSP config and compare
against the XLA chunked path (itself librosa-parity-tested in test_mel.py).
TPU-gated tests (DCASE_TPU_TESTS=1) validate the compiled kernel at the
production shape.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcase2019_task4_tpu.ops import fused_mel as fm
from dcase2019_task4_tpu.ops.mel import MelFrontend

TINY = dict(
    sample_rate=16000, n_window=32, hop_length=12, n_mels=8,
    f_min=0.0, f_max=8000.0, max_frames=8,
)


def test_pick_tile_constraints():
    # production config: hop 511, n_fft 2048 → 4 overlap rows → tile must be
    # a multiple of 8 dividing 864
    tt = fm.pick_tile(864, 2048, 511)
    assert tt > 0 and 864 % tt == 0 and tt % 8 == 0
    # no legal tile → 0 (prime frame count)
    assert fm.pick_tile(7, 2048, 511) == 0


def test_trimmed_bins_drops_negligible_nyquist():
    from dcase2019_task4_tpu.ops.mel import mel_filterbank

    fb = mel_filterbank(44100, 2048, 64, 0.0, 22050.0)
    nb = fm.trimmed_bins(fb)
    assert nb == 1024  # Nyquist triangle weight ~1e-15 is trimmed
    assert np.abs(fb[nb:]).max() < 1e-8


def _frontends(**over):
    kw = dict(TINY, **over)
    fe_p = MelFrontend(stft_mode="auto", pallas_interpret=True, **kw)
    fe_c = MelFrontend(stft_mode="chunked", **kw)
    assert fe_p.stft_mode == "pallas"
    return fe_p, fe_c


def test_interpret_matches_chunked_f32():
    fe_p, fe_c = _frontends()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((3, 140)).astype(np.float32))
    mp = np.asarray(fe_p.linear_mel(a))
    mc = np.asarray(fe_c.linear_mel(a))
    np.testing.assert_allclose(mp, mc, atol=1e-5 * np.abs(mc).max())


def test_interpret_matches_chunked_int16():
    fe_p, fe_c = _frontends()
    rng = np.random.default_rng(1)
    a = jnp.asarray((rng.standard_normal((2, 150)) * 9000).astype(np.int16))
    mp = np.asarray(fe_p.linear_mel(a))
    mc = np.asarray(fe_c.linear_mel(a))
    np.testing.assert_allclose(mp, mc, atol=1e-5 * np.abs(mc).max())


def test_interpret_log_mel_path():
    fe_p, fe_c = _frontends()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((3, 140)).astype(np.float32))
    frames = jnp.asarray([8, 5, 8])
    lp = np.asarray(fe_p.log_mel(a, frames))
    lc = np.asarray(fe_c.log_mel(a, frames))
    np.testing.assert_allclose(lp, lc, atol=1e-4)
    # padding frames zeroed identically
    assert np.all(lp[1, 5:] == 0.0)


def test_interpret_no_tail_config():
    # n_fft divisible by hop → no tail part (exercise the tail_w == 0 branch)
    fe_p, fe_c = _frontends(n_window=32, hop_length=16, max_frames=8)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((2, 160)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fe_p.linear_mel(a)), np.asarray(fe_c.linear_mel(a)), atol=1e-5
    )


@pytest.mark.skipif(
    not os.environ.get("DCASE_TPU_TESTS"), reason="TPU-gated (set DCASE_TPU_TESTS=1)"
)
def test_tpu_production_shape_parity():
    assert jax.default_backend() == "tpu"
    fe_p = MelFrontend(stft_mode="auto", compute_dtype="bfloat16")
    fe_c = MelFrontend(stft_mode="chunked", compute_dtype="bfloat16")
    assert fe_p.stft_mode == "pallas"
    rng = np.random.default_rng(0)
    a = jnp.asarray((rng.standard_normal((8, 441000 + 2048)) * 6000).astype(np.int16))
    mp = np.asarray(jax.jit(fe_p.linear_mel)(a))
    mc = np.asarray(jax.jit(fe_c.linear_mel)(a))
    # bf16 compute: both paths share cast points; differences are rounding
    assert np.abs(mp - mc).max() / np.abs(mc).max() < 2e-3


def test_interpret_scaled_mel_count():
    """128-mel (scaled-config) geometry through the fused kernel: the mel
    matrix widens to 128 lanes — parity with the chunked path."""
    fe_p, fe_c = _frontends(n_mels=128, f_max=8000.0)
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((2, 140)).astype(np.float32))
    mp = np.asarray(fe_p.linear_mel(a))
    mc = np.asarray(fe_c.linear_mel(a))
    assert mp.shape[-1] == 128
    np.testing.assert_allclose(mp, mc, atol=1e-5 * np.abs(mc).max())


@pytest.mark.parametrize(
    "over",
    [
        {},  # tail part present (hop 12, n_fft 32)
        {"n_window": 32, "hop_length": 16, "max_frames": 8},  # no tail
        {"n_mels": 128, "f_max": 8000.0},  # wide mel (scaled geometry)
    ],
)
def test_interpret_onedot_matches_chunked(monkeypatch, over):
    """DCASE_FUSED_MEL_ONEDOT variant (single [tt, n_fft]×[n_fft, 2·NB]
    DFT matmul against the cos‖sin-fused basis) is numerically the same
    contraction reassociated — parity with the chunked path in interpret
    mode, int16 scaling and frame-masked log path included."""
    monkeypatch.setattr(fm, "ONEDOT", True)
    fe_p, fe_c = _frontends(**over)
    assert isinstance(fe_p._fused_bases, fm.OnedotBases)
    rng = np.random.default_rng(7)
    a16 = jnp.asarray((rng.standard_normal((3, 150)) * 9000).astype(np.int16))
    mp = np.asarray(fe_p.linear_mel(a16))
    mc = np.asarray(fe_c.linear_mel(a16))
    np.testing.assert_allclose(mp, mc, atol=1e-5 * np.abs(mc).max())
    frames = jnp.asarray([8, 5, 8])
    lp = np.asarray(fe_p.log_mel(a16, frames))
    lc = np.asarray(fe_c.log_mel(a16, frames))
    np.testing.assert_allclose(lp, lc, atol=1e-4)
    assert np.all(lp[1, 5:] == 0.0)
