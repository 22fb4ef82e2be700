"""Tests for the remaining reference-surface components: BiLSTM, host-side
transforms, optimizer schedules, split helpers, cluster sampler."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.config import Config
from dcase2019_task4_tpu.data.manifests import load_manifest, random_split, train_valid_split
from dcase2019_task4_tpu.data.sampler import ClusterRandomSampler
from dcase2019_task4_tpu.data import transforms as TR
from dcase2019_task4_tpu.ops.gru import bilstm_apply, bilstm_init
from dcase2019_task4_tpu.train.schedules import meanteacher_adam
from dcase2019_task4_tpu.utils.scaler import Scaler

CFG = Config()


# ------------------------------------------------------------------ LSTM


def test_bilstm_matches_torch():
    B, T, IN, H = 2, 11, 32, 16
    params = bilstm_init(jax.random.PRNGKey(0), IN, H, 2)
    x = np.random.default_rng(0).standard_normal((B, T, IN)).astype(np.float32)
    lstm = torch.nn.LSTM(IN, H, num_layers=2, bidirectional=True, batch_first=True)
    sd = {}
    for l, layer in enumerate(params):
        for d, suf in [("fwd", ""), ("bwd", "_reverse")]:
            p = layer[d]
            sd[f"weight_ih_l{l}{suf}"] = torch.from_numpy(np.asarray(p["w_ih"]))
            sd[f"weight_hh_l{l}{suf}"] = torch.from_numpy(np.asarray(p["w_hh"]))
            sd[f"bias_ih_l{l}{suf}"] = torch.from_numpy(np.asarray(p["b_ih"]))
            sd[f"bias_hh_l{l}{suf}"] = torch.from_numpy(np.asarray(p["b_hh"]))
    lstm.load_state_dict(sd)
    lstm.eval()
    ours = np.asarray(jax.jit(bilstm_apply)(params, jnp.asarray(x)))
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=5e-5)


# ------------------------------------------------------------- transforms


def test_transforms_reference_order_and_math():
    rng = np.random.default_rng(0)
    mel = rng.uniform(0.01, 10.0, (50, 8)).astype(np.float32)
    scaler = Scaler().fit_iter([TR.ApplyLog().apply(mel)[None][0]])
    t = TR.get_transforms(64, scaler=scaler)
    feats, label = t((mel, np.ones(3)))[0], None
    assert feats.shape == (64, 8)
    # log → pad zeros → normalize: padded rows are (0-μ)/σ
    np.testing.assert_allclose(feats[50:], np.broadcast_to((0 - scaler.mean_) / scaler.std_, (14, 8)), rtol=1e-5)


def test_augment_noise_pair_clean_student_noisy_teacher():
    rng = np.random.default_rng(1)
    mel = rng.uniform(0.01, 1.0, (10, 4))
    t = TR.get_transforms(10, augment_type="noise", rng=np.random.default_rng(2))
    clean, noisy, label = t((mel, "lab"))
    assert label == "lab"
    # noise is |N| on the LINEAR mel, so noisy dB ≥ would-be-clean dB mostly;
    # crucially they must differ and clean equals the no-noise path
    t2 = TR.get_transforms(10)
    clean2, _ = t2((mel, "lab"))
    np.testing.assert_allclose(clean, clean2)
    assert not np.allclose(clean, noisy)


def test_pad_trunc():
    x = np.ones((5, 3))
    assert TR.pad_trunc_seq(x, 8).shape == (8, 3)
    assert TR.pad_trunc_seq(x, 3).shape == (3, 3)
    np.testing.assert_array_equal(TR.pad_trunc_seq(x, 8)[5:], 0)


# -------------------------------------------------------------- schedules


def test_meanteacher_adam_schedule_values():
    opt = meanteacher_adam(total_steps=1000, rampup_steps=100)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    # step 0: lr = rampup(0)·rampdown(0)·1e-3 = e^-5 · 1 · 1e-3
    hp = state.hyperparams
    np.testing.assert_allclose(float(hp["learning_rate"]), np.exp(-5) * 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(hp["b1"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(hp["b2"]), 0.99 + (np.exp(-5) * (0.999 - 0.99)), rtol=1e-4)
    g = {"w": jnp.ones(3)}
    for _ in range(3):
        updates, state = opt.update(g, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


# ----------------------------------------------------------- split/sampler


def test_random_split_and_train_valid_split():
    m = load_manifest(CFG.paths.weak)
    a, b = random_split(m, [1000, len(m.filenames) - 1000])
    assert len(a) == 1000
    assert not set(a.filenames) & set(b.filenames)
    tr, va = train_valid_split(m, 0.2)
    assert abs(len(va) - 0.2 * len(m)) <= 1
    with pytest.raises(ValueError):
        random_split(m, [1, 2])


def test_cluster_sampler_single_stream_batches():
    s = ClusterRandomSampler([10, 7], [3, 2])
    batches = s.epoch_batches(0)
    assert len(batches) == len(s) == 3 + 3
    for b in batches:
        assert len(set(b[:, 0])) == 1  # one stream per batch
    # all indices valid and unique within stream
    for stream in (0, 1):
        idx = np.concatenate([b[:, 1] for b in batches if b[0, 0] == stream])
        assert len(np.unique(idx)) == len(idx)
