"""CRNN golden-activation parity vs an independently-built torch model.

The torch twin is assembled here from torch.nn primitives following the
architecture contract (SURVEY.md §3.2): 3×[conv3×3 → BN(eps1e-3) → GLU →
avgpool(2,4)] → BiGRU(2×64) → dense heads with the class-softmax /
time-normalized attention pooling. Weights are copied from our pytree into
torch; outputs compared in eval mode (dropout off, BN running stats)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN, count_params

CFG = ModelConfig()


class TorchGLU(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.linear = nn.Linear(ch, ch)

    def forward(self, x):  # x NCHW
        lin = self.linear(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return lin * torch.sigmoid(x)


class TorchCRNN(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        blocks = []
        in_ch = cfg.n_in_channel
        for i, out in enumerate(cfg.nb_filters):
            blocks += [
                nn.Conv2d(in_ch, out, cfg.kernel_size[i], cfg.stride[i], cfg.padding[i]),
                nn.BatchNorm2d(out, eps=cfg.bn_eps, momentum=cfg.bn_momentum),
                TorchGLU(out),
                nn.AvgPool2d(tuple(cfg.pooling[i])),
            ]
            in_ch = out
        self.cnn = nn.Sequential(*blocks)
        self.rnn = nn.GRU(
            cfg.nb_filters[-1], cfg.n_rnn_cell, num_layers=cfg.n_layers_rnn,
            bidirectional=True, batch_first=True,
        )
        self.dense = nn.Linear(cfg.n_rnn_cell * 2, cfg.nclass)
        self.dense_softmax = nn.Linear(cfg.n_rnn_cell * 2, cfg.nclass)

    def forward(self, x):  # x [B, 1, T, F]
        x = self.cnn(x)
        x = x.squeeze(-1).permute(0, 2, 1)  # [B, T', C]
        x, _ = self.rnn(x)
        strong = torch.sigmoid(self.dense(x))
        sof = torch.softmax(self.dense_softmax(x), dim=-1).clamp(1e-7, 1.0)
        weak = (strong * sof).sum(1) / sof.sum(1)
        return strong, weak


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def copy_params_to_torch(params, state, model: TorchCRNN, cfg: ModelConfig):
    sd = {}
    for i in range(len(cfg.nb_filters)):
        base = f"cnn.{4*i}"
        sd[f"{base}.weight"] = _t(params["cnn"][i]["conv"]["w"]).permute(3, 2, 0, 1)
        sd[f"{base}.bias"] = _t(params["cnn"][i]["conv"]["b"])
        bn = f"cnn.{4*i+1}"
        sd[f"{bn}.weight"] = _t(params["cnn"][i]["bn"]["scale"])
        sd[f"{bn}.bias"] = _t(params["cnn"][i]["bn"]["bias"])
        sd[f"{bn}.running_mean"] = _t(state["cnn"][i]["mean"])
        sd[f"{bn}.running_var"] = _t(state["cnn"][i]["var"])
        sd[f"{bn}.num_batches_tracked"] = torch.tensor(0)
        glu = f"cnn.{4*i+2}.linear"
        sd[f"{glu}.weight"] = _t(params["cnn"][i]["act"]["w"]).T
        sd[f"{glu}.bias"] = _t(params["cnn"][i]["act"]["b"])
    for l, layer in enumerate(params["rnn"]):
        for d, suf in [("fwd", ""), ("bwd", "_reverse")]:
            p = layer[d]
            sd[f"rnn.weight_ih_l{l}{suf}"] = _t(p["w_ih"])
            sd[f"rnn.weight_hh_l{l}{suf}"] = _t(p["w_hh"])
            sd[f"rnn.bias_ih_l{l}{suf}"] = _t(p["b_ih"])
            sd[f"rnn.bias_hh_l{l}{suf}"] = _t(p["b_hh"])
    sd["dense.weight"] = _t(params["dense"]["w"]).T
    sd["dense.bias"] = _t(params["dense"]["b"])
    sd["dense_softmax.weight"] = _t(params["dense_softmax"]["w"]).T
    sd["dense_softmax.bias"] = _t(params["dense_softmax"]["b"])
    model.load_state_dict(sd)
    return model


@pytest.fixture(scope="module")
def rand_state_and_input():
    model = CRNN(CFG)
    params, state = model.init(jax.random.PRNGKey(42))
    # non-trivial BN running stats so eval mode is actually exercised
    rng = np.random.default_rng(0)
    state = {
        "cnn": [
            {
                "mean": jnp.asarray(rng.normal(0, 0.5, s["mean"].shape).astype(np.float32)),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, s["var"].shape).astype(np.float32)),
            }
            for s in state["cnn"]
        ]
    }
    x = rng.standard_normal((2, 864, 64)).astype(np.float32) * 2.0
    return model, params, state, x


def test_forward_shapes(rand_state_and_input):
    model, params, state, x = rand_state_and_input
    strong, weak, _ = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(
        params, state, jnp.asarray(x)
    )
    assert strong.shape == (2, 108, 10)
    assert weak.shape == (2, 10)
    assert (np.asarray(strong) >= 0).all() and (np.asarray(strong) <= 1).all()


def test_param_count_matches_reference_scale(rand_state_and_input):
    model, params, _, _ = rand_state_and_input
    n = count_params(params)
    # conv stack ≈ 75k + GRU ≈ 198k ... total ≈ 0.5–1.5M — same model class
    assert 2e5 < n < 2e6


def test_eval_forward_matches_torch(rand_state_and_input):
    model, params, state, x = rand_state_and_input
    strong, weak, _ = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(
        params, state, jnp.asarray(x)
    )
    tm = copy_params_to_torch(params, state, TorchCRNN(CFG), CFG).eval()
    with torch.no_grad():
        ts, tw = tm(torch.from_numpy(x[:, None]))  # NCHW input
    np.testing.assert_allclose(np.asarray(strong), ts.numpy(), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(weak), tw.numpy(), rtol=1e-3, atol=2e-5)


def test_train_mode_batchnorm_and_state_update(rand_state_and_input):
    model, params, state, x = rand_state_and_input
    cfg_nodrop = ModelConfig(dropout=0.0)
    model_nd = CRNN(cfg_nodrop)
    strong, weak, new_state = jax.jit(
        lambda p, s, xx: model_nd.apply(p, s, xx, train=True, rng=jax.random.PRNGKey(0))
    )(params, state, jnp.asarray(x))
    tm = copy_params_to_torch(params, state, TorchCRNN(CFG), CFG).train()
    for m in tm.modules():  # dropout-free torch twin is already dropout-free
        pass
    with torch.no_grad():
        ts, tw = tm(torch.from_numpy(x[:, None]))
    np.testing.assert_allclose(np.asarray(strong), ts.numpy(), rtol=1e-3, atol=3e-5)
    # running stats updated with torch momentum convention (0.99·batch)
    bn0 = dict(tm.named_buffers())["cnn.1.running_mean"].numpy()
    np.testing.assert_allclose(np.asarray(new_state["cnn"][0]["mean"]), bn0, rtol=1e-3, atol=1e-5)


def test_dropout_active_in_train_mode(rand_state_and_input):
    model, params, state, x = rand_state_and_input
    f = jax.jit(lambda p, s, xx, r: model.apply(p, s, xx, train=True, rng=r))
    s1, _, _ = f(params, state, jnp.asarray(x), jax.random.PRNGKey(1))
    s2, _, _ = f(params, state, jnp.asarray(x), jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_attention_semantics_class_softmax_time_norm(rand_state_and_input):
    # reproduce models/CRNN.py:77-83 by hand from the strong head outputs
    model, params, state, x = rand_state_and_input
    strong, weak, _ = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(
        params, state, jnp.asarray(x)
    )
    # recompute weak from the RNN features path: instead, verify bounds and
    # that weak is a convex-ish combination: min_t strong ≤ weak ≤ max_t strong
    s = np.asarray(strong)
    w = np.asarray(weak)
    assert (w <= s.max(axis=1) + 1e-6).all()
    assert (w >= s.min(axis=1) - 1e-6).all()


def test_entry_conv_packed_matches_lax_conv():
    """conv2d_entry_packed (strided-slice im2col, packed output) computes the
    same 3x3 s1 p1 single-channel conv as lax.conv_general_dilated."""
    import jax
    import jax.numpy as jnp

    from dcase2019_task4_tpu.models import layers as L

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 1)).astype(np.float32))
    params = L.conv2d_init(jax.random.PRNGKey(0), 1, 64, 3)
    ref = L.conv2d_apply(params, x)
    out = L.conv2d_entry_packed(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # gradient parity through both formulations
    ct = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    g1 = jax.grad(lambda p: jnp.sum(L.conv2d_apply(p, x) * ct))(params)
    g2 = jax.grad(lambda p: jnp.sum(L.conv2d_entry_packed(p, x) * ct))(params)
    np.testing.assert_allclose(np.asarray(g2["w"]), np.asarray(g1["w"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2["b"]), np.asarray(g1["b"]), rtol=1e-4, atol=1e-4)


def test_entry_conv_rowmat_matches_lax_conv():
    """conv2d_entry_rowmat (row-level banded matmul) computes the same
    3x3 s1 p1 single-channel conv as lax.conv_general_dilated, including
    freq-edge zero padding via band clipping, for square and non-square F/C."""
    import jax
    import jax.numpy as jnp

    from dcase2019_task4_tpu.models import layers as L

    rng = np.random.default_rng(11)
    for F, C in ((64, 64), (16, 24)):
        x = jnp.asarray(rng.standard_normal((2, 12, F, 1)).astype(np.float32))
        params = L.conv2d_init(jax.random.PRNGKey(1), 1, C, 3)
        ref = L.conv2d_apply(params, x)
        out = L.conv2d_entry_rowmat(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
        ct = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
        g1 = jax.grad(lambda p: jnp.sum(L.conv2d_apply(p, x) * ct))(params)
        g2 = jax.grad(lambda p: jnp.sum(L.conv2d_entry_rowmat(p, x) * ct))(params)
        np.testing.assert_allclose(np.asarray(g2["w"]), np.asarray(g1["w"]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2["b"]), np.asarray(g1["b"]), rtol=1e-4, atol=1e-4)


def test_eval_forward_matches_torch_scaled_geometry():
    """Same golden comparison at the scaled config's geometry (128-ch convs,
    128-mel input, (2,4)/(2,4)/(2,8) pooling) — the k=1 no-lane-packing
    kernel path and the wider GLU/BN shapes."""
    cfg = ModelConfig(nclass=10, nb_filters=(128, 128, 128), n_rnn_cell=16,
                      pooling=((2, 4), (2, 4), (2, 8)))
    model = CRNN(cfg)
    params, state0 = model.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    state = {
        "cnn": [
            {
                "mean": jnp.asarray(rng.normal(0, 0.5, s["mean"].shape).astype(np.float32)),
                "var": jnp.asarray(rng.uniform(0.5, 2.0, s["var"].shape).astype(np.float32)),
            }
            for s in state0["cnn"]
        ]
    }
    x = rng.standard_normal((2, 96, 128)).astype(np.float32) * 2.0
    strong, weak, _ = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(
        params, state, jnp.asarray(x)
    )
    tm = copy_params_to_torch(params, state, TorchCRNN(cfg), cfg).eval()
    with torch.no_grad():
        ts, tw = tm(torch.from_numpy(x[:, None]))
    np.testing.assert_allclose(np.asarray(strong), ts.numpy(), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(weak), tw.numpy(), rtol=1e-3, atol=2e-5)
