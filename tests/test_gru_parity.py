"""BiGRU golden-activation parity vs torch.nn.GRU.

The hardest kernel to match (SURVEY.md §7 hard parts #1): PyTorch gate order
(r, z, n), reset applied to the projected hidden state, fwd/bwd concat,
2-layer stacking. Weights are copied from our pytree into a torch GRU and
outputs compared."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.ops.gru import bigru_apply, bigru_init


def _copy_to_torch(params, input_size, hidden, num_layers):
    g = torch.nn.GRU(
        input_size, hidden, num_layers=num_layers, bidirectional=True, batch_first=True
    )
    sd = {}
    for l, layer in enumerate(params):
        for direction, suffix in [("fwd", ""), ("bwd", "_reverse")]:
            p = layer[direction]
            sd[f"weight_ih_l{l}{suffix}"] = torch.from_numpy(np.asarray(p["w_ih"]))
            sd[f"weight_hh_l{l}{suffix}"] = torch.from_numpy(np.asarray(p["w_hh"]))
            sd[f"bias_ih_l{l}{suffix}"] = torch.from_numpy(np.asarray(p["b_ih"]))
            sd[f"bias_hh_l{l}{suffix}"] = torch.from_numpy(np.asarray(p["b_hh"]))
    g.load_state_dict(sd)
    return g.eval()


def test_bigru_matches_torch_2layer():
    B, T, IN, H, LAYERS = 3, 17, 64, 64, 2
    params = bigru_init(jax.random.PRNGKey(0), IN, H, LAYERS)
    x = np.random.default_rng(0).standard_normal((B, T, IN)).astype(np.float32)
    ours = np.asarray(jax.jit(bigru_apply)(params, jnp.asarray(x)))
    torch_gru = _copy_to_torch(params, IN, H, LAYERS)
    with torch.no_grad():
        ref, _ = torch_gru(torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=5e-5)


def test_bigru_matches_torch_asymmetric_dims():
    B, T, IN, H = 2, 9, 40, 24
    params = bigru_init(jax.random.PRNGKey(1), IN, H, 1)
    x = np.random.default_rng(1).standard_normal((B, T, IN)).astype(np.float32)
    ours = np.asarray(bigru_apply(params, jnp.asarray(x)))
    torch_gru = _copy_to_torch(params, IN, H, 1)
    with torch.no_grad():
        ref, _ = torch_gru(torch.from_numpy(x))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=5e-5)


def test_bigru_backward_direction_really_reversed():
    # a time-asymmetric input must produce bwd outputs that differ from fwd
    params = bigru_init(jax.random.PRNGKey(2), 8, 8, 1)
    x = jnp.zeros((1, 12, 8)).at[0, 0].set(1.0)
    out = np.asarray(bigru_apply(params, x))
    fwd, bwd = out[..., :8], out[..., 8:]
    # the impulse at t=0 influences all fwd steps but only the *last* bwd step
    assert np.abs(fwd[0, -1]).max() > 1e-6
    assert np.abs(bwd[0, 0]).max() > 1e-6


def test_orthogonal_init_matrices():
    params = bigru_init(jax.random.PRNGKey(3), 64, 64, 1)
    w = np.asarray(params[0]["fwd"]["w_hh"])  # [3H, H], 3 stacked orthogonals
    for i in range(3):
        blk = w[i * 64 : (i + 1) * 64]
        np.testing.assert_allclose(blk @ blk.T, np.eye(64), atol=1e-4)
    b = np.asarray(params[0]["fwd"]["b_ih"])
    assert np.abs(b).max() <= 1 / np.sqrt(64) + 1e-6


def test_pick_unroll_geometry_default_and_override():
    # full unroll at H>=128 won 99.7 -> 95.7 device ms/step at the scaled
    # geometry; H=64 keeps 27 (full unroll measured 5.1 ms there) —
    # docs/PERF.md "Round 4: the scaled config"
    from dcase2019_task4_tpu.ops import gru as gru_mod

    assert gru_mod.SCAN_UNROLL is None  # auto by default
    assert gru_mod._pick_unroll(108, 64) == 27
    assert gru_mod._pick_unroll(108, 128) == 108
    # outside the measured envelope (T>128) full unroll is NOT assumed —
    # instruction count scales with T and only T=108 was wall-clocked
    assert gru_mod._pick_unroll(216, 256) == 27
    assert gru_mod._pick_unroll(432, 128) == 27
    old = gru_mod.SCAN_UNROLL
    try:
        gru_mod.SCAN_UNROLL = 9  # sweep override wins in both regimes
        assert gru_mod._pick_unroll(108, 64) == 9
        assert gru_mod._pick_unroll(108, 128) == 9
    finally:
        gru_mod.SCAN_UNROLL = old
