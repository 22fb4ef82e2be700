"""Fused Pallas entry-conv tests (ops/entry_conv.py).

CPU suite runs the kernels in interpret mode: forward parity vs the XLA
strided-slice im2col twin (models/layers.py conv2d_entry_packed), weight/
bias gradient parity vs autodiff of that twin, and BN-stats parity vs
direct sums. TPU-gated test repeats on the compiled kernels."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.models import layers as L
from dcase2019_task4_tpu.ops.entry_conv import (
    entry_conv_apply,
    entry_conv_packable,
)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU

B, T, F, C = 2, 32, 64, 64


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F, 1)).astype(np.float32))
    params = {
        "w": jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.2).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
    }
    ct = jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))
    return x, params, ct


def test_packable_guard():
    assert entry_conv_packable(64, 64, 864)
    assert not entry_conv_packable(64, 128, 864)  # k != 2
    assert not entry_conv_packable(63, 64, 864)  # F % k
    assert not entry_conv_packable(64, 64, 108)  # no mult-of-8 tile


def test_forward_matches_xla_twin(setup):
    x, params, _ = setup
    ours = entry_conv_apply(params, x, interpret=INTERPRET)
    ref = L.conv2d_entry_packed(params, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_matches_lax_conv(setup):
    x, params, _ = setup
    ours = entry_conv_apply(params, x, interpret=INTERPRET)
    ref = L.conv2d_apply(params, x, 1, 1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_grads_match_xla_twin(setup):
    x, params, ct = setup

    def loss_ours(p):
        return jnp.sum(entry_conv_apply(p, x, interpret=INTERPRET) * ct)

    def loss_ref(p):
        return jnp.sum(L.conv2d_entry_packed(p, x) * ct)

    go = jax.grad(loss_ours)(params)
    gr = jax.grad(loss_ref)(params)
    np.testing.assert_allclose(np.asarray(go["w"]), np.asarray(gr["w"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(go["b"]), np.asarray(gr["b"]), rtol=1e-4, atol=1e-4)


def test_stats_match_direct_sums(setup):
    x, params, _ = setup
    out, s1, s2 = entry_conv_apply(params, x, interpret=INTERPRET, want_stats=True)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(jnp.sum(out, axis=(0, 1, 2))), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(jnp.sum(out.astype(jnp.float32) ** 2, axis=(0, 1, 2))),
        rtol=1e-5, atol=1e-4,
    )


def test_bf16_path_close_to_f32(setup):
    x, params, _ = setup
    f32 = entry_conv_apply(params, x, interpret=INTERPRET)
    bf16 = entry_conv_apply(params, x, compute_dtype="bfloat16", interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(bf16).astype(np.float32), np.asarray(f32), rtol=0.05, atol=0.05
    )


def test_crnn_wiring_train_parity_interpret():
    """cfg.entry_conv_pallas=True vs the default XLA entry path through the
    full fused CRNN in TRAIN mode: same outputs, BN running stats, and
    parameter gradients (both fused paths draw identical per-tile dropout
    seeds, so the comparison is exact up to fp reassociation)."""
    from dcase2019_task4_tpu.config import ModelConfig
    from dcase2019_task4_tpu.models.crnn import CRNN

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 96, 64)).astype(np.float32))
    cfg_p = ModelConfig(fused_block=True, fused_interpret=True, entry_conv_pallas=True)
    cfg_x = ModelConfig(fused_block=True, fused_interpret=True)
    m_p, m_x = CRNN(cfg_p), CRNN(cfg_x)
    params, state = m_p.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)

    sp, wp, st_p = m_p.apply(params, state, x, train=True, rng=key)
    sx, wx, st_x = m_x.apply(params, state, x, train=True, rng=key)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wx), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(st_p), jax.tree.leaves(st_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    ct_s = jnp.asarray(rng.standard_normal(sp.shape).astype(np.float32))
    ct_w = jnp.asarray(rng.standard_normal(wp.shape).astype(np.float32))

    def loss(model):
        def f(p):
            s, w, _ = model.apply(p, state, x, train=True, rng=key)
            return jnp.sum(s * ct_s) + jnp.sum(w * ct_w)
        return f

    gp = jax.grad(loss(m_p))(params)
    gx = jax.grad(loss(m_x))(params)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(
    not os.environ.get("DCASE_TPU_TESTS"), reason="TPU-gated (set DCASE_TPU_TESTS=1)"
)
def test_compiled_production_shape_tpu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 864, 64, 1)).astype(np.float32))
    params = {
        "w": jnp.asarray((rng.standard_normal((3, 3, 1, 64)) * 0.2).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(64) * 0.1).astype(np.float32)),
    }
    ct = jnp.asarray(rng.standard_normal((4, 864, 64, 64)).astype(np.float32))
    ours = entry_conv_apply(params, x)
    ref = L.conv2d_entry_packed(params, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)
    go = jax.grad(lambda p: jnp.sum(entry_conv_apply(p, x) * ct))(params)
    gr = jax.grad(lambda p: jnp.sum(L.conv2d_entry_packed(p, x) * ct))(params)
    np.testing.assert_allclose(np.asarray(go["w"]), np.asarray(gr["w"]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(go["b"]), np.asarray(gr["b"]), rtol=1e-3, atol=1e-3)
