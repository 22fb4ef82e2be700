"""Fused ENTRY block tests (ops/fused_entry_block.py — experimental kernel:
conv(C_in=1) folded into the BN→GLU→dropout→pool chain).

Like test_fused_block.py: deterministic paths run through interpret mode on
CPU; the dropout path (hardware PRNG) is TPU-gated. The kernel is exact but
not currently wired into the CRNN (slower than XLA-conv + fused_block on
v5e; see the module docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.ops import fused_entry_block as FE

ON_TPU = jax.default_backend() == "tpu"

B, T, F, C = 2, 24, 8, 64
POOL = (2, 4)
EPS = 1e-3


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    cw = jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.3).astype(np.float32))
    cb = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    gw = jnp.asarray((rng.standard_normal((C, C)) * 0.1).astype(np.float32))
    gb = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((B, T // POOL[0], F // POOL[1], C)).astype(np.float32))
    return x, cw, cb, scale, bias, gw, gb, ct


@pytest.mark.skipif(not ON_TPU, reason="pallas TPU kernels (run via DCASE_TPU_TESTS=1)")
def test_stats_match_xla_conv(inputs):
    x, cw, cb, *_ = inputs
    xp = FE.pad_features_for_entry(x)
    s, sq = FE.entry_block_stats(xp, cw.reshape(9, C), cb)
    y = jax.lax.conv_general_dilated(
        x[..., None], cw, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + cb
    n = B * T * F
    np.testing.assert_allclose(np.asarray(s / n), np.asarray(y.mean(axis=(0, 1, 2))), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sq / n - (s / n) ** 2), np.asarray(y.var(axis=(0, 1, 2))), atol=1e-5
    )


@pytest.mark.skipif(not ON_TPU, reason="pallas TPU kernels (run via DCASE_TPU_TESTS=1)")
def test_fwd_and_grads_match_reference(inputs):
    x, cw, cb, scale, bias, gw, gb, ct = inputs
    xp = FE.pad_features_for_entry(x)
    cw9 = cw.reshape(9, C)
    y = jax.lax.conv_general_dilated(
        x[..., None], cw, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + cb
    mean = y.mean(axis=(0, 1, 2))
    var = y.var(axis=(0, 1, 2))
    out = FE.fused_entry_block(xp, cw9, cb, scale, bias, mean, var, gw, gb,
                               jnp.int32(5), 0.0, POOL, EPS, False)
    ref = FE.reference_entry_block(x, cw, cb, scale, bias, mean, var, gw, gb,
                                   None, 1.0, POOL, EPS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def lp(args):
        cw9_, cb_, sc, bi, gw_, gb_ = args
        o = FE.fused_entry_block(xp, cw9_, cb_, sc, bi,
                                 jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var),
                                 gw_, gb_, jnp.int32(5), 0.0, POOL, EPS, True)
        return jnp.sum(o * ct)

    def lr(args):
        cw9_, cb_, sc, bi, gw_, gb_ = args
        yy = jax.lax.conv_general_dilated(
            x[..., None], cw9_.reshape(3, 3, 1, C), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cb_
        from dcase2019_task4_tpu.ops.fused_block import reference_block

        o = reference_block(yy, sc, bi, yy.mean(axis=(0, 1, 2)), yy.var(axis=(0, 1, 2)),
                            gw_, gb_, None, 1.0, POOL, EPS)
        return jnp.sum(o * ct)

    args = (cw9, cb, scale, bias, gw, gb)
    gp = jax.grad(lp)(args)
    gr = jax.grad(lr)(args)
    for name, a, r in zip(["dconv_w", "dconv_b", "dscale", "dbias", "dglu_w", "dglu_b"], gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5,
                                   err_msg=name)
