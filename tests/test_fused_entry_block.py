"""Fused ENTRY block v2 tests (ops/fused_entry_block.py: conv(C_in=1) folded
into the BN→GLU→dropout→pool chain, parity-plane patches).

The deterministic paths AND the dropout train path run in the default CPU
suite via interpret mode (the interpret dropout hash is shared with
ops/fused_block.py, so merged-vs-unfused comparisons see identical masks).
TPU-gated test repeats the parity on the compiled kernels."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.models import layers as L
from dcase2019_task4_tpu.ops import fused_entry_block as FE
from dcase2019_task4_tpu.ops.fused_block import fused_bn_glu_dropout_pool

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU

B, T, F, C = 2, 24, 8, 64
POOL = (2, 4)
EPS = 1e-3
SEED = 11


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F, 1)).astype(np.float32))
    conv = {
        "w": jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.3).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
    }
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    gw = jnp.asarray((rng.standard_normal((C, C)) * 0.1).astype(np.float32))
    gb = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal((B, T // POOL[0], F // POOL[1], C)).astype(np.float32)
    )
    return x, conv, scale, bias, gw, gb, ct


def _batch_stats(y):
    return y.mean(axis=(0, 1, 2)), y.var(axis=(0, 1, 2))


def test_applicable_guard():
    assert FE.entry_block_applicable((2, 24, 8, 1), (2, 4))
    assert FE.entry_block_applicable((96, 864, 64, 1), (2, 4))
    assert not FE.entry_block_applicable((2, 24, 9, 1), (2, 4))  # F odd
    assert not FE.entry_block_applicable((2, 25, 8, 1), (2, 4))  # T % pt
    assert not FE.entry_block_applicable((2, 24, 8, 1), (2, 3))  # pf odd


def test_stats_match_xla_conv(inputs):
    x, conv, *_ = inputs
    s, sq = FE.entry_block_stats_apply(conv, x, interpret=INTERPRET)
    y = L.conv2d_apply(conv, x, 1, 1)
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(jnp.sum(y, axis=(0, 1, 2))), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sq), np.asarray(jnp.sum(y.astype(jnp.float32) ** 2, axis=(0, 1, 2))),
        rtol=1e-5, atol=1e-4,
    )


def test_fwd_matches_reference(inputs):
    x, conv, scale, bias, gw, gb, _ = inputs
    y = L.conv2d_apply(conv, x, 1, 1)
    mean, var = _batch_stats(y)
    out = FE.entry_block_apply(
        conv, scale, bias, mean, var, gw, gb, x, jnp.int32(SEED),
        0.0, POOL, EPS, False, interpret=INTERPRET,
    )
    ref = FE.reference_entry_block(
        x[..., 0], conv["w"], conv["b"], scale, bias, mean, var, gw, gb,
        None, 1.0, POOL, EPS,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_train_matches_unfused_pair_with_dropout(inputs):
    """Merged kernel == conv2d_entry_packed → fused_bn_glu_dropout_pool with
    the SAME seed: identical tile picker + per-tile seeding ⇒ identical
    dropout masks, so outputs and every parameter gradient must agree."""
    x, conv, scale, bias, gw, gb, ct = inputs
    rate = 0.5

    def merged(args):
        cv, sc, bi, gw_, gb_ = args
        y = jax.lax.stop_gradient(L.conv2d_entry_packed(cv, x))
        mean, var = _batch_stats(y)
        o = FE.entry_block_apply(
            cv, sc, bi, mean, var, gw_, gb_, x, jnp.int32(SEED),
            rate, POOL, EPS, True, interpret=INTERPRET,
        )
        return jnp.sum(o * ct)

    def unfused(args):
        cv, sc, bi, gw_, gb_ = args
        y = L.conv2d_entry_packed(cv, x)
        ys = jax.lax.stop_gradient(y)
        mean, var = _batch_stats(ys)
        o = fused_bn_glu_dropout_pool(
            y, sc, bi, mean, var, gw_, gb_, jnp.int32(SEED),
            rate, POOL, EPS, True, INTERPRET,
        )
        return jnp.sum(o * ct)

    args = (conv, scale, bias, gw, gb)
    lm, lu = float(merged(args)), float(unfused(args))
    np.testing.assert_allclose(lm, lu, rtol=1e-5)
    gm = jax.grad(merged)(args)
    gu = jax.grad(unfused)(args)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_grads_match_reference_autodiff(inputs):
    """rate=0 train-mode gradients (incl. BN through-statistics) vs plain
    autodiff of the jnp reference with batch stats differentiated."""
    x, conv, scale, bias, gw, gb, ct = inputs

    def lp(args):
        cv, sc, bi, gw_, gb_ = args
        y = jax.lax.stop_gradient(L.conv2d_apply(cv, x, 1, 1))
        mean, var = _batch_stats(y)
        o = FE.entry_block_apply(
            cv, sc, bi, mean, var, gw_, gb_, x, jnp.int32(SEED),
            0.0, POOL, EPS, True, interpret=INTERPRET,
        )
        return jnp.sum(o * ct)

    def lr(args):
        cv, sc, bi, gw_, gb_ = args
        y = L.conv2d_apply(cv, x, 1, 1)
        mean, var = _batch_stats(y)
        o = FE.reference_entry_block(
            x[..., 0], cv["w"], cv["b"], sc, bi, mean, var, gw_, gb_,
            None, 1.0, POOL, EPS,
        )
        return jnp.sum(o * ct)

    args = (conv, scale, bias, gw, gb)
    gp = jax.grad(lp)(args)
    gr = jax.grad(lr)(args)
    names = ["conv", "scale", "bias", "glu_w", "glu_b"]
    for name, a, b in zip(names, gp, gr):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=1e-4, atol=1e-4, err_msg=name
            )


def test_crnn_wiring_matches_unfused(inputs):
    """cfg.entry_block_pallas=True vs the default path through the full
    fused CRNN: same outputs, BN running state, and gradients."""
    from dcase2019_task4_tpu.config import ModelConfig
    from dcase2019_task4_tpu.models.crnn import CRNN

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 96, 64)).astype(np.float32))
    cfg_m = ModelConfig(fused_block=True, fused_interpret=True, entry_block_pallas=True)
    cfg_u = ModelConfig(fused_block=True, fused_interpret=True)
    m_m, m_u = CRNN(cfg_m), CRNN(cfg_u)
    params, state = m_m.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)

    for train in (False, True):
        sm, wm, st_m = m_m.apply(params, state, x, train=train, rng=key)
        su, wu, st_u = m_u.apply(params, state, x, train=train, rng=key)
        np.testing.assert_allclose(np.asarray(sm), np.asarray(su), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wm), np.asarray(wu), rtol=1e-4, atol=1e-5)
        for a, b in zip(jax.tree.leaves(st_m), jax.tree.leaves(st_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    ct_s = jnp.asarray(rng.standard_normal(sm.shape).astype(np.float32))
    ct_w = jnp.asarray(rng.standard_normal(wm.shape).astype(np.float32))

    def loss(model):
        def f(p):
            s, w, _ = model.apply(p, state, x, train=True, rng=key)
            return jnp.sum(s * ct_s) + jnp.sum(w * ct_w)
        return f

    gm = jax.grad(loss(m_m))(params)
    gu = jax.grad(loss(m_u))(params)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_bf16_matches_unfused_pair_interpret(inputs):
    """act_bf16 path (conv output rounded through bf16 storage, bf16 MXU
    dots) against the unfused bf16 pair at tiny shape on CPU interpret —
    the production dtype's rounding semantics, without needing the TPU."""
    x, conv, scale, bias, gw, gb, ct = inputs
    cd = jnp.bfloat16

    def merged(args):
        cv, sc, bi, gw_, gb_ = args
        s, sq = FE.entry_block_stats_apply(cv, x, compute_dtype=cd, interpret=INTERPRET)
        n = B * T * F
        mean = jax.lax.stop_gradient(s / n)
        var = jax.lax.stop_gradient(sq / n - (s / n) ** 2)
        o = FE.entry_block_apply(
            cv, sc, bi, mean, var, gw_, gb_, x, jnp.int32(SEED),
            0.5, POOL, EPS, True, compute_dtype=cd, interpret=INTERPRET,
        )
        return jnp.sum(o.astype(jnp.float32) * ct)

    def unfused(args):
        cv, sc, bi, gw_, gb_ = args
        y = L.conv2d_entry_packed(cv, x.astype(cd))
        ys = jax.lax.stop_gradient(y)
        s = jnp.sum(ys.astype(jnp.float32), axis=(0, 1, 2))
        sq = jnp.sum(ys.astype(jnp.float32) ** 2, axis=(0, 1, 2))
        n = B * T * F
        mean = s / n
        var = sq / n - mean * mean
        o = fused_bn_glu_dropout_pool(
            y, sc, bi, mean, var, gw_, gb_, jnp.int32(SEED),
            0.5, POOL, EPS, True, INTERPRET,
        )
        return jnp.sum(o.astype(jnp.float32) * ct)

    args = (conv, scale, bias, gw, gb)
    np.testing.assert_allclose(float(merged(args)), float(unfused(args)),
                               rtol=2e-2)
    gm = jax.grad(merged)(args)
    gu = jax.grad(unfused)(args)
    # conv bias: the exact BN backward has zero column sums, so d(conv b)
    # is mathematically ~0. The merged kernel accumulates it in f32 BEFORE
    # any bf16 rounding of dy and lands near 0; the unfused pair sums a
    # bf16-MATERIALIZED dy whose rounding noise breaks the cancellation
    # (~1e-2 leftovers) — the merged path is strictly more accurate here,
    # so the two are asserted against the exact value, not each other.
    np.testing.assert_allclose(np.asarray(gm[0]["b"]), 0.0, atol=1e-3)
    assert float(np.max(np.abs(np.asarray(gu[0]["b"])))) < 0.3
    gm = (gm[0]["w"],) + gm[1:]
    gu = (gu[0]["w"],) + gu[1:]
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)


@pytest.mark.skipif(
    not os.environ.get("DCASE_TPU_TESTS"), reason="TPU-gated (set DCASE_TPU_TESTS=1)"
)
def test_compiled_production_shape_tpu():
    rng = np.random.default_rng(1)
    Bp, Tp, Fp = 4, 864, 64
    x = jnp.asarray(rng.standard_normal((Bp, Tp, Fp, 1)).astype(np.float32))
    conv = {
        "w": jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.2).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
    }
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    gw = jnp.asarray((rng.standard_normal((C, C)) * 0.1).astype(np.float32))
    gb = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal((Bp, Tp // 2, Fp // 4, C)).astype(np.float32)
    )
    rate = 0.5

    def merged(args):
        cv, sc, bi, gw_, gb_ = args
        s, sq = FE.entry_block_stats_apply(cv, x)
        n = Bp * Tp * Fp
        mean = jax.lax.stop_gradient(s / n)
        var = jax.lax.stop_gradient(sq / n - (s / n) ** 2)
        o = FE.entry_block_apply(
            cv, sc, bi, mean, var, gw_, gb_, x, jnp.int32(SEED),
            rate, POOL, EPS, True,
        )
        return jnp.sum(o.astype(jnp.float32) * ct)

    def unfused(args):
        cv, sc, bi, gw_, gb_ = args
        y = L.conv2d_entry_packed(cv, x)
        ys = jax.lax.stop_gradient(y)
        mean = ys.mean(axis=(0, 1, 2))
        var = ys.var(axis=(0, 1, 2))
        o = fused_bn_glu_dropout_pool(
            y, sc, bi, mean, var, gw_, gb_, jnp.int32(SEED),
            rate, POOL, EPS, True,
        )
        return jnp.sum(o.astype(jnp.float32) * ct)

    args = (conv, scale, bias, gw, gb)
    np.testing.assert_allclose(float(merged(args)), float(unfused(args)), rtol=1e-4)
    gm = jax.grad(merged)(args)
    gu = jax.grad(unfused)(args)
    for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
