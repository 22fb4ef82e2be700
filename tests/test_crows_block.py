"""[C, rows] merged entry block (ops/crows_block.py) vs the jnp reference
twin — same test strategy as test_fused_entry_block.py: interpret-mode
forward/VJP parity for the deterministic paths in the default CPU suite,
dropout via determinism + finite differences (the in-kernel mask layout is
kernel-specific); the compiled Mosaic paths re-run TPU-gated."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.ops import crows_block as CR
from dcase2019_task4_tpu.ops.fused_entry_block import reference_entry_block

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU

B, T, F, C = 4, 16, 64, 64
POOL = (2, 4)
EPS = 1e-3
SEED = 17


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F, 1)).astype(np.float32))
    conv = {
        "w": jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.2).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
    }
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    gw = jnp.asarray((rng.standard_normal((C, C)) * 0.1).astype(np.float32))
    gb = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal(
        (B, T // POOL[0], F // POOL[1], C)).astype(np.float32))
    return x, conv, scale, bias, gw, gb, ct


def _stats(conv, x):
    s1, s2 = CR.crows_stats_apply(conv, x, compute_dtype=jnp.float32,
                                  interpret=INTERPRET)
    n = B * T * F
    mean = s1 / n
    var = s2 / n - (s1 / n) ** 2
    return jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var)


def test_applicable(inputs):
    x, *_ = inputs
    assert CR.crows_applicable(x.shape, POOL)
    assert not CR.crows_applicable((3, T, F, 1), POOL)     # odd batch
    assert not CR.crows_applicable((B, T, 32, 1), POOL)    # F != 64
    assert not CR.crows_applicable((B, T, F, 1), (4, 2))   # pt != 2


def test_pick_l_pooled_tile_is_lane_legal():
    """Multi-tile grids must keep the POOLED output block 128-lane-divisible
    (Mosaic rejects (1, 2C, Lp) blocks otherwise — hit at the flagship
    T·F = 864·64, where the old pick chose L=6912 → Lp=864)."""
    assert CR._pick_l(864 * 64, 8) == 6144               # flagship: Lp=768
    for TF in (1024, 2048, 864 * 64, 432 * 64, 3456 * 64, 500 * 64):
        for ptpf in (8, 16):
            L = CR._pick_l(TF, ptpf)
            if L == 0:
                continue
            assert TF % L == 0 and L % 128 == 0
            nt = TF // L
            assert nt == 1 or (L // ptpf) % 128 == 0
    # the single-tile escape: whole array in one block is always legal
    assert CR._pick_l(1024, 8) == 1024


def test_stats_match_conv(inputs):
    x, conv, *_ = inputs
    mean, var = _stats(conv, x)
    y = jax.lax.conv_general_dilated(
        x, conv["w"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["b"]
    np.testing.assert_allclose(np.asarray(mean), np.asarray(y.mean((0, 1, 2))),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(y.var((0, 1, 2))),
                               rtol=1e-4, atol=1e-5)


def test_forward_matches_reference_no_dropout(inputs):
    x, conv, scale, bias, gw, gb, _ = inputs
    mean, var = _stats(conv, x)
    out = CR.crows_apply(conv, scale, bias, mean, var, gw, gb, x,
                         jnp.int32(SEED), 0.0, POOL, EPS, True,
                         compute_dtype=jnp.float32, interpret=INTERPRET)
    ref = reference_entry_block(x[..., 0], conv["w"], conv["b"], scale, bias,
                                mean, var, gw, gb, None, 1.0, POOL, EPS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_vjp_through_stats_matches_autodiff(inputs):
    """mean/var NOT stop_gradient'ed in the reference is the full BN
    training backward; the kernel's two-pass S1/S2 correction must equal
    it (same contract as the other fused blocks: caller stops stats, the
    kernel reconstructs the through-stats terms)."""
    x, conv, scale, bias, gw, gb, ct = inputs

    def loss_crows(args):
        cv, sc, bi, ww, bb = args
        s1, s2 = CR.crows_stats_apply(cv, x, compute_dtype=jnp.float32,
                                      interpret=INTERPRET)
        n = B * T * F
        mean = jax.lax.stop_gradient(s1 / n)
        var = jax.lax.stop_gradient(s2 / n - (s1 / n) ** 2)
        o = CR.crows_apply(cv, sc, bi, mean, var, ww, bb, x, jnp.int32(SEED),
                           0.0, POOL, EPS, True, compute_dtype=jnp.float32,
                           interpret=INTERPRET)
        return jnp.sum(o * ct)

    def loss_ref(args):
        cv, sc, bi, ww, bb = args
        y = jax.lax.conv_general_dilated(
            x, cv["w"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + cv["b"]
        mean, var = y.mean((0, 1, 2)), y.var((0, 1, 2))
        from dcase2019_task4_tpu.ops.fused_block import reference_block

        o = reference_block(y, sc, bi, mean, var, ww, bb, None, 1.0, POOL, EPS)
        return jnp.sum(o * ct)

    args = (conv, scale, bias, gw, gb)
    gc = jax.grad(loss_crows)(args)
    gr = jax.grad(loss_ref)(args)
    flat_c, _ = jax.tree_util.tree_flatten(gc)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    for a, r in zip(flat_c, flat_r):
        # atol: d(conv.b) is mathematically ~0 under through-stats BN
        # (shifting the conv bias cancels in the normalization), so its
        # comparison is noise-vs-noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_dropout_deterministic_and_fd_consistent(inputs):
    x, conv, scale, bias, gw, gb, ct = inputs
    rate = 0.5

    def loss(args, seed=SEED):
        cv, sc, bi, ww, bb = args
        # stats recomputed from the (perturbed) conv params: the kernel's
        # VJP implements the full through-statistics BN backward, so finite
        # differences must see the batch statistics move too
        mean, var = _stats(cv, x)
        o = CR.crows_apply(cv, sc, bi, mean, var, ww, bb, x, jnp.int32(seed),
                           rate, POOL, EPS, True, compute_dtype=jnp.float32,
                           interpret=True)
        return jnp.sum(o * ct)

    args = (conv, scale, bias, gw, gb)
    assert float(loss(args)) == float(loss(args))          # deterministic
    assert float(loss(args)) != float(loss(args, SEED + 3))  # seed-sensitive
    gp = jax.grad(loss)(args)
    eps = 1e-3
    rng = np.random.default_rng(3)
    flat, tree = jax.tree_util.tree_flatten(args)
    gflat, _ = jax.tree_util.tree_flatten(gp)
    for _ in range(3):
        dirs = [jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
                for a in flat]
        pp = jax.tree_util.tree_unflatten(
            tree, [a + eps * d for a, d in zip(flat, dirs)])
        pm = jax.tree_util.tree_unflatten(
            tree, [a - eps * d for a, d in zip(flat, dirs)])
        fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        an = sum(float(jnp.vdot(g, d)) for g, d in zip(gflat, dirs))
        np.testing.assert_allclose(fd, an, rtol=2e-2, atol=1e-3)


def test_crnn_crows_matches_unfused_eval_interpret():
    """Full model with the crows entry block (via cfg dispatch) equals the
    plain XLA path in eval mode."""
    from dcase2019_task4_tpu.config import ModelConfig
    from dcase2019_task4_tpu.models.crnn import CRNN

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 96, 64)).astype(np.float32)
    m_c = CRNN(ModelConfig(fused_block=True, fused_interpret=True,
                           entry_block_crows=True))
    m_u = CRNN(ModelConfig(fused_block=False))
    params, state = m_c.init(jax.random.PRNGKey(0))
    sf, wf, _ = m_c.apply(params, state, jnp.asarray(x), train=False)
    su, wu, _ = m_u.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(su), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wf), np.asarray(wu), rtol=1e-4, atol=1e-5)


def test_crnn_crows_train_grads_match_unfused():
    """Train-mode (rate 0 via dropout=0 config) forward + gradients through
    the whole CRNN: crows dispatch vs plain XLA path."""
    from dcase2019_task4_tpu.config import ModelConfig
    from dcase2019_task4_tpu.models.crnn import CRNN

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 96, 64)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (2, 12, 10)).astype(np.float32))
    m_c = CRNN(ModelConfig(fused_block=True, fused_interpret=True,
                           entry_block_crows=True, dropout=0.0))
    m_u = CRNN(ModelConfig(fused_block=False, dropout=0.0))
    params, state = m_c.init(jax.random.PRNGKey(0))

    def loss(m):
        def f(p):
            s, w, _ = m.apply(p, state, x, train=True, rng=jax.random.PRNGKey(1))
            return jnp.mean((s - tgt) ** 2) + jnp.mean(w)
        return f

    lc, gc = jax.value_and_grad(loss(m_c))(params)
    lu, gu = jax.value_and_grad(loss(m_u))(params)
    np.testing.assert_allclose(float(lc), float(lu), rtol=1e-5)
    for a, r in zip(jax.tree_util.tree_leaves(gc), jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_bf16_close_to_f32(inputs):
    x, conv, scale, bias, gw, gb, _ = inputs
    mean, var = _stats(conv, x)
    f32 = CR.crows_apply(conv, scale, bias, mean, var, gw, gb, x,
                         jnp.int32(SEED), 0.0, POOL, EPS, True,
                         compute_dtype=jnp.float32, interpret=INTERPRET)
    bf = CR.crows_apply(conv, scale, bias, mean, var, gw, gb, x,
                        jnp.int32(SEED), 0.0, POOL, EPS, True,
                        compute_dtype=jnp.bfloat16, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(bf, np.float32), np.asarray(f32),
                               rtol=3e-2, atol=3e-2)
