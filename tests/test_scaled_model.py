"""Scaled-config (BASELINE.json config 5: 128 mels / 128-ch convs) numeric
parity through the fused Pallas kernel stack. C=128 exercises the k=1
(no lane packing) geometry of every fused kernel — the packed k>1 paths are
covered by the default-config tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN

SCALED_TINY = dict(
    nclass=10, nb_filters=(128, 128, 128), n_rnn_cell=16,
    pooling=((2, 4), (2, 4), (2, 8)),
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 48, 128)).astype(np.float32))
    cfg_f = ModelConfig(fused_block=True, fused_interpret=True, **SCALED_TINY)
    m = CRNN(cfg_f)
    params, state = m.init(jax.random.PRNGKey(0))
    return x, params, state


def test_scaled_fused_matches_xla_eval(setup):
    x, params, state = setup
    m_f = CRNN(ModelConfig(fused_block=True, fused_interpret=True, **SCALED_TINY))
    m_x = CRNN(ModelConfig(fused_block=False, **SCALED_TINY))
    sf, wf, _ = m_f.apply(params, state, x, train=False)
    sx, wx, _ = m_x.apply(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wf), np.asarray(wx), rtol=1e-4, atol=1e-5)


def test_scaled_fused_matches_xla_train_grads(setup):
    x, params, state = setup
    key = jax.random.PRNGKey(3)
    m_f = CRNN(ModelConfig(fused_block=True, fused_interpret=True, dropout=0.0,
                           **SCALED_TINY))
    m_x = CRNN(ModelConfig(fused_block=False, dropout=0.0, **SCALED_TINY))
    sh = m_f.apply(params, state, x, train=True, rng=key)[0].shape
    rng = np.random.default_rng(5)
    ct = jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    def loss(model):
        def f(p):
            s, _, _ = model.apply(p, state, x, train=True, rng=key)
            return jnp.mean(jnp.sum(s * ct, axis=(1, 2)))
        return f

    gf = jax.grad(loss(m_f))(params)
    gx = jax.grad(loss(m_x))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
