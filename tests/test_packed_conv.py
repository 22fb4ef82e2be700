"""Packed-layout Pallas conv (ops/packed_conv.py) vs lax.conv reference.

CPU tests run in interpret mode, including a forced-small tile so the
head/tail halo paths (and their global-boundary zeroing) are exercised.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcase2019_task4_tpu.models import layers as L
from dcase2019_task4_tpu.ops import packed_conv as PC


def _case(F, C, T, B=2, seed=0, tt=None):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32))
    params = L.conv2d_init(jax.random.PRNGKey(seed), C, C, 3)
    orig = PC._pick_tile
    if tt is not None:
        PC._pick_tile = lambda T, max_tile=256: tt
    try:
        ref = L.conv2d_apply(params, x)
        out = PC.conv2d_packed(params, x, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
        ct = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
        g1 = jax.grad(lambda p, x: jnp.sum(L.conv2d_apply(p, x) * ct), argnums=(0, 1))(params, x)
        g2 = jax.grad(
            lambda p, x: jnp.sum(PC.conv2d_packed(p, x, interpret=True) * ct), argnums=(0, 1)
        )(params, x)
        np.testing.assert_allclose(np.asarray(g2[0]["w"]), np.asarray(g1[0]["w"]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2[0]["b"]), np.asarray(g1[0]["b"]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g2[1]), np.asarray(g1[1]), rtol=1e-4, atol=1e-4)
    finally:
        PC._pick_tile = orig


def test_block2_shape_multi_tile():
    # k=2 packing, 3 tiles of 8 → interior halos + both global boundaries
    _case(F=16, C=64, T=24, tt=8)


def test_block3_shape():
    _case(F=4, C=64, T=16, tt=8)


def test_single_tile():
    _case(F=16, C=64, T=8)


def test_unpackable_falls_to_k1():
    # odd F → pack_factor 1; L = C = 64-lane path
    assert PC.pack_factor(5, 64) == 1
    _case(F=5, C=64, T=8, seed=3)


def test_part_weights_band_structure():
    w = jnp.asarray(np.random.default_rng(1).standard_normal((3, 3, 4, 4)).astype(np.float32))
    parts = PC.part_weights(w, k=2)
    # g=-1: only the (hi=1, ho=0) block is nonzero; g=+1: only (hi=0, ho=1)
    C = 4
    p_lo = np.asarray(parts[:, 0])
    assert np.all(p_lo[:, :C, :] == 0) and np.all(p_lo[:, C:, C:] == 0)
    p_hi = np.asarray(parts[:, 2])
    assert np.all(p_hi[:, C:, :] == 0) and np.all(p_hi[:, :C, :C] == 0)
    np.testing.assert_array_equal(np.asarray(parts[:, 0, C:, :C]), np.asarray(w[:, 0]))
    np.testing.assert_array_equal(np.asarray(parts[:, 2, :C, C:]), np.asarray(w[:, 2]))


@pytest.mark.skipif(
    not os.environ.get("DCASE_TPU_TESTS"), reason="TPU-gated (set DCASE_TPU_TESTS=1)"
)
def test_tpu_block2_parity():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 432, 16, 64)).astype(np.float32))
    params = L.conv2d_init(jax.random.PRNGKey(0), 64, 64, 3)
    ref = np.asarray(L.conv2d_apply(params, x))
    out = np.asarray(PC.conv2d_packed(params, x))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2 * np.abs(ref).max())
