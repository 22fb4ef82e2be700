"""Data-parallel sharding tests on the 8-device virtual CPU mesh.

New capability vs the reference (strictly single-device, SURVEY.md §2.3):
the fused train step under GSPMD with batch sharded over the mesh must (a)
run, (b) match the single-device step numerically (psum'd grads ==
global-batch grads)."""

import numpy as np
import optax
import pytest

import jax
import jax.flatten_util  # noqa: F401
import jax.numpy as jnp

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.parallel.mesh import (
    make_mesh,
    replicate_state,
    shard_batch,
    tile_stream_layout,
)
from dcase2019_task4_tpu.train.steps import init_train_state, make_train_step

TINY = ModelConfig(nclass=3, nb_filters=(8, 8, 8), n_rnn_cell=8, dropout=0.0)


def _batch(B, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((B, 64, 64)).astype(np.float32)
    target = np.zeros((B, 8, 3), np.float32)
    q = B // 4
    target[:q, :, 0] = 1.0
    target[q : 3 * q] = -1.0
    target[3 * q :, 2:5, 1] = 1.0
    return {"features": feats, "target": target}


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh"
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_tile_stream_layout():
    sizes, slices = tile_stream_layout([2, 4, 2], 8)
    assert sizes == [16, 32, 16]
    assert slices == [slice(0, 16), slice(16, 48), slice(48, 64)]


@pytest.mark.parametrize("mean_teacher", [False, True])
def test_sharded_step_matches_single_device(mean_teacher):
    B = 32  # 4 per device
    weak, strong = slice(0, 8), slice(24, 32)
    model = CRNN(TINY)
    opt = optax.adam(1e-3)
    step = make_train_step(model, opt, weak, strong, mean_teacher=mean_teacher,
                           rampup_length=100, donate=False)
    state0 = init_train_state(model, opt, jax.random.PRNGKey(0), with_ema=mean_teacher)
    batch = _batch(B)
    rng = jax.random.PRNGKey(1)

    # single device
    s1, m1, _ = step(state0, batch, rng, step.zero_metrics())

    # sharded over the mesh
    mesh = make_mesh()
    state_r = replicate_state(state0, mesh)
    batch_r = shard_batch(batch, mesh)
    s2, m2, _ = step(state_r, batch_r, rng, step.zero_metrics())

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p1 = np.asarray(jax.flatten_util.ravel_pytree(s1.params)[0])
    p2 = np.asarray(jax.flatten_util.ravel_pytree(s2.params)[0])
    # f32 reduction-order differences (per-shard partial means + psum vs one
    # flat mean) pass through Adam's rsqrt; ≤5e-4 on a 1e-3-lr step is noise
    np.testing.assert_allclose(p1, p2, rtol=1e-3, atol=5e-4)


def test_dryrun_multichip_entry():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_host_shard_pairs():
    from dcase2019_task4_tpu.parallel.multihost import host_shard_pairs

    pairs = np.stack([np.zeros(32, np.int32), np.arange(32, dtype=np.int32)], axis=1)
    shards = [host_shard_pairs(pairs, p, 4) for p in range(4)]
    assert all(s.shape == (8, 2) for s in shards)
    np.testing.assert_array_equal(np.concatenate(shards), pairs)
    with pytest.raises(AssertionError):
        host_shard_pairs(pairs, 0, 5)


def test_make_global_batch_on_virtual_mesh():
    from dcase2019_task4_tpu.parallel.multihost import make_global_batch

    mesh = make_mesh()
    local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1), "n": 3}
    out = make_global_batch(local, mesh)
    assert out["n"] == 3
    assert out["x"].shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])


def test_fused_grads_sharded_match_single_device():
    """EXACT parameter gradients through the fused Pallas kernel stack under
    shard_map vs single device (not post-Adam params — Adam's first step
    normalizes magnitudes and hides small gradient errors). Catches the BN
    through-statistics backward using per-shard Σdxn/N instead of the psum'd
    global sums. dropout=0: the per-tile mask seeds are shard-local by
    design, so the stochastic paths are only distribution-equivalent."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    B = 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, 96, 64)).astype(np.float32))
    key = jax.random.PRNGKey(9)

    for entry_engine in ("default", "planes", "crows"):
        cfg = ModelConfig(
            fused_block=True, fused_interpret=True, dropout=0.0,
            entry_block_pallas=entry_engine == "planes",
            entry_block_crows=entry_engine == "crows",
        )
        model = CRNN(cfg)
        params, state = model.init(jax.random.PRNGKey(0))
        sh = model.apply(params, state, x, train=True, rng=key)[0].shape
        cts = jnp.asarray(rng.standard_normal(sh).astype(np.float32))

        def loss(p, xb, cb, axis=None, axis_size=1):
            s, _, _ = model.apply(p, state, xb, train=True, rng=key,
                                  batch_axis=axis, axis_size=axis_size)
            return jnp.mean(jnp.sum(s * cb, axis=(1, 2)))

        g_single = jax.grad(loss)(params, x, cts)

        def shard_fn(p, xb, cb):
            g = jax.grad(lambda pp: loss(pp, xb, cb, "data", 8))(p)
            return jax.lax.pmean(g, "data")

        g_sharded = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("data"), P("data")), out_specs=P(),
            check_vma=False,
        )(params, x, cts)

        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"entry_engine={entry_engine}",
            )


def test_sharded_eval_matches_single_device():
    """make_predict_step/make_eval_features with a mesh: batch sharded over
    8 devices through the fused CRNN (interpret kernels) must equal the
    unsharded single-device inference bitwise-closely — eval-mode BN uses
    running stats, so shards are independent by construction."""
    from dcase2019_task4_tpu.ops.mel import MelFrontend
    from dcase2019_task4_tpu.train.steps import make_eval_features, make_predict_step

    mesh = make_mesh()
    cfg = ModelConfig(fused_block=True, fused_interpret=True)
    model = CRNN(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    frontend = MelFrontend(
        sample_rate=16000, n_window=512, hop_length=256, n_mels=64,
        f_min=0.0, f_max=8000.0, max_frames=96,
    )
    rng = np.random.default_rng(4)
    B = 16
    audio = (rng.standard_normal((B, 16000 + 512)) * 2000).astype(np.int16)
    frames = np.full((B,), 96, np.int32)
    mean = rng.standard_normal(64).astype(np.float32)
    std = rng.uniform(0.5, 2.0, 64).astype(np.float32)

    f1 = make_eval_features(frontend, mean, std)
    f8 = make_eval_features(frontend, mean, std, mesh=mesh)
    p1 = make_predict_step(model)
    p8 = make_predict_step(model, mesh=mesh)

    x1 = f1(audio, frames)
    x8 = f8(audio, frames)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x8), rtol=1e-5, atol=1e-5)
    s1, w1 = p1(params, state, x1)
    s8, w8 = p8(params, state, x8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s8), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w8), rtol=1e-5, atol=1e-6)


def test_fused_grads_sharded_match_single_device_k1_geometry():
    """Same exact-gradient pin at the scaled config's k=1 (no lane packing)
    kernel geometry: 128-ch convs, 32-mel input (k = 128//128 = 1), so the
    BN through-statistics psum path runs with unfolded [128]-lane sums."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    B = 16
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, 32, 32)).astype(np.float32))
    key = jax.random.PRNGKey(2)
    cfg = ModelConfig(
        fused_block=True, fused_interpret=True, dropout=0.0,
        nb_filters=(128, 128, 128), n_rnn_cell=8,
        pooling=((2, 4), (2, 4), (2, 2)),
    )
    model = CRNN(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    sh = model.apply(params, state, x, train=True, rng=key)[0].shape
    cts = jnp.asarray(rng.standard_normal(sh).astype(np.float32))

    def loss(p, xb, cb, axis=None, axis_size=1):
        s, _, _ = model.apply(p, state, xb, train=True, rng=key,
                              batch_axis=axis, axis_size=axis_size)
        return jnp.mean(jnp.sum(s * cb, axis=(1, 2)))

    g_single = jax.grad(loss)(params, x, cts)

    def shard_fn(p, xb, cb):
        g = jax.grad(lambda pp: loss(pp, xb, cb, "data", 8))(p)
        return jax.lax.pmean(g, "data")

    g_sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data")), out_specs=P(),
        check_vma=False,
    )(params, x, cts)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
