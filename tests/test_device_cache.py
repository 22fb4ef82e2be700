"""Device-resident dataset mode (data.pipeline.DeviceResidentData +
train.steps.make_device_epoch): the whole training set pinned in device
memory, each epoch one lax.scan dispatch.

The contract is that the mode is a pure TRANSPORT optimization: same
sampler, same batches (bit-identical audio/frames/targets — asserted
below), bit-identical per-step RNG split chain. The compiled programs
differ (one scan body vs one standalone step), so reduction order differs
at the ~1e-7 fp level; Adam's normalized update (m̂/(√v̂+ε), sign-like for
small gradients) amplifies that to ~1e-5 per step on params. Trajectory
equality is therefore asserted to that noise floor, while the INPUT parity
(the thing the mode actually changes) is asserted exactly.
"""

import numpy as np
import pytest

import jax

from dcase2019_task4_tpu.config import Config, DSPConfig, ModelConfig, TrainConfig
from dcase2019_task4_tpu.train.experiment import Experiment

TINY_CFG = Config(
    dsp=DSPConfig(max_len_seconds=1.0),
    model=ModelConfig(nclass=10, nb_filters=(16, 16, 16), n_rnn_cell=16, dropout=0.3),
    train=TrainConfig(batch_size=8, n_epoch=2, num_prefetch=1),
)


def _build(device_cache: bool) -> Experiment:
    exp = Experiment(
        TINY_CFG, mean_teacher=True, subpart_data=12, synthetic_audio=True,
        synthetic_variability=1.0, seed=0, device_cache=device_cache,
    )
    exp.build()
    return exp


@pytest.fixture(scope="module")
def twin_runs():
    streamed = _build(device_cache=False)
    resident = _build(device_cache=True)
    history = []
    for epoch in range(2):
        m_s = streamed.train_epoch(epoch)
        m_r = resident.train_epoch(epoch)
        history.append((m_s, m_r))
    return streamed, resident, history


def test_epoch_metrics_match(twin_runs):
    _, _, history = twin_runs
    for epoch, (m_s, m_r) in enumerate(history):
        for k, meter in m_s.meters.items():
            assert m_r.meters[k].avg == pytest.approx(meter.avg, abs=1e-5), (
                f"epoch {epoch} metric {k}: streamed {meter.avg} "
                f"vs device-resident {m_r.meters[k].avg}"
            )


def test_batch_content_identical(twin_runs):
    """The actual transport contract: the gathered device-resident batch is
    BIT-IDENTICAL to the streamed batch for the same sampler epoch."""
    streamed, resident, _ = twin_runs
    b0 = next(streamed.pipeline.iter_epoch(0, prefetch=0))
    dd = resident._device_data
    idx = dd.epoch_indices(resident.pipeline.sampler, 0)
    assert np.array_equal(np.asarray(dd.data["audio"])[idx[0]], b0["audio"])
    assert np.array_equal(np.asarray(dd.data["frames"])[idx[0]], b0["frames"])
    assert np.array_equal(np.asarray(dd.data["target"])[idx[0]], b0["target"])


def test_trajectories_match(twin_runs):
    streamed, resident, _ = twin_runs
    # same 2-epoch trajectory up to Adam-amplified fp-fusion noise
    # (~1e-5/step; see module docstring)
    assert int(streamed.state.step) == int(resident.state.step)
    for name, a, b in (
        ("params", streamed.state.params, resident.state.params),
        ("ema_params", streamed.state.ema_params, resident.state.ema_params),
        ("bn_state", streamed.state.bn_state, resident.state.bn_state),
    ):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=5e-4, rtol=0.02,
                err_msg=f"{name} leaf diverged between streamed and "
                        "device-resident paths beyond fp-noise scale",
            )


def test_epoch_indices_cover_sampler(twin_runs):
    _, resident, _ = twin_runs
    dd = resident._device_data
    sampler = resident.pipeline.sampler
    idx = dd.epoch_indices(sampler, epoch=0)
    assert idx.shape == (len(sampler), sampler.batch_size)
    n_total = sum(len(s) for s in resident.pipeline.streams)
    assert idx.min() >= 0 and idx.max() < n_total
    # the per-stream sub-batch layout maps into the right offset ranges
    pairs = sampler.epoch_batches(0)
    for col in range(sampler.batch_size):
        s = pairs[0, col, 0]
        lo = dd.offsets[s]
        hi = lo + len(resident.pipeline.streams[s])
        assert lo <= idx[0, col] < hi


def test_size_guard():
    from dcase2019_task4_tpu.data.pipeline import DeviceResidentData

    exp = _build(device_cache=False)
    with pytest.raises(ValueError, match="GiB"):
        DeviceResidentData(exp.pipeline, max_bytes=1024)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_sharded_device_cache_matches_single_device():
    """--device_cache composed with --data_parallel (VERDICT r4 item 3):
    a 2-device mesh running the sharded epoch scan (replicated row store,
    shard-major idx, BN psums + grad pmeans inside the scan body) must
    follow the SAME global-batch trajectory as a single-device device-cache
    run with the equivalent global batch layout ([2,4,2]×2 == [4,8,4]):
    the per-stream row sets per batch are identical, only shard-major row
    order differs, and every loss/statistic is a per-stream (or all-batch)
    mean that pmean reassembles exactly (up to fp reduction order).
    Stochastic elements (dropout, teacher noise) are OFF: the sharded step
    folds the RNG per shard by design, so masks/noise are only
    distribution-equivalent, not bit-equal, between the two paths."""
    import dataclasses

    from dcase2019_task4_tpu.parallel.mesh import make_mesh

    det_model = dataclasses.replace(TINY_CFG.model, dropout=0.0)
    det_train = dataclasses.replace(TINY_CFG.train, noise_std=0.0)
    cfg_sh = dataclasses.replace(TINY_CFG, model=det_model, train=det_train)
    cfg_g = dataclasses.replace(
        cfg_sh, train=dataclasses.replace(det_train, batch_size=16))
    mesh = make_mesh(jax.devices()[:2])
    sharded = Experiment(
        cfg_sh, mean_teacher=True, subpart_data=24, synthetic_audio=True,
        synthetic_variability=1.0, seed=0, device_cache=True, mesh=mesh,
    ).build()
    single = Experiment(
        cfg_g, mean_teacher=True, subpart_data=24, synthetic_audio=True,
        synthetic_variability=1.0, seed=0, device_cache=True,
    ).build()
    assert sharded.pipeline.sampler.batch_size == single.pipeline.sampler.batch_size == 16

    # identical global batches up to the shard-major reorder: the sharded
    # idx is exactly interleave_for_sharding of the single-device idx
    from dcase2019_task4_tpu.parallel.mesh import interleave_for_sharding

    pairs = single.pipeline.sampler.epoch_batches(0)
    idx_sh = sharded._device_data.epoch_indices(sharded.pipeline.sampler, 0)
    dd = single._device_data
    want = np.stack([
        (dd.offsets[p[:, 0]] + p[:, 1]) for p in
        (interleave_for_sharding(p, [2, 4, 2], 2) for p in pairs)
    ])
    np.testing.assert_array_equal(idx_sh, want)

    for epoch in range(2):
        m_sh = sharded.train_epoch(epoch)
        m_si = single.train_epoch(epoch)
        for k, meter in m_si.meters.items():
            assert m_sh.meters[k].avg == pytest.approx(meter.avg, abs=2e-4), (
                f"epoch {epoch} metric {k}")

    assert int(sharded.state.step) == int(single.state.step)
    # Tolerance note: psum'd BN statistics differ from the flat single-
    # device reduction at the ~1e-7 fp level; on leaves whose gradient
    # hovers near zero (fresh biases), Adam's m̂/√v̂ is sign-like and a
    # sign flip costs a full ±lr (1e-3) update — so after 6 steps, ≤ a few
    # 1e-3 of drift on those leaves is reduction noise, not a bug. The
    # EXACT assertions above (idx layout, epoch metric sums to 2e-4) and
    # test_sharding.py's exact-gradient pins carry the correctness claim.
    for name in ("params", "ema_params", "bn_state"):
        la = jax.tree_util.tree_leaves(getattr(sharded.state, name))
        lb = jax.tree_util.tree_leaves(getattr(single.state, name))
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2.5e-3, rtol=2e-2,
                err_msg=f"{name} diverged between sharded and single-device "
                        "device-cache paths beyond fp-noise scale",
            )


def test_validate_works_after_resident_epoch(twin_runs):
    _, resident, _ = twin_runs
    metrics = resident.validate(1)
    assert 0.0 <= metrics["event_macro_f1"] <= 1.0
    assert 0.0 <= metrics["weak_macro_f1"] <= 1.0
