"""Serving-export round trip (eval/export.py): the jax.export/StableHLO
artifact must reproduce the in-process serving function exactly and load
without any framework code beyond jax.

The reference has no export surface (TestModel.py re-instantiates torch
modules from a pickle); this is the TPU-native deployment story, so the
contract under test is ours: audio+frames in → (strong, weak) probs out,
weights/scaler baked in, self-describing header.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.config import Config, DSPConfig, ModelConfig, TrainConfig
from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator, _EvalState
from dcase2019_task4_tpu.eval.export import (
    build_serve_fn,
    export_serving,
    load_serving,
)
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.ops.mel import host_reflect_pad
from dcase2019_task4_tpu.utils.scaler import Scaler


def _tiny_evaluator():
    cfg = Config(
        dsp=DSPConfig(max_len_seconds=1.0),
        model=ModelConfig(nclass=4, nb_filters=(8, 8, 8), n_rnn_cell=8),
        train=TrainConfig(batch_size=2),
    )
    model = CRNN(cfg.model)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    scaler = Scaler().load_state_dict({
        "mean_": (np.linspace(-40.0, -10.0, cfg.dsp.n_mels)).tolist(),
        "mean_of_square_": (np.linspace(-40.0, -10.0, cfg.dsp.n_mels) ** 2 + 9.0).tolist(),
    })
    codec = LabelCodec(["a", "b", "c", "d"], n_frames=cfg.dsp.max_frames // 8)
    meta = {"epoch": 1, "pooling_time_ratio": 8, "mean_teacher": False}
    return CheckpointEvaluator(
        _prebuilt=(cfg, model, _EvalState(params, bn_state), scaler, codec, meta)
    )


def _batch(ev, batch, seed=0):
    d = ev.cfg.dsp
    rng = np.random.default_rng(seed)
    clips = [rng.standard_normal(int(d.sample_rate * s)).astype(np.float32) * 0.1
             for s in np.linspace(0.4, d.max_len_seconds, batch)]
    padded, frames = host_reflect_pad(
        clips, d.max_samples, d.n_window, d.hop_length, d.max_frames)
    audio_i16 = np.clip(np.round(padded * 32768.0), -32768, 32767).astype(np.int16)
    return audio_i16, frames


def test_export_roundtrip_matches_direct_serve(tmp_path):
    ev = _tiny_evaluator()
    path = str(tmp_path / "model.dc19serve")
    header = export_serving(ev, path, batch_size=2)
    assert header["labels"] == ["a", "b", "c", "d"]
    assert header["batch_size"] == 2
    assert header["audio_dtype"] == "int16"

    audio, frames = _batch(ev, 2)
    mean, std = ev.scaler.mean_std_f32
    serve = jax.jit(build_serve_fn(
        ev.model, ev.state.params, ev.state.bn_state, ev.frontend, mean, std))
    want_strong, want_weak = serve(jnp.asarray(audio), jnp.asarray(frames))

    served = load_serving(path)
    got_strong, got_weak = served(audio, frames)
    assert served.header["pooling_time_ratio"] == 8
    assert got_strong.shape == (2, ev.codec.n_frames, 4)
    assert got_weak.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(got_strong), np.asarray(want_strong),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_weak), np.asarray(want_weak),
                               atol=1e-6)
    # probabilities, not logits
    assert 0.0 <= float(np.min(got_weak)) and float(np.max(got_weak)) <= 1.0


def test_export_artifact_is_self_contained_bytes(tmp_path):
    """The artifact must not be a pickle and must reject corrupted magic."""
    ev = _tiny_evaluator()
    path = str(tmp_path / "model.dc19serve")
    export_serving(ev, path, batch_size=2)
    with open(path, "rb") as f:
        head = f.read(16)
    assert head.startswith(b"DC19SERVE1\n")
    bad = str(tmp_path / "bad")
    with open(bad, "wb") as f:
        f.write(b"NOTANARTIFACT")
    with pytest.raises(ValueError, match="serving artifact"):
        load_serving(bad)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="TPU-gated: Mosaic custom-call serialization on "
                           "the flagship (Pallas-kernel) inference path")
def test_export_tpu_pallas_path_roundtrip(tmp_path):
    """On the real chip the flagship geometry routes through the fused
    Pallas kernels; jax.export must serialize their Mosaic custom calls
    (jax guarantees Mosaic stability) and the artifact must reproduce the
    in-process outputs."""
    cfg = Config(train=TrainConfig(batch_size=8))
    model = CRNN(cfg.model)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    scaler = Scaler().load_state_dict({
        "mean_": (np.full(cfg.dsp.n_mels, -30.0)).tolist(),
        "mean_of_square_": (np.full(cfg.dsp.n_mels, 909.0)).tolist(),
    })
    codec = LabelCodec([f"c{i}" for i in range(cfg.model.nclass)],
                       n_frames=cfg.dsp.max_frames // 8)
    meta = {"epoch": 1, "pooling_time_ratio": 8, "mean_teacher": False}
    ev = CheckpointEvaluator(
        _prebuilt=(cfg, model, _EvalState(params, bn_state), scaler, codec, meta))
    path = str(tmp_path / "model.dc19serve")
    export_serving(ev, path, batch_size=8)
    audio, frames = _batch(ev, 8)
    mean, std = ev.scaler.mean_std_f32
    serve = jax.jit(build_serve_fn(
        ev.model, ev.state.params, ev.state.bn_state, ev.frontend, mean, std))
    want_strong, want_weak = serve(jnp.asarray(audio), jnp.asarray(frames))
    got_strong, got_weak = load_serving(path)(audio, frames)
    np.testing.assert_allclose(np.asarray(got_weak), np.asarray(want_weak),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_strong), np.asarray(want_strong),
                               atol=2e-5)


def test_exported_batch_shape_is_enforced(tmp_path):
    """jax.export artifacts are traced at a fixed batch; feeding the wrong
    shape must fail loudly rather than silently recompile."""
    ev = _tiny_evaluator()
    path = str(tmp_path / "model.dc19serve")
    export_serving(ev, path, batch_size=2)
    served = load_serving(path)
    audio, frames = _batch(ev, 4)
    with pytest.raises(ValueError, match="Shape mismatch"):
        served(audio, frames)
