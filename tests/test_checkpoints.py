"""Checkpoint round-trip tests (reference state-dict contract,
main.py:293-309 / TestModel.py:25-44)."""

import numpy as np
import optax

import jax

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.train import checkpoints as ckpt
from dcase2019_task4_tpu.train.steps import init_train_state

TINY = ModelConfig(nclass=3, nb_filters=(8, 8, 8), n_rnn_cell=8)


def _state(seed=0):
    model = CRNN(TINY)
    opt = optax.adam(1e-3)
    return model, opt, init_train_state(model, opt, jax.random.PRNGKey(seed))


def test_save_restore_roundtrip(tmp_path):
    _, _, state = _state(0)
    meta = {"epoch": 3, "scaler": {"mean_": [0.0], "mean_of_square_": [1.0]},
            "many_hot_encoder": {"labels": ["a"], "n_frames": 8},
            "pooling_time_ratio": 8}
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, meta)
    model, opt, template = _state(seed=99)  # different values, same structure
    restored, meta2 = ckpt.restore_checkpoint(p, template)
    assert meta2["epoch"] == 3
    l1 = jax.tree.leaves(state)
    l2 = jax.tree.leaves(restored)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_read_metadata_only(tmp_path):
    _, _, state = _state(0)
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, {"epoch": 7})
    assert ckpt.read_metadata(p)["epoch"] == 7


def test_atomic_replace(tmp_path):
    _, _, state = _state(0)
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, {"epoch": 1})
    ckpt.save_checkpoint(p, state, {"epoch": 2})  # overwrite
    assert ckpt.read_metadata(p)["epoch"] == 2


def test_config_to_dict_roundtrips_dataclasses():
    from dcase2019_task4_tpu.config import Config

    d = ckpt.config_to_dict(Config())
    assert d["model"]["nclass"] == 10
    assert d["dsp"]["sample_rate"] == 44100
