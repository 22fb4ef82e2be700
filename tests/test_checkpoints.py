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


def test_new_checkpoints_are_npz_not_pickle(tmp_path):
    """The default format must load with allow_pickle=False — restoring an
    untrusted checkpoint must not be able to execute code (unlike pickle
    and the reference's torch.load, main.py:293-309)."""
    _, _, state = _state(0)
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, {"epoch": 4})
    with open(p, "rb") as f:
        assert f.read(2) == b"PK"  # zip (npz), not a pickle opcode stream
    with np.load(p, allow_pickle=False) as z:  # must not raise
        assert "__meta__" in z.files


def test_legacy_pickle_checkpoint_restores_only_behind_opt_in(tmp_path):
    """Round-1/2 checkpoints were pickles. Unpickling executes code, so the
    reader requires an explicit opt-in; without it a non-npz file must raise
    instead of silently falling back to pickle.load (ADVICE r3)."""
    import pickle

    import pytest

    _, _, state = _state(0)
    leaves = [np.asarray(l) for l in jax.tree.leaves(state)]
    p = str(tmp_path / "ck_v1")
    with open(p, "wb") as f:
        pickle.dump({"version": 1, "leaves": leaves, "metadata": {"epoch": 9}}, f)
    _, _, template = _state(seed=42)
    with pytest.raises(ValueError, match="allow_legacy_pickle"):
        ckpt.restore_checkpoint(p, template)
    with pytest.raises(ValueError, match="allow_legacy_pickle"):
        ckpt.read_metadata(p)
    restored, meta = ckpt.restore_checkpoint(p, template, allow_legacy_pickle=True)
    assert meta["epoch"] == 9
    assert ckpt.read_metadata(p, allow_legacy_pickle=True)["epoch"] == 9
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_mismatched_template(tmp_path):
    """v2 checkpoints self-describe their leaf keypaths and shapes; restoring
    into a template from a different config must fail loudly instead of
    silently misassigning positionally-matching leaves (VERDICT r3 item 7)."""
    import pytest

    _, _, state = _state(0)
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, state, {"epoch": 0})

    # same leaf COUNT, different shapes (wider RNN) — must be rejected
    other = ModelConfig(nclass=3, nb_filters=(8, 8, 8), n_rnn_cell=16)
    model = CRNN(other)
    template = init_train_state(model, optax.adam(1e-3), jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="shapes do not match"):
        ckpt.restore_checkpoint(p, template)

    # different tree structure (the saved state has EMA leaves, the
    # template does not) — must be rejected on leaf count
    model = CRNN(TINY)
    template_noema = init_train_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0), with_ema=False
    )
    with pytest.raises(ValueError, match="leaves|structure"):
        ckpt.restore_checkpoint(p, template_noema)


def test_bfloat16_leaves_roundtrip(tmp_path):
    """bfloat16 isn't a native numpy dtype; the npz writer bit-casts it to
    uint16 and the reader re-views — values must be bit-exact."""
    import jax.numpy as jnp

    tree = {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) / 3,
            "b": jnp.ones((4,), jnp.float32),
            "step": jnp.asarray(5, jnp.int32)}
    p = str(tmp_path / "ck_bf16")
    ckpt.save_checkpoint(p, tree, {"epoch": 0})
    template = jax.tree.map(jnp.zeros_like, tree)
    restored, _ = ckpt.restore_checkpoint(p, template)
    assert restored["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(tree["w"]).view(np.uint16),
        np.asarray(restored["w"]).view(np.uint16))
    np.testing.assert_array_equal(np.asarray(tree["b"]), np.asarray(restored["b"]))


def test_metadata_numpy_scalars_are_jsonable(tmp_path):
    """valid_metric values arrive as numpy floats; the writer must coerce."""
    _, _, state = _state(0)
    p = str(tmp_path / "ck_np")
    ckpt.save_checkpoint(p, state, {"f1": np.float32(0.5), "arr": np.arange(3)})
    meta = ckpt.read_metadata(p)
    assert meta["f1"] == 0.5 and meta["arr"] == [0, 1, 2]


def test_config_to_dict_roundtrips_dataclasses():
    from dcase2019_task4_tpu.config import Config

    d = ckpt.config_to_dict(Config())
    assert d["model"]["nclass"] == 10
    assert d["dsp"]["sample_rate"] == 44100
