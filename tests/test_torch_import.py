"""Torch-checkpoint import tests: a reference-layout state dict (built from
the torch twin of tests/test_crnn_parity.py) must import into our pytrees
and produce identical outputs — the golden-weights reproduction path
(SURVEY.md §4 item 2)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.train.torch_import import import_model_state_dict

CFG = ModelConfig()


def _reference_layout_state_dict(tm):
    """Arrange the torch twin's weights in the reference's serialized layout
    ({"cnn": {conv0..}, "rnn": {rnn.weight_ih_l0..}, "dense": {...}},
    models/CRNN.py:49-57 naming via nn.Sequential module names)."""
    sd = tm.state_dict()
    cnn, rnn, dense = {}, {}, {}
    for k, v in sd.items():
        if k.startswith("cnn."):
            # torch twin: cnn.{4i}=conv, {4i+1}=batchnorm, {4i+2}=GLU
            idx = int(k.split(".")[1])
            block, layer = divmod(idx, 4)
            rest = k.split(".", 2)[2]
            name = {0: f"conv{block}", 1: f"batchnorm{block}", 2: f"glu{block}.linear"}[layer]
            rest = rest.replace("linear.", "")
            cnn[f"{name}.{rest}"] = v
        elif k.startswith("rnn."):
            rnn[f"rnn.{k.split('.', 1)[1]}"] = v
        elif k.startswith("dense."):
            dense[k.split(".", 1)[1]] = v
        # dense_softmax intentionally dropped — the reference doesn't save it
    return {"cnn": cnn, "rnn": rnn, "dense": dense}


def test_import_matches_torch_forward():
    from tests.test_crnn_parity import TorchCRNN

    torch.manual_seed(0)
    tm = TorchCRNN(CFG).eval()
    # non-trivial running stats
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    sd = _reference_layout_state_dict(tm)

    model = CRNN(CFG)
    params, bn_state = model.init(jax.random.PRNGKey(1))
    params, bn_state = import_model_state_dict(sd, params, bn_state)
    # align the attention head manually (not serialized by the reference)
    params["dense_softmax"] = {
        "w": jnp.asarray(tm.dense_softmax.weight.detach().numpy().T),
        "b": jnp.asarray(tm.dense_softmax.bias.detach().numpy()),
    }

    x = np.random.default_rng(0).standard_normal((2, 864, 64)).astype(np.float32)
    strong, weak, _ = jax.jit(lambda p, s, xx: model.apply(p, s, xx, train=False))(
        params, bn_state, jnp.asarray(x)
    )
    with torch.no_grad():
        ts, tw = tm(torch.from_numpy(x[:, None]))
    np.testing.assert_allclose(np.asarray(strong), ts.numpy(), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(weak), tw.numpy(), rtol=1e-3, atol=2e-5)


def test_import_preserves_unserialized_attention():
    from tests.test_crnn_parity import TorchCRNN

    torch.manual_seed(1)
    tm = TorchCRNN(CFG)
    sd = _reference_layout_state_dict(tm)
    model = CRNN(CFG)
    params, bn_state = model.init(jax.random.PRNGKey(2))
    before = np.asarray(params["dense_softmax"]["w"]).copy()
    params2, _ = import_model_state_dict(sd, params, bn_state)
    np.testing.assert_array_equal(np.asarray(params2["dense_softmax"]["w"]), before)


def test_checkpoint_evaluator_from_torch(tmp_path):
    """End-to-end: reference-format torch.save file → evaluator → metrics."""
    from tests.test_crnn_parity import TorchCRNN
    from dcase2019_task4_tpu.eval.evaluate import CheckpointEvaluator

    torch.manual_seed(2)
    tm = TorchCRNN(CFG)
    state = {
        "model": {
            "name": "CRNN",
            "kwargs": {"n_in_channel": 1, "nclass": 10, "attention": True,
                       "n_RNN_cell": 64, "n_layers_RNN": 2, "activation": "glu",
                       "dropout": 0.5, "kernel_size": [3, 3, 3], "padding": [1, 1, 1],
                       "stride": [1, 1, 1], "nb_filters": [64, 64, 64],
                       "pooling": [(2, 4), (2, 4), (2, 4)]},
            "state_dict": _reference_layout_state_dict(tm),
        },
        "scaler": {"mean_": [0.0] * 64, "mean_of_square_": [1.0] * 64},
        "many_hot_encoder": {"labels": [f"c{i}" for i in range(10)], "n_frames": 108},
        "pooling_time_ratio": 8,
    }
    p = str(tmp_path / "torch_ckpt")
    torch.save(state, p)
    ev = CheckpointEvaluator.from_torch_checkpoint(p, synthetic_audio=True)
    assert ev.meta["pooling_time_ratio"] == 8
    assert ev.codec.labels == [f"c{i}" for i in range(10)]
    # forward smoke through the predict step
    import jax.numpy as jnp

    x = jnp.zeros((2, 864, 64), jnp.float32)
    strong, weak = ev.predict(ev.state.params, ev.state.bn_state, x)
    assert strong.shape == (2, 108, 10)
