"""Import reference PyTorch checkpoints into this framework.

The reference's published artifact is a torch.save state dict with nested
{"model": {"state_dict": {"cnn": ..., "rnn": ..., "dense": ...}},
 "scaler": ..., "many_hot_encoder": ..., "pooling_time_ratio": ...}
(main.py:293-309) whose weights reproduce the README metric table via
TestModel.py (SURVEY.md §4 golden-weights reproduction). This module maps
that layout onto our param pytrees so the published baseline weights can be
evaluated (and fine-tuned) here:

  torch                                  ours
  cnn.conv{i}.weight [O,I,kh,kw]     →   cnn[i].conv.w [kh,kw,I,O]
  cnn.batchnorm{i}.weight/bias       →   cnn[i].bn.scale/bias
  cnn.batchnorm{i}.running_mean/var  →   bn_state.cnn[i].mean/var
  cnn.glu{i}.linear.weight [O,I]     →   cnn[i].act.w [I,O]
  rnn.rnn.weight_ih_l{k}[_reverse]   →   rnn[k].fwd/bwd.w_ih   (same layout)
  dense.weight [O,I]                 →   dense.w [I,O]

NB: the reference does NOT serialize the attention head (`dense_softmax` is
absent from CRNN.state_dict, models/CRNN.py:49-57) — imported checkpoints
keep our (freshly initialized) attention weights, exactly like reloading in
the reference keeps torch's initialized ones.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _np(t):
    # torch tensor or numpy
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def import_model_state_dict(torch_sd: Dict, params: Dict, bn_state: Dict):
    """Map a reference CRNN state_dict ({"cnn","rnn","dense"}) onto copies
    of (params, bn_state). Returns the new pytrees."""
    params = dict(params)
    params["cnn"] = [dict(b) for b in params["cnn"]]
    bn_state = {"cnn": [dict(s) for s in bn_state["cnn"]]}

    cnn_sd = torch_sd["cnn"]
    n_blocks = len(params["cnn"])
    for i in range(n_blocks):
        block = params["cnn"][i]
        block["conv"] = {
            "w": jnp.asarray(_np(cnn_sd[f"conv{i}.weight"]).transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_np(cnn_sd[f"conv{i}.bias"])),
        }
        block["bn"] = {
            "scale": jnp.asarray(_np(cnn_sd[f"batchnorm{i}.weight"])),
            "bias": jnp.asarray(_np(cnn_sd[f"batchnorm{i}.bias"])),
        }
        bn_state["cnn"][i] = {
            "mean": jnp.asarray(_np(cnn_sd[f"batchnorm{i}.running_mean"])),
            "var": jnp.asarray(_np(cnn_sd[f"batchnorm{i}.running_var"])),
        }
        glu_key = f"glu{i}.linear.weight"
        if glu_key in cnn_sd:
            block["act"] = {
                "w": jnp.asarray(_np(cnn_sd[glu_key]).T),
                "b": jnp.asarray(_np(cnn_sd[f"glu{i}.linear.bias"])),
            }
        cg_key = f"cg{i}.linear.weight"
        if cg_key in cnn_sd:
            block["act"] = {
                "w": jnp.asarray(_np(cnn_sd[cg_key]).T),
                "b": jnp.asarray(_np(cnn_sd[f"cg{i}.linear.bias"])),
            }

    rnn_sd = torch_sd["rnn"]
    new_rnn = []
    for l, layer in enumerate(params["rnn"]):
        new_layer = {}
        for d, suffix in [("fwd", ""), ("bwd", "_reverse")]:
            new_layer[d] = {
                "w_ih": jnp.asarray(_np(rnn_sd[f"rnn.weight_ih_l{l}{suffix}"])),
                "w_hh": jnp.asarray(_np(rnn_sd[f"rnn.weight_hh_l{l}{suffix}"])),
                "b_ih": jnp.asarray(_np(rnn_sd[f"rnn.bias_ih_l{l}{suffix}"])),
                "b_hh": jnp.asarray(_np(rnn_sd[f"rnn.bias_hh_l{l}{suffix}"])),
            }
        new_rnn.append(new_layer)
    params["rnn"] = new_rnn

    dense_sd = torch_sd["dense"]
    params["dense"] = {
        "w": jnp.asarray(_np(dense_sd["weight"]).T),
        "b": jnp.asarray(_np(dense_sd["bias"])),
    }
    return params, bn_state


def import_reference_checkpoint(path: str, cfg=None):
    """Load a reference torch.save checkpoint file → (model, params,
    bn_state, scaler, codec, pooling_time_ratio). Requires torch."""
    import torch

    from dcase2019_task4_tpu.config import Config, ModelConfig
    from dcase2019_task4_tpu.data.encoder import LabelCodec
    from dcase2019_task4_tpu.models.crnn import CRNN
    from dcase2019_task4_tpu.utils.scaler import Scaler
    import jax

    state = torch.load(path, map_location="cpu", weights_only=False)
    kw = state["model"]["kwargs"]
    cfg = cfg or Config()
    mc = ModelConfig(
        n_in_channel=kw.get("n_in_channel", 1),
        nclass=kw.get("nclass", 10),
        attention=kw.get("attention", True),
        n_rnn_cell=kw.get("n_RNN_cell", 64),
        n_layers_rnn=kw.get("n_layers_RNN", 2),
        activation=kw.get("activation", "glu"),
        dropout=kw.get("dropout", 0.5),
        kernel_size=tuple(kw.get("kernel_size", (3, 3, 3))),
        padding=tuple(kw.get("padding", (1, 1, 1))),
        stride=tuple(kw.get("stride", (1, 1, 1))),
        nb_filters=tuple(kw.get("nb_filters", (64, 64, 64))),
        pooling=tuple(tuple(p) for p in kw.get("pooling", ((2, 4),) * 3)),
    )
    model = CRNN(mc)
    params, bn_state = model.init(jax.random.PRNGKey(0))
    params, bn_state = import_model_state_dict(
        state["model"]["state_dict"], params, bn_state
    )
    scaler = Scaler().load_state_dict(state["scaler"])
    codec = LabelCodec.load_state_dict(state["many_hot_encoder"])
    return model, params, bn_state, scaler, codec, state["pooling_time_ratio"]
