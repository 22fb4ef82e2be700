"""Checkpoint save/restore.

Carries the same logical contents as the reference's torch.save state dict
(main.py:293-309): model params, EMA params, optimizer state, epoch,
pooling_time_ratio, scaler moments, label-encoder state, plus the full
framework config — so evaluation is config-independent (TestModel.py:25-44).

Format: a single pickle of numpy-ified pytree leaves + JSON-able metadata.
Restore rebuilds the typed TrainState by unflattening the stored leaves
into a template produced by the same factory that created the original
(deterministic structure), which round-trips optax's nested states without
format coupling. (orbax's async machinery is avoided deliberately: its
background commit threads deadlock under this environment's TPU tunnel.)
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _numpyify(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, train_state, metadata: Dict[str, Any]):
    """metadata must be picklable (scaler/codec state dicts, epoch, config
    dataclasses are converted to plain dicts)."""
    leaves = [np.asarray(l) for l in jax.tree.leaves(train_state)]
    payload = {"version": 1, "leaves": leaves, "metadata": metadata}
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template_state):
    """Restore into the structure of `template_state` (same config ⇒ same
    treedef). Returns (train_state, metadata)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    treedef = jax.tree.structure(template_state)
    state = jax.tree.unflatten(treedef, payload["leaves"])
    return state, payload["metadata"]


def read_metadata(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)["metadata"]


def config_to_dict(cfg) -> Dict:
    def conv(o):
        if dataclasses.is_dataclass(o):
            return {k: conv(v) for k, v in dataclasses.asdict(o).items()}
        return o

    return conv(cfg)
