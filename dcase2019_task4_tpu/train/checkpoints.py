"""Checkpoint save/restore.

Carries the same logical contents as the reference's torch.save state dict
(main.py:293-309): model params, EMA params, optimizer state, epoch,
pooling_time_ratio, scaler moments, label-encoder state, plus the full
framework config — so evaluation is config-independent (TestModel.py:25-44).

Format (v2, default): a single ``.npz`` zip — one array entry per pytree
leaf (``leaf_00000`` …) plus a ``__meta__`` entry holding UTF-8 JSON
(metadata + per-leaf dtype manifest). Loading uses ``allow_pickle=False``,
so restoring an untrusted checkpoint cannot execute code — unlike pickle
(and unlike the reference's torch.load). bfloat16 leaves (not a native
numpy dtype) are stored as uint16 bit patterns and re-viewed on load.

Format (v1, legacy): a pickle of numpy-ified leaves + metadata. Still
readable — ``restore_checkpoint`` sniffs the zip magic ``PK`` to pick the
parser — but no longer written. (orbax's async machinery is avoided
deliberately: its background commit threads deadlock under this
environment's TPU tunnel.)

Restore rebuilds the typed TrainState by unflattening the stored leaves
into a template produced by the same factory that created the original
(deterministic structure), which round-trips optax's nested states without
format coupling.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import pickle
import zipfile
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

try:  # jax always ships ml_dtypes; guard anyway so numpy-only tools work
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_ZIP_MAGIC = b"PK"


def _encode_leaf(arr: np.ndarray) -> Tuple[np.ndarray, str]:
    """Return (storable array, dtype tag). Non-native dtypes (bfloat16 and
    friends) are bit-cast to a same-width unsigned int for npz storage."""
    dtype_tag = str(arr.dtype)
    if arr.dtype.kind == "V" or (_BFLOAT16 is not None and arr.dtype == _BFLOAT16):
        arr = arr.view(np.dtype(f"u{arr.dtype.itemsize}"))
    return arr, dtype_tag


def _decode_leaf(arr: np.ndarray, dtype_tag: str) -> np.ndarray:
    if dtype_tag != str(arr.dtype):
        if _BFLOAT16 is not None and dtype_tag == "bfloat16":
            return arr.view(_BFLOAT16)
        return arr.view(np.dtype(dtype_tag))
    return arr


def _json_default(o):
    if isinstance(o, np.generic):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"checkpoint metadata value {o!r} is not JSON-serializable")


def save_checkpoint(path: str, train_state, metadata: Dict[str, Any]):
    """metadata must be JSON-serializable (scaler/codec state dicts, epoch,
    config dataclasses are converted to plain dicts; numpy scalars/arrays
    are converted in place)."""
    leaves = [np.asarray(l) for l in jax.tree.leaves(train_state)]
    names, arrays, dtypes = [], [], []
    for i, leaf in enumerate(leaves):
        stored, tag = _encode_leaf(leaf)
        names.append(f"leaf_{i:05d}")
        arrays.append(stored)
        dtypes.append(tag)
    meta_doc = {"version": 2, "n_leaves": len(leaves), "dtypes": dtypes,
                "metadata": metadata}
    meta_json = json.dumps(meta_doc, default=_json_default)

    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(meta_json.encode("utf-8"), dtype=np.uint8),
             **dict(zip(names, arrays)))
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def _load_npz(path: str, want_leaves: bool):
    with np.load(path, allow_pickle=False) as z:
        meta_doc = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        leaves: List[np.ndarray] = []
        if want_leaves:
            dtypes = meta_doc["dtypes"]
            for i in range(meta_doc["n_leaves"]):
                leaves.append(_decode_leaf(z[f"leaf_{i:05d}"], dtypes[i]))
    return leaves, meta_doc["metadata"]


def _is_zip(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == _ZIP_MAGIC


def restore_checkpoint(path: str, template_state):
    """Restore into the structure of `template_state` (same config ⇒ same
    treedef). Returns (train_state, metadata). Reads both the npz (v2)
    and legacy pickle (v1) formats."""
    if _is_zip(path):
        leaves, metadata = _load_npz(path, want_leaves=True)
    else:  # legacy v1 pickle — only open checkpoints you created yourself
        with open(path, "rb") as f:
            payload = pickle.load(f)
        leaves, metadata = payload["leaves"], payload["metadata"]
    treedef = jax.tree.structure(template_state)
    state = jax.tree.unflatten(treedef, leaves)
    return state, metadata


def read_metadata(path: str) -> Dict[str, Any]:
    if _is_zip(path):
        return _load_npz(path, want_leaves=False)[1]
    with open(path, "rb") as f:
        return pickle.load(f)["metadata"]


def config_to_dict(cfg) -> Dict:
    def conv(o):
        if dataclasses.is_dataclass(o):
            return {k: conv(v) for k, v in dataclasses.asdict(o).items()}
        return o

    return conv(cfg)
