"""Device mesh + GSPMD data parallelism.

The reference is strictly single-device (SURVEY.md §2.3: no
DataParallel/torch.distributed anywhere); scaling out is new capability
built the TPU way: a 1-D `jax.sharding.Mesh` over the slice, batches
sharded on the leading axis, params/EMA/optimizer state replicated, and
XLA's SPMD partitioner inserting the gradient all-reduce over ICI — no
hand-written collectives in the step function.

The multi-stream batch keeps its static [weak | unlabeled | synthetic]
layout *per shard*: the global batch is the per-device layout tiled
`n_devices` times, so every device computes every loss term on local data
and the psum'd gradient equals the global-batch gradient.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put every array leaf sharded on axis 0."""
    sh = batch_sharding(mesh, axis)
    return {
        k: (jax.device_put(v, sh) if isinstance(v, np.ndarray) else v)
        for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def tile_stream_layout(batch_sizes: Sequence[int], n_devices: int):
    """Global multi-stream layout for data parallelism.

    Per-device sub-batches [w, u, s] tile to global [w·n | u·n | s·n] so the
    loss slices stay static AND every shard holds the same stream mix.
    Returns (global_batch_sizes, global_slices)."""
    global_sizes = [b * n_devices for b in batch_sizes]
    slices, start = [], 0
    for b in global_sizes:
        slices.append(slice(start, start + b))
        start += b
    return global_sizes, slices


def interleave_for_sharding(pairs: np.ndarray, batch_sizes: Sequence[int], n_devices: int) -> np.ndarray:
    """Reorder a global [w·n | u·n | s·n] batch of (stream, idx) pairs so
    that contiguous per-device shards each contain the per-device layout
    [w | u | s].

    With this ordering the *per-shard* loss masks line up with the global
    static slices after XLA partitions the batch axis — but note the loss
    math in steps.py uses global slices on the [w·n | u·n | s·n] layout, so
    this helper is only for pipelines that want shard-local layouts (kept
    for the shard_map-based variants)."""
    n_streams = len(batch_sizes)
    out = []
    offsets = np.cumsum([0] + [b * n_devices for b in batch_sizes])
    for d in range(n_devices):
        for s in range(n_streams):
            b = batch_sizes[s]
            seg = pairs[offsets[s] + d * b : offsets[s] + (d + 1) * b]
            out.append(seg)
    return np.concatenate(out, axis=0)
