"""Multi-host (multi-slice) runtime support.

The reference has no distributed runtime at all (SURVEY.md §2.3). The
TPU-native scale-out recipe implemented here:

  * within a slice: GSPMD data parallelism over ICI (parallel/mesh.py) —
    XLA inserts the gradient all-reduce, nothing to code;
  * across hosts: `jax.distributed.initialize()` brings up the multi-host
    runtime (DCN for control, ICI for collectives); every host runs the
    same program and feeds ONLY its shard of each global batch, constructed
    deterministically from the shared (seed, epoch) so no coordination
    traffic is needed for sampling.

`host_shard_pairs` implements the per-host slice of the multi-stream batch:
the global [w·n | u·n | s·n] layout is cut so each host materializes the
rows that `jax.make_array_from_process_local_data` will place on its local
devices. Pure index arithmetic — unit-testable without real hosts.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Bring up the jax multi-host runtime (no-op for single process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_pairs(pairs: np.ndarray, process_index: int, process_count: int) -> np.ndarray:
    """Rows of the global (stream, idx) batch this host must materialize.

    The global batch axis is sharded contiguously over processes in
    process-index order (jax's default device order for a 1-D mesh built
    from jax.devices()); batch size must divide evenly."""
    B = pairs.shape[0]
    assert B % process_count == 0, f"global batch {B} not divisible by {process_count} hosts"
    per = B // process_count
    return pairs[process_index * per : (process_index + 1) * per]


def shard_rows(n: int, process_index: int, process_count: int) -> np.ndarray:
    """Row indices of an n-item evaluation set this host scores: every
    process_count-th item (round-robin — balanced for any n, no divisibility
    requirement). The per-host metric COUNTS merge additively
    (eval/sed_scores.py count_vector), so the partition choice only affects
    load balance, never the merged numbers."""
    return np.arange(process_index, n, process_count)


def all_sum_hosts(vec: np.ndarray) -> np.ndarray:
    """Element-wise sum of a small host-local f64 vector across all
    processes (identity single-process). Used to merge per-host additive
    metric counts after sharded evaluation — the only cross-host traffic
    the distributed eval path needs (a few hundred bytes per epoch)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(vec, np.float64)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(vec, jnp.float64))
    return np.asarray(gathered).sum(axis=0)


def sync_hosts(name: str):
    """Cross-process barrier (no-op single-process). Used to order shared-
    filesystem checkpoint IO: process 0 is the only writer (experiment.run),
    and readers on other processes must not open `baseline_best` before the
    writer's os.replace has landed."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def make_global_batch(local_batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble per-host arrays into global jax.Arrays sharded over `mesh`
    (jax.make_array_from_process_local_data)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out
