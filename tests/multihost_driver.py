"""Subprocess driver for the REAL multi-process multihost test
(tests/test_multihost_real.py): one OS process per simulated host, real
jax.distributed.initialize over localhost (Gloo CPU collectives), 2 local
CPU devices per process.

Usage: python tests/multihost_driver.py <pid> <nprocs> <port> <out_json> [store_dir]
With num_processes=1 it runs the single-process reference on the same
GLOBAL device count (2·P devices) for the equivalence comparison.
With store_dir set, it additionally drives the FULL `Experiment.run()`
loop — per-epoch checkpointing, SaveBest, best-restore — plus a resumed
run, under the real multi-process runtime (VERDICT r3 item 3: only
process 0 may write checkpoints; resume must reproduce).
"""

import json
import os
import sys

pid, nprocs, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
store_dir = sys.argv[5] if len(sys.argv) > 5 else None
n_local = 2 if nprocs > 1 else 4
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
if nprocs > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    # Establish the Gloo clique NOW, while the processes are still in
    # lockstep: context init rendezvous has a 30 s key-value timeout, and
    # the first collective otherwise runs only after each process compiles
    # the big train step — cold-cache / loaded-machine compile skew between
    # the processes can exceed 30 s (observed: GetKeyValue() DEADLINE_EXCEEDED
    # for key cpu:gloo/...). The tiny sync compiles in ~1 s on both sides and
    # the cached communicator is reused by every later collective.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo-clique-warmup")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dcase2019_task4_tpu.config import Config, DSPConfig, ModelConfig, TrainConfig  # noqa: E402
from dcase2019_task4_tpu.parallel.mesh import make_mesh  # noqa: E402
from dcase2019_task4_tpu.train.experiment import Experiment  # noqa: E402

cfg = Config(
    dsp=DSPConfig(max_len_seconds=1.0),
    model=ModelConfig(nclass=10, nb_filters=(16, 16, 16), n_rnn_cell=16, dropout=0.0),
    train=TrainConfig(batch_size=8, n_epoch=1, num_prefetch=1),
)
exp = Experiment(cfg, mean_teacher=True, subpart_data=24, synthetic_audio=True,
                 seed=0, mesh=make_mesh())
exp.build()
assert exp.process_count == nprocs, (exp.process_count, nprocs)
# multi-host eval must shard over this host's LOCAL devices (the global
# mesh can't consume host-local numpy batches); grab the mesh the built
# steps actually closed over for the test's assertion
eval_mesh_devices = 0
if getattr(exp, "eval_mesh", None) is not None:
    eval_mesh_devices = int(exp.eval_mesh.devices.size)
meters = exp.train_epoch(0)
metrics = exp.validate(0)
out = {
    "pid": pid,
    "nprocs": nprocs,
    "n_global_devices": len(jax.devices()),
    "loss": float(meters.meters["loss"].avg),
    "event_macro_f1": float(metrics["event_macro_f1"]),
    "weak_macro_f1": float(metrics["weak_macro_f1"]),
    "n_valid_files_local": len(exp.valid_synth_stream.filenames),
    "eval_mesh_devices": eval_mesh_devices,
    "n_local_devices": len(jax.local_devices()),
}

if store_dir is not None:
    # full run(): 2 epochs with per-epoch checkpoints + SaveBest + final
    # best-restore — the write paths that raced before the process-0 guard
    run_valid = exp.run(store_dir=store_dir, n_epoch=2)
    model_dir = os.path.join(store_dir, "model")
    from dcase2019_task4_tpu.train import checkpoints as ckpt

    epoch1 = os.path.join(model_dir, "baseline_epoch_1")
    best = os.path.join(model_dir, "baseline_best")
    # resumed run from the epoch-1 checkpoint: a fresh Experiment, one more
    # epoch (2), through the same multi-process machinery
    exp2 = Experiment(cfg, mean_teacher=True, subpart_data=24,
                      synthetic_audio=True, seed=0, mesh=make_mesh())
    resumed_valid = exp2.run(store_dir=store_dir + "_resumed", n_epoch=3,
                             resume_from=epoch1)
    resumed_hist = []
    rh = os.path.join(store_dir + "_resumed", "metrics.jsonl")
    if os.path.exists(rh):
        with open(rh) as f:
            resumed_hist = [json.loads(l)["epoch"] for l in f]
    out.update({
        "run_event_f1": float(run_valid["event_macro_f1"]),
        "run_weak_f1": float(run_valid["weak_macro_f1"]),
        "resumed_event_f1": float(resumed_valid["event_macro_f1"]),
        "resumed_weak_f1": float(resumed_valid["weak_macro_f1"]),
        "ckpt_files": sorted(os.listdir(model_dir)),
        "best_meta_epoch": int(ckpt.read_metadata(best)["epoch"]),
        "epoch1_meta_epoch": int(ckpt.read_metadata(epoch1)["epoch"]),
        "resumed_epochs_written": resumed_hist,  # shared file; written by p0
        "tmp_leftovers": sorted(
            f for f in os.listdir(model_dir) if f.endswith(".tmp")),
    })

with open(out_path, "w") as f:
    json.dump(out, f)
print("driver done:", out, flush=True)
