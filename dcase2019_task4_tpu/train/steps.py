"""Jit-compiled training steps.

The reference's per-batch Python loop body (main.py:73-157 for Mean-Teacher,
main_simple_CRNN.py:40-76 for the supervised variant) becomes ONE fused XLA
program per step: on-device featurization (optional) → teacher forward
(stop-gradient) → student forward → masked losses → grads → Adam update →
EMA lerp → new state. Nothing crosses the host boundary except the packed
batch in and scalar metrics out.

Step-count-dependent scalars (consistency rampup, EMA warmup alpha) are
computed from the traced `step` counter with `jnp` ops — no Python control
flow, so one compilation serves the whole run.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcase2019_task4_tpu.train import losses
from dcase2019_task4_tpu.train.ramps import sigmoid_rampup


def dequantize_audio(audio: jnp.ndarray) -> jnp.ndarray:
    """Audio crosses the host↔device link as int16 PCM (half the bytes of
    f32, and bit-exact for 16-bit wav sources); dequantize on device."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    return audio


def _flat_param_update() -> bool:
    """DCASE_FLAT_OPT=1 runs the step's param-update tail (Adam moments +
    update, EMA lerp) over ONE raveled parameter buffer instead of ~40
    per-leaf pytree kernels. Element-wise math is unchanged (differences are
    fp-noise from fusion boundaries) — a kernel-count/scheduling A/B knob for the
    profile's "losses/Adam/EMA/heads" tail (docs/PERF.md). Read at step-build
    time; affects the optimizer state LAYOUT (flat mu/nu), so a checkpoint
    written with one setting resumes only under the same setting."""
    return os.environ.get("DCASE_FLAT_OPT", "0") == "1"


def wrap_optimizer(optimizer):
    """Apply the flat-update knob; call on the optimizer passed to BOTH
    init_train_state and make_train_step (they must agree on state layout).
    Both call it themselves — callers just pass the raw optax transform."""
    return optax.flatten(optimizer) if _flat_param_update() else optimizer


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    ema_params: Any
    ema_bn_state: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def init_train_state(model, optimizer, key, with_ema: bool = True) -> TrainState:
    """Student and teacher are *independently* initialized, like the
    reference's two separate weights_init calls (main.py:281-283); the EMA
    warmup alpha pulls the teacher onto the student within a few steps."""
    k_student, k_teacher = jax.random.split(key)
    params, bn_state = model.init(k_student)
    if with_ema:
        ema_params, ema_bn_state = model.init(k_teacher)
    else:
        ema_params, ema_bn_state = None, None
    opt_state = wrap_optimizer(optimizer).init(params)
    return TrainState(params, bn_state, ema_params, ema_bn_state, opt_state, jnp.int32(0))


def ema_update(params, ema_params, step, alpha_max: float = 0.999):
    """EMA lerp with warmup: α = min(1 − 1/(g+1), α_max) where g is the
    post-increment global step (main.py:45-49,155-157 — the loop increments
    global_step before calling update_ema_variables, so g = step + 1)."""
    g = step + 1
    alpha = jnp.minimum(1.0 - 1.0 / (g.astype(jnp.float32) + 1.0), alpha_max)
    if _flat_param_update():
        from jax.flatten_util import ravel_pytree

        flat_p, _ = ravel_pytree(params)
        flat_e, unravel = ravel_pytree(ema_params)
        return unravel(alpha * flat_e + (1.0 - alpha) * flat_p)
    return jax.tree.map(lambda e, p: alpha * e + (1.0 - alpha) * p, ema_params, params)


class TrainStep:
    """Callable wrapper over the jitted step exposing the metric-sum
    accumulator contract: `step(state, batch, rng, acc)` → (state, metrics,
    acc + metrics), with `acc` built by `zero_metrics()`. The accumulator
    lives on device; fetch it once per epoch and divide by the step count
    for exact per-batch means (replaces host-side per-step metric RTTs)."""

    def __init__(self, fn, metric_keys, raw_fn=None):
        self._fn = fn
        self.raw_fn = raw_fn  # unjitted body, for make_device_epoch's scan
        self.metric_keys = tuple(metric_keys)

    def zero_metrics(self) -> Dict[str, jnp.ndarray]:
        return {k: jnp.float32(0.0) for k in self.metric_keys}

    def __call__(self, state, batch, rng, acc):
        return self._fn(state, batch, rng, acc)


def make_train_step(
    model,
    optimizer,
    weak_slice: Optional[slice],
    strong_slice: Optional[slice],
    mean_teacher: bool = True,
    rampup_length: int = 0,
    max_consistency_cost: float = 2.0,
    ema_alpha: float = 0.999,
    frontend=None,
    scaler_mean=None,
    scaler_std=None,
    noise_std: float = 0.25,
    spec_augment_cfg: Optional[Dict] = None,
    donate: bool = True,
    mesh=None,
    axis_name: str = "data",
):
    """Build the jitted step.

    Batch dict:
      * fused-frontend mode (frontend given): {"audio": [B, Lp] reflect-padded
        (int16 or f32), "frames": [B] valid frame counts, "target": [B, T', C]};
        the teacher's |N(0, noise_std)| mel-noise augmentation is applied on
        device (AugmentGaussianNoise semantics).
      * precomputed mode: {"features": [B, T, F] normalized log-mel,
        optional "features_teacher" (pass the noisy variant here for full
        Mean-Teacher parity — without it the teacher sees clean features),
        "target"}

    With `mesh`, the step runs SPMD over the mesh's `axis_name` axis via
    jax.shard_map: each device computes the per-shard losses on its local
    contiguous chunk of the batch (so the batch must be laid out shard-major —
    per-device [weak | unlabeled | synthetic] sub-layouts, see
    parallel.mesh.interleave_for_sharding — and `weak_slice`/`strong_slice`
    are PER-DEVICE slices), BatchNorm batch statistics are psum'd across
    shards, gradients are pmean'd, and params/EMA/optimizer state stay
    replicated. Unlike plain GSPMD jit, shard_map keeps the fused Pallas
    kernels (ops/fused_block.py, ops/packed_conv.py, ops/fused_mel.py)
    usable: each shard invokes them on its local batch.

    Returns a TrainStep: step(state, batch, rng, acc) → (state, metrics,
    acc') where `acc` is an on-device metric-sum dict (step.zero_metrics())
    and acc' = acc + metrics. Carrying the sums on device restores the
    reference's true per-batch epoch means (main.py:106-150) with a single
    device→host fetch per epoch instead of per-step scalar RTTs.
    """
    if scaler_mean is not None:
        scaler_mean = jnp.asarray(scaler_mean, jnp.float32)
        scaler_std = jnp.asarray(scaler_std, jnp.float32)
    optimizer = wrap_optimizer(optimizer)
    axis = axis_name if mesh is not None else None
    axis_size = int(mesh.devices.size) if mesh is not None else 1

    # static metric-key set (must mirror step_fn's metrics dict exactly —
    # the accumulator pytree is zipped against it)
    metric_keys = ["loss"]
    if weak_slice is not None:
        metric_keys.append("weak_class_loss")
    if strong_slice is not None:
        metric_keys.append("strong_class_loss")
    if mean_teacher:
        metric_keys += ["consistency_strong", "consistency_weak", "consistency_weight"]
        if weak_slice is not None:
            metric_keys.append("weak_ema_class_loss")
        if strong_slice is not None:
            metric_keys.append("strong_ema_class_loss")

    def featurize(batch, rng):
        if frontend is None:
            student = batch["features"]
            teacher = batch.get("features_teacher", student)
            return student, teacher
        audio = batch["audio"]
        if frontend.stft_mode not in ("chunked", "pallas"):
            # the chunked/pallas frontends dequantize int16 themselves,
            # after the hop-chunk relayout (half the reshape bytes)
            audio = dequantize_audio(audio)
        if mean_teacher and "audio2" in batch:
            # paired-teacher-view mode: the teacher featurizes an
            # INDEPENDENT nuisance render of the same clips (same labels,
            # fresh noise/timbre/detune draws) — the reference's gaussian
            # noise (DataLoad.py:283-287) stays on top, so the only delta
            # vs the standard recipe is the view audio
            audio2 = batch["audio2"]
            if frontend.stft_mode not in ("chunked", "pallas"):
                audio2 = dequantize_audio(audio2)
            student, teacher = frontend.log_mel_pair(
                audio, batch["frames"], rng, noise_std, teacher_padded=audio2
            )
        elif mean_teacher:
            student, teacher = frontend.log_mel_pair(audio, batch["frames"], rng, noise_std)
        else:
            student = frontend.log_mel(audio, batch["frames"])
            teacher = student
        if scaler_mean is not None:
            student = (student - scaler_mean) / scaler_std
            teacher = (teacher - scaler_mean) / scaler_std
        return student, teacher

    def step_fn(state: TrainState, batch: Dict, rng, acc: Dict):
        if axis is not None:
            # per-shard randomness (teacher noise, dropout, SpecAugment)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        rng_feat, rng_sa, rng_student, rng_teacher = jax.random.split(rng, 4)
        student_x, teacher_x = featurize(batch, rng_feat)
        if spec_augment_cfg:
            from dcase2019_task4_tpu.ops.specaugment import spec_augment

            student_x = spec_augment(rng_sa, student_x, **spec_augment_cfg)
        target = batch["target"]
        metrics = {}

        if mean_teacher:
            strong_t, weak_t, ema_bn_state = model.apply(
                state.ema_params, state.ema_bn_state, teacher_x, train=True,
                rng=rng_teacher, batch_axis=axis, axis_size=axis_size,
            )
            strong_t = jax.lax.stop_gradient(strong_t)
            weak_t = jax.lax.stop_gradient(weak_t)
            rampup = sigmoid_rampup(state.step.astype(jnp.float32), rampup_length)
            cons_weight = max_consistency_cost * rampup
        else:
            ema_bn_state = state.ema_bn_state

        def loss_fn(params):
            strong_s, weak_s, bn_state = model.apply(
                params, state.bn_state, student_x, train=True, rng=rng_student,
                batch_axis=axis, axis_size=axis_size,
            )
            loss = jnp.float32(0.0)
            m = {}
            if weak_slice is not None:
                wl = losses.weak_bce(weak_s, target, weak_slice)
                m["weak_class_loss"] = wl
                loss += wl
            if strong_slice is not None:
                sl = losses.strong_bce(strong_s, target, strong_slice)
                m["strong_class_loss"] = sl
                loss += sl
            if mean_teacher:
                cs = cons_weight * losses.mse(strong_s, strong_t)
                cw = cons_weight * losses.mse(weak_s, weak_t)
                m["consistency_strong"] = cs
                m["consistency_weak"] = cw
                m["consistency_weight"] = cons_weight
                loss += cs + cw
            m["loss"] = loss
            return loss, (bn_state, m)

        grads, (bn_state, m) = jax.grad(loss_fn, has_aux=True)(state.params)
        metrics.update(m)
        if axis is not None:
            # mean of per-shard gradients == gradient of the global-batch
            # mean loss (equal per-shard row counts per stream)
            grads = jax.lax.pmean(grads, axis)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        if mean_teacher:
            ema_params = ema_update(params, state.ema_params, state.step, ema_alpha)
            # teacher-side eval losses, metered like the reference
            # (main.py:101-121) — no gradient flows here
            if weak_slice is not None:
                metrics["weak_ema_class_loss"] = losses.weak_bce(weak_t, target, weak_slice)
            if strong_slice is not None:
                metrics["strong_ema_class_loss"] = losses.strong_bce(strong_t, target, strong_slice)
        else:
            ema_params = state.ema_params

        new_state = TrainState(
            params, bn_state, ema_params, ema_bn_state, opt_state, state.step + 1
        )
        if axis is not None:
            metrics = jax.lax.pmean(metrics, axis)
        new_acc = jax.tree.map(jnp.add, acc, metrics)
        return new_state, metrics, new_acc

    donate_argnums = (0, 3) if donate else ()
    # raw_fn stays the UNWRAPPED body: make_device_epoch builds its own
    # shard_map around the whole epoch scan (with the mesh given), so the
    # body must be composable inside an existing Manual-mesh context —
    # nesting the step's own shard_map there is an error
    inner_fn = step_fn
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        step_fn = jax.shard_map(
            step_fn,
            mesh=mesh,
            # pytree-prefix specs: state + rng + metric sums replicated,
            # every batch leaf sharded on its leading axis
            in_specs=(P(), P(axis_name), P(), P()),
            out_specs=(P(), P(), P()),
            # the Pallas kernels don't propagate varying-mesh-axis metadata;
            # replication of the outputs is by construction (pmean'd grads →
            # identical updates on every shard, psum'd BN stats)
            check_vma=False,
        )
    return TrainStep(jax.jit(step_fn, donate_argnums=donate_argnums), metric_keys,
                     raw_fn=inner_fn)


def make_device_epoch(train_step: TrainStep, mesh=None, axis_name: str = "data"):
    """One jitted dispatch per EPOCH over a device-resident dataset
    (data.pipeline.DeviceResidentData).

    The per-step host loop costs one dispatch + one ~21 MB host→device audio
    transfer per step; under this environment's 10-35 MB/s tunnel that is
    ~2.1 s/step against ~40 ms of device compute (EPOCH_BENCH.json). With the
    dataset pinned in HBM the whole epoch runs as one `lax.scan` over the
    sampler's [steps, B] index array: batches are leading-axis gathers, and
    the per-step RNG split chain runs inside the scan carry — bit-identical
    draws to the host loop's `rng, sub = jax.random.split(rng)` sequence.
    Batch inputs are bit-identical to the streamed path; trajectories agree
    to Adam-amplified fp-fusion noise, ~1e-5/step (tests/test_device_cache.py).

    Returns epoch_fn(state, data, idx, rng, acc) -> (state, acc) where
    `data` = {"audio": [N, Lp] i16, "frames": [N] i32, "target": [N, T', C]},
    `idx` = [steps, B] int32 global row indices, `rng` = the epoch PRNG key,
    and `acc` accumulates the step's metric sums exactly like the loop path.

    With `mesh` (train_step built with the SAME mesh), the whole epoch scan
    runs SPMD under shard_map: the row store `data` is replicated on every
    device (DeviceResidentData(mesh=...)), `idx` is the shard-major GLOBAL
    batch layout sharded on its batch axis, and each device scans gathering
    its local chunk — the step body's BN psums / grad pmeans keep the
    trajectory equal to the single-device scan over the same global batches
    (tests/test_device_cache.py sharded twin). Multi-process callers still
    stream (Experiment.build guards)."""
    body_fn = train_step.raw_fn

    def epoch_fn(state, data, idx, rng, acc):
        def body(carry, idx_t):
            state, rng, acc = carry
            rng, sub = jax.random.split(rng)
            # leading-axis gathers over every resident array ("audio",
            # "frames", "target", plus "audio2" in paired-view mode)
            batch = {k: v[idx_t] for k, v in data.items()}
            state, _, acc = body_fn(state, batch, sub, acc)
            return (state, rng, acc), None

        (state, rng, acc), _ = jax.lax.scan(body, (state, rng, acc), idx)
        return state, acc

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        epoch_fn = jax.shard_map(
            epoch_fn,
            mesh=mesh,
            # state/data/rng/acc replicated; idx split on the per-step batch
            # axis — each device's chunk is a full per-device stream layout
            in_specs=(P(), P(), P(None, axis_name), P(), P()),
            out_specs=(P(), P()),
            # as in make_train_step: Pallas kernels don't propagate
            # varying-mesh-axis metadata; outputs replicate by construction
            check_vma=False,
        )
    return jax.jit(epoch_fn, donate_argnums=(0, 4))


def _shard_eval(fn, mesh, n_batch_args: int, n_const_args: int = 0,
                n_out: int = 1):
    """shard_map a pure inference fn over the mesh's first axis: const args
    (params/state) replicated, batch args split on axis 0, outputs
    batch-sharded. Pallas kernels have no GSPMD partitioning rules — a
    plain jit over a >1-device mesh would gather to one device — so eval
    scales the same way the train step does (shard_map, per-shard
    kernels). Eval-mode BN uses running statistics: no cross-shard
    reduction exists, so every shard is independent."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=tuple([P()] * n_const_args + [P(axis)] * n_batch_args),
        out_specs=P(axis) if n_out == 1 else tuple([P(axis)] * n_out),
        check_vma=False,
    )


def make_eval_features(frontend, scaler_mean=None, scaler_std=None, mesh=None):
    """Jitted inference featurization (no augmentation). With a >1-device
    `mesh`, batches are sharded over its first axis (batch size must be
    divisible by the device count — iter_eval_batches pads tails to the
    full batch size, so this holds whenever the configured batch size
    does)."""
    if scaler_mean is not None:
        scaler_mean = jnp.asarray(scaler_mean, jnp.float32)
        scaler_std = jnp.asarray(scaler_std, jnp.float32)

    def featurize(audio, frames):
        x = frontend.log_mel(dequantize_audio(audio), frames)
        if scaler_mean is not None:
            x = (x - scaler_mean) / scaler_std
        return x

    if mesh is not None and mesh.devices.size > 1:
        featurize = _shard_eval(featurize, mesh, n_batch_args=2)
    return jax.jit(featurize)


def make_scaler_stats(frontend):
    """Jitted per-batch moment reduction for scaler fitting: featurize and
    reduce to (Σ per bin, Σ² per bin) on device — only two [n_mels] vectors
    cross the device→host link per batch (the reference iterates full
    features on the host, utils/Scaler.py:34-87). `n_valid` masks the
    repeated-tail padding rows of the last batch ON DEVICE (a traced
    scalar — one compilation covers every tail length), so full and tail
    batches run the same code path."""

    @jax.jit
    def stats(audio, frames, n_valid):
        x = frontend.log_mel(dequantize_audio(audio), frames)
        mask = (jnp.arange(x.shape[0]) < n_valid)[:, None].astype(jnp.float32)
        # per-clip mean over time, then summed over valid clips (equal clip weight)
        return (
            jnp.sum(jnp.mean(x, axis=1) * mask, axis=0),
            jnp.sum(jnp.mean(x * x, axis=1) * mask, axis=0),
        )

    return stats


def make_predict_step(model, mesh=None):
    """Jitted batched inference: features → (strong probs, weak probs).
    Replaces the reference's per-clip batch-1 loop
    (evaluation_measures.py:203-231) with full batches. With a >1-device
    `mesh`, the batch shards over its first axis (params/state replicated)
    so per-epoch validation scales with the training mesh instead of
    collapsing onto one device."""

    def predict(params, bn_state, features):
        strong, weak, _ = model.apply(params, bn_state, features, train=False)
        return strong, weak

    if mesh is not None and mesh.devices.size > 1:
        predict = _shard_eval(predict, mesh, n_batch_args=1, n_const_args=2,
                              n_out=2)
    return jax.jit(predict)
