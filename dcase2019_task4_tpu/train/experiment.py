"""End-to-end experiment assembly: the framework's equivalent of the
reference entry scripts (main.py:168-373 Mean-Teacher,
main_simple_CRNN.py:85-295 supervised), re-architected for TPU:

  TSV manifests → packed streams → [device] fused mel frontend → CRNN →
  losses/EMA in ONE jitted (optionally pjit-sharded) step → batched
  inference → vectorized decode → native SED scoring → checkpoints/SaveBest.

Stream composition, splits, seeds, loss masks, ramp lengths, optimizer and
EMA hyperparameters all follow the reference recipe; see inline citations.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dcase2019_task4_tpu.config import Config
from dcase2019_task4_tpu.data.audio_io import SyntheticAudioSource, WavAudioSource
from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.data.manifests import (
    Manifest,
    load_manifest,
    split_synthetic,
    split_weak,
    subpart_manifest,
)
from dcase2019_task4_tpu.data.pipeline import BatchPipeline, Stream, iter_eval_batches
from dcase2019_task4_tpu.eval.decode import decode_batch, predictions_to_tsv
from dcase2019_task4_tpu.eval.sed_scores import compute_strong_metrics
from dcase2019_task4_tpu.eval.tagging import TaggingF1
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.ops.mel import MelFrontend
from dcase2019_task4_tpu.train import checkpoints as ckpt
from dcase2019_task4_tpu.train.steps import (
    init_train_state,
    make_eval_features,
    make_predict_step,
    make_train_step,
)
from dcase2019_task4_tpu.utils.logger import get_logger
from dcase2019_task4_tpu.utils.meters import AverageMeterSet, EarlyStopping, SaveBest
from dcase2019_task4_tpu.utils.scaler import Scaler


class Experiment:
    def __init__(
        self,
        cfg: Config,
        mean_teacher: bool = True,
        no_synthetic: bool = False,
        no_weak: bool = False,
        subpart_data: Optional[int] = None,
        subpart_unlabeled: Optional[int] = None,
        synthetic_audio: bool = False,
        synthetic_variability: float = 0.0,
        synthetic_bands: Optional[Dict] = None,
        logger=None,
        mesh=None,
        seed: int = 0,
        ramped_adam: bool = False,
        device_cache: bool = False,
        paired_teacher_view: bool = False,
    ):
        self.cfg = cfg
        self.ramped_adam = ramped_adam
        # pin the whole training set in HBM and run each epoch as ONE
        # lax.scan dispatch (data.pipeline.DeviceResidentData) — for small
        # datasets (subpart runs / ablations) where the per-step host feed
        # dominates wall-clock; same batches + RNG draws as the streamed path
        self.device_cache = device_cache
        self.mean_teacher = mean_teacher
        self.no_synthetic = no_synthetic
        self.no_weak = no_weak
        self.subpart_data = subpart_data
        # separate cap for the unlabeled manifest (default: same as
        # subpart_data). The real dataset's unlabeled:labeled ratio is ~5:1
        # (14412 vs 1578+2045 files); a single cap applied to all three
        # manifests starves the Mean-Teacher recipe of the thing it feeds on,
        # so SSL-value experiments (tools/ablate_ssl.py) keep the labeled
        # budget fixed and raise only this.
        self.subpart_unlabeled = (
            subpart_unlabeled if subpart_unlabeled is not None else subpart_data
        )
        self.synthetic_audio = synthetic_audio
        self.synthetic_variability = synthetic_variability
        # {stream_name: (lo, hi)} nuisance quantile bands for the synthetic
        # source (audio_io.synth_clip nuisance_band). Streams not listed get
        # the full band. The nuisance-shift ablation passes
        # {"weak": (a, b), "synthetic": (a, b)} so labeled TRAIN data sits
        # in a narrow band while unlabeled + validation span the full one.
        self.synthetic_bands = dict(synthetic_bands or {})
        # teacher consumes an INDEPENDENT nuisance render of each training
        # clip (second synthetic view, salt "v2") instead of sharing the
        # student's audio — the consistency-positive-regime probe
        # (tools/ablate_ssl.py arm mt_nv). Synthetic-only: a wav tree has
        # no second view to render.
        self.paired_teacher_view = paired_teacher_view
        if paired_teacher_view:
            assert synthetic_audio and mean_teacher, (
                "paired_teacher_view needs --synthetic_audio (a second view "
                "is rendered, not recorded) and the Mean-Teacher recipe"
            )
        self.log = logger or get_logger()
        self.mesh = mesh
        self.seed = seed
        self.classes = list(cfg.classes)
        ptr = cfg.model.pooling_time_ratio
        self.codec = LabelCodec(self.classes, n_frames=cfg.dsp.max_frames // ptr)
        self.frontend = MelFrontend(
            sample_rate=cfg.dsp.sample_rate,
            n_window=cfg.dsp.n_window,
            hop_length=cfg.dsp.hop_length,
            n_mels=cfg.dsp.n_mels,
            f_min=cfg.dsp.f_min,
            f_max=cfg.dsp.f_max,
            max_frames=cfg.dsp.max_frames,
            amin=cfg.dsp.amin,
            top_db=cfg.dsp.top_db,
            # frontend MXU dtype follows the model's compute policy
            compute_dtype=cfg.model.compute_dtype,
        )
        self.model = CRNN(cfg.model)
        self.scaler = Scaler()
        self._built = False

    # ------------------------------------------------------------ sources

    def _source_for(self, manifest: Manifest, tsv_path: str, stream_name: str = "",
                    view_salt: str = "desed-synth"):
        if self.synthetic_audio:
            return SyntheticAudioSource(
                manifest, self.classes, self.cfg.dsp.sample_rate,
                self.cfg.dsp.max_len_seconds,
                variability=self.synthetic_variability,
                nuisance_band=self.synthetic_bands.get(stream_name),
                seed_salt=view_salt,
            )
        return WavAudioSource(
            self.cfg.paths.audio_dir_for_meta(tsv_path), self.cfg.dsp.sample_rate
        )

    def _make_stream(self, name: str, manifest: Manifest, tsv_path: str, cache=True) -> Stream:
        d = self.cfg.dsp
        source = self._source_for(manifest, tsv_path, stream_name=name)
        source2 = None
        if self.paired_teacher_view:
            # same manifest/band/variability, distinct salt → an
            # independent nuisance render of every clip (same labels)
            source2 = self._source_for(
                manifest, tsv_path, stream_name=name, view_salt="desed-synth/v2"
            )
        if not self.synthetic_audio:
            # drop rows whose wav is absent, with a logged error per file
            # (reference DatasetDcase2019Task4.py:254-262)
            from dcase2019_task4_tpu.data.features_cache import drop_missing_audio

            manifest = drop_missing_audio(manifest, source, self.log)
        return Stream(
            name,
            manifest,
            source,
            self.codec,
            d.sample_rate,
            d.hop_length,
            self.cfg.model.pooling_time_ratio,
            cache_audio=cache,
            source2=source2,
        )

    # -------------------------------------------------------------- build

    def build(self):
        """Load manifests, make splits (reference seeds), build streams,
        fit the scaler on device, construct jitted steps."""
        cfg, t = self.cfg, self.cfg.train
        p = cfg.paths
        weak_m = subpart_manifest(load_manifest(p.weak), self.subpart_data, t.subpart_seed)
        unlabel_m = subpart_manifest(load_manifest(p.unlabel), self.subpart_unlabeled, t.subpart_seed)
        synth_m = subpart_manifest(load_manifest(p.synthetic), self.subpart_data, t.subpart_seed)

        # 80/20 splits, seed 26 (main.py:215-223)
        train_weak_m, valid_weak_m = split_weak(weak_m, 1 - t.valid_fraction, t.split_seed)
        train_synth_m, valid_synth_m = split_synthetic(synth_m, 1 - t.valid_fraction, t.split_seed)
        self.valid_synth_df = valid_synth_m.df
        self.valid_weak_m = valid_weak_m

        streams: List[Stream] = []
        batch_sizes: List[int] = []
        bs = t.batch_size
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        if self.no_weak:
            # main_simple_CRNN.py -n: synthetic only
            streams = [self._make_stream("synthetic", train_synth_m, p.synthetic)]
            batch_sizes = [bs]
        elif not self.mean_teacher:
            # main_simple_CRNN.py default: [weak ½ | synthetic ½]
            streams = [
                self._make_stream("weak", train_weak_m, p.weak),
                self._make_stream("synthetic", train_synth_m, p.synthetic),
            ]
            batch_sizes = [bs // 2, bs // 2]
        elif self.no_synthetic:
            # main.py -n: [weak ¼ | unlabeled ¾] (main.py:242-245)
            streams = [
                self._make_stream("weak", train_weak_m, p.weak),
                self._make_stream("unlabeled", unlabel_m, p.unlabel, cache=False),
            ]
            batch_sizes = [bs // 4, 3 * bs // 4]
        else:
            # main.py default: [weak ¼ | unlabeled ½ | synthetic ¼]
            streams = [
                self._make_stream("weak", train_weak_m, p.weak),
                self._make_stream("unlabeled", unlabel_m, p.unlabel, cache=False),
                self._make_stream("synthetic", train_synth_m, p.synthetic),
            ]
            batch_sizes = [bs // 4, bs // 2, bs // 4]

        # data-parallel: tile the per-device layout across the mesh,
        # shard-major (each device's contiguous chunk is a full
        # [weak | unlabeled | synthetic] sub-layout — the shard_map step
        # applies the PER-DEVICE loss slices to its local chunk)
        # multi-host: every process runs this same build with the same seed;
        # the pipeline assembles only this host's cut of the global batch
        # (parallel/multihost.py). Single-process runs see (0, 1).
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.pipeline = BatchPipeline(
            streams,
            batch_sizes,
            cfg.dsp.max_samples,
            cfg.dsp.n_window,
            cfg.dsp.hop_length,
            cfg.dsp.max_frames,
            seed=self.seed,
            n_shards=n_dev,
            process_index=self.process_index,
            process_count=self.process_count if self.mesh is not None else 1,
        )
        # loss masks = static per-shard slices of the stream layout
        # (main.py:238-247)
        slices = self.pipeline.stream_slices()
        names = [s.name for s in streams]
        self.weak_slice = slices[names.index("weak")] if "weak" in names else None
        self.strong_slice = slices[names.index("synthetic")] if "synthetic" in names else None

        # multi-host: each host evaluates only every Pth validation file
        # (round-robin); metric COUNTS merge additively across hosts in
        # validate() (all_sum_hosts), so the per-epoch numbers — and with
        # them SaveBest — are exact and identical on every host while the
        # inference work divides by the host count.
        if self.process_count > 1:
            from dcase2019_task4_tpu.data.manifests import shard_manifest

            valid_synth_m = shard_manifest(valid_synth_m, self.process_index,
                                           self.process_count)
            valid_weak_m = shard_manifest(valid_weak_m, self.process_index,
                                          self.process_count)
            self.valid_synth_df = valid_synth_m.df
        self.valid_synth_stream = self._make_stream("valid_synth", valid_synth_m, p.synthetic)
        self.valid_weak_stream = self._make_stream("valid_weak", valid_weak_m, p.weak)

        self._device_data = None
        self._epoch_fn = None
        if self.device_cache:
            if self.process_count > 1:
                raise ValueError(
                    "device_cache is single-process (multi-host runs stream "
                    "per-host batches through the shard_map step instead)"
                )
            from dcase2019_task4_tpu.data.pipeline import DeviceResidentData

            t0 = time.time()
            # data-parallel: row store replicated over the mesh, epoch scan
            # sharded on the batch axis (make_device_epoch(mesh=...)) — the
            # per-device HBM cost and size guard are unchanged
            self._device_data = DeviceResidentData(self.pipeline, mesh=self.mesh)
            self.log.info(
                f"device-resident dataset: {self._device_data.nbytes / 2**20:.0f} "
                f"MiB pinned in {time.time() - t0:.1f}s "
                "(one scan dispatch per epoch"
                + (f", sharded over {n_dev} devices)" if self.mesh is not None else ")")
            )
        self._fit_scaler()
        self._build_steps()
        if self.device_cache:
            from dcase2019_task4_tpu.train.steps import make_device_epoch

            self._epoch_fn = make_device_epoch(self.train_step, mesh=self.mesh)
        self._built = True
        return self

    def _scaler_cache_key(self) -> str:
        """Hash over everything that determines the scaler moments: the
        exact per-stream file lists (streams + splits + subpart already
        applied), the full DSP config, and the audio-source kind. Real-audio
        streams additionally fold each wav's (size, mtime_ns) into the key so
        a file replaced in place under the same name (re-download, fixed
        corrupt clip) invalidates the cached moments; synthetic streams are
        fully determined by (filename, variability) by construction."""
        import hashlib

        h = hashlib.sha1()
        h.update(repr(self.cfg.dsp).encode())
        h.update(repr(bool(self.synthetic_audio)).encode())
        if self.synthetic_audio:
            h.update(repr(float(self.synthetic_variability)).encode())
            if self.synthetic_bands:
                h.update(repr(sorted(self.synthetic_bands.items())).encode())
        for s in self.pipeline.streams:
            h.update(s.name.encode())
            for fn in s.filenames:
                h.update(fn.encode())
                if not self.synthetic_audio:
                    st = os.stat(s.source.path_for(fn))
                    h.update(f"{st.st_size},{st.st_mtime_ns}".encode())
        return h.hexdigest()[:16]

    def _fit_scaler(self):
        """Dataset-moment pass on device over all training streams
        (reference Scaler.calculate_scaler over the ConcatDataset,
        main.py:249-250 — equal weight per clip, features WITHOUT noise).
        Moments reduce on device; only [n_mels] vectors come back per batch.

        Set DCASE_SCALER_CACHE=<dir> to memoize the fit keyed by the stream
        file lists + per-file size/mtime + DSP config (_scaler_cache_key) —
        the moment pass streams every training
        clip through the host↔device link, which dominates setup time under
        the tunnel, and sweeps/ablations re-fit identical data per arm."""
        from dcase2019_task4_tpu.train.steps import make_scaler_stats

        cache_dir = os.environ.get("DCASE_SCALER_CACHE")
        cache_path = None
        if cache_dir:
            cache_path = os.path.join(cache_dir, f"scaler_{self._scaler_cache_key()}.json")
            if os.path.exists(cache_path):
                self.scaler.load(cache_path)
                self.log.info(f"scaler stats loaded from cache: {cache_path}")
                return

        self.log.info("fitting scaler (device pass over training features)")
        t0 = time.time()
        stats = make_scaler_stats(self.frontend)
        B = max(self.pipeline.batch_size, 8)
        d = self.cfg.dsp
        total = None
        total_sq = None
        count = 0
        if self._device_data is not None:
            # audio is already pinned in HBM (rows padded to a multiple of
            # B) — the whole moment pass is ONE jitted scan over [K, B]
            # chunk views: no host→device re-streaming, no per-chunk eager
            # ops (each would compile a separate program through the tunnel)
            dd = self._device_data
            n = dd.n_real
            K = dd.data["audio"].shape[0] // B

            @jax.jit
            def fit_all(audio, frames):
                a = audio.reshape(K, B, audio.shape[1])
                f = frames.reshape(K, B)
                nvs = jnp.minimum(n - jnp.arange(K) * B, B).astype(jnp.int32)

                def body(carry, xs):
                    s_tot, sq_tot = carry
                    ak, fk, nv = xs
                    s, sq = stats(ak, fk, nv)
                    return (s_tot + s, sq_tot + sq), None

                zero = jnp.zeros(self.cfg.dsp.n_mels, jnp.float32)
                (s, sq), _ = jax.lax.scan(body, (zero, zero), (a, f, nvs))
                return s, sq

            s, sq = fit_all(dd.data["audio"], dd.data["frames"])
            total = np.asarray(s, np.float64)
            total_sq = np.asarray(sq, np.float64)
            count = n
        else:
            for stream in self.pipeline.streams:
                for batch in iter_eval_batches(stream, B, d.max_samples, d.n_window, d.hop_length, d.max_frames):
                    nv = batch["n_valid"]
                    # one code path for full and tail batches: padded rows are
                    # masked on device by the traced n_valid scalar
                    s, sq = stats(batch["audio"], batch["frames"], jnp.int32(nv))
                    s, sq = np.asarray(s, np.float64), np.asarray(sq, np.float64)
                    total = s if total is None else total + s
                    total_sq = sq if total_sq is None else total_sq + sq
                    count += nv
        self.scaler.mean_ = total / count
        self.scaler.mean_of_square_ = total_sq / count
        self.scaler._finalize()
        self.log.info(f"scaler fit in {time.time() - t0:.1f}s ({count} clips)")
        if cache_path:
            os.makedirs(cache_dir, exist_ok=True)
            self.scaler.save(cache_path)
            self.log.info(f"scaler stats cached: {cache_path}")

    def _build_steps(self):
        t = self.cfg.train
        if len(self.pipeline) == 0:
            # loud failure instead of silently training 0 steps/epoch — easy
            # to hit with --data_parallel, where the global batch is the
            # per-device stream layout tiled by the mesh size
            sizes = {s.name: len(s) for s in self.pipeline.streams}
            raise ValueError(
                f"0 steps/epoch: global batch {self.pipeline.batch_size} "
                f"(per-stream {self.pipeline.sampler.batch_sizes}) exceeds "
                f"the available stream sizes {sizes} — lower the batch size, "
                "the mesh size, or raise --subpart_data"
            )
        # rampup_length = steps/epoch · n_epoch / 2 (main.py:72)
        rampup_length = len(self.pipeline) * t.n_epoch // 2
        if self.ramped_adam:
            # the reference's (commented-out) adjust_learning_rate recipe
            # (main.py:32-42,81) as a per-step optax schedule — --ramped_adam
            from dcase2019_task4_tpu.train.schedules import meanteacher_adam

            total_steps = len(self.pipeline) * t.n_epoch
            self.optimizer = meanteacher_adam(
                total_steps, rampup_length, max_learning_rate=t.lr,
            )
            self.log.info("using ramped-Adam schedule (train/schedules.py)")
        else:
            self.optimizer = optax.adam(t.lr, b1=t.beta1, b2=t.beta2, eps=t.adam_eps)
        mean, std = self.scaler.mean_std_f32
        sa_cfg = None
        if t.spec_augment:
            sa_cfg = dict(
                time_masks=t.sa_time_masks,
                max_time_width=t.sa_max_time_width,
                freq_masks=t.sa_freq_masks,
                max_freq_width=t.sa_max_freq_width,
            )
        self.train_step = make_train_step(
            self.model,
            self.optimizer,
            self.weak_slice,
            self.strong_slice,
            mean_teacher=self.mean_teacher,
            rampup_length=rampup_length,
            max_consistency_cost=t.max_consistency_cost,
            ema_alpha=t.ema_alpha,
            frontend=self.frontend,
            scaler_mean=mean,
            scaler_std=std,
            noise_std=t.noise_std if self.mean_teacher else 0.0,
            spec_augment_cfg=sa_cfg,
            mesh=self.mesh,
        )
        # eval/validation also shards over a mesh (shard_map — the Pallas
        # kernels have no GSPMD partitioning rules, a plain jit would gather
        # onto one device). Single-process: the training mesh. Multi-host:
        # eval batches are host-LOCAL numpy (each host scores its own
        # round-robin file shard, see above), so shard them over a local
        # mesh of this host's addressable devices — work divides by
        # (hosts × local devices), i.e. the total device count, and the
        # additive count merge keeps the metrics exact (eval-mode BN has no
        # cross-shard statistics).
        eval_mesh = None
        if self.mesh is not None:
            eval_devices = (
                self.mesh.devices.ravel()
                if self.process_count == 1
                else jax.local_devices()
            )
            if (
                len(eval_devices) > 1
                and self.pipeline.batch_size % len(eval_devices) == 0
            ):
                from dcase2019_task4_tpu.parallel.mesh import make_mesh

                eval_mesh = (
                    self.mesh
                    if self.process_count == 1
                    else make_mesh(eval_devices)
                )
        self.eval_mesh = eval_mesh
        self.eval_features = make_eval_features(self.frontend, mean, std,
                                                mesh=eval_mesh)
        self.predict_step = make_predict_step(self.model, mesh=eval_mesh)
        self.state = init_train_state(
            self.model, self.optimizer, jax.random.PRNGKey(self.seed), with_ema=self.mean_teacher
        )
        if self.mesh is not None:
            from dcase2019_task4_tpu.parallel.mesh import replicate_state

            self.state = replicate_state(self.state, self.mesh)

    # -------------------------------------------------------------- train

    def train_epoch(self, epoch: int) -> AverageMeterSet:
        """One epoch (reference train(), main.py:52-165): iterate the
        multi-stream batches, run the fused step, meter scalar losses,
        assert loss sanity on host (main.py:147-148)."""
        from dcase2019_task4_tpu.data.pipeline import device_prefetch

        meters = AverageMeterSet()
        rng = jax.random.PRNGKey(hash((self.seed, epoch)) % (2**31))
        start = time.time()
        if self._device_data is not None:
            # device-resident fast path: whole epoch in one scan dispatch,
            # same batches (same sampler), bit-identical RNG split chain
            dd = self._device_data
            idx = dd.epoch_indices(self.pipeline.sampler, epoch)
            acc = self.train_step.zero_metrics()
            self.state, acc = self._epoch_fn(self.state, dd.data, idx, rng, acc)
            n = idx.shape[0]
            sums = jax.device_get(acc)
            loss = float(sums["loss"]) / n
            assert not (np.isnan(loss) or loss > 1e5), f"Loss explosion: {loss}"
            assert loss >= 0, "Loss problem, cannot be negative"
            for k in self.train_step.metric_keys:
                meters.update(k, float(sums[k]) / n, n)
            self.log.info(f"Epoch: {epoch}\tTime {time.time() - start:.2f}\t{meters}")
            return meters
        n = 0
        sharding, put_fn = None, None
        if self.mesh is not None:
            from dcase2019_task4_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
            if self.process_count > 1:
                # per-host shards → global jax.Arrays over the multi-host mesh
                from dcase2019_task4_tpu.parallel.multihost import make_global_batch

                put_fn = lambda b: make_global_batch(b, self.mesh)  # noqa: E731
        acc = self.train_step.zero_metrics()
        host_iter = self.pipeline.iter_epoch(epoch, prefetch=self.cfg.train.num_prefetch)
        for batch in device_prefetch(host_iter, self.cfg.train.num_prefetch, sharding, put_fn):
            rng, sub = jax.random.split(rng)
            self.state, metrics, acc = self.train_step(self.state, batch, sub, acc)
            n += 1
            if n == 1 or n % 20 == 0 or n == len(self.pipeline):
                # host sync for the sanity asserts (main.py:147-148), amortized
                loss = float(metrics["loss"])
                assert not (np.isnan(loss) or loss > 1e5), f"Loss explosion: {loss}"
                assert loss >= 0, "Loss problem, cannot be negative"
        # exact per-batch epoch means from the on-device metric sums — one
        # fetch per epoch, matching the reference's AverageMeterSet over
        # every batch (main.py:106-150)
        if n:
            sums = jax.device_get(acc)
            for k in self.train_step.metric_keys:
                meters.update(k, float(sums[k]) / n, n)
        self.log.info(f"Epoch: {epoch}\tTime {time.time() - start:.2f}\t{meters}")
        return meters

    # ---------------------------------------------------------- validate

    def _eval_params(self):
        """(params, bn_state) homed where the eval steps run. Multi-host:
        train state is replicated over the GLOBAL mesh but eval shards over
        this host's LOCAL mesh — jit refuses mixed device sets, so re-home
        one replicated copy onto the local devices (fully-replicated
        arrays are locally addressable: np.asarray is a local read, no
        cross-host traffic; refreshed only when the train state changes)."""
        params, bn = self.state.params, self.state.bn_state
        if self.eval_mesh is not None and self.eval_mesh is not self.mesh:
            if getattr(self, "_eval_params_for", None) is not id(self.state):
                from dcase2019_task4_tpu.parallel.mesh import replicated

                rep = replicated(self.eval_mesh)
                self._eval_params_cache = jax.tree.map(
                    lambda x: jax.device_put(np.asarray(x), rep), (params, bn)
                )
                self._eval_params_for = id(self.state)
            params, bn = self._eval_params_cache
        return params, bn

    def predict_dataframe(self, stream: Stream, save_predictions: Optional[str] = None):
        """Batched inference + vectorized decode over a stream → prediction
        dataframe in seconds (replaces get_predictions,
        evaluation_measures.py:203-231)."""
        import pandas as pd

        d = self.cfg.dsp
        dfs = []
        params, bn = self._eval_params()
        for batch in iter_eval_batches(
            stream, self.pipeline.batch_size, d.max_samples, d.n_window, d.hop_length, d.max_frames
        ):
            x = self.eval_features(batch["audio"], batch["frames"])
            strong, _ = self.predict_step(params, bn, x)
            df = decode_batch(
                np.asarray(strong)[: batch["n_valid"]],
                batch["filenames"],
                self.codec,
                d.sample_rate,
                d.hop_length,
                self.cfg.model.pooling_time_ratio,
                threshold=0.5,
                median_window=self.cfg.train.median_window,
            )
            dfs.append(df)
        out = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame(
            columns=["event_label", "onset", "offset", "filename"]
        )
        return predictions_to_tsv(out, save_predictions)

    def weak_f1(self, stream: Stream) -> np.ndarray:
        """Per-class weak tagging F1 over a stream (get_f_measure_by_class,
        evaluation_measures.py:19-83). Multi-host: each host accumulates its
        local confusion counts, which are summed across hosts (additive, and
        F1 is count-scale-invariant, so this is exact for both sharded and
        redundantly-evaluated streams)."""
        from dcase2019_task4_tpu.eval.tagging import macro_f_measure

        d = self.cfg.dsp
        acc = TaggingF1(len(self.classes))
        params, bn = self._eval_params()
        for batch in iter_eval_batches(
            stream, self.pipeline.batch_size, d.max_samples, d.n_window, d.hop_length, d.max_frames
        ):
            x = self.eval_features(batch["audio"], batch["frames"])
            _, weak = self.predict_step(params, bn, x)
            nv = batch["n_valid"]
            acc.update(np.asarray(weak)[:nv], batch["target"][:nv])
        if self.process_count > 1:
            from dcase2019_task4_tpu.parallel.multihost import all_sum_hosts

            tp, fp, fn, _ = all_sum_hosts(np.stack([acc.tp, acc.fp, acc.fn, acc.tn]))
            return macro_f_measure(tp, fp, fn)
        return acc.per_class_f1()

    def _merged_strong_metrics(self, predictions):
        """Multi-host strong scoring: score the LOCAL shard of validation
        files, all-sum the additive count vectors across hosts, and rebuild
        global metrics — every host logs (and SaveBest reads) the same exact
        numbers as an unsharded run."""
        from dcase2019_task4_tpu.eval.sed_scores import (
            SedMetrics,
            event_based_metrics,
            segment_based_metrics,
        )
        from dcase2019_task4_tpu.parallel.multihost import all_sum_hosts

        ev_local = event_based_metrics(self.valid_synth_df, predictions)
        seg_local = segment_based_metrics(self.valid_synth_df, predictions, 1.0)
        ev = SedMetrics.from_counts(
            self.classes, "Event-based",
            all_sum_hosts(ev_local.count_vector(self.classes)),
        )
        seg = SedMetrics.from_counts(
            self.classes, "Segment-based",
            all_sum_hosts(seg_local.count_vector(self.classes)),
            segment_based=True,
        )
        self.log.info(str(ev))
        self.log.info(str(seg))
        return ev

    def validate(self, epoch: int) -> Dict[str, float]:
        if not self.mean_teacher:
            # the supervised recipe also reports per-epoch TRAIN-set metrics
            # (main_simple_CRNN.py:236-252): strong scoring on the training
            # synthetic stream and weak tagging F1 on the training weak stream
            names = [s.name for s in self.pipeline.streams]
            if "synthetic" in names:
                self.log.info("Training synthetic metric:")
                train_stream = self.pipeline.streams[names.index("synthetic")]
                train_predictions = self.predict_dataframe(train_stream)
                compute_strong_metrics(train_predictions, train_stream.manifest.df, self.log)
            if "weak" in names:
                self.log.info("Training weak metric:")
                weak_t = self.weak_f1(self.pipeline.streams[names.index("weak")])
                self.log.info(
                    f"Weak F1 per class: {dict(zip(self.classes, np.round(weak_t * 100, 2)))}"
                )
                self.log.info(f"Weak F1 macro averaged: {np.mean(weak_t):.4f}")
        self.log.info("### Valid synthetic metric ###")
        predictions = self.predict_dataframe(self.valid_synth_stream)
        if self.process_count > 1:
            event_metric = self._merged_strong_metrics(predictions)
        else:
            event_metric = compute_strong_metrics(predictions, self.valid_synth_df, self.log)
        self.log.info("### Valid weak metric ###")
        weak = self.weak_f1(self.valid_weak_stream)
        self.log.info(f"Weak F1 per class: {dict(zip(self.classes, np.round(weak * 100, 2)))}")
        self.log.info(f"Weak F1 macro averaged: {np.mean(weak):.4f}")
        event_macro = event_metric.results_class_wise_average_metrics()["f_measure"]["f_measure"]
        return {"event_macro_f1": event_macro, "weak_macro_f1": float(np.mean(weak))}

    # ----------------------------------------------------------- full run

    def checkpoint_metadata(self, epoch: int, valid: Dict) -> Dict:
        return {
            "epoch": epoch,
            "valid_metric": valid,
            "pooling_time_ratio": self.cfg.model.pooling_time_ratio,
            "scaler": self.scaler.state_dict(),
            "many_hot_encoder": self.codec.state_dict(),
            "config": ckpt.config_to_dict(self.cfg),
            "mean_teacher": self.mean_teacher,
        }

    def run(
        self,
        store_dir: Optional[str] = None,
        n_epoch: Optional[int] = None,
        resume_from: Optional[str] = None,
        early_stopping: Optional[int] = None,
        eval_every: int = 1,
    ) -> Dict:
        """The reference's 100-epoch loop with per-epoch validation,
        checkpointing and SaveBest on event-F1 + weak-F1 (main.py:316-354).
        `resume_from` restores a checkpoint (params, EMA, optimizer, step
        counter, scaler) and continues from the saved epoch — a true resume,
        which the reference lacks (SURVEY.md §5 checkpoint/resume).
        `early_stopping` = patience in epochs on the same SaveBest criterion
        (the reference defines EarlyStopping, utils/utils.py:286-334, but
        never wires it; here `--early_stopping N` makes it reachable).
        `eval_every` = validate/checkpoint/SaveBest only on every Nth epoch
        (and always the last) — host-side decode+scoring dominates epoch
        wall-clock at small step counts, so long-horizon runs (e.g. the SSL
        ablation's 3000+-step budget) thin it; 1 = reference parity."""
        if not self._built:
            self.build()
        t = self.cfg.train
        n_epoch = n_epoch if n_epoch is not None else t.n_epoch
        store_dir = store_dir or os.path.join(self.cfg.paths.store_dir, "run")
        model_dir = os.path.join(store_dir, "model")
        os.makedirs(model_dir, exist_ok=True)
        save_best = SaveBest("sup")
        stopper = EarlyStopping(early_stopping, "sup") if early_stopping is not None else None
        best_path = os.path.join(model_dir, "baseline_best")
        last_valid: Dict = {}
        start_epoch = 0
        if resume_from is not None:
            meta = self.restore(resume_from)
            start_epoch = int(meta["epoch"]) + 1
            self.log.info(f"resumed from {resume_from} at epoch {start_epoch}")
        from dcase2019_task4_tpu.utils.metrics_writer import MetricsWriter

        # structured per-epoch history (JSONL; append so --resume extends it).
        # Multi-host: only process 0 writes (all hosts compute identical
        # merged metrics).
        writer = MetricsWriter(
            os.path.join(store_dir, "metrics.jsonl") if self.process_index == 0 else None
        )
        for epoch in range(start_epoch, n_epoch):
            t0 = time.time()
            meters = self.train_epoch(epoch)
            if eval_every > 1 and (epoch + 1) % eval_every != 0 and epoch != n_epoch - 1:
                writer.write({
                    "epoch": epoch,
                    "epoch_time_s": round(time.time() - t0, 2),
                    **meters.averages(""),
                })
                continue
            last_valid = self.validate(epoch)
            if self.strong_slice is not None:
                global_valid = last_valid["event_macro_f1"] + last_valid["weak_macro_f1"]
            else:
                global_valid = last_valid["weak_macro_f1"]
            meta = self.checkpoint_metadata(epoch, last_valid)
            # multi-host: the train state is replicated and the merged
            # metrics are identical on every host, so process 0 is the ONLY
            # checkpoint writer — concurrent writers would race on the shared
            # `path + ".tmp"` staging file (checkpoints.py save_checkpoint).
            # save_best.apply still runs on every host (deterministic, keeps
            # is_best consistent for the final restore below).
            writer_host = self.process_index == 0
            if writer_host and t.checkpoint_epochs and (epoch + 1) % t.checkpoint_epochs == 0:
                ckpt.save_checkpoint(
                    os.path.join(model_dir, f"baseline_epoch_{epoch}"), self.state, meta
                )
            is_best = bool(t.save_best and save_best.apply(global_valid))
            if is_best and writer_host:
                ckpt.save_checkpoint(best_path, self.state, meta)
            writer.write({
                "epoch": epoch,
                "epoch_time_s": round(time.time() - t0, 2),
                **meters.averages(""),
                **last_valid,
                "global_valid": global_valid,
                "saved_best": is_best,
            })
            if stopper is not None and stopper.apply(global_valid):
                self.log.info(
                    f"early stopping at epoch {epoch}: no improvement over "
                    f"{stopper.best_val:.4f} (epoch {stopper.best_epoch}) for "
                    f"{early_stopping} epochs"
                )
                break
        writer.close()
        if self.process_count > 1:
            # readers must not open baseline_best before process 0's final
            # os.replace lands on the shared filesystem
            from dcase2019_task4_tpu.parallel.multihost import sync_hosts

            sync_hosts("checkpoints-flushed")
        if t.save_best and os.path.exists(best_path):
            self.state, meta = ckpt.restore_checkpoint(best_path, self.state)
            if self.mesh is not None:
                from dcase2019_task4_tpu.parallel.mesh import replicate_state

                self.state = replicate_state(self.state, self.mesh)
            self.log.info(f"testing model: {best_path} (epoch {meta['epoch']})")
        return last_valid

    # ------------------------------------------------------------ resume

    def restore(self, path: str):
        """Restore a checkpoint into this experiment: scaler moments first,
        then ALL step closures rebuilt around them (train featurize included),
        then the train state itself (the _build_steps re-init is overwritten)."""
        if not self._built:
            self.build()
        meta = ckpt.read_metadata(path)
        self.scaler.load_state_dict(meta["scaler"])
        self._build_steps()
        self.state, _ = ckpt.restore_checkpoint(path, self.state)
        if self.mesh is not None:
            from dcase2019_task4_tpu.parallel.mesh import replicate_state

            self.state = replicate_state(self.state, self.mesh)
        return meta
