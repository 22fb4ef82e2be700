"""Checkpoint evaluation: the framework's TestModel equivalent
(TestModel.py:25-62): rebuild model + scaler + codec from a checkpoint,
run batched inference over a named TSV set, decode to a predictions TSV,
score with the native event/segment metrics and weak tagging F1."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
import optax

from dcase2019_task4_tpu.config import Config, DSPConfig, ModelConfig, PathsConfig, TrainConfig
from dcase2019_task4_tpu.data.audio_io import SyntheticAudioSource, WavAudioSource
from dcase2019_task4_tpu.data.encoder import LabelCodec
from dcase2019_task4_tpu.data.manifests import load_manifest, subpart_manifest
from dcase2019_task4_tpu.data.pipeline import Stream, iter_eval_batches
from dcase2019_task4_tpu.eval.decode import decode_batch, predictions_to_tsv
from dcase2019_task4_tpu.eval.sed_scores import compute_strong_metrics
from dcase2019_task4_tpu.eval.tagging import TaggingF1
from dcase2019_task4_tpu.models.crnn import CRNN
from dcase2019_task4_tpu.ops.mel import MelFrontend
from dcase2019_task4_tpu.train import checkpoints as ckpt
from dcase2019_task4_tpu.train.steps import init_train_state, make_eval_features, make_predict_step
from dcase2019_task4_tpu.utils.logger import get_logger
from dcase2019_task4_tpu.utils.scaler import Scaler


def config_from_metadata(meta: Dict) -> Config:
    c = meta["config"]
    return Config(
        paths=PathsConfig(**c["paths"]),
        dsp=DSPConfig(**c["dsp"]),
        model=ModelConfig(
            **{
                k: (tuple(tuple(x) if isinstance(x, list) else x for x in v) if isinstance(v, list) else v)
                for k, v in c["model"].items()
            }
        ),
        train=TrainConfig(**c["train"]),
    )


class _EvalState:
    """Minimal state bundle for inference (params + BN running stats)."""

    def __init__(self, params, bn_state):
        self.params = params
        self.bn_state = bn_state


class CheckpointEvaluator:
    def __init__(self, ckpt_path: Optional[str] = None, synthetic_audio: bool = False,
                 logger=None, _prebuilt=None, mesh=None):
        self.log = logger or get_logger()
        if _prebuilt is not None:
            (self.cfg, self.model, self.state, self.scaler, self.codec, self.meta) = _prebuilt
        else:
            meta = ckpt.read_metadata(ckpt_path)
            self.cfg = config_from_metadata(meta)
            self.meta = meta
            self.codec = LabelCodec.load_state_dict(meta["many_hot_encoder"])
            self.scaler = Scaler().load_state_dict(meta["scaler"])
            self.model = CRNN(self.cfg.model)
            optimizer = optax.adam(self.cfg.train.lr)
            template = init_train_state(
                self.model, optimizer, jax.random.PRNGKey(0),
                with_ema=meta.get("mean_teacher", True),
            )
            self.state, _ = ckpt.restore_checkpoint(ckpt_path, template)
            self.log.info(f"Model loaded at epoch: {meta['epoch']}")
        d = self.cfg.dsp
        self.frontend = MelFrontend(
            sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
            n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
            amin=d.amin, top_db=d.top_db,
        )
        mean, std = self.scaler.mean_std_f32
        # mesh: shard eval batches over the devices (shard_map — exact for
        # eval-mode BN); requires the batch size to divide the device count
        if mesh is not None and self.cfg.train.batch_size % mesh.devices.size != 0:
            self.log.warning(
                f"eval batch {self.cfg.train.batch_size} not divisible by "
                f"{mesh.devices.size} devices — running unsharded"
            )
            mesh = None
        self.eval_features = make_eval_features(self.frontend, mean, std, mesh=mesh)
        self.predict = make_predict_step(self.model, mesh=mesh)
        self.synthetic_audio = synthetic_audio

    @classmethod
    def from_torch_checkpoint(cls, path: str, synthetic_audio: bool = False, logger=None,
                              mesh=None):
        """Evaluate a reference torch.save checkpoint (TestModel.py's input
        format) by importing its weights (train/torch_import.py)."""
        from dcase2019_task4_tpu.train.torch_import import import_reference_checkpoint

        model, params, bn_state, scaler, codec, ptr = import_reference_checkpoint(path)
        cfg = Config(model=model.cfg)
        meta = {"epoch": "torch-import", "pooling_time_ratio": ptr, "mean_teacher": True}
        state = _EvalState(params, bn_state)
        return cls(
            synthetic_audio=synthetic_audio, logger=logger,
            _prebuilt=(cfg, model, state, scaler, codec, meta), mesh=mesh,
        )

    def _stream(self, tsv_path: str, subpart: Optional[int]) -> Stream:
        m = subpart_manifest(load_manifest(tsv_path), subpart)
        if self.synthetic_audio:
            src = SyntheticAudioSource(m, self.codec.labels, self.cfg.dsp.sample_rate,
                                       self.cfg.dsp.max_len_seconds)
        else:
            src = WavAudioSource(self.cfg.paths.audio_dir_for_meta(tsv_path),
                                 self.cfg.dsp.sample_rate)
        return Stream(
            "eval", m, src, self.codec, self.cfg.dsp.sample_rate,
            self.cfg.dsp.hop_length, self.meta["pooling_time_ratio"],
        )

    def load_thresholds(self, path: str) -> np.ndarray:
        """Read a per-class decode threshold vector from JSON — either a
        {class: threshold} dict (keys matched to the codec's label order;
        the format --save_thresholds writes) or a bare [C] list."""
        import json

        with open(path) as f:
            raw = json.load(f)
        if isinstance(raw, dict):
            missing = [c for c in self.codec.labels if c not in raw]
            if missing:
                raise ValueError(f"thresholds file {path} missing classes: {missing}")
            return np.asarray([float(raw[c]) for c in self.codec.labels])
        th = np.asarray(raw, dtype=np.float64)
        if th.shape != (len(self.codec.labels),):
            raise ValueError(
                f"thresholds list has shape {th.shape}, expected ({len(self.codec.labels)},)"
            )
        return th

    def load_windows(self, path: str) -> np.ndarray:
        """Per-class median-window vector from JSON ({class: window} dict —
        the format --save_thresholds writes alongside as *.event_windows —
        or a bare [C] list of odd ints)."""
        import json

        with open(path) as f:
            raw = json.load(f)
        if isinstance(raw, dict):
            missing = [c for c in self.codec.labels if c not in raw]
            if missing:
                raise ValueError(f"windows file {path} missing classes: {missing}")
            w = np.asarray([int(raw[c]) for c in self.codec.labels])
        else:
            w = np.asarray(raw, dtype=np.int64)
            if w.shape != (len(self.codec.labels),):
                raise ValueError(
                    f"windows list has shape {w.shape}, expected ({len(self.codec.labels)},)"
                )
        if np.any(w % 2 == 0):
            raise ValueError(f"median windows must be odd, got {w.tolist()}")
        return w

    def predict_set(self, source_path: str, save_predictions_fname: str,
                    subpart: Optional[int] = None,
                    weak_fname: Optional[str] = None,
                    weak_threshold: float = 0.5,
                    threshold=0.5, median_window=None) -> Dict:
        """Groundtruth-free batched inference (serving surface — goes beyond
        the reference, whose TestModel.py:25-62 always scores against labels).

        `source_path` is either a directory of wavs or a filename TSV (any of
        the three schemas; labels, if present, are ignored). Emits the strong
        event predictions TSV in the exact get_predictions format
        (evaluation_measures.py:216-230) and, optionally, a weak clip-tagging
        TSV (`filename⇥event_labels`, classes whose attention-pooled
        probability clears `weak_threshold` — a scalar or a per-class [C]
        vector, e.g. the tuned tagging thresholds from load_thresholds —
        the reference's weak TSV schema).
        `threshold` is the strong-decode binarization — a scalar or a
        per-class [C] vector (class_threshold mode,
        evaluation_measures.py:60-66; see load_thresholds).
        """
        import os

        import pandas as pd

        from dcase2019_task4_tpu.data.manifests import Manifest, load_manifest

        d = self.cfg.dsp
        if os.path.isdir(source_path):
            names = sorted(
                f for f in os.listdir(source_path) if f.lower().endswith(".wav")
            )
            manifest = Manifest(
                kind="unlabeled", filenames=names, df=pd.DataFrame({"filename": names})
            )
            audio_dir = source_path
        else:
            manifest = load_manifest(source_path)
            audio_dir = self.cfg.paths.audio_dir_for_meta(source_path)
        manifest = subpart_manifest(manifest, subpart)
        if self.synthetic_audio:
            src = SyntheticAudioSource(manifest, self.codec.labels, d.sample_rate,
                                       d.max_len_seconds)
        else:
            src = WavAudioSource(audio_dir, d.sample_rate)
        stream = Stream("predict", manifest, src, self.codec, d.sample_rate,
                        d.hop_length, self.meta["pooling_time_ratio"])
        params, bn = self.state.params, self.state.bn_state
        dfs, weak_rows = [], []
        for batch in iter_eval_batches(
            stream, self.cfg.train.batch_size, d.max_samples, d.n_window,
            d.hop_length, d.max_frames
        ):
            x = self.eval_features(batch["audio"], batch["frames"])
            strong, weak = self.predict(params, bn, x)
            nv = batch["n_valid"]
            dfs.append(
                decode_batch(
                    np.asarray(strong)[:nv], batch["filenames"], self.codec,
                    d.sample_rate, d.hop_length, self.meta["pooling_time_ratio"],
                    threshold=threshold, median_window=(
                        self.cfg.train.median_window if median_window is None
                        else median_window
                    ),
                )
            )
            if weak_fname:
                w = np.asarray(weak)[:nv]
                for fname, probs in zip(batch["filenames"][:nv], w):
                    tags = [self.codec.labels[i] for i in np.nonzero(probs > weak_threshold)[0]]
                    weak_rows.append((fname, ",".join(tags)))
        predictions = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame(
            columns=["event_label", "onset", "offset", "filename"]
        )
        self.log.info(f"Saving predictions at: {save_predictions_fname}")
        predictions_to_tsv(predictions, save_predictions_fname)
        if weak_fname:
            pd.DataFrame(weak_rows, columns=["filename", "event_labels"]).to_csv(
                weak_fname, sep="\t", index=False
            )
            self.log.info(f"Saving weak tags at: {weak_fname}")
        return {"predictions": predictions, "n_files": len(stream)}

    def predict_long(self, source_path: str, save_predictions_fname: str,
                     subpart: Optional[int] = None,
                     threshold=0.5, merge_gap: float = 0.2,
                     clamp_to_duration: bool = True,
                     overlap: bool = False, median_window=None) -> Dict:
        """Arbitrary-length wav inference (long-audio serving surface).

        The reference truncates every clip to max_frames before the model
        (PadOrTrunc, DataLoad.py:210-259) — audio past 10 s is silently
        dropped. Here each file is cut into the model's native
        `max_len_seconds` windows (static shapes, so one compiled program
        serves any duration), windows are batched across files, decoded
        independently, events are shifted by their window start, and
        same-class fragments abutting a window boundary are stitched
        (`merge_gap` seconds; eval/decode.merge_window_events). With
        `clamp_to_duration`, events are cut at the true file length (the
        last window is zero-padded past it).

        `overlap` is the higher-quality mode: windows advance by HALF a
        window (starts aligned to the pooled-frame grid), per-frame class
        probabilities are averaged where windows overlap, and each file is
        decoded ONCE over its assembled full-length probability timeline —
        the median filter then runs across window boundaries and no
        fragment stitching is needed (merge_gap is ignored).
        """
        import os

        import pandas as pd

        from dcase2019_task4_tpu.data.manifests import Manifest, load_manifest
        from dcase2019_task4_tpu.data.pipeline import quantize_audio_int16
        from dcase2019_task4_tpu.eval.decode import merge_window_events
        from dcase2019_task4_tpu.ops.mel import host_reflect_pad

        d = self.cfg.dsp
        if os.path.isdir(source_path):
            names = sorted(
                f for f in os.listdir(source_path) if f.lower().endswith(".wav")
            )
            manifest = Manifest(
                kind="unlabeled", filenames=names, df=pd.DataFrame({"filename": names})
            )
            audio_dir = source_path
        else:
            manifest = load_manifest(source_path)
            audio_dir = self.cfg.paths.audio_dir_for_meta(source_path)
        manifest = subpart_manifest(manifest, subpart)
        if self.synthetic_audio:
            src = SyntheticAudioSource(manifest, self.codec.labels, d.sample_rate,
                                       d.max_len_seconds)
        else:
            src = WavAudioSource(audio_dir, d.sample_rate)

        window = d.max_samples
        ptr = self.meta["pooling_time_ratio"]
        frame_samples = d.hop_length * ptr       # samples per pooled output frame
        win_frames = d.max_frames // ptr         # pooled frames per window
        if overlap:
            # half-window hop, snapped to the pooled-frame grid so window
            # outputs land on integer frame offsets of the file timeline
            hop_samples = max(1, win_frames // 2) * frame_samples
        else:
            hop_samples = window
        # (filename, window_start_sec, window_start_pooled_frame, audio)
        jobs = []
        durations = {}
        for fname in manifest.filenames:
            audio = np.asarray(src.get_audio(fname), dtype=np.float32)
            durations[fname] = len(audio) / d.sample_rate
            n_win = 1 + max(0, -(-(len(audio) - window) // hop_samples))
            for w in range(n_win):
                s0 = w * hop_samples
                jobs.append((fname, s0 / d.sample_rate, s0 // frame_samples,
                             audio[s0:s0 + window]))

        B = self.cfg.train.batch_size
        params, bn = self.state.params, self.state.bn_state
        dfs = []
        probs_by_file: Dict[str, list] = {}
        for start in range(0, len(jobs), B):
            chunk = jobs[start:start + B]
            n_valid = len(chunk)
            while len(chunk) < B:  # pad tail batch (sliced off below)
                chunk.append(chunk[-1])
            padded, frames = host_reflect_pad(
                [c[3] for c in chunk], window, d.n_window, d.hop_length, d.max_frames
            )
            x = self.eval_features(quantize_audio_int16(padded), frames)
            strong, _ = self.predict(params, bn, x)
            strong = np.asarray(strong)[:n_valid]
            if overlap:
                for (fname, _, sf, _), p in zip(chunk[:n_valid], strong):
                    probs_by_file.setdefault(fname, []).append((int(sf), p))
                continue
            # composite row keys keep same-file windows apart through decode
            keys = [f"{i}\x00{c[0]}" for i, c in enumerate(chunk)]
            df = decode_batch(
                strong, keys[:n_valid], self.codec,
                d.sample_rate, d.hop_length, ptr,
                threshold=threshold, median_window=(
                    self.cfg.train.median_window if median_window is None
                    else median_window
                ),
            )
            if not df.empty:
                idx = df["filename"].str.split("\x00", n=1)
                offsets = np.asarray([chunk[int(i[0])][1] for i in idx])
                df["filename"] = [i[1] for i in idx]
                df["onset"] = df["onset"] + offsets
                df["offset"] = df["offset"] + offsets
            dfs.append(df)
        if overlap:
            from scipy.ndimage import median_filter

            from dcase2019_task4_tpu.eval.decode import grids_to_dataframe

            th = np.asarray(threshold)
            for fname in manifest.filenames:
                entries = probs_by_file.get(fname, [])
                if not entries:
                    continue
                Tn = max(sf for sf, _ in entries) + win_frames
                buf = np.zeros((Tn, len(self.codec.labels)), dtype=np.float64)
                cnt = np.zeros((Tn, 1), dtype=np.float64)
                for sf, p in entries:
                    buf[sf:sf + win_frames] += p
                    cnt[sf:sf + win_frames] += 1.0
                avg = buf / np.maximum(cnt, 1.0)
                binary = (avg > th).astype(np.float32)
                mw = (self.cfg.train.median_window if median_window is None
                      else median_window)
                if np.ndim(mw) == 0:
                    med = median_filter(binary, size=(int(mw), 1))
                else:  # per-class windows (tuner output): filter per column
                    med = np.stack([
                        median_filter(binary[:, c], size=int(w))
                        for c, w in enumerate(np.asarray(mw).reshape(-1))
                    ], axis=1)
                dfs.append(grids_to_dataframe(
                    med[None], [fname], self.codec,
                    d.sample_rate, d.hop_length, ptr,
                ))
        predictions = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame(
            columns=["event_label", "onset", "offset", "filename"]
        )
        if not overlap:
            predictions = merge_window_events(predictions, merge_gap)
        if clamp_to_duration and not predictions.empty:
            dur = predictions["filename"].map(durations)
            predictions = predictions[predictions["onset"] < dur].copy()
            predictions["offset"] = np.minimum(
                predictions["offset"], dur[predictions.index]
            )
        self.log.info(f"Saving predictions at: {save_predictions_fname}")
        predictions_to_tsv(predictions, save_predictions_fname)
        return {
            "predictions": predictions,
            "n_files": len(manifest.filenames),
            "n_windows": len(jobs),
        }

    def test_model(self, tsv_path: str, subpart: Optional[int] = None,
                   save_predictions_fname: Optional[str] = None,
                   tune_thresholds: bool = False,
                   threshold=0.5, median_window=None) -> Dict:
        """Full evaluation of one TSV set (reference test_model,
        TestModel.py:25-62): strong decode + event/segment metrics + weak F1.
        `tune_thresholds` additionally grid-searches (a) per-class weak
        tagging thresholds and (b) per-class STRONG-decode thresholds +
        median windows maximizing event-based F1 on this set
        (eval/thresholds.py), reporting both tuned scores. `median_window`
        is a scalar or a per-class [C] vector (the tuner's persisted
        windows; None → the config default)."""
        import pandas as pd

        if median_window is None:
            median_window = self.cfg.train.median_window
        self.log.info(tsv_path)
        stream = self._stream(tsv_path, subpart)
        d = self.cfg.dsp
        dfs, acc = [], TaggingF1(len(self.codec.labels))
        weak_probs, weak_targets = [], []
        strong_probs, strong_fnames = [], []
        params, bn = self.state.params, self.state.bn_state
        for batch in iter_eval_batches(
            stream, self.cfg.train.batch_size, d.max_samples, d.n_window, d.hop_length, d.max_frames
        ):
            x = self.eval_features(batch["audio"], batch["frames"])
            strong, weak = self.predict(params, bn, x)
            nv = batch["n_valid"]
            dfs.append(
                decode_batch(
                    np.asarray(strong)[:nv], batch["filenames"], self.codec,
                    d.sample_rate, d.hop_length, self.meta["pooling_time_ratio"],
                    threshold=threshold, median_window=median_window,
                )
            )
            acc.update(np.asarray(weak)[:nv], batch["target"][:nv])
            if tune_thresholds:
                weak_probs.append(np.asarray(weak)[:nv])
                weak_targets.append(batch["target"][:nv])
                strong_probs.append(np.asarray(strong)[:nv])
                strong_fnames.extend(batch["filenames"][:nv])
        predictions = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame(
            columns=["event_label", "onset", "offset", "filename"]
        )
        if save_predictions_fname:
            self.log.info(f"Saving predictions at: {save_predictions_fname}")
            predictions_to_tsv(predictions, save_predictions_fname)
        event_metric = compute_strong_metrics(predictions, stream.manifest.df, self.log)
        weak_f1 = acc.per_class_f1()
        self.log.info(f"Weak F1-score per class: {dict(zip(self.codec.labels, np.round(weak_f1*100,2)))}")
        self.log.info(f"Weak F1-score macro averaged: {np.mean(weak_f1):.4f}")
        out = {
            "event_macro_f1": event_metric.results_class_wise_average_metrics()["f_measure"]["f_measure"],
            "weak_macro_f1": float(np.mean(weak_f1)),
            "predictions": predictions,
        }
        if tune_thresholds and weak_probs:
            from dcase2019_task4_tpu.eval.thresholds import (
                tune_event_thresholds,
                tune_weak_thresholds,
            )

            th, tuned_f1 = tune_weak_thresholds(
                np.concatenate(weak_probs), np.concatenate(weak_targets)
            )
            self.log.info(
                f"Tuned per-class thresholds: {dict(zip(self.codec.labels, np.round(th, 2)))}"
            )
            self.log.info(f"Tuned weak F1 macro averaged: {np.mean(tuned_f1):.4f}")
            out["tuned_thresholds"] = th.tolist()
            out["tuned_weak_macro_f1"] = float(np.mean(tuned_f1))
            ev = tune_event_thresholds(
                np.concatenate(strong_probs), strong_fnames,
                stream.manifest.df, self.codec,
                d.sample_rate, d.hop_length, self.meta["pooling_time_ratio"],
                median_windows=(3, 5, 7),
            )
            self.log.info(
                "Tuned per-class EVENT thresholds: "
                f"{dict(zip(self.codec.labels, np.round(ev['thresholds'], 2)))} "
                f"windows {dict(zip(self.codec.labels, ev['windows'].tolist()))}"
            )
            self.log.info(
                f"Tuned event F1 macro averaged: {ev['macro_f1']:.4f} "
                f"(decode-default 0.5/5: {ev['default_macro_f1']:.4f})"
            )
            out["tuned_event_thresholds"] = np.asarray(ev["thresholds"]).tolist()
            out["tuned_event_windows"] = np.asarray(ev["windows"]).tolist()
            out["tuned_event_macro_f1"] = ev["macro_f1"]
        return out
