"""Optional on-disk feature cache (reference-style .npy layout).

The framework's default path computes features on device every step (no
cache, BASELINE.json north star). For workflows that want the reference's
precomputed-features layout (DatasetDcase2019Task4.extract_features_from_meta,
DatasetDcase2019Task4.py:233-269), this module batch-computes log-mel
features on the accelerator and writes one `<clip>.npy` per file under
  <feature_dir>/sr44100_win2048_hop511_mels64[_nolog]/features/
— the exact directory naming scheme of the reference
(DatasetDcase2019Task4.py:82-87) — and provides a Stream-compatible source
that reads them back.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from dcase2019_task4_tpu.utils.logger import get_logger

LOG = get_logger()


def cache_dir_name(dsp, save_log_feature: bool = True) -> str:
    name = (
        f"sr{dsp.sample_rate}_win{dsp.n_window}_hop{dsp.hop_length}_mels{dsp.n_mels}"
    )
    if not save_log_feature:
        name += "_nolog"
    return name


def precompute_features(
    manifest,
    source,
    cfg,
    base_feature_dir: Optional[str] = None,
    save_log_feature: bool = True,
    batch_size: int = 24,
) -> List[str]:
    """Featurize every clip of `manifest` on the accelerator and cache to
    .npy. Missing/corrupt audio is skipped with a logged error (reference
    behaviour). Returns the list of filenames actually cached."""
    import jax.numpy as jnp

    from dcase2019_task4_tpu.ops.mel import MelFrontend, host_reflect_pad

    d = cfg.dsp
    base = base_feature_dir or cfg.paths.feature_dir
    out_dir = os.path.join(base, cache_dir_name(d, save_log_feature), "features")
    os.makedirs(out_dir, exist_ok=True)
    fe = MelFrontend(
        sample_rate=d.sample_rate, n_window=d.n_window, hop_length=d.hop_length,
        n_mels=d.n_mels, f_min=d.f_min, f_max=d.f_max, max_frames=d.max_frames,
        amin=d.amin, top_db=d.top_db,
    )
    done: List[str] = []
    pending: List[tuple] = []

    def flush():
        if not pending:
            return
        names, clips = zip(*pending)
        padded, frames = host_reflect_pad(
            list(clips), d.max_samples, d.n_window, d.hop_length, d.max_frames
        )
        if save_log_feature:
            feats = np.asarray(fe.log_mel(jnp.asarray(padded), jnp.asarray(frames)))
        else:
            feats = np.asarray(fe.linear_mel(jnp.asarray(padded)))
        for name, nf, feat in zip(names, frames, feats):
            out = os.path.join(out_dir, os.path.splitext(name)[0] + ".npy")
            np.save(out, feat[:nf].astype(np.float32))
            done.append(name)
        pending.clear()

    for name in manifest.filenames:
        out = os.path.join(out_dir, os.path.splitext(name)[0] + ".npy")
        if os.path.exists(out):
            done.append(name)
            continue
        try:
            clip = source.get_audio(name)
        except (FileNotFoundError, ValueError, OSError) as e:
            LOG.error(f"File {name} is in the tsv file but audio is unavailable: {e}")
            continue
        pending.append((name, clip))
        if len(pending) >= batch_size:
            flush()
    flush()
    return done


class NpyFeatureSource:
    """Reads cached features (get_feature_file contract,
    DatasetDcase2019Task4.py:183-195). Exposes get_features (not audio);
    consumers use the precomputed-features mode of the train step."""

    def __init__(self, cfg, base_feature_dir: Optional[str] = None, save_log_feature: bool = True):
        base = base_feature_dir or cfg.paths.feature_dir
        self.dir = os.path.join(base, cache_dir_name(cfg.dsp, save_log_feature), "features")

    def get_features(self, filename: str) -> np.ndarray:
        return np.load(os.path.join(self.dir, os.path.splitext(filename)[0] + ".npy"))


def drop_missing_audio(manifest, source, logger=None):
    """Drop manifest rows whose audio is unreadable, with an error log per
    file — the reference's tolerance behaviour
    (DatasetDcase2019Task4.py:254-262). Returns a filtered Manifest."""
    from dcase2019_task4_tpu.data.manifests import manifest_from_df

    log = logger or LOG
    missing = []
    for name in manifest.filenames:
        try:
            if hasattr(source, "path_for"):
                if not os.path.isfile(source.path_for(name)):
                    raise FileNotFoundError(source.path_for(name))
            else:
                source.get_audio(name)
        except (FileNotFoundError, ValueError, OSError):
            log.error(f"File {name} is in the tsv file but the audio is not present!")
            missing.append(name)
    if not missing:
        return manifest
    df = manifest.df[~manifest.df["filename"].isin(set(missing))].reset_index(drop=True)
    return manifest_from_df(df)
