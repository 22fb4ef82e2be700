"""Ahead-of-time serving export via ``jax.export`` (StableHLO).

Serializes the COMPLETE serving function — int16/f32 PCM audio in, event
probabilities out — as ONE self-contained artifact: the fused log-mel
frontend, dataset-scaler normalization, and CRNN forward (eval-mode BN)
are traced once with the checkpoint's weights baked in as constants,
lowered to StableHLO, and written with jax.export's versioned
serialization. Loading needs only jax (``load_serving``): no framework
code, no checkpoint parsing, no pickle — the artifact compiles on the
target device at load time and is covered by jax.export's cross-version
compatibility guarantees.

The reference has no deployment story at all — its TestModel.py:25-62
re-instantiates torch modules from a pickled state dict inside the full
training repo. This module is the TPU-native equivalent of a serving
export (what torch users reach for TorchScript/ONNX for).

Input contract (matches the training/eval pipeline, data/pipeline.py
``_pack_audio``): ``audio`` is ``[B, max_samples + n_window]`` int16 PCM
(or f32 in [-1, 1]) with each clip reflect-padded by n_window//2 around
its own boundary (ops/mel.py ``host_reflect_pad``), ``frames`` is ``[B]``
int32 valid-frame counts. Outputs: ``(strong [B, T/pool, nclass] probs,
weak [B, nclass] probs)``.

Platform notes: the artifact is exported for the platform(s) it is lowered
for — by default the one jax is running on. The Pallas kernel strategies
lower to TPU-specific custom calls (jax guarantees serialization stability
for Mosaic); the XLA kernel path exports everywhere and is what a
multi-platform export should use.
"""

import json
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from dcase2019_task4_tpu.train.steps import dequantize_audio

# artifact container: a tiny self-describing header + the jax.export blob,
# so load_serving can sanity-check shapes without tracing anything
_MAGIC = b"DC19SERVE1\n"


def build_serve_fn(model, params, bn_state, frontend, scaler_mean, scaler_std):
    """The full serving computation as one function of (audio, frames);
    weights/normalization are closure constants (baked into the export)."""
    mean = jnp.asarray(scaler_mean, jnp.float32)
    std = jnp.asarray(scaler_std, jnp.float32)

    def serve(audio, frames):
        x = frontend.log_mel(dequantize_audio(audio), frames)
        x = (x - mean) / std
        strong, weak, _ = model.apply(params, bn_state, x, train=False)
        return strong, weak

    return serve


def export_serving(
    evaluator,
    out_path: str,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    audio_dtype=jnp.int16,
    disabled_checks: Sequence = (),
) -> dict:
    """Export `evaluator`'s serving function (CheckpointEvaluator — built
    from a native or imported-torch checkpoint) to `out_path`. Returns the
    artifact's header dict (shapes, classes, frame math)."""
    cfg = evaluator.cfg
    d = cfg.dsp
    B = int(batch_size or cfg.train.batch_size)
    mean, std = evaluator.scaler.mean_std_f32
    serve = build_serve_fn(
        evaluator.model, evaluator.state.params, evaluator.state.bn_state,
        evaluator.frontend, mean, std,
    )
    audio_spec = jax.ShapeDtypeStruct((B, d.max_samples + d.n_window), audio_dtype)
    frames_spec = jax.ShapeDtypeStruct((B,), jnp.int32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if disabled_checks:
        kwargs["disabled_checks"] = tuple(disabled_checks)
    exported = jax_export.export(jax.jit(serve), **kwargs)(audio_spec, frames_spec)
    header = {
        "batch_size": B,
        "audio_shape": [B, d.max_samples + d.n_window],
        "audio_dtype": np.dtype(audio_dtype).name if audio_dtype != jnp.bfloat16
        else "bfloat16",
        "n_frames_max": d.max_frames,
        "pooling_time_ratio": int(evaluator.meta["pooling_time_ratio"]),
        "frames_per_second": d.frames_per_second,
        "labels": list(evaluator.codec.labels),
        "platforms": list(exported.platforms),
    }
    blob = exported.serialize()
    hdr = json.dumps(header).encode()
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        f.write(blob)
    return header


class ServingModel:
    """A deserialized serving artifact: `header` metadata + a jit-compiled
    `__call__(audio, frames) -> (strong_probs, weak_probs)`."""

    def __init__(self, header: dict, exported):
        self.header = header
        self.exported = exported
        self._call = jax.jit(exported.call)

    def __call__(self, audio, frames) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._call(jnp.asarray(audio), jnp.asarray(frames, jnp.int32))


def load_serving(path: str) -> ServingModel:
    """Load an artifact written by `export_serving`. Only jax is required —
    no model classes, configs, or checkpoint readers."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a dcase19 serving artifact")
        n = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(n).decode())
        blob = f.read()
    return ServingModel(header, jax_export.deserialize(blob))
