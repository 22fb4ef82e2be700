"""TPU-native sound event detection framework (DCASE 2019 Task 4 / DESED).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
turpaultn/DCASE2019_task4: semi-supervised sound event detection with a
Mean-Teacher CRNN over weak / unlabeled / synthetic-strong data streams,
with an on-device fused log-mel frontend, jit-compiled training steps,
pjit/GSPMD data parallelism over a TPU mesh, vectorized event decoding,
and self-contained sed_eval-compatible scoring.

Layout:
  config    — dataclass configs (DSP, model, training, paths)
  data      — TSV manifests, label codec, audio IO, packed pipeline, sampler
  ops       — on-device DSP (fused mel frontend), median filter, GRU scan
  models    — functional CRNN (conv-BN-GLU-pool ×3 → BiGRU ×2 → heads)
  train     — losses, ramps, EMA, jitted steps, trainer loop, checkpoints
  eval      — decoding to events, SED metrics (event/segment-based), tagging F1
  parallel  — device mesh + sharding for data-parallel training
  utils     — logging, meters, scaler
"""

__version__ = "0.2.0"
