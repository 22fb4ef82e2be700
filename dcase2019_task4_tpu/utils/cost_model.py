"""Analytic FLOP / HBM-byte model of the fused Mean-Teacher train step.

Purpose: make the throughput claim auditable against hardware peak from
BENCH_r*.json alone — bench.py emits `mfu_pct` and `hbm_util_pct` computed
from this model and the measured step time (VERDICT r2 item 7).

Two deliberately different accounting conventions:

* `model_flops` counts MODEL flops (the standard MFU convention): the
  matmul/conv/GRU/head arithmetic the architecture requires, independent of
  how kernels implement it. The on-device feature frontend's windowed DFT +
  mel projection IS model work here (the framework's defining feature — the
  reference does it on the host with librosa, DatasetDcase2019Task4.py:197-231)
  and is counted; implementation tricks that ADD flops to save bandwidth
  (pooling as MXU matmuls against 0/1 expansion matrices, im2col patch
  duplication) are NOT counted. Elementwise work (BN, sigmoid, losses, Adam,
  EMA) is ignored — on the MXU-flop scale it is noise.

* `hbm_bytes` models the step's main-memory traffic for the DEFAULT kernel
  configuration (fused Pallas STFT→mel, packed im2col entry conv, fused
  BN→GLU→dropout→pool blocks with the two-pass custom VJP, packed interior
  convs) by enumerating every large tensor each pass writes/reads, matching
  the per-pass structure documented in docs/PERF.md. Small traffic
  (parameters, optimizer state, GRU activations, DFT bases, stats vectors)
  is lumped with an explicit allowance. This is a model, not a measurement:
  expect it to be a mild UNDER-estimate (XLA spills/temporaries are not
  modeled), so `hbm_util_pct` is a lower bound.

Peaks: TPU v5e (the bench chip) — 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

from __future__ import annotations

from dcase2019_task4_tpu.config import Config

# TPU v5e ("TPU v5 lite") public peak numbers
V5E_PEAK_FLOPS_BF16 = 197e12
V5E_PEAK_HBM_BYTES_PER_S = 819e9


def _conv_stack_dims(cfg: Config):
    """Yield (t_in, f_in, c_in, c_out, kernel, pool) per conv block."""
    m = cfg.model
    t, f, c_in = cfg.dsp.max_frames, cfg.dsp.n_mels, m.n_in_channel
    for i, c_out in enumerate(m.nb_filters):
        yield t, f, c_in, c_out, m.kernel_size[i], m.pooling[i]
        t //= m.pooling[i][0]
        f //= m.pooling[i][1]
        c_in = c_out


def model_flops(cfg: Config, batch: int, mean_teacher: bool = True) -> dict:
    """Per-step model FLOPs, itemized. Backward = 2x forward for every
    param-bearing student op (dx + dw); the teacher is forward-only; the
    frontend is not differentiated (features do not depend on params)."""
    d, m = cfg.dsp, cfg.model
    B, T = batch, d.max_frames
    K = d.n_window // 2 + 1  # spectrum bins

    # windowed DFT as cos+sin projections (one clean featurization; the
    # teacher's noise is added to the linear mel, ops/mel.py log_mel_pair)
    frontend = 2 * B * T * d.n_window * K * 2 + 2 * B * T * K * d.n_mels

    conv = glu = 0
    for t, f, c_in, c_out, ks, _pool in _conv_stack_dims(cfg):
        conv += 2 * B * t * f * (ks * ks * c_in) * c_out
        if m.activation in ("glu", "cg"):
            glu += 2 * B * t * f * c_out * c_out  # 1x1 dense gate
    t_r, f_r, c_r = T, d.n_mels, m.nb_filters[-1]
    for _t, _f, _ci, _co, _k, pool in _conv_stack_dims(cfg):
        t_r //= pool[0]
        f_r //= pool[1]

    H, gru = m.n_rnn_cell, 0
    d_in = c_r * f_r  # freq squeezed (flattened if f_r > 1, models/crnn.py)
    for layer in range(m.n_layers_rnn):
        gru += 2 * (2 * B * t_r * 3 * H * (d_in + H))  # both directions
        d_in = 2 * H
    heads = 2 * (2 * B * t_r * 2 * H * m.nclass)  # dense + dense_softmax

    fwd = conv + glu + gru + heads
    total = frontend + 3 * fwd + (fwd if mean_teacher else 0)
    return {
        "frontend": frontend, "conv_fwd": conv, "glu_fwd": glu,
        "gru_fwd": gru, "heads_fwd": heads,
        "student_fwd_bwd": 3 * fwd, "teacher_fwd": fwd if mean_teacher else 0,
        "total": total,
    }


def hbm_bytes(cfg: Config, batch: int, mean_teacher: bool = True,
              bwd_recompute: bool = False) -> dict:
    """Per-step HBM traffic model for the default kernel path, itemized.

    `bwd_recompute` mirrors DCASE_FUSED_BWD_RECOMPUTE=1 (ops/fused_block.py):
    the backward fixup rebuilds dxn instead of round-tripping dy_partial.
    """
    d, m = cfg.dsp, cfg.model
    B, T = batch, d.max_frames
    bf = 2 if m.compute_dtype == "bfloat16" else 4
    n_models = 2 if mean_teacher else 1
    samples = d.max_samples + d.n_window

    out = {}
    # ---- frontend (fused Pallas STFT→mel, ops/fused_mel.py) -------------
    # int16 feed read + dequantized f32 write/read + two log-mel outputs
    # (student clean / teacher noisy) written then read by the entry convs
    out["frontend"] = (
        B * samples * 2                       # int16 read
        + 2 * B * samples * 4                 # f32 dequant write + kernel read
        + 2 * n_models * B * T * d.n_mels * bf  # mel pair write + read
    )

    blocks = list(_conv_stack_dims(cfg))
    t0, f0, _c0, c_out0, ks0, pool0 = blocks[0]
    k_pack = max(1, 128 // c_out0)
    conv1 = B * t0 * f0 * c_out0 * bf          # entry-conv activation (packed)
    patch = B * t0 * (f0 // k_pack) * 128 * bf  # im2col patch tensor (lane-padded)
    pooled1 = conv1 // (pool0[0] * pool0[1])

    # ---- entry conv (XLA packed im2col, models/layers.py) ---------------
    # fwd per model: patch write+read, conv-out write; student bwd: d(conv)
    # write by block-1 VJP, then wgrad reads patch + d(conv)
    out["entry_conv_fwd"] = n_models * (2 * patch + conv1)
    out["entry_conv_bwd"] = conv1 + (patch + conv1)

    # ---- block-1 fused BN→GLU→dropout→pool (ops/fused_block.py) ---------
    # fwd per model: read conv-out, write pooled tile
    out["block1_fwd"] = n_models * (conv1 + pooled1)
    # student bwd: default = reduce(read y + dout, write dy_partial) +
    # fixup(read y + dy_partial, write dy) = 5 big + 1 pooled;
    # recompute = reduce(read y + dout) + fixup(read y + dout, write dy)
    out["block1_bwd"] = (3 * conv1 + 2 * pooled1) if bwd_recompute \
        else (5 * conv1 + pooled1)

    # ---- interior blocks (packed Pallas convs + fused blocks) -----------
    inner = 0
    for t, f, c_in, c_out, _ks, pool in blocks[1:]:
        x_in = B * t * f * c_in * bf           # block input (= prev pooled)
        conv_i = B * t * f * c_out * bf        # conv-out at input resolution
        pooled_i = conv_i // (pool[0] * pool[1])
        # fwd per model: conv reads input + writes conv-out; fused block
        # reads conv-out + writes pooled
        inner += n_models * (x_in + 2 * conv_i + pooled_i)
        # student bwd: fused-block VJP passes over conv-out, then conv
        # dx (read d(conv-out), write dx) + wgrad (read input + d(conv-out))
        block_bwd = (3 * conv_i + 2 * pooled_i) if bwd_recompute \
            else (5 * conv_i + pooled_i)
        inner += block_bwd + (conv_i + x_in) + (x_in + conv_i)
    out["interior_blocks"] = inner

    # ---- everything small: GRU/head activations both directions, params +
    # grads + Adam moments + EMA (~10 passes over ~P params), DFT bases,
    # stats/loss vectors. Explicit allowance.
    n_params = _param_count(cfg)
    t_rnn = blocks[-1][0] // blocks[-1][5][0]
    gru_act = B * t_rnn * 2 * m.n_rnn_cell * 4
    out["small_allowance"] = 10 * n_params * 4 + 20 * gru_act \
        + d.n_window * 2048 * bf
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def _param_count(cfg: Config) -> int:
    m = cfg.model
    n = 0
    for _t, _f, c_in, c_out, ks, _p in _conv_stack_dims(cfg):
        n += ks * ks * c_in * c_out + c_out      # conv w+b
        n += 4 * c_out                            # BN scale/bias/mean/var
        n += c_out * c_out + c_out                # GLU gate
    H = m.n_rnn_cell
    d_in = m.nb_filters[-1]
    for layer in range(m.n_layers_rnn):
        n += 2 * (3 * H * (d_in + H) + 6 * H)     # both directions
        d_in = 2 * H
    n += 2 * (2 * H * m.nclass + m.nclass)        # dense + dense_softmax
    return n


def step_utilization(cfg: Config, batch: int, step_seconds: float,
                     mean_teacher: bool = True,
                     bwd_recompute: bool = False) -> dict:
    """MFU / HBM-bandwidth utilization for a measured step time on v5e."""
    fl = model_flops(cfg, batch, mean_teacher)
    by = hbm_bytes(cfg, batch, mean_teacher, bwd_recompute)
    return {
        "flops_per_step": fl["total"],
        "hbm_bytes_per_step": by["total"],
        "mfu_pct": round(100 * fl["total"] / step_seconds / V5E_PEAK_FLOPS_BF16, 2),
        "hbm_util_pct": round(
            100 * by["total"] / step_seconds / V5E_PEAK_HBM_BYTES_PER_S, 2),
        "flops_breakdown": fl,
        "hbm_breakdown": by,
    }
