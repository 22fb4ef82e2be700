"""Bidirectional multi-layer GRU as a TPU-friendly `lax.scan`.

Replaces the reference's cuDNN `nn.GRU(bidirectional=True, num_layers=2,
batch_first=True)` (models/RNN.py:7-16) with hand-written cell math matching
PyTorch's exact semantics — gate order (r, z, n), the reset gate applied to
the *projected* hidden state:

    r = σ(W_ir x + b_ir + W_hr h + b_hr)
    z = σ(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn))
    h' = (1 − z) ⊙ n + z ⊙ h

TPU mapping:
  * The input projections for ALL timesteps are hoisted out of the scan as
    one [B·T, in] @ [in, 3H] matmul per direction — the MXU does the bulk of
    the FLOPs in one large GEMM instead of T small ones.
  * Forward and backward directions share a single scan by stacking them on
    the batch axis (the backward stream consumes time-reversed gates), so
    the sequential part runs once with 2× batch instead of twice.
  * The recurrent matmul per step is [2B, H] @ [H, 3H].

Weight layout mirrors PyTorch (`w_ih` [3H, in], `w_hh` [3H, H], biases
[3H]) so golden-parity tests and torch-checkpoint import are direct.
Initialization follows the reference's weights_init GRU branch
(utils/utils.py:217-219): orthogonal for matrices; biases keep PyTorch's
default U(−1/√H, 1/√H).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# scan unroll factor. None = pick per geometry (_pick_unroll); an explicit
# int forces that unroll everywhere (tools/profile_step.py --unroll sweeps).
# Swept on v5e at the reference size (T=108, H=64): 8→0.96 ms, 16→1.30,
# 27→0.76, 54→0.77, 108→5.1 (full unroll blows the instruction budget at
# H=64). At H≥128 the trade flips: full unroll removes the scan's
# dynamic-slice/update machinery and loop-carried buffer round-trips, and
# the per-step recurrence is wide enough that instruction count no longer
# binds — measured at the scaled geometry (T=108, H=128): unroll 27 →
# 99.7 device ms/step, 9 → 98.0, 108 (full) → 95.7 (docs/PERF.md "Round 4:
# the scaled config").
SCAN_UNROLL = None


def _pick_unroll(T: int, H: int) -> int:
    if SCAN_UNROLL is not None:
        return SCAN_UNROLL  # explicit sweep override
    # Measured envelope for the full-unroll win: T=108, H=128 (docs/PERF.md
    # round 4). Full unroll's known failure mode — instruction-budget blowup —
    # scales with T, so gate on T as well; longer sequences fall back to the
    # swept 27 until someone measures them (tools/profile_step.py --unroll).
    return T if (H >= 128 and T <= 128) else 27


def _orthogonal(key, shape):
    """Orthogonal init matching torch.nn.init.orthogonal_ semantics:
    orthonormal rows if rows ≤ cols else orthonormal columns."""
    rows, cols = shape
    n = max(rows, cols)
    a = jax.random.normal(key, (n, min(rows, cols)), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    q = q[: max(rows, cols), : min(rows, cols)]
    return q if rows >= cols else q.T


def gru_layer_init(key, input_size: int, hidden: int):
    """One direction of one layer."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    w_ih = jnp.concatenate(
        [_orthogonal(k, (hidden, input_size)) for k in jax.random.split(k1, 3)], axis=0
    )
    w_hh = jnp.concatenate(
        [_orthogonal(k, (hidden, hidden)) for k in jax.random.split(k2, 3)], axis=0
    )
    return {
        "w_ih": w_ih,  # [3H, in] — torch layout, gates (r, z, n)
        "w_hh": w_hh,  # [3H, H]
        "b_ih": jax.random.uniform(k3, (3 * hidden,), jnp.float32, -bound, bound),
        "b_hh": jax.random.uniform(k4, (3 * hidden,), jnp.float32, -bound, bound),
    }


def bigru_init(key, input_size: int, hidden: int, num_layers: int):
    """Params: list over layers of {"fwd": ..., "bwd": ...}; layer ℓ>0
    consumes the 2H-wide concat of layer ℓ−1."""
    layers = []
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else 2 * hidden
        key, kf, kb = jax.random.split(key, 3)
        layers.append(
            {"fwd": gru_layer_init(kf, in_dim, hidden), "bwd": gru_layer_init(kb, in_dim, hidden)}
        )
    return layers


def _direction_gates(params, x):
    """Hoisted input projection: [B, T, in] → [B, T, 3H] (one MXU GEMM)."""
    return x @ params["w_ih"].T.astype(x.dtype) + params["b_ih"].astype(x.dtype)


def _gru_scan(gates_fwd, gates_bwd, p_fwd, p_bwd, hidden: int):
    """Single scan for both directions stacked on the batch axis.

    gates_*: [B, T, 3H] precomputed input projections (bwd already
    time-reversed). Returns (out_fwd [B, T, H], out_bwd [B, T, H] in
    original time order)."""
    B, T, H3 = gates_fwd.shape
    H = hidden
    # time-major for scan: [T, 2B, 3H]
    gates = jnp.concatenate([gates_fwd, gates_bwd], axis=0).transpose(1, 0, 2)
    w_hh = jnp.stack([p_fwd["w_hh"].T, p_bwd["w_hh"].T])  # [2, H, 3H]
    b_hh = jnp.stack([p_fwd["b_hh"], p_bwd["b_hh"]])  # [2, 3H]
    dtype = gates.dtype
    w_hh = w_hh.astype(dtype)
    b_hh = b_hh.astype(dtype)

    def step(h, g_t):
        # h: [2B, H]; recurrent projection with per-direction weights:
        # block-diagonal as batched matmul over the direction axis
        h2 = h.reshape(2, B, H)
        rec = jnp.einsum("dbh,dhk->dbk", h2, w_hh, preferred_element_type=jnp.float32)
        rec = (rec + b_hh[:, None, :]).reshape(2 * B, 3 * H).astype(dtype)
        g_r, g_z, g_n = jnp.split(g_t, 3, axis=-1)
        r_r, r_z, r_n = jnp.split(rec, 3, axis=-1)
        r = jax.nn.sigmoid(g_r + r_r)
        z = jax.nn.sigmoid(g_z + r_z)
        n = jnp.tanh(g_n + r * r_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2 * B, H), dtype)
    # unroll: amortizes per-iteration loop overhead on TPU (measured ~40x
    # on a standalone scan; the recurrent matmuls are tiny)
    _, hs = jax.lax.scan(step, h0, gates,
                         unroll=_pick_unroll(gates.shape[0], H))  # [T, 2B, H]
    hs = hs.transpose(1, 0, 2)  # [2B, T, H]
    out_fwd, out_bwd_rev = hs[:B], hs[B:]
    return out_fwd, out_bwd_rev[:, ::-1]


def bigru_apply(params, x):
    """[B, T, in] → [B, T, 2H]: stacked bidirectional layers, outputs
    concatenated (fwd ‖ bwd) per layer like torch. dropout_recurrent is 0 in
    the reference config (config.py:53-58), so no inter-layer dropout."""
    out = x
    for layer in params:
        hidden = layer["fwd"]["w_hh"].shape[1]
        g_f = _direction_gates(layer["fwd"], out)
        g_b = _direction_gates(layer["bwd"], out[:, ::-1])
        o_f, o_b = _gru_scan(g_f, g_b, layer["fwd"], layer["bwd"], hidden)
        out = jnp.concatenate([o_f, o_b], axis=-1)
    return out


# ----------------------------------------------------------------- LSTM
# The reference also ships a (unused) BidirectionalLSTM (models/RNN.py:19-45:
# nn.LSTM(nIn, nHidden//2, bidirectional) + per-frame Linear embedding);
# provided here with the same TPU mapping as the GRU: hoisted input GEMMs +
# one shared scan for both directions. torch gate order (i, f, g, o).


def lstm_layer_init(key, input_size: int, hidden: int):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    w_ih = jnp.concatenate(
        [_orthogonal(k, (hidden, input_size)) for k in jax.random.split(k1, 4)], axis=0
    )
    w_hh = jnp.concatenate(
        [_orthogonal(k, (hidden, hidden)) for k in jax.random.split(k2, 4)], axis=0
    )
    return {
        "w_ih": w_ih,  # [4H, in] — torch layout, gates (i, f, g, o)
        "w_hh": w_hh,  # [4H, H]
        "b_ih": jax.random.uniform(k3, (4 * hidden,), jnp.float32, -bound, bound),
        "b_hh": jax.random.uniform(k4, (4 * hidden,), jnp.float32, -bound, bound),
    }


def bilstm_init(key, input_size: int, hidden: int, num_layers: int):
    layers = []
    for layer in range(num_layers):
        in_dim = input_size if layer == 0 else 2 * hidden
        key, kf, kb = jax.random.split(key, 3)
        layers.append(
            {"fwd": lstm_layer_init(kf, in_dim, hidden), "bwd": lstm_layer_init(kb, in_dim, hidden)}
        )
    return layers


def _lstm_scan(gates_fwd, gates_bwd, p_fwd, p_bwd, hidden: int):
    B, T, _ = gates_fwd.shape
    H = hidden
    gates = jnp.concatenate([gates_fwd, gates_bwd], axis=0).transpose(1, 0, 2)
    w_hh = jnp.stack([p_fwd["w_hh"].T, p_bwd["w_hh"].T])  # [2, H, 4H]
    b_hh = jnp.stack([p_fwd["b_hh"], p_bwd["b_hh"]])
    dtype = gates.dtype
    w_hh = w_hh.astype(dtype)
    b_hh = b_hh.astype(dtype)

    def step(carry, g_t):
        h, c = carry
        h2 = h.reshape(2, B, H)
        rec = jnp.einsum("dbh,dhk->dbk", h2, w_hh, preferred_element_type=jnp.float32)
        rec = (rec + b_hh[:, None, :]).reshape(2 * B, 4 * H).astype(dtype)
        gi, gf, gg, go = jnp.split(g_t + rec, 4, axis=-1)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    init = (jnp.zeros((2 * B, H), dtype), jnp.zeros((2 * B, H), dtype))
    _, hs = jax.lax.scan(step, init, gates,
                         unroll=_pick_unroll(gates.shape[0], H))
    hs = hs.transpose(1, 0, 2)
    return hs[:B], hs[B:][:, ::-1]


def bilstm_apply(params, x):
    """[B, T, in] → [B, T, 2H], torch LSTM semantics."""
    out = x
    for layer in params:
        hidden = layer["fwd"]["w_hh"].shape[1]
        g_f = _direction_gates(layer["fwd"], out)
        g_b = _direction_gates(layer["bwd"], out[:, ::-1])
        o_f, o_b = _lstm_scan(g_f, g_b, layer["fwd"], layer["bwd"], hidden)
        out = jnp.concatenate([o_f, o_b], axis=-1)
    return out
