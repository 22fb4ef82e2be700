"""Fused ENTRY block v3 — the [C, rows] (channel-on-SUBLANE) orientation.

Third formulation of the CRNN's first block (conv 1→C → BN → GLU → dropout
→ avg-pool; reference models/CNN.py:47-67). The two measured obstacles of
the previous formulations (docs/PERF.md):

* unfused packed im2col (default): the patch tensor puts the 12 useful
  patch columns on the 128-LANE axis → 680 MB HBM for 64 MB of data.
* merged parity-plane kernel (ops/fused_entry_block.py): avoids the HBM
  patch tensor but rebuilds [rows, 12] patch tiles in VMEM — measured
  slower than the traffic it saves (17.5 vs 12.7 ms first-block cost).

This kernel transposes the world instead: rows live on the LANE axis and
channels/taps on the SUBLANE axis, where padding granularity is 8, not 128:

  patches  [18, L]   — 9 conv taps × 2 batch-halves, each tap a ±1 lane
                       roll of the input row tile (f-edge wrap lands only
                       on positions the conv's zero-padding masks anyway)
  conv     [2C, 18] @ [18, L]        (both batch-halves in one matmul)
  BN       per-channel vectors as [2C, 1] sublane columns
  GLU      [2C, 2C] block-diagonal @ [2C, L]  — full-width MXU matmul
                       (the half-split packing exists exactly for this:
                       a plain [C, C] @ [C, L] would use 1/4 of the MXU)
  pool     [2C, L] @ P [L, L/(pt·pf)] — a constant 0/1 matrix performs the
                       window sum AND the compaction (lane-gathers are not
                       a thing Mosaic does fast; matmuls are)

Nothing row-shaped ever reaches HBM: the forward reads the dt-shifted
input copies (3 × 10.6 MB at B=96) and writes the pooled tile (85 MB);
the backward reads the same + the pooled cotangent and emits ONLY packed
parameter gradients — the entry conv consumes the (stop-gradient) mel
features, so no dx and no d(conv-out) exist anywhere (the unfused pair
pays ~3.4 GB/model for the same gradients).

Two-pass backward (global BN statistics before per-element dy), identical
math to ops/fused_entry_block.py; under shard_map the S1/S2 sums are
psum'd between the passes while dscale/dbias stay local sums.

Batch-half packing: sublane c is channel c of clips [0, B/2), sublane
C + c is channel c of clips [B/2, B). Geometry gate: C == 64, F == 64,
pool = (2, pf), B even — the flagship config; other geometries fall back
to the default path (models/crnn.py dispatch).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcase2019_task4_tpu.ops.entry_conv import _precision
from dcase2019_task4_tpu.ops.fused_block import (
    _dropout_mask,
    _params,
    _seed_for,
)

TAPS = 9  # 3x3 conv, single input channel


def crows_applicable(shape, pool) -> bool:
    """[B, T, F, 1] features + pool → can this kernel run?"""
    B, T, F, cin = shape
    pt, pf = pool
    return (cin == 1 and F == 64 and pt == 2 and F % pf == 0
            and B % 2 == 0 and T % 2 == 0 and _pick_l(T * F, pt * pf) > 0)


def _pick_l(TF: int, ptpf: int = 8, max_l: int = 8192) -> int:
    """Largest lane-tile L ≤ max_l with TF % L == 0 and L % 128 == 0.
    The POOLED output tile L/(pt·pf) must itself be a legal lane block:
    128-divisible, unless the whole array is one tile (nt == 1, where the
    block equals the array and Mosaic accepts any size)."""
    best = 0
    for nt in range(1, TF // 128 + 1):
        if TF % nt:
            continue
        L = TF // nt
        if L <= max_l and L % 128 == 0 and (nt == 1 or L % (128 * ptpf) == 0):
            return L
    return best


# --------------------------------------------------------- host constants


def _pool_matrix(L: int, F: int, pt: int, pf: int, dtype) -> np.ndarray:
    """[L, L/(pt·pf)] 0/1: column p sums pool window p. Rows are flat
    (t, f) with f minor; a 128-lane chunk holds pt=2 consecutive frames, so
    windows never cross chunk boundaries."""
    r = np.arange(L)
    chunk, within = r // (pt * F), r % (pt * F)
    f = within % F
    p = chunk * (F // pf) + f // pf
    out = np.zeros((L, L // (pt * pf)), np.float32)
    out[r, p] = 1.0
    return out.astype(dtype)


def pack_conv_w(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 1, C] conv weight → [2C, 2·TAPS] half-interleaved packed
    weight (differentiable: gradients fold back through this packing).
    Tap order matches _patch_tile: (df, dt) major (the patch stack rolls
    the whole 3-dt base once per df), halves interleaved."""
    C = w.shape[-1]
    wt = w.transpose(1, 0, 2, 3).reshape(TAPS, C).T  # [C, 9], j = df*3 + dt
    z = jnp.zeros_like(wt)
    top = jnp.stack([wt, z], axis=2).reshape(C, 2 * TAPS)  # taps at even cols
    bot = jnp.stack([z, wt], axis=2).reshape(C, 2 * TAPS)  # taps at odd cols
    return jnp.concatenate([top, bot], axis=0)  # [2C, 18]


def pack_glu_w(gw: jnp.ndarray) -> jnp.ndarray:
    """[C, C] GLU weight → [2C, 2C] block-diagonal of gwᵀ (lin = gwᵀ @ xn
    reproduces the row-layout lin = xn @ gw)."""
    C = gw.shape[0]
    z = jnp.zeros_like(gw)
    top = jnp.concatenate([gw.T, z], axis=1)
    bot = jnp.concatenate([z, gw.T], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def pack_vec(v: jnp.ndarray) -> jnp.ndarray:
    """[C] per-channel vector → [2C, 1] sublane column (both halves)."""
    return jnp.concatenate([v, v]).reshape(-1, 1)


def make_shifted_rows(x: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, ...]:
    """x [B, T, F] → three [B/2, 2, T·F] row tensors (dt = −1, 0, +1
    time-shifted, zero-filled at clip edges), halves stacked on the middle
    (sublane) axis. One small XLA pass over the 10.6 MB features."""
    B, T, F = x.shape
    flat = x.reshape(B, T * F).astype(dtype)
    xm = jnp.pad(flat, ((0, 0), (F, 0)))[:, : T * F]   # value of frame t-1
    xp = jnp.pad(flat, ((0, 0), (0, F)))[:, F:]        # value of frame t+1
    def halves(a):
        return jnp.stack([a[: B // 2], a[B // 2 :]], axis=1)  # [B/2, 2, TF]
    return halves(xm), halves(flat), halves(xp)


# --------------------------------------------------------------- kernels


def _lane_roll(t, shift):
    """Roll the lane axis of [s, L]. Wrap-in lanes land only on f-edge
    positions the caller masks (L % F == 0). pltpu.roll wants shift ≥ 0."""
    return pltpu.roll(t, shift % t.shape[-1], 1)


def _patch_tile(xm, x0, xp, F, cdtype):
    """Three [2, L] dt-row tiles → [2·TAPS, L] patch tile, halves
    interleaved per tap, taps ordered (df, dt) major. The whole [6, L]
    dt-stack is rolled ONCE per df (2 rolls total instead of 6 per-tap
    rolls — the rolls are the patch build's only VPU work)."""
    L = x0.shape[-1]
    # Mosaic's lane rotate is 32-bit-only ("Rotate with non-32-bit data"):
    # roll in f32 and cast the stacked result down to the compute dtype.
    rdtype = jnp.float32 if jnp.dtype(cdtype).itemsize < 4 else cdtype
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) % F
    mask_l = (lane_f != 0).astype(rdtype)       # df = −1 taps
    mask_r = (lane_f != F - 1).astype(rdtype)   # df = +1 taps
    base = jnp.concatenate(
        [xm.astype(rdtype), x0.astype(rdtype), xp.astype(rdtype)], axis=0
    )  # [6, L]: (dt, half)
    left = _lane_roll(base, 1) * mask_l
    right = _lane_roll(base, -1) * mask_r
    stack = jnp.concatenate([left, base, right], axis=0)  # [18, L]: (df, dt, half)
    return stack.astype(cdtype)


def _conv_tile(xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, F, cdtype, act_bf16,
               want_patches):
    """Rebuild the conv tile y [2C, L] (f32; optionally rounded through
    bf16 to match what the unfused pipeline stores in HBM)."""
    patches = _patch_tile(xm_ref[0], x0_ref[0], xp_ref[0], F, cdtype)
    y = jax.lax.dot_general(
        w2_ref[:].astype(cdtype), patches, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(cdtype),
    ) + cb_ref[:].astype(jnp.float32)
    if act_bf16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    return y, (patches if want_patches else None)


def _chain_fwd_cs(y, scale, bias, mean, var, gw_ref, gb, eps, lp):
    """BN + GLU in the [2C, L] orientation. Matches fused_block._chain_fwd
    semantics with channels on sublanes."""
    inv = jax.lax.rsqrt(var + eps)
    xn = (y - mean) * inv * scale + bias
    if lp:
        lin = jax.lax.dot_general(
            gw_ref[:].astype(jnp.bfloat16), xn.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(jnp.bfloat16),
        ) + gb
    else:
        lin = jax.lax.dot_general(
            gw_ref[:], xn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(jnp.float32),
        ) + gb
    sig = jax.nn.sigmoid(xn)
    return xn, lin, sig


def _stats_kernel(xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, s1_ref, s2_ref,
                  *, F, cdtype, act_bf16):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    y, _ = _conv_tile(xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, F, cdtype,
                      act_bf16, False)
    s1_ref[:] += jnp.sum(y, axis=1, keepdims=True)
    s2_ref[:] += jnp.sum(y * y, axis=1, keepdims=True)


def _fwd_kernel(seed_ref, xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, scale_ref,
                bias_ref, mean_ref, var_ref, gw_ref, gb_ref, pm_ref,
                out_ref, *, F, pool, rate, eps, nt, train, lp, cdtype,
                act_bf16, interp):
    y, _ = _conv_tile(xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, F, cdtype,
                      act_bf16, False)
    xn, lin, sig = _chain_fwd_cs(
        y, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:], gw_ref,
        gb_ref[:], eps, lp,
    )
    g = lin * sig
    if train and rate > 0.0:
        seed_val = _seed_for(seed_ref, nt)
        if not interp:
            pltpu.prng_seed(seed_val)
        g = g * _dropout_mask(g.shape, rate, seed_val, interp) * (1.0 / (1.0 - rate))
    pooled = jax.lax.dot_general(
        g.astype(cdtype) if lp else g, pm_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision(cdtype if lp else jnp.float32),
    ) * (1.0 / (pool[0] * pool[1]))
    out_ref[0] = pooled.astype(out_ref.dtype)


def _upsample_cs(dout, pmt_ref, pool, lp, cdtype):
    """Pooled cotangent [2C, L/(pt·pf)] → per-element [2C, L] via Pᵀ."""
    d = dout.astype(jnp.float32) * (1.0 / (pool[0] * pool[1]))
    return jax.lax.dot_general(
        d.astype(cdtype) if lp else d, pmt_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=_precision(cdtype if lp else jnp.float32),
    )


def _recompute_dxn_cs(y, dout_up, scale, bias, mean, var, gw_ref, gb, eps,
                      rate, keep, seed_val, train, lp, interp):
    xn, lin, sig = _chain_fwd_cs(y, scale, bias, mean, var, gw_ref, gb, eps, lp)
    dh = dout_up
    if train and rate > 0.0:
        if not interp:
            pltpu.prng_seed(seed_val)
        dh = dh * _dropout_mask(dh.shape, rate, seed_val, interp) * (1.0 / keep)
    dlin = dh * sig
    dxn_gate = dh * lin * sig * (1.0 - sig)
    # dxn = gwᵀ-packed contracted on its SUBLANE axis = (gw-packed) @ dlin
    if lp:
        dxn = jax.lax.dot_general(
            gw_ref[:].astype(jnp.bfloat16), dlin.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_precision(jnp.bfloat16),
        ) + dxn_gate
    else:
        dxn = jax.lax.dot_general(
            gw_ref[:], dlin, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(jnp.float32),
        ) + dxn_gate
    return xn, dlin, dxn


def _contract_lanes(a, b, lp):
    """[s_a, L] ×_L [s_b, L] → [s_a, s_b] (Σ over lanes of both)."""
    dt = jnp.bfloat16 if lp else jnp.float32
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(dt),
    )


def _bwd_reduce_kernel(seed_ref, xm_ref, x0_ref, xp_ref, dout_ref, w2_ref,
                       cb_ref, scale_ref, bias_ref, mean_ref, var_ref, gw_ref,
                       gb_ref, pmt_ref,
                       dgw_ref, dgb_ref, s1_ref, s2_ref,
                       *, F, pool, rate, eps, nt, train, lp, cdtype,
                       act_bf16, interp):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dgw_ref[:] = jnp.zeros_like(dgw_ref)
        dgb_ref[:] = jnp.zeros_like(dgb_ref)
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    y, _ = _conv_tile(xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, F, cdtype,
                      act_bf16, False)
    dout_up = _upsample_cs(dout_ref[0], pmt_ref, pool, lp, cdtype)
    xn, dlin, dxn = _recompute_dxn_cs(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        gw_ref, gb_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        train, lp, interp,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    xhat = (y - mean_ref[:]) * inv
    # lin = GWp @ xn → dGWp[c, c'] = Σ_r dlin[c]·xn[c'] (lanes contracted)
    dgw_ref[:] += _contract_lanes(dlin, xn, lp)
    dgb_ref[:] += jnp.sum(dlin, axis=1, keepdims=True)
    s1_ref[:] += jnp.sum(dxn, axis=1, keepdims=True)
    s2_ref[:] += jnp.sum(dxn * xhat, axis=1, keepdims=True)


def _bwd_wgrad_kernel(seed_ref, xm_ref, x0_ref, xp_ref, dout_ref, w2_ref,
                      cb_ref, scale_ref, bias_ref, mean_ref, var_ref, gw_ref,
                      gb_ref, pmt_ref, a_ref, b2_ref,
                      dw2_ref, dcb_ref,
                      *, F, pool, rate, eps, nt, train, lp, cdtype,
                      act_bf16, interp):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)

    y, patches = _conv_tile(xm_ref, x0_ref, xp_ref, w2_ref, cb_ref, F, cdtype,
                            act_bf16, True)
    dout_up = _upsample_cs(dout_ref[0], pmt_ref, pool, lp, cdtype)
    _, _, dxn = _recompute_dxn_cs(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        gw_ref, gb_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        train, lp, interp,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    dy = inv * scale_ref[:] * dxn - a_ref[:] - (y - mean_ref[:]) * b2_ref[:]
    dw2_ref[:] += _contract_lanes(dy, patches, lp or cdtype == jnp.bfloat16)
    dcb_ref[:] += jnp.sum(dy, axis=1, keepdims=True)


# ------------------------------------------------------------- dispatch


def _geom(x3_shape, pool):
    B2, _, TF = x3_shape
    pt, pf = pool
    L = _pick_l(TF, pt * pf)
    nt = TF // L
    return B2, TF, L, nt, TF // (pt * pf), L // (pt * pf)


def _specs(L, Lp, n_const):
    x_spec = pl.BlockSpec((1, 2, L), lambda b, i, *_: (b, 0, i),
                          memory_space=pltpu.VMEM)
    const = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
    return [x_spec] * 3, const


def crows_stats(xm, x0, xp, w2, cbias, compute_dtype=jnp.float32,
                act_bf16=False, interpret=False):
    B2, TF, L, nt, _, _ = _geom(x0.shape, (2, 4))
    kernel = functools.partial(
        _stats_kernel, F=64, cdtype=jnp.dtype(compute_dtype), act_bf16=act_bf16,
    )
    x_specs, const = _specs(L, 0, 2)
    acc = pl.BlockSpec((w2.shape[0], 1), lambda b, i: (0, 0),
                       memory_space=pltpu.VMEM)
    s1, s2 = pl.pallas_call(
        kernel,
        grid=(B2, nt),
        in_specs=x_specs + const,
        out_specs=[acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((w2.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((w2.shape[0], 1), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(xm, x0, xp, w2, cbias)
    return s1, s2


def _fwd(xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb, seed,
         rate, pool, eps, train, compute_dtype, act_bf16, interpret):
    B2, TF, L, nt, TFp, Lp = _geom(x0.shape, pool)
    C2 = w2.shape[0]
    lp = act_bf16
    cdtype = jnp.dtype(compute_dtype)
    kernel = functools.partial(
        _fwd_kernel, F=64, pool=pool, rate=rate, eps=eps, nt=nt, train=train,
        lp=lp, cdtype=cdtype, act_bf16=act_bf16, interp=bool(interpret),
    )
    pm = jnp.asarray(_pool_matrix(L, 64, pool[0], pool[1],
                                  np.float32 if not lp else jnp.bfloat16))
    x_specs, const = _specs(L, Lp, 9)
    out_dtype = jnp.bfloat16 if act_bf16 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B2, nt),
            in_specs=x_specs + const,
            out_specs=pl.BlockSpec((1, C2, Lp), lambda b, i, *_: (b, 0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B2, C2, TFp), out_dtype),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xm, x0, xp,
      w2, cbias, scale, bias, mean, var, gw, gb, pm)


def _bwd(xm, x0, xp, dout, w2, cbias, scale, bias, mean, var, gw, gb, seed,
         rate, pool, eps, train, compute_dtype, act_bf16, interpret,
         batch_axis=None, axis_size=1):
    B2, TF, L, nt, TFp, Lp = _geom(x0.shape, pool)
    C2 = w2.shape[0]
    C = C2 // 2
    lp = act_bf16
    cdtype = jnp.dtype(compute_dtype)
    common = dict(F=64, pool=pool, rate=rate, eps=eps, nt=nt, train=train,
                  lp=lp, cdtype=cdtype, act_bf16=act_bf16,
                  interp=bool(interpret))
    pmt = jnp.asarray(_pool_matrix(L, 64, pool[0], pool[1],
                                   np.float32 if not lp else jnp.bfloat16).T)
    x_specs, const9 = _specs(L, Lp, 9)
    dout_spec = pl.BlockSpec((1, C2, Lp), lambda b, i, *_: (b, 0, i),
                             memory_space=pltpu.VMEM)
    in_specs = x_specs + [dout_spec] + const9
    accC = pl.BlockSpec((C2, 1), lambda b, i, *_: (0, 0),
                        memory_space=pltpu.VMEM)
    args = (jnp.asarray(seed, jnp.int32).reshape(1), xm, x0, xp, dout,
            w2, cbias, scale, bias, mean, var, gw, gb, pmt)

    dgw, dgb, s1, s2 = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B2, nt), in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((C2, C2), lambda b, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                accC, accC, accC,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C2, C2), jnp.float32),
            jax.ShapeDtypeStruct((C2, 1), jnp.float32),
            jax.ShapeDtypeStruct((C2, 1), jnp.float32),
            jax.ShapeDtypeStruct((C2, 1), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(*args)

    # fold halves → per-channel sums; psum under shard_map (forward used the
    # GLOBAL batch statistics, so the through-stats correction needs the
    # global Σdxn / Σdxn·x̂ — dscale/dbias stay LOCAL, see fused_block's
    # sharded-BN-backward note)
    n_total = float(2 * B2 * TF)
    s1c = s1.reshape(2, C).sum(axis=0)
    s2c = s2.reshape(2, C).sum(axis=0)
    if batch_axis is not None:
        s1c = jax.lax.psum(s1c, batch_axis)
        s2c = jax.lax.psum(s2c, batch_axis)
        n_total = n_total * axis_size
    var_c = var[:C, 0]
    scale_c = scale[:C, 0]
    inv_c = jax.lax.rsqrt(var_c + eps)
    a = pack_vec(inv_c * scale_c * s1c / n_total)
    b2 = pack_vec(inv_c * inv_c * scale_c * s2c / n_total)

    dw2, dcb = pl.pallas_call(
        functools.partial(_bwd_wgrad_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B2, nt),
            in_specs=in_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[
                pl.BlockSpec((C2, 2 * TAPS), lambda b, i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                accC,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C2, 2 * TAPS), jnp.float32),
            jax.ShapeDtypeStruct((C2, 1), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(*args, a, b2)
    return dw2, dcb, s2, s1, dgw, dgb


# ---------------------------------------------------------- public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18, 19, 20)
)
def crows_entry_block(xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb,
                      seed, rate: float, pool: Tuple[int, int], eps: float,
                      train: bool, compute_dtype=jnp.float32,
                      act_bf16: bool = False, interpret: bool = False,
                      batch_axis=None, axis_size: int = 1):
    """dt-shifted row tensors [B/2, 2, T·F] ×3 + packed params → pooled
    [B/2, 2C, T·F/(pt·pf)] (channel-sublane packed; unpack with
    unpack_pooled). See module docstring for the VJP contract."""
    return _fwd(xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb, seed,
                rate, pool, eps, train, compute_dtype, act_bf16, interpret)


def _vjp_fwd(xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb, seed,
             rate, pool, eps, train, compute_dtype, act_bf16, interpret,
             batch_axis, axis_size):
    out = _fwd(xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb, seed,
               rate, pool, eps, train, compute_dtype, act_bf16, interpret)
    return out, (xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb, seed)


def _vjp_bwd(rate, pool, eps, train, compute_dtype, act_bf16, interpret,
             batch_axis, axis_size, res, dout):
    xm, x0, xp, w2, cbias, scale, bias, mean, var, gw, gb, seed = res
    dw2, dcb, dscale, dbias, dgw, dgb = _bwd(
        xm, x0, xp, dout, w2, cbias, scale, bias, mean, var, gw, gb, seed,
        rate, pool, eps, train, compute_dtype, act_bf16, interpret,
        batch_axis, axis_size,
    )
    z = jnp.zeros_like
    return (z(xm), z(x0), z(xp), dw2.astype(w2.dtype), dcb, dscale, dbias,
            z(mean), z(var), dgw, dgb, z(jnp.asarray(seed, jnp.int32)))


crows_entry_block.defvjp(_vjp_fwd, _vjp_bwd)


def unpack_pooled(pooled: jnp.ndarray, F2: int) -> jnp.ndarray:
    """[B/2, 2C, T2·F2] packed pooled → [B, T2, F2, C] standard layout
    (ONE transpose of the 8×-smaller tensor — the whole point)."""
    B2, C2, TFp = pooled.shape
    C = C2 // 2
    halves = jnp.concatenate([pooled[:, :C], pooled[:, C:]], axis=0)  # [B, C, TFp]
    return halves.reshape(B2 * 2, C, TFp // F2, F2).transpose(0, 2, 3, 1)


def crows_stats_apply(conv_params, x, compute_dtype=None, interpret=False):
    """x [B, T, F, 1] → per-channel (Σ, Σ²) f32 of the entry conv output."""
    cdtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    act_bf16 = cdtype == jnp.bfloat16
    xm, x0, xp = make_shifted_rows(x[..., 0], cdtype)
    w2 = jax.lax.stop_gradient(pack_conv_w(conv_params["w"]).astype(cdtype))
    cbias = jax.lax.stop_gradient(pack_vec(conv_params["b"]))
    s1, s2 = crows_stats(xm, x0, xp, w2, cbias, cdtype, act_bf16, interpret)
    C = conv_params["w"].shape[-1]
    return s1.reshape(2, C).sum(axis=0), s2.reshape(2, C).sum(axis=0)


def crows_apply(conv_params, scale, bias, mean, var, glu_w, glu_b,
                x, seed, rate, pool, eps, train,
                compute_dtype=None, interpret=False,
                batch_axis=None, axis_size=1):
    """Logical-parameter wrapper: x [B, T, F, 1] + [C] BN vectors + [C, C]
    GLU weight → pooled [B, T/pt, F/pf, C]. Packing is differentiable, so
    parameter cotangents fold back to logical shapes by autodiff."""
    cdtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    act_bf16 = cdtype == jnp.bfloat16
    xm, x0, xp = make_shifted_rows(x[..., 0], cdtype)
    out = crows_entry_block(
        xm, x0, xp, pack_conv_w(conv_params["w"]).astype(cdtype),
        pack_vec(conv_params["b"]),
        pack_vec(scale), pack_vec(bias), pack_vec(mean), pack_vec(var),
        pack_glu_w(glu_w), pack_vec(glu_b),
        seed, rate, tuple(pool), eps, train, cdtype, act_bf16, interpret,
        batch_axis, axis_size,
    )
    return unpack_pooled(out, x.shape[2] // pool[1])
