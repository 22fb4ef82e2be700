"""Fused ENTRY block v2: conv(C_in=1) → BN → GLU → dropout → pool, Pallas.

The first CRNN block's conv output [B, T, F, 64] is the largest activation
of the network (680 MB bf16 at B=96, reference models/CNN.py:47
Conv2d(1, 64, 3, 1, 1) + :52-67 BN/GLU/dropout/AvgPool). The unfused
pipeline pays, per model pass: conv-out write (680 MB) + BN-stats read
(680 MB, XLA producer-fused) + fused-block read (680 MB) + pooled write
(85 MB); the backward adds a dy write + read (2×680 MB) between the block
kernel and the conv weight-gradient. This kernel keeps the conv output in
VMEM for its whole life, so the only HBM traffic is the parity planes
(~11 MB), the pooled output (85 MB), and its cotangent:

  stats    — conv per tile → Σ / Σ² per packed lane (BN batch statistics;
             no conv output ever written)
  forward  — conv → BN → GLU → dropout (on-core PRNG) → avg-pool
  backward — 2 passes (BN-training backward needs the global Σdxn,
             Σdxn·x̂ before any per-element dy exists):
               pass 1: recompute conv + chain, accumulate dW_glu, db_glu,
                       S1 = Σdxn, S2 = Σdxn·x̂
               pass 2: recompute conv + chain + dxn, finish
                       dy = inv·γ·dxn − a − (y−mean)·b in-register, and
                       contract it with the patch tile for dW2 / db —
                       dy is NEVER materialized in HBM.

v1 of this kernel (round 1) died on patch construction: a [rows, 9] patch
tile puts 9 on the 128-lane axis (~14× padding waste → 115 ms/step). v2
uses ops/entry_conv.py's PARITY-PLANE formulation: XLA prepares
even/odd-column planes of the zero-padded input, every patch column
j = (dt, e) of the k = 2 lane-packing is a CONTIGUOUS F2-lane slice of a
plane, and the [rows, 12] @ [12, 128] conv matmul lands (t, f2) on the ROW
axis so the conv output is natively in the lane-packed f-sublane layout
the chain math (ops/fused_block.py helpers) runs in.

Dropout uses fused_block's exact per-tile seeding and the SAME tile picker,
so outputs/gradients are bit-comparable (f32) against the unfused
conv2d_entry_packed → fused_bn_glu_dropout_pool pair — which is how the
tests pin it.

VJP contract (mirrors fused_bn_glu_dropout_pool): mean/var must be
stop_gradient'ed batch statistics of the conv output (entry_block_stats);
the cotangent for the input planes is ZERO by design — the mel features
are not differentiated (first layer, reference models/CRNN.py:59-62).

The custom-VJP boundary takes PACKED parameters (w2 [12,128] patch-basis
conv weight, lane-tiled BN vectors, block-diagonal GLU weight);
entry_block_apply packs with differentiable ops (build_w2 / tile / kron),
so parameter cotangents fold back to logical shapes by autodiff.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcase2019_task4_tpu.ops import entry_conv as EC
from dcase2019_task4_tpu.ops.fused_block import (
    _chain_fwd,
    _dropout_mask,
    _freq_matrix,
    _pack_factor,
    _pack_w,
    _params,
    _pick_tile,
    _pool_mxu,
    _recompute_dxn,
    _seed_for,
    _tile_k,
    _upsample_mxu,
)

J = EC.J  # 12 patch columns
LANES = EC.LANES  # 128


def entry_block_applicable(shape, pool) -> bool:
    """[B, T, F, 1] features + pool → can the merged kernel run?
    Needs the k=2 parity packing (C=64-class geometry), pool-divisible
    T/F, fused_block's tile (same dropout layout) to be a multiple of 8
    (plane halo blocks) and of the time pool."""
    B, T, F, _ = shape
    C = LANES // 2
    pt, pf = pool
    if T % pt or F % pf or F % 2 or pf % 2:
        return False
    tt = _pick_tile(T, F, C)
    return tt % 8 == 0 and tt % pt == 0


# ------------------------------------------------------------- kernels


def _conv_tile(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
               tt, F2, cdtype, act_bf16, want_patches):
    """Rebuild the conv-output tile [tt·F2, L] (f32, rounded through the
    activation storage dtype so all passes see the values the unfused
    pipeline stores in HBM). Returns (y, patches_or_None)."""
    ev = EC._assemble(evm_ref, evt_ref)
    od = EC._assemble(odm_ref, odt_ref)
    patches = EC._patch_tile(ev, od, tt, F2, cdtype)
    y = jax.lax.dot_general(
        patches, w2_ref[:].astype(cdtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=EC._precision(cdtype),
    ) + cb_ref[:].astype(jnp.float32)
    if act_bf16:
        y = y.astype(jnp.bfloat16).astype(jnp.float32)
    return y, (patches if want_patches else None)


def _stats_kernel(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
                  s1_ref, s2_ref, *, tt, F2, cdtype, act_bf16):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    y, _ = _conv_tile(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
                      tt, F2, cdtype, act_bf16, False)
    s1_ref[:] += jnp.sum(y, axis=0)
    s2_ref[:] += jnp.sum(y * y, axis=0)


def _fwd_kernel(seed_ref, evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
                scale_ref, bias_ref, mean_ref, var_ref, gw_ref, gb_ref, bm_ref,
                out_ref, *, tt, F2, L, k, C, pool, rate, eps, nt, train, lp,
                cdtype, act_bf16, interp):
    y, _ = _conv_tile(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
                      tt, F2, cdtype, act_bf16, False)
    xn, lin, sig = _chain_fwd(
        y, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:], gw_ref[:], gb_ref[:],
        eps, lp,
    )
    g = lin * sig
    if train and rate > 0.0:
        seed_val = _seed_for(seed_ref, nt)
        if not interp:
            pltpu.prng_seed(seed_val)
        g = g * _dropout_mask((tt * F2, L), rate, seed_val, interp) * (1.0 / (1.0 - rate))
    pooled = _pool_mxu(g, bm_ref[:], k, C, pool, lp, tt, F2, L)
    A = tt // pool[0]
    out_ref[0] = pooled.reshape(A, bm_ref.shape[0] // A, C).astype(out_ref.dtype)


def _bwd_reduce_kernel(seed_ref, evm_ref, evt_ref, odm_ref, odt_ref, dout_ref,
                       w2_ref, cb_ref, scale_ref, bias_ref, mean_ref, var_ref,
                       gw_ref, gb_ref, bm_ref,
                       dgw_ref, dgb_ref, s1_ref, s2_ref,
                       *, tt, F2, L, k, C, pool, rate, eps, nt, train, lp,
                       cdtype, act_bf16, interp):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dgw_ref[:] = jnp.zeros_like(dgw_ref)
        dgb_ref[:] = jnp.zeros_like(dgb_ref)
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    y, _ = _conv_tile(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
                      tt, F2, cdtype, act_bf16, False)
    dout_up = _upsample_mxu(dout_ref[0], bm_ref[:], L, k, C, pool, lp, tt, F2)
    xn, dlin, dxn = _recompute_dxn(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        gw_ref[:], gb_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        (tt * F2, L), train, lp, interp,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    xhat = (y - mean_ref[:]) * inv
    if lp:
        dgw_ref[:] += jax.lax.dot_general(
            xn.astype(jnp.bfloat16), dlin.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=EC._precision(jnp.bfloat16),
        )
    else:
        dgw_ref[:] += jax.lax.dot_general(
            xn, dlin, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dgb_ref[:] += jnp.sum(dlin, axis=0)
    s1_ref[:] += jnp.sum(dxn, axis=0)
    s2_ref[:] += jnp.sum(dxn * xhat, axis=0)


def _bwd_wgrad_kernel(seed_ref, evm_ref, evt_ref, odm_ref, odt_ref, dout_ref,
                      w2_ref, cb_ref, scale_ref, bias_ref, mean_ref, var_ref,
                      gw_ref, gb_ref, bm_ref, a_ref, b2_ref,
                      dw2_ref, dcb_ref,
                      *, tt, F2, L, k, C, pool, rate, eps, nt, train, lp,
                      cdtype, act_bf16, interp):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)

    y, patches = _conv_tile(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, cb_ref,
                            tt, F2, cdtype, act_bf16, True)
    dout_up = _upsample_mxu(dout_ref[0], bm_ref[:], L, k, C, pool, lp, tt, F2)
    _, _, dxn = _recompute_dxn(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        gw_ref[:], gb_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        (tt * F2, L), train, lp, interp,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    dy = inv * scale_ref[:] * dxn - a_ref[:] - (y - mean_ref[:]) * b2_ref[:]
    dw2_ref[:] += jax.lax.dot_general(
        patches, dy.astype(cdtype) if lp else dy,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=EC._precision(cdtype),
    )
    dcb_ref[:] += jnp.sum(dy, axis=0)


# ------------------------------------------------------------ dispatch


def _geom(ev_shape):
    B, Tp, F2p = ev_shape
    T, F2, L = Tp - 8, F2p - 1, LANES
    k = 2
    C = L // k
    F = F2 * k
    tt = _pick_tile(T, F, C)
    return B, T, F, C, k, F2, L, tt


def _plane_specs(tt, F2p):
    """Like entry_conv._plane_specs but with index maps that also accept
    the scalar-prefetch ref PrefetchScalarGridSpec appends."""
    main = pl.BlockSpec((1, tt, F2p), lambda b, i, *_: (b, i, 0),
                        memory_space=pltpu.VMEM)
    tail = pl.BlockSpec((1, 8, F2p), lambda b, i, *_: (b, (i + 1) * tt // 8, 0),
                        memory_space=pltpu.VMEM)
    return main, tail


def _plane_and_const_specs(tt, F2p, n_const):
    main, tail = _plane_specs(tt, F2p)
    const = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const
    return [main, tail, main, tail] + const


def entry_block_stats(ev, od, w2, cbias, compute_dtype=jnp.float32,
                      act_bf16=False, interpret=False):
    """Parity planes → per-lane (Σ, Σ²) f32 of the (storage-rounded) conv
    output — the BN batch-statistics inputs. Fold with lane-sum/k for the
    per-channel values."""
    B, T, F, C, k, F2, L, tt = _geom(ev.shape)
    kernel = functools.partial(
        _stats_kernel, tt=tt, F2=F2, cdtype=jnp.dtype(compute_dtype),
        act_bf16=act_bf16,
    )
    acc = pl.BlockSpec((L,), lambda b, t: (0,), memory_space=pltpu.VMEM)
    s1, s2 = pl.pallas_call(
        kernel,
        grid=(B, T // tt),
        in_specs=_plane_and_const_specs(tt, F2 + 1, 2),
        out_specs=[acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((L,), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(ev, ev, od, od, w2, cbias)
    return s1, s2


def _fwd(ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed,
         rate, pool, eps, train, compute_dtype, act_bf16, interpret):
    B, T, F, C, k, F2, L, tt = _geom(ev.shape)
    nt = T // tt
    pt, pf = pool
    lp = act_bf16
    kernel = functools.partial(
        _fwd_kernel, tt=tt, F2=F2, L=L, k=k, C=C, pool=pool, rate=rate,
        eps=eps, nt=nt, train=train, lp=lp, cdtype=jnp.dtype(compute_dtype),
        act_bf16=act_bf16, interp=bool(interpret),
    )
    bmt = jnp.asarray(_freq_matrix(tt, F2, pt, pf // k))
    out_dtype = jnp.bfloat16 if act_bf16 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=_plane_and_const_specs(tt, F2 + 1, 9),
            out_specs=pl.BlockSpec(
                (1, tt // pt, F // pf, C), lambda b, t, *_: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T // pt, F // pf, C), out_dtype),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), ev, ev, od, od,
      w2, cbias, scale, bias, mean, var, gw, gb, bmt)


def _bwd(ev, od, dout, w2, cbias, scale, bias, mean, var, gw, gb, seed,
         rate, pool, eps, train, compute_dtype, act_bf16, interpret,
         batch_axis=None, axis_size=1):
    B, T, F, C, k, F2, L, tt = _geom(ev.shape)
    nt = T // tt
    pt, pf = pool
    lp = act_bf16
    dout_spec = pl.BlockSpec(
        (1, tt // pt, F // pf, C), lambda b, t, *_: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    main, tail = _plane_specs(tt, F2 + 1)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    accL = pl.BlockSpec((L,), lambda b, t, *_: (0,), memory_space=pltpu.VMEM)
    common = dict(
        tt=tt, F2=F2, L=L, k=k, C=C, pool=pool, rate=rate, eps=eps, nt=nt,
        train=train, lp=lp, cdtype=jnp.dtype(compute_dtype),
        act_bf16=act_bf16, interp=bool(interpret),
    )
    bm = jnp.asarray(_freq_matrix(tt, F2, pt, pf // k).T)  # upsample orientation
    args = (jnp.asarray(seed, jnp.int32).reshape(1), ev, ev, od, od, dout,
            w2, cbias, scale, bias, mean, var, gw, gb, bm)
    in_specs = [main, tail, main, tail, dout_spec] + [const] * 9

    dgw, dgb, s1, s2 = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nt), in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((L, L), lambda b, t, *_: (0, 0), memory_space=pltpu.VMEM),
                accL, accL, accL,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((L, L), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(*args)

    # global BN through-statistics coefficients. S1/S2 are per packed LANE;
    # the BN statistics are per CHANNEL, so fold the k lane-copies before
    # building the coefficients and re-tile (scale/var are exact tiles, so
    # their first C entries are the logical vectors). n is the LOCAL element
    # count: under shard_map the caller passes per-shard planes but the
    # GLOBAL mean/var — same contract as fused_bn_glu_dropout_pool.
    n_total = float(B * T * F)
    s1c = s1.reshape(k, C).sum(axis=0)
    s2c = s2.reshape(k, C).sum(axis=0)
    if batch_axis is not None:
        s1c = jax.lax.psum(s1c, batch_axis)
        s2c = jax.lax.psum(s2c, batch_axis)
        n_total = n_total * axis_size
    inv_c = jax.lax.rsqrt(var[:C] + eps)
    a = _tile_k(inv_c * scale[:C] * s1c / n_total, k)
    b2 = _tile_k(inv_c * inv_c * scale[:C] * s2c / n_total, k)

    dw2, dcb = pl.pallas_call(
        functools.partial(_bwd_wgrad_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nt),
            in_specs=in_specs + [const, const],
            out_specs=[
                pl.BlockSpec((J, L), lambda b, t, *_: (0, 0), memory_space=pltpu.VMEM),
                accL,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((J, L), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(*args, a, b2)
    # dscale/dbias per packed lane: S2 / S1 (folded to [C] by the caller's
    # differentiable tile packing)
    return dw2, dcb, s2, s1, dgw, dgb


# ---------------------------------------------------------- public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16, 17, 18, 19)
)
def fused_entry_block(ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed,
                      rate: float, pool: Tuple[int, int], eps: float,
                      train: bool, compute_dtype=jnp.float32,
                      act_bf16: bool = False, interpret: bool = False,
                      batch_axis=None, axis_size: int = 1):
    """Parity planes [B, T+8, F/2+1] ×2 + packed params → pooled
    [B, T/pt, F/pf, C]. See module docstring for the VJP contract."""
    return _fwd(ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed,
                rate, pool, eps, train, compute_dtype, act_bf16, interpret)


def _vjp_fwd(ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed,
             rate, pool, eps, train, compute_dtype, act_bf16, interpret,
             batch_axis, axis_size):
    out = _fwd(ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed,
               rate, pool, eps, train, compute_dtype, act_bf16, interpret)
    return out, (ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed)


def _vjp_bwd(rate, pool, eps, train, compute_dtype, act_bf16, interpret,
             batch_axis, axis_size, res, dout):
    ev, od, w2, cbias, scale, bias, mean, var, gw, gb, seed = res
    dw2, dcb, dscale, dbias, dgw, dgb = _bwd(
        ev, od, dout, w2, cbias, scale, bias, mean, var, gw, gb, seed,
        rate, pool, eps, train, compute_dtype, act_bf16, interpret,
        batch_axis, axis_size,
    )
    return (jnp.zeros_like(ev), jnp.zeros_like(od), dw2.astype(w2.dtype), dcb,
            dscale, dbias, jnp.zeros_like(mean), jnp.zeros_like(var),
            dgw, dgb, jnp.zeros_like(jnp.asarray(seed, jnp.int32)))


fused_entry_block.defvjp(_vjp_fwd, _vjp_bwd)


def entry_block_stats_apply(conv_params, x, compute_dtype=None, interpret=False):
    """x [B, T, F, 1] → per-CHANNEL (Σ, Σ²) f32 of the entry conv output
    (callers stop_gradient the derived mean/var)."""
    k = 2
    C = conv_params["w"].shape[-1]
    cdtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    act_bf16 = cdtype == jnp.bfloat16
    ev, od = EC.make_parity_planes(x[..., 0], cdtype)
    w2 = jax.lax.stop_gradient(EC.build_w2(conv_params["w"], k).astype(cdtype))
    cbias = jax.lax.stop_gradient(jnp.tile(conv_params["b"], k))
    s1, s2 = entry_block_stats(ev, od, w2, cbias, cdtype, act_bf16, interpret)
    return s1.reshape(k, C).sum(axis=0), s2.reshape(k, C).sum(axis=0)


def entry_block_apply(conv_params, scale, bias, mean, var, glu_w, glu_b,
                      x, seed, rate, pool, eps, train,
                      compute_dtype=None, interpret=False,
                      batch_axis=None, axis_size=1):
    """Logical-parameter wrapper: x [B, T, F, 1] + [C]-shaped BN vectors +
    [C, C] GLU weight → pooled [B, T/pt, F/pf, C]. Parameter packing uses
    differentiable ops, so gradients fold back to the logical shapes."""
    k = 2
    C = conv_params["w"].shape[-1]
    cdtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    act_bf16 = cdtype == jnp.bfloat16
    ev, od = EC.make_parity_planes(x[..., 0], cdtype)
    w2 = EC.build_w2(conv_params["w"], k).astype(cdtype)
    cbias = jnp.tile(conv_params["b"], k)
    out = fused_entry_block(
        ev, od, w2, cbias,
        _tile_k(scale, k), _tile_k(bias, k), _tile_k(mean, k), _tile_k(var, k),
        _pack_w(glu_w, k), _tile_k(glu_b, k),
        seed, rate, tuple(pool), eps, train, cdtype, act_bf16, interpret,
        batch_axis, axis_size,
    )
    return out


def reference_entry_block(x, conv_w, conv_b, scale, bias, mean, var, glu_w, glu_b,
                          mask, keep, pool, eps):
    """jnp twin: x [B, T, F] (1 channel), conv_w [3, 3, 1, C]."""
    from dcase2019_task4_tpu.ops.fused_block import reference_block

    y = jax.lax.conv_general_dilated(
        x[..., None], conv_w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + conv_b
    return reference_block(y, scale, bias, mean, var, glu_w, glu_b, mask, keep, pool, eps)
