"""Fused ENTRY conv block: conv(C_in=1) → BN → GLU → dropout → pool, Pallas.

The first CRNN block is special: its input is the [B, T, F] log-mel feature
map (1 channel) and its conv output [B, T, F, 64] is the largest activation
of the whole network (≈680 MB bf16 at B=96) — the profiled majority of step
time is XLA materializing and re-reading it (conv write, BN-stats read,
chain read/write, plus layout copies around the pallas block kernel).

This kernel never materializes it. The 3×3 conv over a 1-channel input is
nine shifted adds — expressed as a [rows, 9] @ [9, C] matmul built from
static slices of a (1,1)-padded input tile. Halo rows arrive via a second
BlockSpec view of the same padded input (no manual DMA):

  main block: rows [t·tt, (t+1)·tt)        shape (1, tt, F+2)
  halo block: rows [(t+1)·tt, (t+1)·tt+2)  shape (1, 2, F+2)

Kernels:
  * stats   — conv per tile, accumulate Σ and Σ² per channel (batch stats
              for BN without ever writing the conv output)
  * forward — conv → BN → GLU → dropout (on-core PRNG) → pool
  * backward (2 passes, same structure as ops/fused_block.py):
      pass 1: recompute, accumulate dW_glu, db_glu, S1=Σdxn, S2=Σdxn·x̂
      pass 2: recompute, BN-backward → dy_conv, accumulate
              dconv_w [9, C], dconv_b [C]

IMPORTANT: the VJP returns a ZERO cotangent for the feature input x — valid
here because features come from the (non-differentiated) frontend. Do not
use this block anywhere gradients must flow into its input.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcase2019_task4_tpu.ops.fused_block import _chain_fwd, _dropout_mask, _params, _seed_for


def _conv_from_patches(xbuf, w9, b, tt, F, C):
    """xbuf [tt+2, F+2] (already padded) → conv_out [tt·F, C] f32."""
    slices = [xbuf[dt : dt + tt, df : df + F] for dt in range(3) for df in range(3)]
    patches = jnp.stack(slices, axis=-1).reshape(tt * F, 9)
    return jnp.dot(patches, w9, preferred_element_type=jnp.float32) + b, patches


def _load_tile(xm_ref, xh_ref):
    """Assemble the [tt+2, F+2] padded tile from main + halo blocks.
    The halo block is 8 rows (TPU sublane alignment); only the first 2 are
    real (the input is padded to T+8 rows so the block always fits)."""
    return jnp.concatenate([xm_ref[0], xh_ref[0][:2]], axis=0)


# ------------------------------------------------------------- kernels


def _stats_kernel(xm_ref, xh_ref, w9_ref, b_ref, sum_ref, sumsq_ref, *, tt, F, C):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sumsq_ref[:] = jnp.zeros_like(sumsq_ref)

    xbuf = _load_tile(xm_ref, xh_ref).astype(jnp.float32)
    y, _ = _conv_from_patches(xbuf, w9_ref[:], b_ref[:], tt, F, C)
    sum_ref[:] += jnp.sum(y, axis=0)
    sumsq_ref[:] += jnp.sum(y * y, axis=0)


def _fwd_kernel(seed_ref, xm_ref, xh_ref, w9_ref, b_ref, scale_ref, bias_ref,
                mean_ref, var_ref, gw_ref, gb_ref, out_ref,
                *, tt, F, C, pool, rate, eps, nt, train):
    xbuf = _load_tile(xm_ref, xh_ref).astype(jnp.float32)
    y, _ = _conv_from_patches(xbuf, w9_ref[:], b_ref[:], tt, F, C)
    xn, lin, sig = _chain_fwd(y, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
                              gw_ref[:], gb_ref[:], eps)
    g = lin * sig
    if train and rate > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, nt))
        g = g * _dropout_mask((tt * F, C), rate) * (1.0 / (1.0 - rate))
    pt, pf = pool
    pooled = g.reshape(tt // pt, pt, F // pf, pf, C).mean(axis=(1, 3))
    out_ref[0] = pooled.astype(out_ref.dtype)


def _recompute(seed_ref, xm_ref, xh_ref, dout_ref, w9_ref, b_ref, scale_ref,
               bias_ref, mean_ref, var_ref, gw_ref, gb_ref,
               *, tt, F, C, pool, rate, eps, nt, train):
    from dcase2019_task4_tpu.ops.fused_block import _recompute_dxn, _upsample

    xbuf = _load_tile(xm_ref, xh_ref).astype(jnp.float32)
    y, patches = _conv_from_patches(xbuf, w9_ref[:], b_ref[:], tt, F, C)
    dout_up = _upsample(dout_ref[0].astype(jnp.float32), tt, F, C, pool)
    xn, dlin, dxn = _recompute_dxn(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        gw_ref[:], gb_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        (tt * F, C), train,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    xhat = (y - mean_ref[:]) * inv
    return y, patches, xn, dlin, dxn, xhat, inv


def _bwd_reduce_kernel(seed_ref, xm_ref, xh_ref, dout_ref, w9_ref, b_ref,
                       scale_ref, bias_ref, mean_ref, var_ref, gw_ref, gb_ref,
                       dgw_ref, dgb_ref, s1_ref, s2_ref,
                       *, tt, F, C, pool, rate, eps, nt, train):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dgw_ref[:] = jnp.zeros_like(dgw_ref)
        dgb_ref[:] = jnp.zeros_like(dgb_ref)
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    _, _, xn, dlin, dxn, xhat, _ = _recompute(
        seed_ref, xm_ref, xh_ref, dout_ref, w9_ref, b_ref, scale_ref, bias_ref,
        mean_ref, var_ref, gw_ref, gb_ref,
        tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt, train=train,
    )
    dgw_ref[:] += jnp.dot(xn.T, dlin, preferred_element_type=jnp.float32)
    dgb_ref[:] += jnp.sum(dlin, axis=0)
    s1_ref[:] += jnp.sum(dxn, axis=0)
    s2_ref[:] += jnp.sum(dxn * xhat, axis=0)


def _bwd_apply_kernel(seed_ref, xm_ref, xh_ref, dout_ref, w9_ref, b_ref,
                      scale_ref, bias_ref, mean_ref, var_ref, gw_ref, gb_ref,
                      s1_ref, s2_ref,
                      dw9_ref, dcb_ref,
                      *, tt, F, C, pool, rate, eps, nt, n_total, train):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw9_ref[:] = jnp.zeros_like(dw9_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)

    _, patches, xn, dlin, dxn, xhat, inv = _recompute(
        seed_ref, xm_ref, xh_ref, dout_ref, w9_ref, b_ref, scale_ref, bias_ref,
        mean_ref, var_ref, gw_ref, gb_ref,
        tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt, train=train,
    )
    dy = inv * scale_ref[:] * (dxn - s1_ref[:] / n_total - xhat * s2_ref[:] / n_total)
    # accumulator is padded to 16 sublanes; write the real 9 rows
    dw9_ref[:9] += jnp.dot(patches.T, dy, preferred_element_type=jnp.float32)
    dcb_ref[:] += jnp.sum(dy, axis=0)


# ------------------------------------------------------------ dispatch


def _pick_tile(T: int, F: int, C: int) -> int:
    budget = 6_000_000
    # multiples of 8 only: main/halo blocks must be sublane-aligned
    for tt in (216, 96, 72, 48, 24, 16, 8):
        if T % tt == 0 and tt * F * C * 4 <= budget:
            return tt
    raise ValueError(f"no sublane-aligned tile divides T={T}")


def pad_features_for_entry(x):
    """[B, T, F] features → [B, T+8, F+2] zero-padded for fused_entry_block
    (1 leading + 7 trailing time rows: conv halo + block alignment)."""
    return jnp.pad(x, ((0, 0), (1, 7), (1, 1)))


def _x_specs(tt, F):
    """(main, halo) BlockSpecs over the padded input [B, T+8, F+2]
    (pad_features_for_entry). tt is a multiple of 8 so both the tt-row main
    block and the 8-row halo block are sublane-aligned."""
    main = pl.BlockSpec((1, tt, F + 2), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM)
    halo = pl.BlockSpec(
        (1, 8, F + 2), lambda b, t, *_: (b, (t + 1) * (tt // 8), 0), memory_space=pltpu.VMEM
    )
    return main, halo


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def entry_block_stats(xp, conv_w9, conv_b, tt=None):
    """xp: [B, T+2, F+2] padded features → (Σ, Σ²) per channel of the conv
    output (for BN batch statistics)."""
    B, Tp2, Fp2 = xp.shape
    T, F = Tp2 - 8, Fp2 - 2
    C = conv_w9.shape[1]
    tt = tt or _pick_tile(T, F, C)
    main, halo = _x_specs(tt, F)
    kernel = functools.partial(_stats_kernel, tt=tt, F=F, C=C)
    s, sq = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(B, T // tt),
            in_specs=[main, halo, _vmem(), _vmem()],
            out_specs=[
                pl.BlockSpec((C,), lambda b, t: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((C,), lambda b, t: (0,), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C,), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
        ],
        compiler_params=_params(),
    )(xp, xp, conv_w9, conv_b)
    return s, sq


def _fwd(xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed,
         rate, pool, eps, train, out_dtype):
    B, Tp2, Fp2 = xp.shape
    T, F = Tp2 - 8, Fp2 - 2
    C = conv_w9.shape[1]
    tt = _pick_tile(T, F, C)
    nt = T // tt
    pt, pf = pool
    main, halo = _x_specs(tt, F)
    kernel = functools.partial(
        _fwd_kernel, tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt, train=train
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=[main, halo] + [_vmem()] * 8,
            out_specs=pl.BlockSpec(
                (1, tt // pt, F // pf, C), lambda b, t, *_: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T // pt, F // pf, C), out_dtype),
        compiler_params=_params(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), xp, xp, conv_w9, conv_b,
      scale, bias, mean, var, glu_w, glu_b)


def _bwd(xp, dout, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed,
         rate, pool, eps, train):
    B, Tp2, Fp2 = xp.shape
    T, F = Tp2 - 8, Fp2 - 2
    C = conv_w9.shape[1]
    tt = _pick_tile(T, F, C)
    nt = T // tt
    pt, pf = pool
    main, halo = _x_specs(tt, F)
    dout_spec = pl.BlockSpec(
        (1, tt // pt, F // pf, C), lambda b, t, *_: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [main, halo, dout_spec] + [_vmem()] * 8
    args = (jnp.asarray(seed, jnp.int32).reshape(1), xp, xp, dout, conv_w9, conv_b,
            scale, bias, mean, var, glu_w, glu_b)
    acc_c = lambda: pl.BlockSpec((C,), lambda b, t, *_: (0,), memory_space=pltpu.VMEM)

    reduce_kernel = functools.partial(
        _bwd_reduce_kernel, tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt, train=train
    )
    dgw, dgb, s1, s2 = pl.pallas_call(
        reduce_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nt), in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((C, C), lambda b, t, *_: (0, 0), memory_space=pltpu.VMEM),
                acc_c(), acc_c(), acc_c(),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
        ],
        compiler_params=_params(),
    )(*args)

    apply_kernel = functools.partial(
        _bwd_apply_kernel, tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt,
        n_total=float(B * T * F), train=train,
    )
    dw9, dcb = pl.pallas_call(
        apply_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, nt),
            in_specs=in_specs + [_vmem(), _vmem()],
            out_specs=[
                pl.BlockSpec((16, C), lambda b, t, *_: (0, 0), memory_space=pltpu.VMEM),
                acc_c(),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((16, C), jnp.float32),  # padded 9→16 rows
            jax.ShapeDtypeStruct((C,), jnp.float32),
        ],
        compiler_params=_params(),
    )(*args, s1, s2)
    return dw9[:9], dcb, s2, s1, dgw, dgb


# ---------------------------------------------------------- public API


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_entry_block(xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b,
                      seed, rate: float, pool: Tuple[int, int], eps: float, train: bool):
    """xp: [B, T+2, F+2] zero-padded 1-channel features; conv_w9: [9, C]
    (3×3 kernel flattened dt-major). Returns pooled [B, T/pt, F/pf, C].

    VJP contract: mean/var must be stop_gradient'ed batch stats of the conv
    output (use entry_block_stats); the cotangent for xp is ZERO by design
    (features are not differentiated)."""
    return _fwd(xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed,
                rate, pool, eps, train, jnp.bfloat16 if xp.dtype == jnp.bfloat16 else xp.dtype)


def _vjp_fwd(xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed,
             rate, pool, eps, train):
    out = _fwd(xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed,
               rate, pool, eps, train, jnp.bfloat16 if xp.dtype == jnp.bfloat16 else xp.dtype)
    return out, (xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed)


def _vjp_bwd(rate, pool, eps, train, res, dout):
    xp, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed = res
    dw9, dcb, dscale, dbias, dgw, dgb = _bwd(
        xp, dout, conv_w9, conv_b, scale, bias, mean, var, glu_w, glu_b, seed,
        rate, pool, eps, train,
    )
    return (jnp.zeros_like(xp), dw9, dcb, dscale, dbias,
            jnp.zeros_like(mean), jnp.zeros_like(var), dgw, dgb,
            jnp.zeros_like(jnp.asarray(seed, jnp.int32)))


fused_entry_block.defvjp(_vjp_fwd, _vjp_bwd)


def reference_entry_block(x, conv_w, conv_b, scale, bias, mean, var, glu_w, glu_b,
                          mask, keep, pool, eps):
    """jnp twin: x [B, T, F] (1 channel), conv_w [3, 3, 1, C]."""
    from dcase2019_task4_tpu.ops.fused_block import reference_block

    y = jax.lax.conv_general_dilated(
        x[..., None], conv_w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + conv_b
    return reference_block(y, scale, bias, mean, var, glu_w, glu_b, mask, keep, pool, eps)
