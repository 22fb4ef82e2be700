"""Fused post-conv block: BatchNorm → GLU → dropout → avg-pool, in Pallas.

Why: the profiled cost of the CRNN step on v5e is dominated not by matmuls
but by the elementwise chain each conv block runs over its full-resolution
activation (e.g. [96, 864, 64, 64] ≈ 680 MB bf16 for block 1). XLA executes
it as several separate HBM round-trips (BN stats read, normalize+GLU,
dropout rng+apply, pool) ≈ 4–7 passes over the tensor per direction. This
kernel does the whole chain in ONE pass per direction:

  forward:   read conv_out tile → BN (precomputed batch stats) → GLU
             (lin = xn@W+b, out = lin·σ(xn)) → dropout (on-core PRNG)
             → avg-pool (pt, pf) → write pooled tile   [8× smaller]
  backward:  two passes (BN training backward needs global Σdxn, Σdxn·x̂):
             pass 1 recomputes the chain per tile and accumulates
             dW, db, S1=Σdxn, S2=Σdxn·x̂ across the sequential grid;
             pass 2 recomputes dxn and writes
             dy = inv·γ·(dxn − S1/N − x̂·S2/N).

Dropout masks are regenerated identically in both directions from a
deterministic per-tile seed (pltpu.prng_seed keyed on the grid position),
so no mask tensor ever exists in HBM.

Semantics match the reference block exactly (models/CNN.py:44-67: BN eps
1e-3 with batch statistics in training, GLU, dropout, AvgPool2d) and the
module ships a pure-jnp twin (`reference_block`) used for eval mode, CPU,
and correctness tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ------------------------------------------------------------- jnp twin


def reference_block(y, scale, bias, mean, var, glu_w, glu_b, mask, keep, pool, eps):
    """Pure-jnp BN→GLU→(given mask)dropout→pool on [B, T, F, C]."""
    inv = jax.lax.rsqrt(var + eps)
    xn = (y - mean) * inv * scale + bias
    lin = xn @ glu_w + glu_b
    g = lin * jax.nn.sigmoid(xn)
    if mask is not None:
        g = g * mask / keep
    B, T, F, C = g.shape
    pt, pf = pool
    return g.reshape(B, T // pt, pt, F // pf, pf, C).mean(axis=(2, 4))


# ----------------------------------------------------------- fwd kernel


def _seed_for(seed_ref, nt):
    b = pl.program_id(0)
    t = pl.program_id(1)
    return seed_ref[0] + b * nt + t


def _chain_fwd(y, scale, bias, mean, var, glu_w, glu_b, eps):
    """Shared BN+GLU math on a [rows, C] tile; returns (xn, lin, sig)."""
    inv = jax.lax.rsqrt(var + eps)
    xn = (y - mean) * inv * scale + bias
    lin = jnp.dot(xn, glu_w, preferred_element_type=jnp.float32) + glu_b
    sig = jax.nn.sigmoid(xn)
    return xn, lin, sig


def _dropout_mask(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(int(rate * 2**32), 2**32 - 1))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold).astype(jnp.float32)


def _fwd_kernel(seed_ref, y_ref, scale_ref, bias_ref, mean_ref, var_ref,
                w_ref, b_ref, out_ref, *, tt, F, C, pool, rate, eps, nt, train):
    y = y_ref[0].reshape(tt * F, C).astype(jnp.float32)
    xn, lin, sig = _chain_fwd(
        y, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:], w_ref[:], b_ref[:], eps
    )
    g = lin * sig
    if train and rate > 0.0:
        pltpu.prng_seed(_seed_for(seed_ref, nt))
        g = g * _dropout_mask((tt * F, C), rate) * (1.0 / (1.0 - rate))
    pt, pf = pool
    pooled = g.reshape(tt // pt, pt, F // pf, pf, C).mean(axis=(1, 3))
    out_ref[0] = pooled.astype(out_ref.dtype)


# ----------------------------------------------- bwd kernels (2 passes)


def _recompute_dxn(y, dout_up, scale, bias, mean, var, w, b, eps, rate, keep, seed_val, shape, train):
    """Recompute forward pieces and the gradient into the BN output."""
    xn, lin, sig = _chain_fwd(y, scale, bias, mean, var, w, b, eps)
    dh = dout_up
    if train and rate > 0.0:
        pltpu.prng_seed(seed_val)
        dh = dh * _dropout_mask(shape, rate) * (1.0 / keep)
    dlin = dh * sig
    dxn_gate = dh * lin * sig * (1.0 - sig)
    dxn = jnp.dot(dlin, w.T, preferred_element_type=jnp.float32) + dxn_gate
    return xn, dlin, dxn


def _upsample(dout, tt, F, C, pool):
    """Pool cotangent → per-element cotangent (mean pooling backward)."""
    pt, pf = pool
    d = dout.reshape(tt // pt, 1, F // pf, 1, C)
    d = jnp.broadcast_to(d, (tt // pt, pt, F // pf, pf, C))
    return (d / (pt * pf)).reshape(tt * F, C)


def _bwd_reduce_kernel(seed_ref, y_ref, dout_ref, scale_ref, bias_ref, mean_ref,
                       var_ref, w_ref, b_ref,
                       dw_ref, db_ref, s1_ref, s2_ref,
                       *, tt, F, C, pool, rate, eps, nt, train):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    y = y_ref[0].reshape(tt * F, C).astype(jnp.float32)
    dout_up = _upsample(dout_ref[0].astype(jnp.float32), tt, F, C, pool)
    xn, dlin, dxn = _recompute_dxn(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        w_ref[:], b_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        (tt * F, C), train,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    xhat = (y - mean_ref[:]) * inv
    dw_ref[:] += jnp.dot(xn.T, dlin, preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dlin, axis=0)
    s1_ref[:] += jnp.sum(dxn, axis=0)
    s2_ref[:] += jnp.sum(dxn * xhat, axis=0)


def _bwd_apply_kernel(seed_ref, y_ref, dout_ref, scale_ref, bias_ref, mean_ref,
                      var_ref, w_ref, b_ref, s1_ref, s2_ref,
                      dy_ref, *, tt, F, C, pool, rate, eps, nt, n_total, train):
    y = y_ref[0].reshape(tt * F, C).astype(jnp.float32)
    dout_up = _upsample(dout_ref[0].astype(jnp.float32), tt, F, C, pool)
    xn, dlin, dxn = _recompute_dxn(
        y, dout_up, scale_ref[:], bias_ref[:], mean_ref[:], var_ref[:],
        w_ref[:], b_ref[:], eps, rate, 1.0 - rate, _seed_for(seed_ref, nt),
        (tt * F, C), train,
    )
    inv = jax.lax.rsqrt(var_ref[:] + eps)
    xhat = (y - mean_ref[:]) * inv
    # BN training backward: dy = inv·γ·(dxn − S1/N − x̂·S2/N)
    dy = inv * scale_ref[:] * (dxn - s1_ref[:] / n_total - xhat * s2_ref[:] / n_total)
    dy_ref[0] = dy.reshape(tt, F, C).astype(dy_ref.dtype)


# ------------------------------------------------------------ dispatch


_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128MB VMEM; the 16MB default is
# only the compiler's conservative scoped cap


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pick_tile(T: int, F: int = 64, C: int = 64) -> int:
    # fwd and bwd MUST use the same tiling: dropout bits are generated
    # per-tile (seeded on the grid position), so the mask layout is part of
    # the function's semantics. The backward holds ~10 live f32 [tt·F, C]
    # buffers (plus double-buffered input blocks); budget them against the
    # raised VMEM limit.
    budget_bytes = 6_000_000  # per [tt·F, C] f32 buffer
    for tt in (96, 72, 48, 36, 24, 16, 12, 8, 6, 4, 2, 1):
        if T % tt == 0 and tt * F * C * 4 <= budget_bytes:
            return tt
    return 1


def _specs(tt, F, C, pool, B, T):
    nt = T // tt
    pt, pf = pool
    grid = (B, nt)
    in_specs = [
        pl.BlockSpec((1, tt, F, C), lambda b, t, *_: (b, t, 0, 0), memory_space=pltpu.VMEM),  # y
        pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        pl.BlockSpec(memory_space=pltpu.VMEM),  # mean
        pl.BlockSpec(memory_space=pltpu.VMEM),  # var
        pl.BlockSpec(memory_space=pltpu.VMEM),  # glu_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # glu_b
    ]
    out_spec = pl.BlockSpec(
        (1, tt // pt, F // pf, C), lambda b, t, *_: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    return grid, nt, in_specs, out_spec


def _fwd_pallas(y, scale, bias, mean, var, glu_w, glu_b, seed, rate, pool, eps, train,
                interpret=False):
    B, T, F, C = y.shape
    tt = _pick_tile(T, F, C)
    grid, nt, in_specs, out_spec = _specs(tt, F, C, pool, B, T)
    pt, pf = pool
    kernel = functools.partial(
        _fwd_kernel, tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt, train=train
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs, out_specs=out_spec
        ),
        out_shape=jax.ShapeDtypeStruct((B, T // pt, F // pf, C), y.dtype),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), y, scale, bias, mean, var, glu_w, glu_b)


def _bwd_pallas(y, dout, scale, bias, mean, var, glu_w, glu_b, seed, rate, pool, eps,
                train, interpret=False):
    B, T, F, C = y.shape
    tt = _pick_tile(T, F, C)
    grid, nt, in_specs, _ = _specs(tt, F, C, pool, B, T)
    pt, pf = pool
    dout_spec = pl.BlockSpec(
        (1, tt // pt, F // pf, C), lambda b, t, *_: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    reduce_in = in_specs[:1] + [dout_spec] + in_specs[1:]
    # accumulator outputs live in VMEM across the whole sequential grid
    reduce_out_specs = [
        pl.BlockSpec((C, C), lambda b, t, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b, t, *_: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b, t, *_: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b, t, *_: (0,), memory_space=pltpu.VMEM),
    ]
    reduce_kernel = functools.partial(
        _bwd_reduce_kernel, tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt, train=train
    )
    dw, db, s1, s2 = pl.pallas_call(
        reduce_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=reduce_in, out_specs=reduce_out_specs
        ),
        out_shape=[
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
            jax.ShapeDtypeStruct((C,), jnp.float32),
        ],
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), y, dout, scale, bias, mean, var, glu_w, glu_b)

    apply_in = reduce_in + [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # s1
        pl.BlockSpec(memory_space=pltpu.VMEM),  # s2
    ]
    n_total = float(B * T * F)
    apply_kernel = functools.partial(
        _bwd_apply_kernel, tt=tt, F=F, C=C, pool=pool, rate=rate, eps=eps, nt=nt,
        n_total=n_total, train=train,
    )
    dy = pl.pallas_call(
        apply_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=apply_in,
            out_specs=pl.BlockSpec((1, tt, F, C), lambda b, t, *_: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, F, C), y.dtype),
        compiler_params=None if interpret else _params(),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), y, dout, scale, bias, mean, var, glu_w, glu_b, s1, s2)

    # d(scale), d(bias): γ receives Σdxn·x̂ = s2, β receives Σdxn = s1
    return dy, s2, s1, dw, db


# ---------------------------------------------------------- public API


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12)
)
def fused_bn_glu_dropout_pool(
    y, scale, bias, mean, var, glu_w, glu_b, seed,
    rate: float, pool: Tuple[int, int], eps: float, train: bool,
    interpret: bool = False,
):
    """Fused BN(batch stats)→GLU→dropout→avgpool with exact custom VJP.

    y: [B, T, F, C] conv output; seed: int32 scalar array (traced — changes
    per step); mean/var: the batch statistics of y. This function's VJP
    contains the full BN-training backward (including the through-statistics
    terms), so callers must pass mean/var as jax.lax.stop_gradient(stats) to
    avoid double-counting.
    """
    return _fwd_pallas(y, scale, bias, mean, var, glu_w, glu_b, seed, rate, pool, eps,
                       train, interpret)


def _vjp_fwd(y, scale, bias, mean, var, glu_w, glu_b, seed, rate, pool, eps, train, interpret):
    out = _fwd_pallas(y, scale, bias, mean, var, glu_w, glu_b, seed, rate, pool, eps,
                      train, interpret)
    return out, (y, scale, bias, mean, var, glu_w, glu_b, seed)


def _vjp_bwd(rate, pool, eps, train, interpret, res, dout):
    y, scale, bias, mean, var, glu_w, glu_b, seed = res
    dy, dscale, dbias, dw, db = _bwd_pallas(
        y, dout, scale, bias, mean, var, glu_w, glu_b, seed, rate, pool, eps, train, interpret
    )
    # mean/var are stop_gradient inputs: zero cotangents; seed: zero
    return (dy, dscale, dbias, jnp.zeros_like(mean), jnp.zeros_like(var), dw, db,
            jnp.zeros_like(jnp.asarray(seed, jnp.int32)))


fused_bn_glu_dropout_pool.defvjp(_vjp_fwd, _vjp_bwd)
