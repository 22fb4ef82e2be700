"""Packed-layout 3×3 convolution as row-shifted matmuls (Pallas, TPU).

Blocks 2/3 of the CRNN convolve multi-channel activations that the fused
Pallas blocks (ops/fused_block.py) keep in the lane-packed row-major view
[B, T, F/k, k·C] (k = 128//C). XLA's conv wants its batch-minor layout
({0,3,2,1}) instead, so every conv is bracketed by ~0.3–0.5 ms transpose
copies — ~5 ms/step at B=96 on v5e across both models and directions
(docs/PERF.md). This kernel runs the conv *in* the packed layout:

    out[b, t, f2, :] = Σ_{dt∈0..2, g∈−1..1} x[b, t+dt−1, f2+g, :] @ W[dt,g]

Each (dt, g) term is a sublane shift of the flattened [T·F2, 128] row
matrix (shift = dt·F2 + g) followed by one [128, 128] MXU matmul; the 3×3
kernel's freq taps live in the part-weights' band structure:

    W[dt, g][(hi, ci), (ho, co)] = w[dt, k·g + hi − ho + 1, ci, co]
    (zero where the freq offset falls outside the 3-tap window)

Freq-edge zero padding emerges from masking the g = ±1 terms at f2 = 0 /
f2 = F2−1 (the shifted rows there belong to the neighboring time step).
Time-edge padding needs no padded copy of the activation: each grid step
reads one halo row on each side through 8-row overlap blocks of the same
array (clamped index maps), zeroed in-kernel at the global boundaries.
The transpose conv (input gradient) is the same kernel with
flipped/transposed part-weights — the g-masks are self-mirroring — and the
weight gradient is a third accumulating kernel; both wired through a
custom VJP. The part-weight embedding itself is differentiable, so the
fold-back of part cotangents onto w [3,3,C,C] is automatic.

Replaces lax.conv_general_dilated for the interior blocks on TPU
(reference conv semantics: models/CNN.py:47-67, 3×3 stride 1 pad 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024
LANES = 128


def pack_factor(F: int, C: int) -> int:
    return LANES // C if (C <= LANES and LANES % C == 0 and F % (LANES // C) == 0) else 1


# ------------------------------------------------------------ embeddings


def part_weights(w: jax.Array, k: int) -> jax.Array:
    """w [3, 3, C, C] (HWIO) → part-weights [3, 3, L, L] indexed (dt, g+1).

    Differentiable (slice placements), so jax.grad folds part-weight
    cotangents back onto w."""
    C = w.shape[-1]
    L = k * C
    out = jnp.zeros((3, 3, L, L), w.dtype)
    for g in range(-1, 2):
        for hi in range(k):
            for ho in range(k):
                df = k * g + hi - ho + 1
                if 0 <= df <= 2:
                    out = out.at[
                        :, g + 1, hi * C : (hi + 1) * C, ho * C : (ho + 1) * C
                    ].set(w[:, df])
    return out


def flip_parts(parts: jax.Array) -> jax.Array:
    """Part-weights of the transpose conv: W'[dt, g] = W[2−dt, 2−g]ᵀ."""
    return jnp.flip(parts, axis=(0, 1)).transpose(0, 1, 3, 2)


# ------------------------------------------------------------ kernels


def _row_masks(n: int, F2: int):
    """Row masks from an iota: lo[r]=0 where f2==0 (kills g=−1), hi[r]=0
    where f2==F2−1 (kills g=+1). Also correct for the transpose conv: the
    g=±1 contribution to row r is valid iff f2(r)±1 is in range — the same
    predicate."""
    f2 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) % F2
    lo = (f2 != 0).astype(jnp.float32)
    hi = (f2 != F2 - 1).astype(jnp.float32)
    return lo, hi


def _halo_rows(head_ref, main_ref, tail_ref, tt, F2, L, dtype):
    """Assemble [2 + (tt+2)·F2, L] rows: a zero guard row at each end (the
    extreme taps dt=0,g=−1 at r=0 and dt=2,g=+1 at r=n−1 slice one row
    past the halo; both values are masked, the slices just need to stay
    in-bounds), the halo row before the tile (zeroed at t=0), the tile,
    and the halo row after (zeroed at t=T−1)."""
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    prev = head_ref[0][7].astype(dtype) * jnp.where(i > 0, 1.0, 0.0).astype(dtype)
    nxt = tail_ref[0][0].astype(dtype) * jnp.where(i < last, 1.0, 0.0).astype(dtype)
    zero = jnp.zeros((1, L), dtype)
    return jnp.concatenate(
        [
            zero,
            prev.reshape(F2, L),
            main_ref[0].reshape(tt * F2, L).astype(dtype),
            nxt.reshape(F2, L),
            zero,
        ],
        axis=0,
    )


def _precision(dtype):
    # pinned per-dot so the global matmul-precision flag can't leak in
    # (Mosaic rejects fp32-contract bf16 matmuls); f32 compute stays exact
    return (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _conv_kernel(head_ref, main_ref, tail_ref, parts_ref, bias_ref, out_ref,
                 *, tt, F2, L, dtype):
    rows = _halo_rows(head_ref, main_ref, tail_ref, tt, F2, L, dtype)
    n = tt * F2
    lo, hi = _row_masks(n, F2)
    acc = jnp.zeros((n, L), jnp.float32)
    for dt in range(3):
        for g in (-1, 0, 1):
            s = dt * F2 + g + 1  # +1: zero guard row
            lhs = rows[s : s + n, :]
            term = jax.lax.dot_general(
                lhs, parts_ref[dt, g + 1].astype(dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision(dtype),
            )
            if g == -1:
                term = term * lo
            elif g == 1:
                term = term * hi
            acc = acc + term
    acc = acc + bias_ref[:].astype(jnp.float32)
    out_ref[0] = acc.reshape(tt, F2, L).astype(out_ref.dtype)


def _wgrad_kernel(head_ref, main_ref, tail_ref, dy_ref, dparts_ref, db_ref,
                  *, tt, F2, L, dtype):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dparts_ref[:] = jnp.zeros_like(dparts_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    rows = _halo_rows(head_ref, main_ref, tail_ref, tt, F2, L, dtype)
    dy = dy_ref[0].reshape(tt * F2, L).astype(jnp.float32)
    n = tt * F2
    lo, hi = _row_masks(n, F2)
    for dt in range(3):
        for g in (-1, 0, 1):
            s = dt * F2 + g + 1
            lhs = rows[s : s + n, :]
            dyg = dy
            if g == -1:
                dyg = dy * lo
            elif g == 1:
                dyg = dy * hi
            # lhsᵀ @ dy, contracting the row axis — no materialized transpose
            dparts_ref[dt, g + 1] += jax.lax.dot_general(
                lhs, dyg.astype(dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_precision(dtype),
            )
    db_ref[:] += jnp.sum(dy, axis=0)


# ------------------------------------------------------------ dispatch


def _pick_tile(T: int, max_tile: int = 256) -> int:
    for tt in range(min(T, max_tile), 0, -1):
        if T % tt == 0 and tt % 8 == 0:
            return tt
    return 0


def _x_specs(tt):
    """head (last row = tile_start − 1, clamped at 0), main, tail (first
    row = tile_end, clamped to stay in-bounds for the last tile)."""

    def head(b, i, _tt=tt):
        return (b, jnp.maximum(i * _tt - 8, 0) // 8, 0, 0)

    def tail(b, i, _tt=tt):
        last = pl.num_programs(1) - 1
        return (b, jnp.where(i < last, (i + 1) * _tt // 8, (i + 1) * _tt // 8 - 1), 0, 0)

    def main(b, i):
        return (b, i, 0, 0)

    return head, main, tail


def _run_conv(x, parts, bias, *, tt, F2, L, dtype, out_dtype, interpret):
    B, T = x.shape[0], x.shape[1]
    head, main, tail = _x_specs(tt)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_conv_kernel, tt=tt, F2=F2, L=L, dtype=dtype),
        grid=(B, T // tt),
        in_specs=[
            pl.BlockSpec((1, 8, F2, L), head, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, F2, L), main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, F2, L), tail, memory_space=pltpu.VMEM),
            const,
            const,
        ],
        out_specs=pl.BlockSpec((1, tt, F2, L), main, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, F2, L), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, x, parts, bias)


def _run_wgrad(x, dy, *, tt, F2, L, dtype, interpret):
    B, T = x.shape[0], x.shape[1]
    head, main, tail = _x_specs(tt)
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, tt=tt, F2=F2, L=L, dtype=dtype),
        grid=(B, T // tt),
        in_specs=[
            pl.BlockSpec((1, 8, F2, L), head, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, F2, L), main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, F2, L), tail, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, F2, L), main, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, 3, L, L), lambda b, i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3, L, L), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, x, x, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_conv(x, parts, bias_packed, compute_dtype, interpret=False):
    """x [B, T, F2, L] packed activation → same-shape conv output.

    parts: [3, 3, L, L] from part_weights(); bias_packed: [L] (= k-tiled
    conv bias). Output dtype follows x (f32 accumulation inside)."""
    out, _ = _packed_conv_fwd(x, parts, bias_packed, compute_dtype, interpret)
    return out


def _packed_conv_fwd(x, parts, bias_packed, compute_dtype, interpret):
    B, T, F2, L = x.shape
    tt = _pick_tile(T)
    out = _run_conv(
        x, parts, bias_packed, tt=tt, F2=F2, L=L,
        dtype=jnp.dtype(compute_dtype), out_dtype=x.dtype, interpret=interpret,
    )
    return out, (x, parts)


def _packed_conv_bwd(compute_dtype, interpret, res, dy):
    x, parts = res
    B, T, F2, L = x.shape
    tt = _pick_tile(T)
    dtype = jnp.dtype(compute_dtype)
    # input gradient: transpose conv = same kernel, flipped/transposed parts
    dx = _run_conv(
        dy, flip_parts(parts), jnp.zeros((L,), jnp.float32),
        tt=tt, F2=F2, L=L, dtype=dtype, out_dtype=x.dtype, interpret=interpret,
    )
    dparts, db = _run_wgrad(x, dy, tt=tt, F2=F2, L=L, dtype=dtype, interpret=interpret)
    return dx, dparts.astype(parts.dtype), db


packed_conv.defvjp(_packed_conv_fwd, _packed_conv_bwd)


def conv2d_packed(params, x, compute_dtype=None, interpret: bool = False):
    """Drop-in for layers.conv2d_apply on 3×3 s1 p1 same-channel convs with
    a lane-packable activation. x [B, T, F, C] → [B, T, F, C].

    Routes through the packed Pallas kernel: reshape to the packed view
    (pure bitcast of the row-major array), conv in-layout, reshape back."""
    w = params["w"]  # [3, 3, C, C]
    C = w.shape[-1]
    B, T, F, _ = x.shape
    k = pack_factor(F, C)
    F2, L = F // k, k * C
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    parts = part_weights(w, k).astype(dtype)
    bias = jnp.tile(params["b"], k)
    x2 = x.reshape(B, T, F2, L)
    out = packed_conv(x2, parts, bias, dtype, interpret)
    return out.reshape(B, T, F, C)
