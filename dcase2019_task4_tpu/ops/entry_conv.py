"""Entry 3×3 conv (1 input channel) as a fused Pallas im2col matmul.

Replaces the XLA-side strided-slice im2col path
(models/layers.py conv2d_entry_packed) on TPU. That path materializes a
[B, T, F2, 12] patch tensor whose 12-lane minor pads to 128 lanes in HBM —
680 MB of traffic for 64 MB of data — plus ~1.3 ms of layout copies around
it and a separate 680 MB db reduce; the cluster profiled at ~7.9 ms of the
37.5 ms step (docs/PERF.md). Here the patch tensor never leaves VMEM:

  * XLA prepares two PARITY PLANES of the zero-padded input,
    even = xp[:, :, 0::2] and odd = xp[:, :, 1::2], each [B, T+2, F/2+1]
    (~11 MB bf16 total — trivial). Every patch column j = (dt, e) of the
    k = 2 lane-packing is then a CONTIGUOUS F2-lane slice of a plane:
    e ∈ {0,1,2,3} → (even|odd)[t+dt, f2 + (0|0|1|1)] — no lane-strided
    access anywhere (the pattern Mosaic handles badly, docs/PERF.md
    "Measured dead ends").
  * The forward kernel builds the [tt·F2, 12] patch tile in VMEM, runs one
    MXU matmul against the resident packed weight W2 [12, 128] (embedding
    from conv2d_entry_packed's derivation, models/layers.py:63-67), adds
    the packed bias, and writes the [tt, F2, 128] lane-packed output the
    fused blocks read — crucially, (t, f2) both land on the ROW axis of
    the matmul, so the output layout is natively f2-sublane (the property
    that sank every big-N rowmat formulation).
  * The forward also accumulates the per-lane Σ / Σ² of the output that
    the BatchNorm batch statistics need — no separate 680 MB stats pass.
  * The weight-gradient kernel rebuilds the patch tile from the planes
    (recompute: the input is ~60× smaller than dy) and contracts it with
    dy for dW2 [12, 128]; db [128] rides along on the same dy read.
  * No input gradient exists: the conv consumes the (non-trainable) mel
    features, so dL/d(planes) is never needed (first layer,
    models/CRNN.py:59-62); the VJP returns zeros which XLA removes.

Reference semantics: models/CNN.py:47 Conv2d(1, 64, 3, 1, 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024
LANES = 128
J = 12  # patch columns: 3 (dt) × 4 (e = h + df, k + 2 with k = 2)


def _precision(dtype):
    # pinned per-dot: the global matmul-precision flag must not leak into
    # bf16 Mosaic dots ("Bad lhs type", CLAUDE.md)
    return (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def pick_tile(T: int, max_tile: int = 96) -> int:
    """Largest multiple-of-8 tile dividing T (0 = not tileable)."""
    for tt in range(min(T, max_tile), 0, -1):
        if T % tt == 0 and tt % 8 == 0:
            return tt
    return 0


def build_w2(w: jax.Array, k: int = 2) -> jax.Array:
    """Embed the [3, 3, 1, C] conv kernel into the packed patch basis
    W2 [3(k+2), k·C]: W2[(dt, e), h·C + c] = w[dt, e − h, 0, c] for
    0 ≤ e − h ≤ 2 (zero elsewhere). Differentiable (slice placements), so
    jax.grad folds the dW2 cotangent back onto w."""
    C = w.shape[-1]
    wj = w[:, :, 0, :]  # [3, 3, C]
    w2 = jnp.zeros((3, k + 2, k, C), wj.dtype)
    for h in range(k):
        for e in range(k + 2):
            if 0 <= e - h <= 2:
                w2 = w2.at[:, e, h, :].set(wj[:, e - h, :])
    return w2.reshape(3 * (k + 2), k * C)


def make_parity_planes(x: jax.Array, dtype):
    """x [B, T, F] → (even, odd) [B, T+8, F//2+1] parity planes of the
    zero-padded input; rows T+2..T+7 are extra zeros so the kernels'
    8-row tail halo block stays in bounds on the last tile."""
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 7), (1, 1)))
    return xp[:, :, 0::2], xp[:, :, 1::2]


def _assemble(main_ref, tail_ref):
    """[tt] main rows + first 2 tail rows → [tt+2] halo rows."""
    return jnp.concatenate([main_ref[0], tail_ref[0][:2]], axis=0)


def _patch_tile(ev, od, tt, F2, dtype):
    """[tt+2, F2+1] parity planes → [tt·F2, J] patch tile.

    Column j = 4·dt + e; each part is a contiguous lane slice. The
    minor-axis stack is the one (patch-sized, VMEM-local) relayout this
    design pays instead of the 680 MB HBM patch tensor. The stack runs in
    f32 regardless of compute dtype — Mosaic only supports non-no-op
    minor-dim insertion for 32-bit types — and casts after."""
    parts = []
    for dt in range(3):
        for plane, off in ((ev, 0), (od, 0), (ev, 1), (od, 1)):  # e = 0..3
            parts.append(plane[dt : dt + tt, off : off + F2].astype(jnp.float32))
    patches = jnp.stack(parts, axis=-1)  # [tt, F2, J]
    return patches.reshape(tt * F2, J).astype(dtype)


def _fwd_kernel(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, bias_ref,
                out_ref, s1_ref, s2_ref, *, tt, F2, L, dtype):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    ev = _assemble(evm_ref, evt_ref)
    od = _assemble(odm_ref, odt_ref)
    patches = _patch_tile(ev, od, tt, F2, dtype)
    out = jax.lax.dot_general(
        patches, w2_ref[:].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(dtype),
    ) + bias_ref[:].astype(jnp.float32)
    stored = out.astype(out_ref.dtype)
    out_ref[0] = stored.reshape(tt, F2, L)
    # BN batch statistics of the conv output as STORED (the storage-dtype
    # rounding is what downstream consumers see), per packed lane
    os = stored.astype(jnp.float32)
    s1_ref[:] += jnp.sum(os, axis=0)
    s2_ref[:] += jnp.sum(os * os, axis=0)


def _wgrad_kernel(evm_ref, evt_ref, odm_ref, odt_ref, dy_ref,
                  dw2_ref, db_ref, *, tt, F2, L, dtype):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    ev = _assemble(evm_ref, evt_ref)
    od = _assemble(odm_ref, odt_ref)
    patches = _patch_tile(ev, od, tt, F2, dtype)
    dy = dy_ref[0].reshape(tt * F2, L)
    # patchesᵀ @ dy, contracting the row axis — no materialized transpose
    dw2_ref[:] += jax.lax.dot_general(
        patches, dy.astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_precision(dtype),
    )
    db_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=0)


def _plane_specs(tt, F2p):
    main = pl.BlockSpec((1, tt, F2p), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    # 8-row tail halo block at row (i+1)·tt (in 8-row block units — tt is a
    # multiple of 8); in bounds on the last tile because the planes carry 6
    # extra zero rows (make_parity_planes)
    tail = pl.BlockSpec((1, 8, F2p), lambda b, i: (b, (i + 1) * tt // 8, 0),
                        memory_space=pltpu.VMEM)
    return main, tail


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def entry_conv(ev, od, w2, bias_packed, out_dtype, compute_dtype, interpret=False):
    """Parity planes → (out [B, T, F2, 128], s1 [128], s2 [128]).

    s1/s2 are the per-lane Σ / Σ² of out (f32) for BatchNorm batch
    statistics; their cotangents are treated as zero (callers stop_gradient
    the statistics — the fused block's VJP owns the through-stats
    backward, ops/fused_block.py)."""
    outs, _ = _entry_conv_fwd(ev, od, w2, bias_packed, out_dtype, compute_dtype, interpret)
    return outs


def _run_fwd(ev, od, w2, bias_packed, out_dtype, compute_dtype, interpret):
    B, Tp, F2p = ev.shape
    T, F2, L = Tp - 8, F2p - 1, LANES
    tt = pick_tile(T)
    dtype = jnp.dtype(compute_dtype)
    main, tail = _plane_specs(tt, F2p)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tt=tt, F2=F2, L=L, dtype=dtype),
        grid=(B, T // tt),
        in_specs=[main, tail, main, tail, const, const],
        out_specs=[
            pl.BlockSpec((1, tt, F2, L), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((L,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F2, L), out_dtype),
            jax.ShapeDtypeStruct((L,), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(ev, ev, od, od, w2, bias_packed)


def _entry_conv_fwd(ev, od, w2, bias_packed, out_dtype, compute_dtype, interpret):
    out, s1, s2 = _run_fwd(ev, od, w2, bias_packed, out_dtype, compute_dtype, interpret)
    return (out, s1, s2), (ev, od, w2)


def _entry_conv_bwd(out_dtype, compute_dtype, interpret, res, cts):
    dy, _ds1, _ds2 = cts  # stats cotangents are zero by contract
    ev, od, w2 = res
    B, Tp, F2p = ev.shape
    T, F2, L = Tp - 8, F2p - 1, LANES
    tt = pick_tile(T)
    dtype = jnp.dtype(compute_dtype)
    main, tail = _plane_specs(tt, F2p)
    dw2, db = pl.pallas_call(
        functools.partial(_wgrad_kernel, tt=tt, F2=F2, L=L, dtype=dtype),
        grid=(B, T // tt),
        in_specs=[main, tail, main, tail,
                  pl.BlockSpec((1, tt, F2, L), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((J, L), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((J, L), jnp.float32),
            jax.ShapeDtypeStruct((L,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(ev, ev, od, od, dy)
    # mel features carry no gradient (first layer) — zero cotangents, DCE'd
    return jnp.zeros_like(ev), jnp.zeros_like(od), dw2.astype(w2.dtype), db


entry_conv.defvjp(_entry_conv_fwd, _entry_conv_bwd)


def entry_conv_apply(params, x, compute_dtype=None, interpret: bool = False,
                     want_stats: bool = False):
    """Drop-in for the entry conv: x [B, T, F, 1] → [B, T, F, C].

    With want_stats also returns the per-CHANNEL (Σ, Σ²) of the conv
    output (f32), folded from the kernel's per-lane accumulators — the
    BatchNorm batch-statistics inputs with no extra pass over the output
    (callers must stop_gradient the derived mean/var, crnn._fused_block).
    """
    w = params["w"]  # [3, 3, 1, C]
    C = w.shape[-1]
    B, T, F, _ = x.shape
    k = LANES // C
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    ev, od = make_parity_planes(x[..., 0], dtype)
    w2 = build_w2(w, k).astype(dtype)
    bias = jnp.tile(params["b"], k)
    out, s1_l, s2_l = entry_conv(ev, od, w2, bias, dtype, dtype, interpret)
    out = out.reshape(B, T, F, C)
    if want_stats:
        s1 = jax.lax.stop_gradient(s1_l).reshape(k, C).sum(axis=0)
        s2 = jax.lax.stop_gradient(s2_l).reshape(k, C).sum(axis=0)
        return out, s1, s2
    return out


def entry_conv_packable(F: int, C: int, T: int) -> bool:
    k = LANES // C if (C < LANES and LANES % C == 0) else 0
    return k == 2 and F % k == 0 and pick_tile(T) > 0
