"""Microbench + ablations for the fused entry-conv kernel (ops/entry_conv.py)
vs the XLA strided-slice im2col path (models/layers.py conv2d_entry_packed).

Timing methodology (CLAUDE.md): N dependent iterations inside ONE jit via
lax.scan — each iteration perturbs the weights by a tiny function of the
previous output, so no two iterations are identical work and the tunnel
cannot replay cached results — then one scalar fetch. Reported number is
(blocked wall time) / N.

Ablation kernels (isolate where the Pallas time goes):
  * stats-only  — conv + Σ/Σ² accumulators, NO [B,T,F2,128] output write
  * no-stack    — output write + matmul, patch tile replaced by a broadcast
                  of one plane slice (kills the 12-part minor-axis stack)
  * write-only  — only writes bias-broadcast tiles (pure output-write cost)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcase2019_task4_tpu.models import layers as L
from dcase2019_task4_tpu.ops import entry_conv as EC

B, T, F, C = 96, 864, 64, 64
N_ITERS = 20
rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.standard_normal((B, T, F, 1)).astype(np.float32)))
w0 = jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.2).astype(np.float32))
b0 = jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32))
ct = jax.device_put(
    jnp.asarray(rng.standard_normal((B, T, F, C)).astype(np.float32)).astype(jnp.bfloat16)
)


def timeit_chained(make_step, init_carry, n=N_ITERS, reps=3):
    """make_step: carry -> (new_carry, probe_scalar). Times n chained
    iterations inside one jit; returns ms/iter (best of reps)."""

    @jax.jit
    def run(carry):
        def body(c, _):
            c2, probe = make_step(c)
            return c2, probe

        c_final, probes = lax.scan(body, carry, None, length=n)
        return probes[-1]

    out = run(init_carry)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init_carry)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def perturb(w, probe):
    return w + (probe * 1e-30).astype(w.dtype)


# ---------------------------------------------------------------- XLA path


def xla_fwd_step(carry):
    w = carry
    o = L.conv2d_entry_packed({"w": w, "b": b0}, x.astype(jnp.bfloat16))
    probe = o[0, 0, 0, :].astype(jnp.float32).sum()
    return perturb(w, probe), probe


def xla_grad_step(carry):
    w = carry

    def loss(wv):
        o = L.conv2d_entry_packed({"w": wv, "b": b0}, x.astype(jnp.bfloat16))
        return jnp.sum(o.astype(jnp.float32) * ct.astype(jnp.float32))

    g = jax.grad(loss)(w)
    probe = g[0, 0, 0, 0]
    return perturb(w, probe), probe


# -------------------------------------------------------------- Pallas path


def pallas_fwd_step(carry):
    w = carry
    out, s1, s2 = EC.entry_conv_apply(
        {"w": w, "b": b0}, x, compute_dtype="bfloat16", want_stats=True
    )
    probe = s1.sum()
    return perturb(w, probe), probe


def pallas_grad_step(carry):
    w = carry

    def loss(wv):
        o = EC.entry_conv_apply({"w": wv, "b": b0}, x, compute_dtype="bfloat16")
        return jnp.sum(o.astype(jnp.float32) * ct.astype(jnp.float32))

    g = jax.grad(loss)(w)
    probe = g[0, 0, 0, 0]
    return perturb(w, probe), probe


# ---------------------------------------------------------------- ablations


def _abl_kernel(evm_ref, evt_ref, odm_ref, odt_ref, w2_ref, bias_ref,
                out_ref, s1_ref, *, tt, F2, L_, mode):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)

    dtype = jnp.bfloat16
    if mode == "write_only":
        out_ref[0] = jnp.broadcast_to(
            bias_ref[:].astype(out_ref.dtype), (tt, F2, L_)
        )
        s1_ref[:] += bias_ref[:]
        return
    ev = EC._assemble(evm_ref, evt_ref)
    od = EC._assemble(odm_ref, odt_ref)
    if mode == "no_stack":
        base = ev[0:tt, 0:F2].astype(jnp.float32)
        patches = jnp.broadcast_to(base.reshape(tt * F2, 1), (tt * F2, EC.J)).astype(dtype)
    else:  # full / stats_only
        patches = EC._patch_tile(ev, od, tt, F2, dtype)
    o = lax.dot_general(
        patches, w2_ref[:].astype(dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    if mode == "stats_only":
        s1_ref[:] += jnp.sum(o, axis=0)
        out_ref[0] = jnp.zeros((1, 1, L_), out_ref.dtype) + o[0:1, :].reshape(1, 1, L_)
    else:
        st = o.astype(out_ref.dtype)
        out_ref[0] = st.reshape(tt, F2, L_)
        s1_ref[:] += o[0:1, :].reshape(L_)


def make_ablation(mode, max_tile):
    Lh = EC.LANES
    dtype = jnp.bfloat16
    ev0, od0 = EC.make_parity_planes(x[..., 0], dtype)
    Tp, F2p = ev0.shape[1], ev0.shape[2]
    F2 = F2p - 1
    tt = EC.pick_tile(T, max_tile)
    assert tt > 0
    main, tail = EC._plane_specs(tt, F2p)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = (B, 1, 1, Lh) if mode == "stats_only" else (B, T, F2, Lh)
    out_block = (
        pl.BlockSpec((1, 1, 1, Lh), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        if mode == "stats_only"
        else pl.BlockSpec((1, tt, F2, Lh), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    )
    call = pl.pallas_call(
        functools.partial(
            _abl_kernel, tt=tt, F2=F2, L_=Lh,
            mode=mode,
        ),
        grid=(B, T // tt),
        in_specs=[main, tail, main, tail, const, const],
        out_specs=[out_block, pl.BlockSpec((Lh,), lambda b, i: (0,), memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, dtype),
            jax.ShapeDtypeStruct((Lh,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=EC._VMEM_LIMIT),
    )

    def step(carry):
        w2 = carry
        out, s1 = call(ev0, ev0, od0, od0, w2, jnp.tile(b0, 2))
        probe = s1.sum() + out[0, 0, 0, :].astype(jnp.float32).sum()
        return w2 + (probe * 1e-30).astype(w2.dtype), probe

    return step


def main():
    print(f"backend={jax.default_backend()} B={B} T={T} F={F} C={C} iters={N_ITERS}")
    t = timeit_chained(xla_fwd_step, w0)
    print(f"XLA im2col fwd:          {t:7.3f} ms")
    t = timeit_chained(xla_grad_step, w0)
    print(f"XLA im2col fwd+bwd:      {t:7.3f} ms")

    for max_tile in (96, 432, 864):
        orig = EC.pick_tile
        EC.pick_tile = lambda T_, mt=max_tile: orig(T_, mt)
        try:
            t = timeit_chained(pallas_fwd_step, w0)
            print(f"pallas fwd     tt<={max_tile:4d}: {t:7.3f} ms")
            t = timeit_chained(pallas_grad_step, w0)
            print(f"pallas fwd+bwd tt<={max_tile:4d}: {t:7.3f} ms")
        except Exception as e:
            print(f"tt<={max_tile}: FAIL {type(e).__name__}: {str(e)[:160]}")
        finally:
            EC.pick_tile = orig

    w2_0 = EC.build_w2(w0.astype(jnp.bfloat16), 2)
    for mode in ("write_only", "no_stack", "stats_only", "full"):
        for max_tile in (96, 864):
            try:
                t = timeit_chained(make_ablation(mode, max_tile), w2_0)
                print(f"ablation {mode:10s} tt<={max_tile:4d}: {t:7.3f} ms")
            except Exception as e:
                print(f"ablation {mode} tt<={max_tile}: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
