"""Microbench: [C, rows] merged entry block (ops/crows_block.py) vs the
default unfused pair (conv2d_entry_packed → fused_bn_glu_dropout_pool) at
production shape (B=96, T=864, F=64, C=64, bf16, dropout 0.5, pool (2,4)).

Same protocol as tools/bench_entry_block.py: the FULL first-block training
cost (BN batch stats + forward + backward to all five parameter groups),
timed as N dependent lax.scan iterations inside one jit with a single
scalar fetch (per-call timing through the tunnel lies, CLAUDE.md). The
crows variant includes its XLA-side costs (dt-shifted feature copies and
the pooled-tile unpack transpose) so the comparison is end to end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dcase2019_task4_tpu.models import layers as L
from dcase2019_task4_tpu.ops import crows_block as CR
from dcase2019_task4_tpu.ops.fused_block import fused_bn_glu_dropout_pool

B, T, F, C = 96, 864, 64, 64
POOL = (2, 4)
EPS = 1e-3
RATE = 0.5
SEED = 17
N_ITERS = 20
CD = jnp.bfloat16

rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.standard_normal((B, T, F, 1)).astype(np.float32)))
params0 = (
    {
        "w": jnp.asarray((rng.standard_normal((3, 3, 1, C)) * 0.2).astype(np.float32)),
        "b": jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),
    },
    jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32)),  # scale
    jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),  # bias
    jnp.asarray((rng.standard_normal((C, C)) * 0.1).astype(np.float32)),  # glu_w
    jnp.asarray((rng.standard_normal(C) * 0.1).astype(np.float32)),  # glu_b
)
ct = jax.device_put(
    jnp.asarray(
        rng.standard_normal((B, T // POOL[0], F // POOL[1], C)).astype(np.float32)
    ).astype(CD)
)


def crows_loss(args):
    conv, scale, bias, gw, gb = args
    s, sq = CR.crows_stats_apply(conv, x, compute_dtype=CD)
    n = B * T * F
    mean = jax.lax.stop_gradient(s / n)
    var = jax.lax.stop_gradient(sq / n - (s / n) ** 2)
    o = CR.crows_apply(
        conv, scale, bias, mean, var, gw, gb, x, jnp.int32(SEED),
        RATE, POOL, EPS, True, compute_dtype=CD,
    )
    return jnp.sum(o.astype(jnp.float32) * ct.astype(jnp.float32))


def unfused_loss(args):
    conv, scale, bias, gw, gb = args
    y = L.conv2d_entry_packed(conv, x.astype(CD))
    ys = jax.lax.stop_gradient(y)
    s = jnp.sum(ys, axis=(0, 1, 2), dtype=jnp.float32)
    sq = jnp.sum(ys.astype(jnp.float32) ** 2, axis=(0, 1, 2))
    n = B * T * F
    mean = s / n
    var = sq / n - mean * mean
    o = fused_bn_glu_dropout_pool(
        y, scale, bias, mean, var, gw, gb, jnp.int32(SEED),
        RATE, POOL, EPS, True,
    )
    return jnp.sum(o.astype(jnp.float32) * ct.astype(jnp.float32))


def timeit_chained(loss_fn, fwd_only=False, n=N_ITERS, reps=3):
    def step(args):
        if fwd_only:
            probe = loss_fn(args) * 1e-30
        else:
            g = jax.grad(loss_fn)(args)
            probe = g[0]["w"][0, 0, 0, 0] * 1e-30
        conv, scale, bias, gw, gb = args
        conv2 = {"w": conv["w"] + probe.astype(conv["w"].dtype), "b": conv["b"]}
        return (conv2, scale, bias, gw, gb), probe

    @jax.jit
    def run(args):
        final, probes = lax.scan(lambda c, _: step(c), args, None, length=n)
        return probes[-1]

    out = run(params0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(params0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main():
    print(f"backend={jax.default_backend()} B={B} bf16 pool={POOL} rate={RATE}")
    for name, fn in (("unfused pair", unfused_loss), ("crows kernel", crows_loss)):
        t_f = timeit_chained(fn, fwd_only=True)
        print(f"{name:13s} stats+fwd:      {t_f:7.3f} ms")
        t_g = timeit_chained(fn, fwd_only=False)
        print(f"{name:13s} stats+fwd+bwd:  {t_g:7.3f} ms")


if __name__ == "__main__":
    main()
