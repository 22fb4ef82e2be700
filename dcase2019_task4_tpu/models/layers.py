"""Functional neural-net layers (pure param-pytree style).

Building blocks for the CRNN with the exact conventions of the reference
stack (models/CNN.py, models/CRNN.py, utils/utils.py:205-224 weights_init):

  * conv2d    — 3×3 stride-1 pad-1 NHWC conv; Xavier-uniform init gain √2
  * batchnorm — eps 1e-3, torch-momentum 0.99 (running ← 0.99·batch + 0.01·old),
                weight ~ N(1, 0.02), bias 0; separate running-stat state so
                student and EMA teacher track their own statistics
  * glu       — linear-gated unit: linear(x) · σ(x)   (models/CNN.py:5-16)
  * cg        — context gating:     x · σ(linear(x))  (models/CNN.py:19-30)
  * avg_pool  — window-mean pooling over (time, freq)
  * linear    — N(0, 0.01) weight, zero bias
  * dropout   — inverted dropout

Layout is NHWC ([batch, time, freq, channel]) throughout — the TPU-native
choice: channels ride the 128-wide lane dimension and XLA maps the convs
onto the MXU without transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- conv2d

def conv2d_init(key, in_ch: int, out_ch: int, k: int):
    """Xavier-uniform with gain √2 on an HWIO kernel, zero bias
    (weights_init conv branch, utils/utils.py:212-214)."""
    fan_in = in_ch * k * k
    fan_out = out_ch * k * k
    limit = np.sqrt(2.0) * np.sqrt(6.0 / (fan_in + fan_out))
    w = jax.random.uniform(key, (k, k, in_ch, out_ch), jnp.float32, -limit, limit)
    return {"w": w, "b": jnp.zeros((out_ch,), jnp.float32)}


def conv2d_apply(params, x, stride: int = 1, padding: int = 1):
    # output dtype follows the input (uniform-dtype conv stack keeps the
    # backward pass dtype-consistent); the MXU accumulates f32 internally
    out = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + params["b"].astype(out.dtype)


def conv2d_entry_packed(params, x):
    """Single-input-channel 3×3 s1 p1 conv as a strided-slice im2col matmul.

    Why not lax.conv: XLA:TPU's conv emits a batch-minor layout
    ({0,3,2,1}) while the fused Pallas blocks need the row-major lane-packed
    view — the layout conversions around the entry conv cost ~4.7 ms per
    model per direction at B=96 on v5e. A plain dot_general writes row-major
    directly, and packing k=128/C adjacent f-columns into the N axis makes
    the output 128-lane-minor, so no padded HBM tiles anywhere:

        out[b,t,f2,h·C+c] = Σ_{dt,e} x_pad[b,t+dt,k·f2+e] · W2[(dt,e),h·C+c]
        W2[(dt,e),h·C+c] = w[dt,e−h,c]  (zero outside 0 ≤ e−h ≤ 2)

    The patch axis (dt,e) has 3·(k+2) entries built from shifted strided
    slices of the tiny [B,T+2,F+2] input. The conv weight gradient then
    flows through two small matmuls instead of XLA's conv-wgrad (which
    would demand the batch-minor layout again for dy).

    x: [B, T, F, 1] → [B, T, F, C]."""
    w = params["w"]  # [3, 3, 1, C]
    C = w.shape[-1]
    B, T, F, _ = x.shape
    k = 128 // C if (C < 128 and 128 % C == 0 and F % (128 // C) == 0) else 1
    F2, L, J = F // k, k * C, 3 * (k + 2)
    xp = jnp.pad(x[..., 0], ((0, 0), (1, 1), (1, 1)))
    # concatenate (not stack): stack lowers to dynamic-update-slices whose
    # layout XLA picks t-minor, forcing a 0.65 ms relayout copy per model
    # before the patch matmul (B=96, v5e); concatenate propagates the
    # consumer's layout
    patches = jnp.concatenate(
        [xp[:, dt: dt + T, e: e + k * F2: k, None] for dt in range(3) for e in range(k + 2)],
        axis=-1,
    )  # [B, T, F2, J]
    # embed w into the packed patch basis
    wj = w[:, :, 0, :]  # [3, 3, C]
    w2 = jnp.zeros((3, k + 2, k, C), wj.dtype)
    for h in range(k):
        for e in range(k + 2):
            if 0 <= e - h <= 2:
                w2 = w2.at[:, e, h, :].set(wj[:, e - h, :])
    w2 = w2.reshape(J, L)
    out = jnp.einsum(
        "btfj,jl->btfl", patches.astype(x.dtype), w2.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + jnp.tile(params["b"], k).astype(x.dtype)
    return out.reshape(B, T, F, C)


def conv2d_entry_rowmat(params, x):
    """Single-input-channel 3×3 s1 p1 conv as ONE row-level banded matmul.

    An alternative to conv2d_entry_packed for configurations its k-packing
    cannot serve (C ≥ 128 or F not divisible by 128//C). NOT used in the
    fused-block CRNN: the [B, T, F·C]-shaped output is t-sublane-tiled
    while the fused Pallas blocks read f-sublane tiles, and the forced
    relayout (~6 ms at B=96 on v5e) exceeds the patch-tensor saving. Here
    the im2col happens at the **row** level: the patch for output row
    (b, t) is just the three time-shifted feature rows, and the freq
    shifts are folded into the weight's band structure:

        out[b,t, f·C+c] = Σ_{dt,i} xcat[b,t, dt·F+i] · Wbig[dt·F+i, f·C+c]
        Wbig[dt·F+i, f·C+c] = w[dt, i−f+1, c]   (zero outside the band)

    xcat = concat of x[t−1], x[t], x[t+1] → [B, T, 3F] (lane-aligned-ish,
    42 MB bf16), Wbig [3F, F·C] is built from the 3×3 kernel by a tiny
    einsum against a constant band selector, so the conv weight gradient
    flows through automatically. The [B, T, F·C] output reshapes (pure
    bitcast) to the [B, T, F/k, k·C] lane-packed row-major view the fused
    Pallas blocks read. The dense formulation spends 21× the conv's FLOPs
    (130 GFLOP/step at B=96) but runs ~0.7 ms on the MXU — HBM layout, not
    FLOPs, is the binding constraint for this op.

    x: [B, T, F, 1] → [B, T, F, C]."""
    w = params["w"]  # [3, 3, 1, C]
    C = w.shape[-1]
    B, T, F, _ = x.shape
    xs = x[..., 0]
    xp = jnp.pad(xs, ((0, 0), (1, 1), (0, 0)))
    xcat = jnp.concatenate(
        [xp[:, 0:T], xp[:, 1 : T + 1], xp[:, 2 : T + 2]], axis=-1
    )  # [B, T, 3F]
    # band selector Q[df, i, f] = 1 iff i − f + 1 == df (freq zero-padding
    # emerges from band clipping at f = 0 and f = F−1)
    i_idx = np.arange(F)[:, None]
    f_idx = np.arange(F)[None, :]
    Q = np.stack([(i_idx - f_idx + 1 == df).astype(np.float32) for df in range(3)])
    wbig = jnp.einsum("xif,dxc->difc", jnp.asarray(Q), w[:, :, 0, :]).reshape(
        3 * F, F * C
    )
    out = jnp.einsum(
        "btj,jl->btl", xcat.astype(x.dtype), wbig.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + jnp.tile(params["b"], F).astype(x.dtype)
    return out.reshape(B, T, F, C)


# -------------------------------------------------------------- batchnorm

def batchnorm_init(key, ch: int):
    params = {
        "scale": 1.0 + 0.02 * jax.random.normal(key, (ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }
    return params, state


def batchnorm_apply(params, state, x, train: bool, eps: float = 1e-3, momentum: float = 0.99,
                    axis_name=None, axis_size: int = 1):
    """BatchNorm over all axes but channel (torch BatchNorm2d semantics).

    torch momentum convention: running ← (1−m)·running + m·batch with the
    reference's m=0.99 (models/CNN.py:52), batch variance biased for
    normalization but unbiased for the running update, exactly like torch.
    Inside a shard_map over a data-parallel mesh axis, pass
    `axis_name`/`axis_size`: batch statistics then psum across the shards
    (global-batch semantics). Returns (y, new_state)."""
    axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)  # stats accumulate in f32 even for bf16 x
        if axis_name is not None:
            n = (x.size // x.shape[-1]) * axis_size
            s = jax.lax.psum(jnp.sum(xf, axis=axes), axis_name)
            sq = jax.lax.psum(jnp.sum(xf * xf, axis=axes), axis_name)
            mean = s / n
            var = sq / n - mean * mean
        else:
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            n = x.size // x.shape[-1]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y.astype(x.dtype), new_state


# ------------------------------------------------------------------ dense

def linear_init(key, in_dim: int, out_dim: int):
    """weights_init Linear branch: N(0, 0.01) weight, zero bias
    (utils/utils.py:221-224). Stored [in, out] so apply is x @ w."""
    w = 0.01 * jax.random.normal(key, (in_dim, out_dim), jnp.float32)
    return {"w": w, "b": jnp.zeros((out_dim,), jnp.float32)}


def linear_apply(params, x):
    return x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)


# ------------------------------------------------------------ activations

def _channel_linear(params, x):
    """Channel-wise linear. On 4-D conv activations this is expressed as a
    1×1 conv rather than a reshape+matmul: XLA:TPU then keeps the tensor in
    its conv layout instead of inserting ~8 ms/step of layout-transpose
    copies around every GLU (measured on v5e, B=96: 98→77 ms/step)."""
    if x.ndim == 4:
        w = params["w"].astype(x.dtype)[None, None]  # [1,1,C,C]
        lin = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return lin + params["b"].astype(x.dtype)
    return linear_apply(params, x)


def glu_apply(params, x):
    """Reference GLU (models/CNN.py:5-16): channel-wise linear of x gated by
    σ(x): out = linear(x) · σ(x). The linear acts on the channel axis, which
    is already last in NHWC — no permutes, unlike the reference's NCHW
    round-trip."""
    return _channel_linear(params, x) * jax.nn.sigmoid(x)


def context_gating_apply(params, x):
    """Reference ContextGating (models/CNN.py:19-30): x · σ(linear(x))."""
    return x * jax.nn.sigmoid(_channel_linear(params, x))


def activation_apply(kind: str, params, x):
    if kind == "glu":
        return glu_apply(params, x)
    if kind == "cg":
        return context_gating_apply(params, x)
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "leakyrelu":
        return jax.nn.leaky_relu(x, 0.2)
    raise ValueError(f"unknown activation: {kind}")


# ---------------------------------------------------------------- pooling

def avg_pool(x, pool):
    """Mean pooling with window=stride=(pt, pf) over (time, freq) of NHWC."""
    pt, pf = pool
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, pt, pf, 1), (1, pt, pf, 1), "VALID"
    )
    return summed / (pt * pf)


# ---------------------------------------------------------------- dropout

def dropout_apply(rng, x, rate: float, train: bool):
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
