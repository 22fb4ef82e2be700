"""The CRNN: conv-BN-GLU-pool ×3 → BiGRU ×2 → strong/weak heads.

Functional re-design of the reference model (models/CRNN.py:10-84,
models/CNN.py:33-89, models/RNN.py:7-16) with identical math:

  input [B, T=864, F=64, C=1] (NHWC)
  → 3 × [conv 3×3 s1 p1 (64ch) → BN(eps 1e-3, mom .99) → GLU → dropout → avgpool (2,4)]
  → [B, 108, 1, 64] → squeeze freq → [B, 108, 64]
  → BiGRU (2 layers, hidden 64) → [B, 108, 128] → dropout 0.5
  → dense → sigmoid → strong [B, 108, nclass]
  → attention head: sof = clamp(softmax(dense_softmax(x), axis=-1), 1e-7, 1)
    weak = Σ_t(strong·sof) / Σ_t(sof)            [B, nclass]

The attention head reproduces the reference's (unusual) semantics exactly:
softmax over the **class** axis but normalization summed over **time**
(models/CRNN.py:77-83).

Params and BN running stats are separate pytrees so the EMA teacher keeps
its own statistics (the reference's EMA copies parameters only,
main.py:45-49, while each model's BN buffers update from its own forwards).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dcase2019_task4_tpu.config import ModelConfig
from dcase2019_task4_tpu.models import layers as L
from dcase2019_task4_tpu.ops.gru import bigru_apply, bigru_init


class CRNN:
    """Stateless apply/init bundle; all tensors live in the param pytrees."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    # ------------------------------------------------------------- init

    def init(self, key) -> Tuple[Dict, Dict]:
        cfg = self.cfg
        params: Dict = {"cnn": [], "rnn": None, "dense": None}
        state: Dict = {"cnn": []}
        in_ch = cfg.n_in_channel
        for i, out_ch in enumerate(cfg.nb_filters):
            key, kc, kb, kg = jax.random.split(key, 4)
            block = {"conv": L.conv2d_init(kc, in_ch, out_ch, cfg.kernel_size[i])}
            bn_p, bn_s = L.batchnorm_init(kb, out_ch)
            block["bn"] = bn_p
            if cfg.activation in ("glu", "cg"):
                block["act"] = L.linear_init(kg, out_ch, out_ch)
            params["cnn"].append(block)
            state["cnn"].append(bn_s)
            in_ch = out_ch
        key, kr, kd, ks = jax.random.split(key, 4)
        params["rnn"] = bigru_init(kr, cfg.nb_filters[-1], cfg.n_rnn_cell, cfg.n_layers_rnn)
        params["dense"] = L.linear_init(kd, cfg.n_rnn_cell * 2, cfg.nclass)
        if cfg.attention:
            params["dense_softmax"] = L.linear_init(ks, cfg.n_rnn_cell * 2, cfg.nclass)
        return params, state

    # ------------------------------------------------------------ apply

    def apply(
        self,
        params: Dict,
        state: Dict,
        x: jnp.ndarray,
        train: bool = False,
        rng=None,
        batch_axis=None,
        axis_size: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        """x: [B, T, F] or [B, T, F, C] → (strong, weak, new_state).

        `batch_axis`/`axis_size`: when called inside a shard_map over a data
        mesh axis (train/steps.py), BatchNorm batch statistics are psum'd
        across the `axis_size` shards of `batch_axis` so training matches the
        global-batch semantics exactly."""
        cfg = self.cfg
        if x.ndim == 3:
            x = x[..., None]
        if train and rng is None:
            raise ValueError("rng required in train mode (dropout)")
        # conv stack inputs in the configured MXU dtype (accumulation is f32
        # via preferred_element_type); everything stateful or
        # probability-producing stays f32
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        interpret = cfg.fused_interpret
        use_fused = cfg.fused_block
        if use_fused is None:
            # auto: the Pallas fused block needs a TPU backend (or interpret
            # mode for CPU tests); with GLU only
            use_fused = (
                jax.default_backend() == "tpu" or interpret
            ) and cfg.activation == "glu"
        new_state: Dict = {"cnn": []}
        entry_stats = None
        for i, block in enumerate(params["cnn"]):
            if (
                i == 0
                and x.shape[-1] == 1
                and cfg.kernel_size[0] == 3
                and cfg.stride[0] == 1
                and cfg.padding[0] == 1
                and use_fused
                and cfg.entry_block_crows
                and block["conv"]["w"].shape[-1] == 64
                and _crows_applicable(x.shape, tuple(cfg.pooling[0]))
            ):
                # first block in the [C, rows] channel-on-sublane
                # orientation (ops/crows_block.py): patches pad to 8
                # sublanes instead of 128 lanes, and neither the patch
                # tensor nor the conv activation nor any of its gradients
                # ever reach HBM.
                if train:
                    rng, sub = jax.random.split(rng)
                    seed = jax.random.randint(sub, (), 0, 2**31 - 2**20, dtype=jnp.int32)
                else:
                    seed = jnp.int32(0)
                x, bn_s = self._entry_block(
                    block, state["cnn"][0], x, seed, train,
                    batch_axis=batch_axis, axis_size=axis_size,
                    interpret=interpret, engine="crows",
                )
                new_state["cnn"].append(bn_s)
                continue
            if (
                i == 0
                and x.shape[-1] == 1
                and cfg.kernel_size[0] == 3
                and cfg.stride[0] == 1
                and cfg.padding[0] == 1
                and use_fused
                and cfg.entry_block_pallas
                and block["conv"]["w"].shape[-1] * 2 == 128
                and _entry_block_applicable(x.shape, tuple(cfg.pooling[0]))
            ):
                # whole first block (conv→BN→GLU→dropout→pool) as ONE fused
                # Pallas kernel (ops/fused_entry_block.py): the 680 MB conv
                # activation never exists in HBM in either direction.
                if train:
                    rng, sub = jax.random.split(rng)
                    seed = jax.random.randint(sub, (), 0, 2**31 - 2**20, dtype=jnp.int32)
                else:
                    seed = jnp.int32(0)
                x, bn_s = self._entry_block(
                    block, state["cnn"][0], x, seed, train,
                    batch_axis=batch_axis, axis_size=axis_size, interpret=interpret,
                )
                new_state["cnn"].append(bn_s)
                continue
            if (
                i == 0
                and x.shape[-1] == 1
                and cfg.kernel_size[0] == 3
                and cfg.stride[0] == 1
                and cfg.padding[0] == 1
            ):
                # entry conv in the lane-packed layout. Default: the XLA
                # strided-slice im2col (conv2d_entry_packed), which avoids
                # XLA's batch-minor conv layout copies. Opt-in
                # (cfg.entry_conv_pallas): the fused Pallas im2col kernel
                # (ops/entry_conv.py) — the patch tensor never leaves VMEM
                # and the BN batch-stat sums ride out of the forward for
                # free, but its in-VMEM patch stack costs what the HBM
                # savings buy back (measured ≈parity on v5e).
                # (conv2d_entry_rowmat is NOT used here: its [B,T,F·C]
                # output is t-sublane-tiled while the fused blocks read
                # f-sublane tiles — the forced relayout costs more than it
                # saves.)
                from dcase2019_task4_tpu.ops.entry_conv import (
                    entry_conv_apply,
                    entry_conv_packable,
                )

                C0 = block["conv"]["w"].shape[-1]
                if (
                    use_fused
                    and cfg.entry_conv_pallas
                    and entry_conv_packable(x.shape[2], C0, x.shape[1])
                ):
                    want_stats = train and _fused_block_applicable(
                        (x.shape[0], x.shape[1], x.shape[2], C0), tuple(cfg.pooling[0])
                    )
                    if want_stats:
                        x, s1, s2 = entry_conv_apply(
                            block["conv"], x, compute_dtype=compute_dtype,
                            interpret=interpret, want_stats=True,
                        )
                        entry_stats = (s1, s2)
                    else:
                        x = entry_conv_apply(
                            block["conv"], x, compute_dtype=compute_dtype,
                            interpret=interpret,
                        )
                else:
                    x = L.conv2d_entry_packed(block["conv"], x.astype(compute_dtype))
            elif (
                use_fused
                and cfg.kernel_size[i] == 3
                and cfg.stride[i] == 1
                and cfg.padding[i] == 1
                and block["conv"]["w"].shape[2] == block["conv"]["w"].shape[3]
                and _packed_conv_tileable(x.shape[1])
            ):
                # interior convs in the lane-packed layout (Pallas row-shifted
                # matmuls) — no transpose copies between XLA's batch-minor
                # conv layout and the fused blocks (ops/packed_conv.py).
                # _packed_conv_tileable guards non-default time lengths with
                # no legal multiple-of-8 tile (fall through to XLA's conv).
                from dcase2019_task4_tpu.ops.packed_conv import conv2d_packed

                x = conv2d_packed(
                    block["conv"], x.astype(compute_dtype), compute_dtype=compute_dtype,
                    interpret=interpret,
                )
            else:
                x = L.conv2d_apply(block["conv"], x.astype(compute_dtype), cfg.stride[i], cfg.padding[i])
            if use_fused and _fused_block_applicable(x.shape, tuple(cfg.pooling[i])):
                if train:
                    rng, sub = jax.random.split(rng)
                    seed = jax.random.randint(sub, (), 0, 2**31 - 2**20, dtype=jnp.int32)
                else:
                    seed = jnp.int32(0)
                x, bn_s = self._fused_block(
                    block, state["cnn"][i], x, i, seed, train,
                    batch_axis=batch_axis, axis_size=axis_size, interpret=interpret,
                    stats=entry_stats if i == 0 else None,
                )
                new_state["cnn"].append(bn_s)
                continue
            x, bn_s = L.batchnorm_apply(
                block["bn"], state["cnn"][i], x, train, cfg.bn_eps, cfg.bn_momentum,
                axis_name=batch_axis, axis_size=axis_size,
            )
            new_state["cnn"].append(bn_s)
            x = L.activation_apply(cfg.activation, block.get("act"), x)
            if train and cfg.dropout > 0:
                rng, sub = jax.random.split(rng)
                x = L.dropout_apply(sub, x, cfg.dropout, train)
            x = L.avg_pool(x, cfg.pooling[i])
        # [B, T', F', C] → [B, T', C·F'] (freq collapses to 1 in the default
        # config; the general flatten mirrors models/CRNN.py:64-67)
        B, T, F, C = x.shape
        if F == 1:
            x = x[:, :, 0, :]
        else:
            x = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        x = bigru_apply(params["rnn"], x.astype(jnp.float32))
        if train and cfg.dropout > 0:
            rng, sub = jax.random.split(rng)
            x = L.dropout_apply(sub, x, cfg.dropout, train)
        strong = jax.nn.sigmoid(L.linear_apply(params["dense"], x))
        if cfg.attention:
            sof = jax.nn.softmax(L.linear_apply(params["dense_softmax"], x), axis=-1)
            sof = jnp.clip(sof, 1e-7, 1.0)
            weak = (strong * sof).sum(axis=1) / sof.sum(axis=1)
        else:
            weak = strong.mean(axis=1)
        return strong, weak, new_state

    def _fused_entry_block(self, block, bn_state, x, seed, train):
        """EXPERIMENTAL (not wired into apply): block 0 with the conv folded
        into the Pallas kernel (ops/fused_entry_block.py). Numerically exact
        (see tests) but currently slower than XLA-conv + _fused_block on
        v5e — the in-kernel 1-channel conv (9-lane patch matmul) doesn't map
        well to the VPU/MXU; kept for future tuning.
        x [B, T, F] single-channel features → pooled [B, T/pt, F/pf, C]."""
        from dcase2019_task4_tpu.ops.fused_entry_block import (
            entry_block_stats,
            fused_entry_block,
            pad_features_for_entry,
        )

        cfg = self.cfg
        xp = pad_features_for_entry(x)
        w9 = block["conv"]["w"].reshape(9, -1)
        cb = block["conv"]["b"]
        if train:
            s, sq = entry_block_stats(xp, jax.lax.stop_gradient(w9), jax.lax.stop_gradient(cb))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            mean = s / n
            var = sq / n - mean**2
            unbiased = var * n / max(n - 1, 1)
            m = cfg.bn_momentum
            new_bn = {
                "mean": (1 - m) * bn_state["mean"] + m * mean,
                "var": (1 - m) * bn_state["var"] + m * unbiased,
            }
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            rate = cfg.dropout
        else:
            mean, var = bn_state["mean"], bn_state["var"]
            new_bn = bn_state
            rate = 0.0
        out = fused_entry_block(
            xp, w9, cb, block["bn"]["scale"], block["bn"]["bias"], mean, var,
            block["act"]["w"], block["act"]["b"], seed,
            rate, tuple(cfg.pooling[0]), cfg.bn_eps, train,
        )
        return out.astype(jnp.dtype(cfg.compute_dtype)), new_bn

    def _fused_block(self, block, bn_state, y, i, seed, train,
                     batch_axis=None, axis_size: int = 1, interpret: bool = False,
                     stats=None):
        """Post-conv chain via the fused Pallas kernel (ops/fused_block.py):
        one HBM pass instead of XLA's several. BN statistics and the
        running-stat update follow layers.batchnorm_apply exactly; under a
        shard_map data axis the Σx/Σx² reductions psum across shards so the
        statistics are those of the GLOBAL batch. `stats` = precomputed
        (Σ, Σ²) per channel (the fused entry-conv kernel emits them for
        free, ops/entry_conv.py) — skips the XLA reduction over y."""
        from dcase2019_task4_tpu.ops.fused_block import fused_bn_glu_dropout_pool

        cfg = self.cfg
        if train:
            # Σx/Σx² as plain XLA reductions: XLA sibling-fuses both into one
            # read of y (and into the producer where the layout allows) —
            # measured 3.4 ms/step cheaper than the separate Pallas stats
            # pass (ops/fused_block.batch_stats) now that the entry conv
            # writes a fusable row-major layout.
            # stop_gradient: the fused kernel's custom VJP carries the full
            # BN through-statistics backward, so the stats themselves must
            # not be differentiated.
            if stats is not None:
                s, sq = stats
            else:
                ys = jax.lax.stop_gradient(y)
                s = jnp.sum(ys, axis=(0, 1, 2), dtype=jnp.float32)
                sq = jnp.sum(ys.astype(jnp.float32) ** 2, axis=(0, 1, 2))
            n = y.size // y.shape[-1]
            if batch_axis is not None:
                s = jax.lax.psum(s, batch_axis)
                sq = jax.lax.psum(sq, batch_axis)
                n = n * axis_size
            mean = s / n
            var = sq / n - mean * mean
            unbiased = var * n / max(n - 1, 1)
            m = cfg.bn_momentum
            new_bn = {
                "mean": (1 - m) * bn_state["mean"] + m * mean,
                "var": (1 - m) * bn_state["var"] + m * unbiased,
            }
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            rate = cfg.dropout
        else:
            mean, var = bn_state["mean"], bn_state["var"]
            new_bn = bn_state
            rate = 0.0
        out = fused_bn_glu_dropout_pool(
            y, block["bn"]["scale"], block["bn"]["bias"], mean, var,
            block["act"]["w"], block["act"]["b"], seed,
            rate, tuple(cfg.pooling[i]), cfg.bn_eps, train, interpret,
            batch_axis, axis_size,
        )
        return out, new_bn

    def _entry_block(self, block, bn_state, x, seed, train,
                     batch_axis=None, axis_size: int = 1, interpret: bool = False,
                     engine: str = "planes"):
        """First block (conv→BN→GLU→dropout→pool) as one Pallas kernel
        (engine="planes": ops/fused_entry_block.py parity-plane kernel;
        engine="crows": ops/crows_block.py channel-on-sublane kernel). BN
        statistics come from the kernel's stats pass over the conv output
        (never materialized); the running-stat update and shard psum
        mirror _fused_block exactly."""
        if engine == "crows":
            from dcase2019_task4_tpu.ops.crows_block import (
                crows_apply as entry_block_apply,
                crows_stats_apply as entry_block_stats_apply,
            )
        else:
            from dcase2019_task4_tpu.ops.fused_entry_block import (
                entry_block_apply,
                entry_block_stats_apply,
            )

        cfg = self.cfg
        cd = jnp.dtype(cfg.compute_dtype)
        if train:
            s, sq = entry_block_stats_apply(
                block["conv"], x, compute_dtype=cd, interpret=interpret
            )
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if batch_axis is not None:
                s = jax.lax.psum(s, batch_axis)
                sq = jax.lax.psum(sq, batch_axis)
                n = n * axis_size
            mean = s / n
            var = sq / n - mean * mean
            unbiased = var * n / max(n - 1, 1)
            m = cfg.bn_momentum
            new_bn = {
                "mean": (1 - m) * bn_state["mean"] + m * mean,
                "var": (1 - m) * bn_state["var"] + m * unbiased,
            }
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            rate = cfg.dropout
        else:
            mean, var = bn_state["mean"], bn_state["var"]
            new_bn = bn_state
            rate = 0.0
        out = entry_block_apply(
            block["conv"], block["bn"]["scale"], block["bn"]["bias"], mean, var,
            block["act"]["w"], block["act"]["b"], x, seed,
            rate, tuple(cfg.pooling[0]), cfg.bn_eps, train,
            compute_dtype=cd, interpret=interpret,
            batch_axis=batch_axis, axis_size=axis_size,
        )
        return out, new_bn


def _entry_block_applicable(shape, pool) -> bool:
    from dcase2019_task4_tpu.ops.fused_entry_block import entry_block_applicable

    return entry_block_applicable(shape, pool)


def _crows_applicable(shape, pool) -> bool:
    from dcase2019_task4_tpu.ops.crows_block import crows_applicable

    return crows_applicable(shape, pool)


def _packed_conv_tileable(T: int) -> bool:
    """conv2d_packed needs a multiple-of-8 tile dividing T (its halo blocks
    are 8-row); without one (e.g. T=108) fall back to XLA's conv."""
    from dcase2019_task4_tpu.ops.packed_conv import _pick_tile

    return _pick_tile(T) > 0


def _fused_block_applicable(shape, pool) -> bool:
    """The fused Pallas block pools whole tiles: needs pool-divisible T/F and
    a time tile that is a multiple of the time pool."""
    from dcase2019_task4_tpu.ops.fused_block import _pick_tile

    B, T, F, C = shape
    pt, pf = pool
    if T % pt or F % pf:
        return False
    return _pick_tile(T, F, C) % pt == 0


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
