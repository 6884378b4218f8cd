"""Axial-attention multi-scale encoder — the TPU-first pixel-decoder core.

Why this exists: the reference's pixel decoder runs MultiScaleDeformableAttention
(a CUDA gather kernel). The faithful JAX port (openpvsg_tpu.ops.ms_deform_attn)
is numerically exact but gather-bound: XLA:TPU gathers sustain ~10M rows/s,
making the encoder ~95% of inference time (measured 379 ms of a 410 ms
VPS forward at 384x480x4 frames). TPU reaches peak on dense matmuls, so the
default encoder is re-designed around them:

  per layer, per level (shared weights, level embedding):
    row attention  — MHA along W (B*H as batch)   } global receptive field
    col attention  — MHA along H (B*W as batch)   } in two dense steps
    FFN
  cross-scale fusion — top-down pathway: each finer level adds a 1x1-conv of
    the bilinear-upsampled coarser level (the level mixing MSDA gets from
    multi-level sampling points)

Everything is batched matmul + resize: no gathers, fully MXU-bound. The
gather-exact MSDA encoder remains available (PixelDecoderConfig
encoder="msda") for running converted reference checkpoints.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from openpvsg_tpu.config import PixelDecoderConfig
from openpvsg_tpu.models.position_encoding import sine_pos_encoding
from openpvsg_tpu.ops.resize import resize_bilinear


class AxisMHA(nn.Module):
    """Multi-head attention contracting over ONE spatial axis of a
    (B, H, W, C) tensor, expressed as einsums that keep the NHWC layout —
    no transpose/flatten round trip. The round-1 implementation transposed
    to (B*W, H, C) for column attention; the HLO dump showed those
    transposes materializing ~900 MB of relayout copies per forward (the
    single largest copy source, tools/dump_hlo.py). Param tree is identical
    to MultiheadAttention (q_proj/k_proj/v_proj/out_proj), so converted
    checkpoints load unchanged.
    """
    num_heads: int
    dim: int
    axis: int  # 2 = attend along W (row attention), 1 = along H (columns)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qk: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """qk: (B, H, W, C) query/key input (content + positional);
        v: (B, H, W, C) value input (content only)."""
        nh = self.num_heads
        hd = self.dim // nh
        B, H, W, C = qk.shape
        qp = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(qk)
        kp = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(qk)
        vp = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)
        qp = qp.reshape(B, H, W, nh, hd)
        kp = kp.reshape(B, H, W, nh, hd)
        vp = vp.reshape(B, H, W, nh, hd)
        if self.axis == 2:  # along W: (B, H) are batch dims
            logits = jnp.einsum("bhqnd,bhknd->bhnqk", qp, kp,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(logits / jnp.sqrt(hd), axis=-1)
            out = jnp.einsum("bhnqk,bhknd->bhqnd", attn.astype(self.dtype),
                             vp)
        else:  # along H: (B, W) are batch dims
            logits = jnp.einsum("bqwnd,bkwnd->bwnqk", qp, kp,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(logits / jnp.sqrt(hd), axis=-1)
            out = jnp.einsum("bwnqk,bkwnd->bqwnd", attn.astype(self.dtype),
                             vp)
        out = out.reshape(B, H, W, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class AxialAttentionBlock(nn.Module):
    num_heads: int
    dim: int
    ffn_dim: int
    dtype: Any = jnp.float32
    fast_norm: bool = False  # LN stats in compute dtype (see PERF.md)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C); pos: (1, H, W, C)."""
        f32r = not self.fast_norm
        y = AxisMHA(self.num_heads, self.dim, axis=2, dtype=self.dtype,
                    name="row_attn")(x + pos, x)
        x = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                         name="norm_row")(x + y)

        y = AxisMHA(self.num_heads, self.dim, axis=1, dtype=self.dtype,
                    name="col_attn")(x + pos, x)
        x = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                         name="norm_col")(x + y)

        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn_fc2")(y)
        x = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                         name="norm_ffn")(x + y)
        return x


class AxialPixelEncoder(nn.Module):
    """Drop-in replacement for the deformable encoder inside the pixel
    decoder: takes the projected multi-scale levels ([stride32, 16, 8],
    (B, h, w, C) each), returns enhanced levels in the same order."""
    cfg: PixelDecoderConfig
    dtype: Any = jnp.float32
    fast_norm: bool = False

    @nn.compact
    def __call__(self, levels: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        cfg = self.cfg
        C = cfg.feat_channels
        n = len(levels)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (n, C))
        poss = []
        for f in levels:
            _, h, w, _ = f.shape
            poss.append(sine_pos_encoding(h, w, num_feats=C // 2)
                        .astype(self.dtype)[None])
        xs = [f + level_embed[i] for i, f in enumerate(levels)]

        for layer in range(cfg.encoder_layers):
            block = AxialAttentionBlock(
                cfg.num_heads, C, cfg.ffn_channels, dtype=self.dtype,
                fast_norm=self.fast_norm, name=f"layer_{layer}")
            xs = [block(x, p) for x, p in zip(xs, poss)]
            # top-down cross-scale fusion: levels are ordered coarse->fine
            mixed = [xs[0]]
            for i in range(1, n):
                up = resize_bilinear(mixed[i - 1], xs[i].shape[1:3])
                up = nn.Dense(C, dtype=self.dtype,
                              name=f"mix_{layer}_{i}")(up)
                mixed.append(xs[i] + up)
            xs = mixed
        return xs
