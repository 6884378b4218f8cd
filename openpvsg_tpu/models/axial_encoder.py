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
import jax.numpy as jnp

from openpvsg_tpu.config import PixelDecoderConfig
from openpvsg_tpu.models.position_encoding import sine_pos_encoding
from openpvsg_tpu.models.transformer_decoder import MultiheadAttention
from openpvsg_tpu.ops.resize import resize_bilinear


class AxialAttentionBlock(nn.Module):
    num_heads: int
    dim: int
    ffn_dim: int
    dtype: Any = jnp.float32
    fast_norm: bool = False  # LN stats in compute dtype (see PERF.md)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C); pos: (1, H, W, C)."""
        B, H, W, C = x.shape
        f32r = not self.fast_norm
        row_attn = MultiheadAttention(self.num_heads, self.dim, self.dtype,
                                      name="row_attn")
        col_attn = MultiheadAttention(self.num_heads, self.dim, self.dtype,
                                      name="col_attn")

        # rows: (B*H, W, C)
        q = (x + pos).reshape(B * H, W, C)
        y = row_attn(q, q, x.reshape(B * H, W, C))
        x = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                         name="norm_row")(x + y.reshape(B, H, W, C))

        # cols: (B*W, H, C)
        xt = x.transpose(0, 2, 1, 3)
        post = pos.transpose(0, 2, 1, 3)
        q = (xt + post).reshape(B * W, H, C)
        y = col_attn(q, q, xt.reshape(B * W, H, C))
        x = x + y.reshape(B, W, H, C).transpose(0, 2, 1, 3)
        x = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                         name="norm_col")(x)

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
