"""Masked-attention DETR-style transformer decoder (flax, batched).

TPU-native rebuild of the reference's 9-layer Mask2Former decoder (reference:
models/mask2former/mask2former_head.py:355-479 and the video variant
models/mask2former_vps/mask2former_video_head.py:337-462). One module covers
both: image features are a T=1 video. Per layer:

  masked cross-attn over the level's (T*H_l*W_l) tokens  ->  norm
  self-attn over the 100 queries                         ->  norm
  FFN                                                    ->  norm

The attention mask comes from the previous layer's mask prediction resized
to the level resolution: tokens with sigmoid(mask) < 0.5 are excluded, and a
query whose mask would exclude everything attends everywhere (mmdet rule).
All attention is dense batched matmul (MXU); no dynamic shapes.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from openpvsg_tpu.config import TransformerDecoderConfig
from openpvsg_tpu.ops.resize import resize_bilinear


class MultiheadAttention(nn.Module):
    """Standard MHA with optional boolean mask (True = may attend).

    Parameter layout matches torch.nn.MultiheadAttention after the converter
    splits the packed in_proj into q/k/v."""
    num_heads: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        H = self.num_heads
        hd = self.dim // H
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        qp = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)
        # einsums operate directly on (B, L, H, hd) — no explicit head
        # transposes (the model is relayout-bound on TPU; see PERF.md)
        qp = qp.reshape(B, Lq, H, hd)
        kp = kp.reshape(B, Lk, H, hd)
        vp = vp.reshape(B, Lk, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp,
                            preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        if mask is not None:
            # mask: (B, Lq, Lk) or (B, H, Lq, Lk); True = attend
            if mask.ndim == 3:
                mask = mask[:, None]
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(B, Lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class DecoderFFN(nn.Module):
    hidden: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class MaskedDecoderLayer(nn.Module):
    cfg: TransformerDecoderConfig
    dtype: Any = jnp.float32
    # fast_norm=True computes LN statistics in the compute dtype instead of
    # fp32 — removes the convert_reduce_fusion ops that PERF.md identified as
    # ~11% of the inference window (no-op when dtype is float32)
    fast_norm: bool = False

    @nn.compact
    def __call__(self, query, query_pos, feat, feat_pos, attn_mask):
        """query: (B, Q, C); feat: (B, S, C); attn_mask: (B, Q, S) bool
        (True = attend)."""
        c = self.cfg
        f32r = not self.fast_norm
        # masked cross-attention (operation_order puts cross first)
        x = MultiheadAttention(c.num_heads, c.feat_channels, self.dtype,
                               name="cross_attn")(
            query + query_pos, feat + feat_pos, feat, mask=attn_mask)
        query = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                             name="norm1")(query + x)
        # self-attention among queries
        x = MultiheadAttention(c.num_heads, c.feat_channels, self.dtype,
                               name="self_attn")(
            query + query_pos, query + query_pos, query)
        query = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                             name="norm2")(query + x)
        query = DecoderFFN(c.ffn_channels, c.feat_channels, self.dtype,
                           name="ffn")(query)
        query = nn.LayerNorm(dtype=self.dtype, force_float32_reductions=f32r,
                             name="norm3")(query)
        return query


def compute_attn_mask(mask_pred: jnp.ndarray, level_hw: Tuple[int, int]) -> jnp.ndarray:
    """mask_pred: (B, Q, T, H, W) logits -> bool attend-mask (B, Q, T*h*w).

    mmdet semantics: excluded = sigmoid(resized) < 0.5 (== logits < 0);
    a query with no attendable token attends everywhere."""
    B, Q, T, H, W = mask_pred.shape
    h, w = level_hw
    m = mask_pred.reshape(B * Q * T, H, W, 1)
    m = resize_bilinear(m, (h, w)).reshape(B, Q, T * h * w)
    attend = m >= 0.0  # sigmoid(x) >= 0.5  <=>  x >= 0
    all_blocked = ~attend.any(axis=-1, keepdims=True)
    return attend | all_blocked
