"""Swin Transformer backbone (flax, NHWC).

Second backbone family for the segmenters (the reference stack's Mask2Former
supports Swin alongside R-50; BASELINE.json names "Swin/R-50 backbone" as the
flagship surface). Swin is a natural TPU citizen: shifted-window attention is
dense batched matmul over (windows, 49, C) tokens — no gathers; the cyclic
shift is jnp.roll.

Architecture follows the public Swin-T/S/B recipe: patch embed 4x4, depths
(2, 2, 6, 2) for tiny, window 7, relative position bias, patch merging
between stages, pre-norm blocks, stochastic depth omitted at inference.
Outputs 4 scales (strides 4/8/16/32) with channels C·(1,2,4,8) after a
per-scale LayerNorm, matching what the pixel decoder consumes.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SWIN_CONFIGS = {
    # name: (embed_dim, depths, num_heads)
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
}


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws-1)² relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray | None):
        """x: (nW, ws*ws, C); attn_mask: (nW_types, ws², ws²) additive or
        None. Windows of the same shift share a mask row (mask broadcast by
        window index handled by caller reshaping)."""
        nW, L, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nW, L, 3, H, hd)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # (nW, H, L, hd)

        table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, H))
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx].transpose(2, 0, 1)  # (H, L, L)

        logits = jnp.einsum("whld,whmd->whlm", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = logits + bias[None].astype(logits.dtype)
        if attn_mask is not None:
            logits = logits + attn_mask[:, None].astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("whlm,whmd->whld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nW, L, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C); H, W divisible by window (caller pads)."""
        B, H, W, C = x.shape
        ws = self.window
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))

        nh, nw = H // ws, W // ws
        windows = (x.reshape(B, nh, ws, nw, ws, C)
                   .transpose(0, 1, 3, 2, 4, 5)
                   .reshape(B * nh * nw, ws * ws, C))

        attn_mask = None
        if self.shift:
            # standard shifted-window mask: tokens from different spatial
            # regions (pre-roll) must not attend to each other
            img_mask = np.zeros((H, W), np.int32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift),
                       slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[hs, wsl] = cnt
                    cnt += 1
            m = (np.reshape(img_mask, (nh, ws, nw, ws))
                 .transpose(0, 2, 1, 3).reshape(nh * nw, ws * ws))
            diff = m[:, :, None] != m[:, None, :]
            mask = np.where(diff, -100.0, 0.0).astype(np.float32)
            attn_mask = jnp.tile(jnp.asarray(mask), (B, 1, 1))

        out = WindowAttention(self.dim, self.num_heads, ws, self.dtype,
                              name="attn")(windows, attn_mask)
        x = (out.reshape(B, nh, nw, ws, ws, C)
             .transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C))
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns 4 scale outputs (strides 4/8/16/32), each LayerNormed."""
    variant: str = "tiny"
    window: int = 7
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        embed_dim, depths, heads = SWIN_CONFIGS[self.variant]
        B, H, W, _ = x.shape
        ws = self.window

        # patch embed 4x4 (conv) + LN
        x = nn.Conv(embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        outs = []
        dim = embed_dim
        for stage, depth in enumerate(depths):
            # pad to window multiples for this stage
            _, h, w, _ = x.shape
            ph = (-h) % ws
            pw = (-w) % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0))) if (ph or pw) else x
            for blk in range(depth):
                xp = SwinBlock(dim, heads[stage], ws,
                               shift=0 if blk % 2 == 0 else ws // 2,
                               dtype=self.dtype,
                               name=f"stage{stage}_block{blk}")(xp)
            x = xp[:, :h, :w]
            if stage in self.out_indices:
                outs.append(nn.LayerNorm(dtype=self.dtype,
                                         name=f"out_norm{stage}")(x))
            if stage < len(depths) - 1:
                # patch merging needs even dims
                _, h2, w2, _ = x.shape
                x = jnp.pad(x, ((0, 0), (0, h2 % 2), (0, w2 % 2), (0, 0))) \
                    if (h2 % 2 or w2 % 2) else x
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"downsample{stage}")(x)
                dim *= 2
        return outs
