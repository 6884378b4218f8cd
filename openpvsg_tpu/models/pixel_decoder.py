"""MSDeformAttn pixel decoder (flax, NHWC).

TPU-native rebuild of mmdet's MSDeformAttnPixelDecoder (reference config:
configs/mask2former/..._custom.py:35-67): the top-3 backbone scales are
projected to 256-d, run through a 6-layer deformable-attention encoder over
the concatenated multi-scale token axis, then fused FPN-style with the
stride-4 scale to produce the mask features.

The deformable attention itself is `openpvsg_tpu.ops.ms_deform_attn` — a
bilinear-gather reformulation of the mmcv CUDA kernel.
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu.config import PixelDecoderConfig
from openpvsg_tpu.models.position_encoding import sine_pos_encoding
from openpvsg_tpu.ops.resize import resize_bilinear
from openpvsg_tpu.ops.sampling import ms_deform_attn


def _msda_offset_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Directional-grid bias init of sampling offsets (mmcv
    MultiScaleDeformableAttention.init_weights): head h points at angle
    2πh/H, scaled by point index."""
    thetas = np.arange(n_heads) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1)


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention layer (self-attention flavor used in
    the encoder: query == value tokens + positional embedding)."""
    embed_dim: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, value: jnp.ndarray,
                 reference_points: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        """query/value: (B, S, C); reference_points: (B, S, 2) normalized.
        Returns (B, S, C)."""
        B, S, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = C // H

        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, S, H, head_dim)

        bias0 = _msda_offset_bias(H, L, P)
        offsets = nn.Dense(
            H * L * P * 2, dtype=self.dtype, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(bias0, dtype),
        )(query).reshape(B, S, H, L, P, 2)
        attn = nn.Dense(
            H * L * P, dtype=self.dtype, name="attention_weights",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(query).reshape(B, S, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, S, H, L, P)

        # offsets are in pixels of each level: normalize by (W_l, H_l)
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], dtype=jnp.float32)  # (L, 2)
        locs = (reference_points[:, :, None, None, None, :]
                + offsets / normalizer[None, None, None, :, None, :])
        out = ms_deform_attn(v, spatial_shapes, locs, attn)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class FFN(nn.Module):
    hidden: int
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class ConvGN(nn.Module):
    out_ch: int
    kernel: int = 1
    num_groups: int = 32
    act: bool = False
    dtype: Any = jnp.float32
    fast_norm: bool = False  # GN stats in compute dtype (see PERF.md)

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                    padding=((pad, pad), (pad, pad)), use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype,
                         force_float32_reductions=not self.fast_norm,
                         name="gn")(x)
        if self.act:
            x = nn.relu(x)
        return x


class MSDeformAttnPixelDecoder(nn.Module):
    cfg: PixelDecoderConfig
    dtype: Any = jnp.float32
    fast_norm: bool = False

    def _msda_encoder(self, projs: Sequence[jnp.ndarray],
                      spatial_shapes: Sequence[Tuple[int, int]]):
        """Exact deformable-attention encoder (reference semantics;
        gather-bound on TPU — see axial_encoder.py for the fast default)."""
        cfg = self.cfg
        C = cfg.feat_channels
        n_enc = cfg.num_levels
        B = projs[0].shape[0]
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (n_enc, C))

        srcs, poss = [], []
        for i, proj in enumerate(projs):
            h, w = spatial_shapes[i]
            pos = sine_pos_encoding(h, w, num_feats=C // 2).astype(self.dtype)
            srcs.append(proj.reshape(B, h * w, C))
            poss.append(pos.reshape(1, h * w, C) + level_embed[i])
        src = jnp.concatenate(srcs, axis=1)
        pos = jnp.concatenate(poss, axis=1)

        # reference points: each token's own normalized center, shared across
        # levels (valid ratios = 1: no padding masks on TPU — static shapes)
        ref_list = []
        for (h, w) in spatial_shapes:
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            ref_list.append(jnp.stack([gx, gy], -1).reshape(h * w, 2))
        reference_points = jnp.concatenate(ref_list, axis=0)[None]
        reference_points = jnp.broadcast_to(reference_points, (B, src.shape[1], 2))

        x = src
        for layer in range(cfg.encoder_layers):
            attn_out = MSDeformAttention(
                embed_dim=C, num_heads=cfg.num_heads, num_levels=n_enc,
                num_points=cfg.num_points, dtype=self.dtype,
                name=f"encoder_layer_{layer}_attn",
            )(x + pos, x, reference_points, spatial_shapes)
            x = nn.LayerNorm(dtype=self.dtype,
                             force_float32_reductions=not self.fast_norm,
                             name=f"encoder_layer_{layer}_norm1")(x + attn_out)
            x = FFN(cfg.ffn_channels, C, dtype=self.dtype,
                    name=f"encoder_layer_{layer}_ffn")(x)
            x = nn.LayerNorm(dtype=self.dtype,
                             force_float32_reductions=not self.fast_norm,
                             name=f"encoder_layer_{layer}_norm2")(x)

        outs: List[jnp.ndarray] = []
        start = 0
        for (h, w) in spatial_shapes:
            outs.append(x[:, start:start + h * w].reshape(B, h, w, C))
            start += h * w
        return outs

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: backbone outputs, low->high stride, NHWC.

        Returns (mask_feature (B, H/4, W/4, C_out),
                 multi_scale_feats [stride32, stride16, stride8] NHWC).
        """
        cfg = self.cfg
        C = cfg.feat_channels
        n_enc = cfg.num_levels  # encoder levels (top 3 scales)
        n_in = len(cfg.in_channels)

        # --- project encoder inputs: levels [highest stride ...] = [3, 2, 1]
        projs: List[jnp.ndarray] = []
        spatial_shapes: List[Tuple[int, int]] = []
        for i in range(n_enc):
            level_idx = n_in - i - 1
            proj = ConvGN(C, kernel=1, num_groups=cfg.num_groups,
                          dtype=self.dtype, fast_norm=self.fast_norm,
                          name=f"input_conv_{i}")(feats[level_idx])
            projs.append(proj)
            spatial_shapes.append(proj.shape[1:3])
        B = projs[0].shape[0]

        if cfg.encoder == "axial":
            from openpvsg_tpu.models.axial_encoder import AxialPixelEncoder

            outs = AxialPixelEncoder(cfg, dtype=self.dtype,
                                     fast_norm=self.fast_norm,
                                     name="axial_encoder")(projs)
        else:
            outs = self._msda_encoder(projs, spatial_shapes)
        # outs = [stride32, stride16, stride8]

        # --- FPN fusion with remaining lower-stride levels (stride 4)
        if (cfg.fused_fpn and not self.is_initializing()
                and n_in - n_enc == 1
                and feats[0].shape[1] % 8 == 0):
            # serving path: the whole stride-4 chain as the fused Pallas
            # kernel (ops/pallas/fpn_kernel.py — VERDICT r2 #5; measured
            # 1.20 -> 0.80 ms/window standalone). Params are read from the
            # SAME flax submodules the unfused branch declares (created at
            # init, which always takes the unfused branch), so checkpoints
            # are interchangeable. Inference-only: pallas_call has no VJP.
            import jax as _jax

            from openpvsg_tpu.ops.pallas.fpn_kernel import fused_fpn_stride4

            pv = self.variables["params"]
            p = {
                "w_lat": pv["lateral_conv_0"]["conv"]["kernel"],
                "b_lat": pv["lateral_conv_0"]["conv"]["bias"],
                "gn1_scale": pv["lateral_conv_0"]["gn"]["scale"],
                "gn1_bias": pv["lateral_conv_0"]["gn"]["bias"],
                "w_out": pv["output_conv_0"]["conv"]["kernel"],
                "b_out": pv["output_conv_0"]["conv"]["bias"],
                "gn2_scale": pv["output_conv_0"]["gn"]["scale"],
                "gn2_bias": pv["output_conv_0"]["gn"]["bias"],
                "w_mask": pv["mask_feature"]["kernel"],
                "b_mask": pv["mask_feature"]["bias"],
            }
            mask_feature = fused_fpn_stride4(
                feats[0], outs[-1], p, num_groups=cfg.num_groups,
                compute_dtype=self.dtype,
                interpret=_jax.default_backend() == "cpu")
            return mask_feature, outs[:cfg.num_outs]

        y = outs[-1]
        for i in range(n_in - n_enc - 1, -1, -1):
            lateral = ConvGN(C, kernel=1, num_groups=cfg.num_groups,
                             dtype=self.dtype, fast_norm=self.fast_norm,
                             name=f"lateral_conv_{i}")(feats[i])
            y = lateral + resize_bilinear(y, lateral.shape[1:3])
            y = ConvGN(C, kernel=3, num_groups=cfg.num_groups, act=True,
                       dtype=self.dtype, fast_norm=self.fast_norm,
                       name=f"output_conv_{i}")(y)
            outs.append(y)

        mask_feature = nn.Conv(cfg.out_channels, (1, 1), dtype=self.dtype,
                               name="mask_feature")(outs[-1])
        return mask_feature, outs[:cfg.num_outs]
