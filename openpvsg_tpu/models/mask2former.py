"""Mask2Former segmenter (flax, NHWC) — unified image (IPS) / video (VPS)
panoptic head.

TPU-native rebuild of the reference detectors and heads:
  Mask2FormerCustom            models/mask2former/mask2former.py:77-191
  Mask2FormerHeadCustom        models/mask2former/mask2former_head.py:58-681
  Mask2FormerVideoCustom       models/mask2former_vps/mask2former.py:85-223
  Mask2FormerVideoHead         models/mask2former_vps/mask2former_video_head.py

One head covers both tasks: features carry a time axis T (T=1 for IPS); the
decoder attends over the flattened (T*H_l*W_l) token axis per level with 2-D
sine PE for images and the 3-D variant for clips (reference:
SinePositionalEncoding3D). The mask logits are one einsum
('bqc,bthwc->bqthw') on the MXU.

Outputs are per-layer prediction lists (10 = initial + 9 layers) for deep
supervision, exactly the aux-loss structure of the reference.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from openpvsg_tpu.config import Mask2FormerConfig
from openpvsg_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from openpvsg_tpu.models.position_encoding import sine_pos_encoding, sine_pos_encoding_3d
from openpvsg_tpu.models.resnet import ResNet
from openpvsg_tpu.models.transformer_decoder import MaskedDecoderLayer
from openpvsg_tpu.ops.resize import resize_bilinear


class MaskEmbedMLP(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class Mask2FormerHead(nn.Module):
    cfg: Mask2FormerConfig
    dtype: Any = jnp.float32
    # all_layer_masks=True emits full-resolution mask logits for every layer
    # (deep supervision); False (inference) emits only the final layer's —
    # intermediate layers only need attention masks, computed exactly from
    # pre-resized mask features (resize is linear, so
    # resize(einsum(q, F)) == einsum(q, resize(F)) — no approximation).
    all_layer_masks: bool = True
    fast_norm: bool = False  # LN/GN stats in compute dtype (PERF.md)

    @nn.compact
    def __call__(self, mask_features: jnp.ndarray,
                 multi_scale_feats: Sequence[jnp.ndarray]):
        """mask_features: (B, T, H4, W4, C); multi_scale_feats: list of
        (B, T, h_l, w_l, C) for strides [32, 16, 8].

        Returns (cls_preds, mask_preds, query_feats):
          cls_preds:  (L+1, B, Q, num_classes+1)
          mask_preds: (L+1, B, Q, T, H4, W4) logits (or (1, ...) when
                      all_layer_masks=False)
          query_feats:(B, Q, C) final decoder-normed query embeddings
          (the reference's return_query=True surface, mask2former_head.py:650-681)
        """
        cfg = self.cfg
        C = cfg.decoder.feat_channels
        Q = cfg.num_queries
        n_levels = cfg.num_transformer_feat_level
        B, T = mask_features.shape[0], mask_features.shape[1]
        H4, W4 = mask_features.shape[2], mask_features.shape[3]

        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (Q, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (Q, C))
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (n_levels, C))

        # flatten each level to (B, T*h*w, C) with positional encodings, and
        # pre-resize the mask features to each level's resolution (used to
        # compute attention masks without a full-res einsum per layer)
        feats_flat: List[jnp.ndarray] = []
        pos_flat: List[jnp.ndarray] = []
        level_hw: List[Tuple[int, int]] = []
        level_mask_feats: List[jnp.ndarray] = []
        mf_flat = mask_features.reshape(B * T, H4, W4, C)
        for lvl, f in enumerate(multi_scale_feats):
            _, _, h, w, _ = f.shape
            if T == 1:
                pos = sine_pos_encoding(h, w, num_feats=C // 2)[None]
            else:
                pos = sine_pos_encoding_3d(T, h, w, num_feats=C // 2)
            pos = pos.reshape(1, T * h * w, C).astype(self.dtype)
            feats_flat.append(f.reshape(B, T * h * w, C) + level_embed[lvl])
            pos_flat.append(pos)
            level_hw.append((h, w))
            lm = resize_bilinear(mf_flat, (h, w)).reshape(B, T * h * w, C)
            level_mask_feats.append(lm)

        query = jnp.broadcast_to(query_feat[None], (B, Q, C)).astype(self.dtype)
        query_pos = jnp.broadcast_to(query_embed[None], (B, Q, C)).astype(self.dtype)

        decoder_norm = nn.LayerNorm(dtype=self.dtype,
                                    force_float32_reductions=not self.fast_norm,
                                    name="decoder_norm")
        cls_embed = nn.Dense(cfg.num_classes + 1, dtype=self.dtype, name="cls_embed")
        mask_embed = MaskEmbedMLP(C, dtype=self.dtype, name="mask_embed")

        def head_common(q):
            out = decoder_norm(q)
            return cls_embed(out), mask_embed(out), out

        # mask logits: f32 MXU accumulation always; storage dtype follows
        # cfg.mask_logits_dtype (bf16 halves the train step's largest HBM
        # tensor — the (L, B, Q, T, H, W) deep-supervision stack; see the
        # config knob's docstring)
        logits_dtype = (jnp.bfloat16
                        if getattr(cfg, "mask_logits_dtype",
                                   "float32") == "bfloat16"
                        else jnp.float32)

        def full_masks(membed):
            out = jnp.einsum("bqc,bthwc->bqthw", membed, mask_features,
                             preferred_element_type=jnp.float32)
            return out.astype(logits_dtype)

        def attn_mask_for(membed, lvl):
            # logits at level resolution, exactly == resize(full einsum)
            logits = jnp.einsum("bqc,bsc->bqs", membed, level_mask_feats[lvl],
                                preferred_element_type=jnp.float32)
            attend = logits >= 0.0
            all_blocked = ~attend.any(axis=-1, keepdims=True)
            return attend | all_blocked

        cls_preds, mask_preds = [], []
        cls_p, membed, _ = head_common(query)
        cls_preds.append(cls_p)
        if self.all_layer_masks:
            mask_preds.append(full_masks(membed))

        final_query = None
        final_membed = membed
        for layer in range(cfg.decoder.num_layers):
            lvl = layer % n_levels
            attn_mask = attn_mask_for(membed, lvl)
            query = MaskedDecoderLayer(cfg.decoder, dtype=self.dtype,
                                       fast_norm=self.fast_norm,
                                       name=f"layer_{layer}")(
                query, query_pos, feats_flat[lvl], pos_flat[lvl], attn_mask)
            cls_p, membed, normed = head_common(query)
            cls_preds.append(cls_p)
            if self.all_layer_masks:
                mask_preds.append(full_masks(membed))
            final_query = normed
            final_membed = membed

        if not self.all_layer_masks:
            mask_preds.append(full_masks(final_membed))

        return (jnp.stack(cls_preds), jnp.stack(mask_preds), final_query)


class Mask2Former(nn.Module):
    """Backbone + pixel decoder + transformer head.

    Input images: (B, T, H, W, 3) normalized; T=1 for IPS. The backbone runs
    on the flattened (B*T) frame axis (reference clip reshape:
    mask2former_vps/mask2former.py:107-110) — on TPU this is the natural
    large-batch MXU layout.
    """
    cfg: Mask2FormerConfig
    train: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32
    fast_norm: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        cfg = self.cfg
        B, T, H, W, _ = images.shape
        x = images.reshape(B * T, H, W, 3).astype(self.dtype)
        if cfg.backbone.kind == "swin":
            from openpvsg_tpu.models.swin import SwinTransformer

            feats = SwinTransformer(
                variant=cfg.backbone.swin_variant,
                out_indices=cfg.backbone.out_indices,
                dtype=self.dtype,
                name="backbone",
            )(x)
        else:
            feats = ResNet(
                depth=cfg.backbone.depth,
                out_indices=cfg.backbone.out_indices,
                norm=cfg.backbone.norm,
                train=self.train,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="backbone",
            )(x)
        mask_features, ms_feats = MSDeformAttnPixelDecoder(
            cfg.pixel_decoder, dtype=self.dtype, fast_norm=self.fast_norm,
            name="pixel_decoder")(feats)

        def unflatten(f):
            _, h, w, c = f.shape
            return f.reshape(B, T, h, w, c)

        cls_preds, mask_preds, query_feats = Mask2FormerHead(
            cfg, dtype=self.dtype, all_layer_masks=self.train,
            fast_norm=self.fast_norm, name="head")(
            unflatten(mask_features), [unflatten(f) for f in ms_feats])
        out = {
            "cls_preds": cls_preds,      # (L+1, B, Q, K+1)
            "mask_preds": mask_preds,    # (L+1, B, Q, T, H/4, W/4) in train;
                                         # (1, ...) final-layer-only in eval
            "query_feats": query_feats,  # (B, Q, C)
        }
        if cfg.with_sem_seg:
            # per-pixel semantic aux head (VPS loss_sem_seg option)
            sem = nn.Conv(cfg.num_classes + 1, (1, 1), dtype=self.dtype,
                          name="sem_seg_head")(mask_features)
            out["sem_seg"] = unflatten(sem)  # (B, T, H/4, W/4, K+1)
        return out
