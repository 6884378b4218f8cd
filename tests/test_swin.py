"""Swin backbone tests: scale shapes, window-attention vs torch oracle,
full segmenter forward, converter structure."""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from openpvsg_tpu.models.swin import (SwinTransformer, WindowAttention,
                                      _rel_pos_index)


def test_backbone_scales():
    model = SwinTransformer(variant="tiny")
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    shapes = [o.shape for o in outs]
    assert shapes == [(1, 16, 24, 96), (1, 8, 12, 192),
                      (1, 4, 6, 384), (1, 2, 3, 768)]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_window_attention_matches_torch(rng):
    """Our windowed MHA with relative position bias vs a direct torch
    computation using the converted weights."""
    dim, heads, ws, nW = 32, 4, 4, 3
    L = ws * ws
    model = WindowAttention(dim, heads, ws)
    x = jnp.asarray(rng.standard_normal((nW, L, dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, None)["params"]

    qkv_w = np.asarray(params["qkv"]["kernel"])  # (C, 3C)
    qkv_b = np.asarray(params["qkv"]["bias"])
    proj_w = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    table = np.asarray(params["rel_bias_table"])

    xt = torch.from_numpy(np.asarray(x))
    qkv = (xt @ torch.from_numpy(qkv_w) + torch.from_numpy(qkv_b))
    q, k, v = qkv.reshape(nW, L, 3, heads, dim // heads).permute(
        2, 0, 3, 1, 4).unbind(0)
    logits = (q @ k.transpose(-2, -1)) / np.sqrt(dim // heads)
    idx = _rel_pos_index(ws)
    bias = torch.from_numpy(table[idx]).permute(2, 0, 1)
    logits = logits + bias[None]
    attn = TF.softmax(logits, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(nW, L, dim)
    expect = (out @ torch.from_numpy(proj_w) + torch.from_numpy(proj_b)).numpy()

    ours = np.asarray(model.apply({"params": params}, x, None))
    np.testing.assert_allclose(ours, expect, atol=1e-4)


def test_swin_segmenter_forward():
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(kind="swin", swin_variant="tiny"),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32,
                                         in_channels=(96, 192, 384, 768)),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=32))
    model = Mask2Former(cfg)
    x = jnp.zeros((1, 1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["cls_preds"].shape == (2, 1, 4, 6)
    assert out["mask_preds"].shape[-2:] == (16, 16)


def test_swin_converter_structure(rng):
    from openpvsg_tpu.train.checkpoint import convert_mmdet_swin
    import flax

    # synthetic mmdet-layout swin-tiny state dict (2 blocks in stage 0 only,
    # truncated depths for test size)
    dims = (96, 192, 384, 768)
    depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    ws = 7
    sd = {}

    def add(k, *shape):
        sd[k] = rng.standard_normal(shape).astype(np.float32) * 0.02

    add("backbone.patch_embed.projection.weight", 96, 3, 4, 4)
    add("backbone.patch_embed.projection.bias", 96)
    add("backbone.patch_embed.norm.weight", 96)
    add("backbone.patch_embed.norm.bias", 96)
    for s, (d, nh, depth) in enumerate(zip(dims, heads, depths)):
        for b in range(depth):
            p = f"backbone.stages.{s}.blocks.{b}"
            for n in ("norm1", "norm2"):
                add(f"{p}.{n}.weight", d)
                add(f"{p}.{n}.bias", d)
            add(f"{p}.attn.w_msa.qkv.weight", 3 * d, d)
            add(f"{p}.attn.w_msa.qkv.bias", 3 * d)
            add(f"{p}.attn.w_msa.proj.weight", d, d)
            add(f"{p}.attn.w_msa.proj.bias", d)
            add(f"{p}.attn.w_msa.relative_position_bias_table",
                (2 * ws - 1) ** 2, nh)
            add(f"{p}.ffn.layers.0.0.weight", 4 * d, d)
            add(f"{p}.ffn.layers.0.0.bias", 4 * d)
            add(f"{p}.ffn.layers.1.weight", d, 4 * d)
            add(f"{p}.ffn.layers.1.bias", d)
        if s < 3:
            add(f"backbone.stages.{s}.downsample.norm.weight", 4 * d)
            add(f"backbone.stages.{s}.downsample.norm.bias", 4 * d)
            add(f"backbone.stages.{s}.downsample.reduction.weight", 2 * d, 4 * d)
    for i, d in enumerate(dims):
        add(f"backbone.norm{i}.weight", d)
        add(f"backbone.norm{i}.bias", d)

    converted = convert_mmdet_swin(sd)
    model = SwinTransformer(variant="tiny")
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    init_flat = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda a: a.shape, init["params"]))
    conv_flat = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda a: np.asarray(a).shape, converted["params"]))
    assert set(init_flat) == set(conv_flat), (
        sorted(set(init_flat) ^ set(conv_flat))[:6])
    for k in init_flat:
        assert init_flat[k] == conv_flat[k], k
    # converted weights must run
    out = model.apply({"params": jax.tree.map(jnp.asarray,
                                              converted["params"])},
                      jnp.zeros((1, 56, 56, 3)))
    assert np.isfinite(np.asarray(out[0])).all()
