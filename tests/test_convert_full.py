"""Full-model weight-converter test: build a synthetic state_dict with the
exact mmdet Mask2Former key layout (reference: mmdet 2.25 module tree as
described in SURVEY.md §2.3), convert, and run the flax model with
encoder='msda' — catching any tree-structure or shape mismatch between the
converter and our module naming."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                 PixelDecoderConfig, TransformerDecoderConfig)
from openpvsg_tpu.models.mask2former import Mask2Former
from openpvsg_tpu.train.checkpoint import convert_mmdet_mask2former


def synthetic_mmdet_sd(rng, num_classes=5, Q=8, C=256, enc_layers=2,
                       dec_layers=3):
    sd = {}

    def add(k, *shape):
        sd[k] = rng.standard_normal(shape).astype(np.float32) * 0.02

    def add_bn(prefix, ch):
        add(f"{prefix}.weight", ch)
        add(f"{prefix}.bias", ch)
        sd[f"{prefix}.running_mean"] = np.zeros(ch, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(ch, np.float32)

    # --- ResNet-26-style backbone (1 bottleneck per stage)
    add("backbone.conv1.weight", 64, 3, 7, 7)
    add_bn("backbone.bn1", 64)
    planes = [64, 128, 256, 512]
    in_ch = 64
    for s, p in enumerate(planes, start=1):
        pre = f"backbone.layer{s}.0"
        add(f"{pre}.conv1.weight", p, in_ch, 1, 1)
        add_bn(f"{pre}.bn1", p)
        add(f"{pre}.conv2.weight", p, p, 3, 3)
        add_bn(f"{pre}.bn2", p)
        add(f"{pre}.conv3.weight", p * 4, p, 1, 1)
        add_bn(f"{pre}.bn3", p * 4)
        add(f"{pre}.downsample.0.weight", p * 4, in_ch, 1, 1)
        add_bn(f"{pre}.downsample.1", p * 4)
        in_ch = p * 4

    # --- pixel decoder
    pd = "panoptic_head.pixel_decoder"
    for i, ch in enumerate((2048, 1024, 512)):
        add(f"{pd}.input_convs.{i}.conv.weight", C, ch, 1, 1)
        add(f"{pd}.input_convs.{i}.conv.bias", C)
        add(f"{pd}.input_convs.{i}.gn.weight", C)
        add(f"{pd}.input_convs.{i}.gn.bias", C)
    add(f"{pd}.level_encoding.weight", 3, C)
    for li in range(enc_layers):
        p = f"{pd}.encoder.layers.{li}"
        add(f"{p}.attentions.0.sampling_offsets.weight", 8 * 3 * 4 * 2, C)
        add(f"{p}.attentions.0.sampling_offsets.bias", 8 * 3 * 4 * 2)
        add(f"{p}.attentions.0.attention_weights.weight", 8 * 3 * 4, C)
        add(f"{p}.attentions.0.attention_weights.bias", 8 * 3 * 4)
        for nm in ("value_proj", "output_proj"):
            add(f"{p}.attentions.0.{nm}.weight", C, C)
            add(f"{p}.attentions.0.{nm}.bias", C)
        add(f"{p}.ffns.0.layers.0.0.weight", 1024, C)
        add(f"{p}.ffns.0.layers.0.0.bias", 1024)
        add(f"{p}.ffns.0.layers.1.weight", C, 1024)
        add(f"{p}.ffns.0.layers.1.bias", C)
        for n in (0, 1):
            add(f"{p}.norms.{n}.weight", C)
            add(f"{p}.norms.{n}.bias", C)
    add(f"{pd}.lateral_convs.0.conv.weight", C, 256, 1, 1)
    add(f"{pd}.lateral_convs.0.conv.bias", C)
    add(f"{pd}.lateral_convs.0.gn.weight", C)
    add(f"{pd}.lateral_convs.0.gn.bias", C)
    add(f"{pd}.output_convs.0.conv.weight", C, C, 3, 3)
    add(f"{pd}.output_convs.0.conv.bias", C)
    add(f"{pd}.output_convs.0.gn.weight", C)
    add(f"{pd}.output_convs.0.gn.bias", C)
    add(f"{pd}.mask_feature.weight", C, C, 1, 1)
    add(f"{pd}.mask_feature.bias", C)

    # --- transformer head
    h = "panoptic_head"
    add(f"{h}.query_embed.weight", Q, C)
    add(f"{h}.query_feat.weight", Q, C)
    add(f"{h}.level_embed.weight", 3, C)
    for li in range(dec_layers):
        p = f"{h}.transformer_decoder.layers.{li}"
        for a in (0, 1):
            add(f"{p}.attentions.{a}.attn.in_proj_weight", 3 * C, C)
            add(f"{p}.attentions.{a}.attn.in_proj_bias", 3 * C)
            add(f"{p}.attentions.{a}.attn.out_proj.weight", C, C)
            add(f"{p}.attentions.{a}.attn.out_proj.bias", C)
        add(f"{p}.ffns.0.layers.0.0.weight", 2048, C)
        add(f"{p}.ffns.0.layers.0.0.bias", 2048)
        add(f"{p}.ffns.0.layers.1.weight", C, 2048)
        add(f"{p}.ffns.0.layers.1.bias", C)
        for n in (0, 1, 2):
            add(f"{p}.norms.{n}.weight", C)
            add(f"{p}.norms.{n}.bias", C)
    add(f"{h}.transformer_decoder.post_norm.weight", C)
    add(f"{h}.transformer_decoder.post_norm.bias", C)
    add(f"{h}.cls_embed.weight", num_classes + 1, C)
    add(f"{h}.cls_embed.bias", num_classes + 1)
    for j in (0, 2, 4):
        add(f"{h}.mask_embed.{j}.weight", C, C)
        add(f"{h}.mask_embed.{j}.bias", C)
    return sd


def test_converted_tree_loads_and_runs(rng):
    sd = synthetic_mmdet_sd(rng)
    converted = convert_mmdet_mask2former(sd)

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=8,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=2, encoder="msda"),
        decoder=TransformerDecoderConfig(num_layers=3))
    model = Mask2Former(cfg)
    x = jnp.zeros((1, 1, 64, 64, 3))
    init_vars = model.init(jax.random.PRNGKey(0), x)

    # converted tree must match the model's param structure exactly
    import flax
    init_flat = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda a: a.shape, init_vars["params"]))
    conv_flat = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda a: np.asarray(a).shape, converted["params"]))
    missing = set(init_flat) - set(conv_flat)
    extra = set(conv_flat) - set(init_flat)
    assert not missing, f"converter missing params: {sorted(missing)[:8]}"
    assert not extra, f"converter extra params: {sorted(extra)[:8]}"
    for k in init_flat:
        assert init_flat[k] == conv_flat[k], (
            f"shape mismatch at {k}: {init_flat[k]} vs {conv_flat[k]}")

    bs_init = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda a: a.shape, init_vars.get("batch_stats", {})))
    bs_conv = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda a: np.asarray(a).shape, converted["batch_stats"]))
    assert set(bs_init) == set(bs_conv)

    variables = {"params": jax.tree.map(jnp.asarray, converted["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray,
                                             converted["batch_stats"])}
    out = model.apply(variables, x)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert np.isfinite(np.asarray(out["mask_preds"])).all()
