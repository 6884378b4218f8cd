"""Mask2Former forward smoke tests (tiny shapes, CPU) + fusion postprocess
semantics vs a straightforward python port of the reference loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu import INSTANCE_OFFSET
from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                 PixelDecoderConfig, TransformerDecoderConfig)
from openpvsg_tpu.models.fusion import panoptic_fusion
from openpvsg_tpu.models.mask2former import Mask2Former


def tiny_cfg(video=False, encoder="axial"):
    return Mask2FormerConfig(
        num_things_classes=3,
        num_stuff_classes=2,
        num_queries=8,
        video=video,
        num_frames=2 if video else 1,
        backbone=BackboneConfig(depth=26, norm="frozen_bn"),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=64,
                                         encoder=encoder),
        decoder=TransformerDecoderConfig(num_layers=3, ffn_channels=64),
    )


@pytest.mark.parametrize("T,encoder", [(1, "axial"), (2, "axial"),
                                       (1, "msda"), (2, "msda")])
def test_forward_shapes(T, encoder):
    cfg = tiny_cfg(video=(T == 2), encoder=encoder)
    model = Mask2Former(cfg)
    x = jnp.zeros((1, T, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    L = cfg.decoder.num_layers + 1
    assert out["cls_preds"].shape == (L, 1, 8, cfg.num_classes + 1)
    # inference emits only the final layer's full-res masks
    assert out["mask_preds"].shape == (1, 1, 8, T, 16, 24)
    assert out["query_feats"].shape == (1, 8, 256)

    # training mode emits per-layer masks for deep supervision
    train_model = Mask2Former(cfg, train=True)
    out_t = train_model.apply(variables, x, mutable=["batch_stats"])[0]
    assert out_t["mask_preds"].shape == (L, 1, 8, T, 16, 24)
    # identical final-layer masks between the two paths (the attn-mask
    # factorization is exact)
    np.testing.assert_allclose(np.asarray(out["mask_preds"][-1]),
                               np.asarray(out_t["mask_preds"][-1]), atol=2e-5)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert np.isfinite(np.asarray(out["mask_preds"])).all()


def test_forward_jits():
    cfg = tiny_cfg()
    model = Mask2Former(cfg)
    x = jnp.zeros((1, 1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    out = fwd(variables, x)
    assert out["cls_preds"].shape[0] == cfg.decoder.num_layers + 1
    assert out["mask_preds"].shape[0] == 1  # eval: final layer only


def _reference_fusion_loop(cls_logits, mask_logits, num_things, num_stuff,
                           object_mask_thr=0.8, iou_thr=0.8):
    """Direct python port of the reference per-query loop
    (mask2former_fusion_head.py:30-94), used as the oracle."""
    import scipy.special

    num_classes = num_things + num_stuff
    probs = scipy.special.softmax(cls_logits, axis=-1)
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    sig = scipy.special.expit(mask_logits)
    keep = (labels != num_classes) & (scores > object_mask_thr)

    h, w = mask_logits.shape[-2:]
    pan = np.full((h, w), num_classes, dtype=np.int64)
    cur_scores = scores[keep]
    cur_classes = labels[keep]
    cur_masks = sig[keep]
    if cur_masks.shape[0] == 0:
        return pan
    cur_prob_masks = cur_scores[:, None, None] * cur_masks
    cur_mask_ids = cur_prob_masks.argmax(0)
    instance_id = 1
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class < num_things
        mask = (cur_mask_ids == k) & (cur_masks[k] >= 0.5)
        mask_area = mask.sum()
        original_area = (cur_masks[k] >= 0.5).sum()
        if mask_area > 0 and original_area > 0:
            if mask_area / original_area < iou_thr:
                continue
            if not isthing:
                pan[mask] = pred_class
            else:
                pan[mask] = pred_class + instance_id * INSTANCE_OFFSET
                instance_id += 1
    return pan


def test_fusion_matches_reference_loop(rng):
    num_things, num_stuff = 3, 2
    Q, H, W = 10, 24, 32
    for trial in range(8):
        cls_logits = rng.standard_normal((Q, num_things + num_stuff + 1)) * 3
        mask_logits = rng.standard_normal((Q, H, W)) * 2
        ours = np.asarray(panoptic_fusion(
            jnp.asarray(cls_logits, jnp.float32),
            jnp.asarray(mask_logits, jnp.float32),
            num_things, num_stuff)["pan_seg"])
        oracle = _reference_fusion_loop(cls_logits, mask_logits,
                                        num_things, num_stuff)
        np.testing.assert_array_equal(ours, oracle, err_msg=f"trial {trial}")


def test_fusion_empty():
    out = panoptic_fusion(
        jnp.full((4, 6), -10.0).at[:, -1].set(10.0),  # all background
        jnp.zeros((4, 8, 8)), 3, 2)
    assert (np.asarray(out["pan_seg"]) == 5).all()
    assert not np.asarray(out["query_keep"]).any()


def test_axis_mha_matches_transposed_mha(rng):
    """The layout-preserving AxisMHA must equal the flatten/transpose MHA
    formulation it replaced (same params, same math, no relayout)."""
    import jax
    import jax.numpy as jnp
    from openpvsg_tpu.models.axial_encoder import AxisMHA
    from openpvsg_tpu.models.transformer_decoder import MultiheadAttention

    B, H, W, C, heads = 2, 5, 7, 32, 4
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.float32)

    axis_row = AxisMHA(heads, C, axis=2)
    params = axis_row.init(jax.random.PRNGKey(0), x + pos, x)["params"]
    got_row = axis_row.apply({"params": params}, x + pos, x)

    mha = MultiheadAttention(heads, C)
    q = (x + pos).reshape(B * H, W, C)
    want_row = mha.apply({"params": params}, q, q,
                         x.reshape(B * H, W, C)).reshape(B, H, W, C)
    np.testing.assert_allclose(np.asarray(got_row), np.asarray(want_row),
                               atol=1e-5)

    axis_col = AxisMHA(heads, C, axis=1)
    got_col = axis_col.apply({"params": params}, x + pos, x)
    xt = x.transpose(0, 2, 1, 3)
    qt = (x + pos).transpose(0, 2, 1, 3).reshape(B * W, H, C)
    want_col = mha.apply({"params": params}, qt, qt,
                         xt.reshape(B * W, H, C)) \
        .reshape(B, W, H, C).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got_col), np.asarray(want_col),
                               atol=1e-5)
