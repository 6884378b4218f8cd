"""Frozen-BN -> conv folding (serving-graph optimization, PERF.md round 2).

The fold is exact algebra — BN-with-running-stats after a bias-free conv is
a conv with per-output-channel scaled kernel + bias — so folded and unfolded
models must agree to float-reassociation tolerance. The reference never
fuses (eval-mode BN stays a separate op; mmcv's fuse_conv_bn is present but
uninvoked).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.models.resnet import ResNet, fold_frozen_bn


def _randomize_stats(rng, stats):
    """Random running mean / positive var so the fold is non-trivial."""
    def mk(tree):
        out = {}
        for k, v in tree.items():
            if k == "bn":
                out[k] = {
                    "mean": jnp.asarray(
                        rng.standard_normal(v["mean"].shape), v["mean"].dtype),
                    "var": jnp.asarray(
                        rng.standard_normal(v["var"].shape) ** 2 + 0.5,
                        v["var"].dtype),
                }
            else:
                out[k] = mk(v)
        return out
    return mk(stats)


@pytest.mark.parametrize("depth", [26, 18])
def test_resnet_fold_matches_unfolded(depth, rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m = ResNet(depth=depth, norm="frozen_bn")
    v = dict(m.init(jax.random.PRNGKey(0), x))
    v["batch_stats"] = _randomize_stats(rng, v["batch_stats"])
    ref = m.apply(v, x)

    fv = fold_frozen_bn(v)
    assert "batch_stats" not in fv
    mf = ResNet(depth=depth, norm="folded")
    # the folded param tree must be exactly the folded-model structure
    want = jax.tree_util.tree_structure(
        mf.init(jax.random.PRNGKey(0), x)["params"])
    assert jax.tree_util.tree_structure(fv["params"]) == want
    out = mf.apply(fv, x)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_segmenter_inference_folds_by_default(rng):
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=32))
    model = Mask2Former(cfg)
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3))))
    variables["batch_stats"] = _randomize_stats(
        rng, variables["batch_stats"])

    frames = (rng.standard_normal((2, 30, 30, 3)) * 40 + 110).clip(
        0, 255).astype(np.uint8)
    folded = SegmenterInference(cfg, variables)          # fold_bn default on
    plain = SegmenterInference(cfg, variables, fold_bn=False)
    assert folded.cfg.backbone.norm == "folded"
    assert plain.cfg.backbone.norm == "frozen_bn"
    cls_f, masks_f, q_f = [np.asarray(t) for t in folded.forward_frames(frames)]
    cls_p, masks_p, q_p = [np.asarray(t) for t in plain.forward_frames(frames)]
    np.testing.assert_allclose(cls_f, cls_p, atol=1e-4)
    np.testing.assert_allclose(masks_f, masks_p, atol=1e-3)
    np.testing.assert_allclose(q_f, q_p, atol=1e-4)


def test_segmenter_rejects_extra_checkpoint_params(rng):
    """flax silently ignores params the model never reads, so loading a
    bigger checkpoint into a smaller config would run a truncated model;
    SegmenterInference must refuse."""
    import dataclasses

    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg3 = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32),
        decoder=TransformerDecoderConfig(num_layers=3, ffn_channels=32))
    v3 = Mask2Former(cfg3).init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 1, 32, 32, 3)))
    cfg2 = dataclasses.replace(
        cfg3, decoder=dataclasses.replace(cfg3.decoder, num_layers=2))
    with pytest.raises(ValueError, match="does not use"):
        SegmenterInference(cfg2, v3)
