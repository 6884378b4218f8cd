"""Orbax checkpoint round-trip for trainer state trees."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_relation_params_roundtrip(tmp_path):
    from openpvsg_tpu.models.relation.heads import RelationModel
    from openpvsg_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = RelationModel(model_name="vanilla", feature_dim=16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 16)),
                        jnp.zeros((2, 4, 32)))["params"]
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {"params": params})
    restored = load_checkpoint(path, {"params": params})
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainstate_roundtrip(tmp_path):
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig, TrainConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    cfg = Mask2FormerConfig(
        num_things_classes=2, num_stuff_classes=1, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=16),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=16))
    trainer = SegmenterTrainer(cfg, TrainConfig(), steps_per_epoch=10,
                               example_shape=(1, 32, 32))
    path = str(tmp_path / "state")
    save_checkpoint(path, trainer.state)
    restored = load_checkpoint(path, trainer.state)
    assert int(restored.step) == int(trainer.state.step)
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
