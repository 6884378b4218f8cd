"""Frame-pipeline semantics: the fused device preprocess must match the
reference transform chain step-for-step (resize bilinear antialias=False ==
torch/mmcv interpolate, ImageNet-stat normalization, /32 padding), with
clip-consistent augmentation and crop rejection."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from openpvsg_tpu.config import DataConfig
from openpvsg_tpu.data.pipeline import (TrainAugmentor, pad_to_divisor,
                                        preprocess_clip,
                                        preprocess_test_frame)


def test_resize_matches_torch(rng):
    frames = rng.integers(0, 255, (2, 30, 40, 3)).astype(np.uint8)
    out = np.asarray(preprocess_clip(
        jnp.asarray(frames), 36, 48, False, jnp.int32(0), jnp.int32(0),
        36, 48, 64, 64, mean=(0, 0, 0), std=(1, 1, 1)))
    expect = F.interpolate(
        torch.from_numpy(frames.astype(np.float32)).permute(0, 3, 1, 2),
        size=(36, 48), mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out[:, :36, :48], expect, atol=1e-3)
    # padding region is zero after (mean 0, std 1) normalization
    assert np.all(out[:, 36:] == 0) and np.all(out[:, :, 48:] == 0)


def test_normalization_and_flip(rng):
    frames = rng.integers(0, 255, (1, 16, 16, 3)).astype(np.uint8)
    cfg = DataConfig()
    out = np.asarray(preprocess_clip(
        jnp.asarray(frames), 16, 16, True, jnp.int32(0), jnp.int32(0),
        16, 16, 32, 32, mean=tuple(cfg.mean), std=tuple(cfg.std)))
    expect = (frames[0, :, ::-1].astype(np.float32)
              - np.asarray(cfg.mean)) / np.asarray(cfg.std)
    np.testing.assert_allclose(out[0, :16, :16], expect, atol=1e-4)


def test_test_pipeline_pads_only(rng):
    frame = rng.integers(0, 255, (30, 41, 3)).astype(np.uint8)
    ph, pw = pad_to_divisor(30, 41, 32)
    assert (ph, pw) == (32, 64)
    out = np.asarray(preprocess_test_frame(jnp.asarray(frame), ph, pw))
    assert out.shape == (32, 64, 3)
    cfg = DataConfig()
    expect = (frame.astype(np.float32) - np.asarray(cfg.mean)) / np.asarray(cfg.std)
    np.testing.assert_allclose(out[:30, :41], expect, atol=1e-4)
    assert np.all(out[30:] == 0)


def test_augmentor_clip_consistency_and_rejection():
    cfg = DataConfig(train_scale=(20, 20), crop_size=(10, 10))
    aug = TrainAugmentor(cfg, seed=0)
    params = aug.sample((20, 20))
    masks = np.zeros((2, 20, 20), np.int32)
    masks[:, 2:6, 2:6] = 1  # instance persists in both frames
    out = aug.apply_to_masks(masks, params)
    assert out.shape == (2, 10, 10)
    # instance present everywhere -> a crop containing it passes check_match
    full = np.ones((2, 10, 10), np.int32)
    assert aug.check_match(full)
    # instance missing from frame 1 -> reject
    bad = np.stack([np.ones((10, 10), np.int32), np.zeros((10, 10), np.int32)])
    assert not aug.check_match(bad)


def test_category_gate():
    from openpvsg_tpu.tracker.matching import category_gate

    class T:
        def __init__(self, c):
            self.category = c

    cost = np.zeros((2, 2))
    out = category_gate(cost, [T(1), T(2)], [T(1), T(5)])
    np.testing.assert_array_equal(out, [[0, 4], [1, 3]])
