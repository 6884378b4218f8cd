"""Deterministic frame pipeline: decode -> resize -> flip -> crop ->
normalize -> pad, with clip-consistent augmentation.

Rebuild of the reference pipeline stack (reference:
datasets/pipelines/{loading,transforms,formatting}.py; configs/_base_/
datasets/pvsg_vps.py:4-22):

  train: resize to (360, 480) keep_ratio=False -> random flip p=0.5 ->
         random crop (360, 480) (shared params across the clip; crops with
         no instance surviving every frame are rejected, transforms.py:
         262-267) -> normalize -> pad to /32
  test:  normalize -> pad to /32 (no resize)

Normalization uses mean (123.675, 116.28, 103.53) / std (58.395, 57.12,
57.375) on RGB-loaded frames with to_rgb=False — i.e. the standard ImageNet
RGB stats applied to RGB pixels (the reference loads with
channel_order='rgb', loading.py:46).

TPU design: PNG decode happens on host (PIL); everything after is one jitted
function over the whole clip (resize+normalize+pad fused by XLA), keeping
H2D traffic to the raw uint8 frames.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from openpvsg_tpu.config import DataConfig


def load_frame(path: str) -> np.ndarray:
    """Host: decode an image to RGB uint8 (H, W, 3)."""
    return np.asarray(Image.open(path).convert("RGB"))


def load_mask(path: str) -> np.ndarray:
    """Host: decode a palette mask to the object-id map (H, W) int32."""
    return np.asarray(Image.open(path)).astype(np.int32)


def pad_to_divisor(h: int, w: int, divisor: int = 32) -> Tuple[int, int]:
    return ((h + divisor - 1) // divisor * divisor,
            (w + divisor - 1) // divisor * divisor)


@partial(jax.jit, static_argnames=("out_h", "out_w", "flip", "crop_h",
                                   "crop_w", "pad_h", "pad_w", "mean", "std"))
def preprocess_clip(
    frames: jnp.ndarray,          # (T, H, W, 3) uint8
    out_h: int, out_w: int,       # resize target (keep_ratio=False)
    flip: bool,
    crop_y: jnp.ndarray, crop_x: jnp.ndarray,   # scalars (dynamic slice)
    crop_h: int, crop_w: int,
    pad_h: int, pad_w: int,
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53),
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375),
) -> jnp.ndarray:
    """One fused device call: resize -> flip -> crop -> normalize -> pad.
    Returns (T, pad_h, pad_w, 3) float32."""
    x = frames.astype(jnp.float32)
    T = x.shape[0]
    x = jax.image.resize(x, (T, out_h, out_w, 3), method="bilinear",
                         antialias=False)
    if flip:
        x = x[:, :, ::-1, :]
    x = jax.lax.dynamic_slice(
        x, (0, crop_y.astype(jnp.int32), crop_x.astype(jnp.int32), 0),
        (T, crop_h, crop_w, 3))
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    x = jnp.pad(x, ((0, 0), (0, pad_h - crop_h), (0, pad_w - crop_w), (0, 0)))
    return x


@partial(jax.jit, static_argnames=("pad_h", "pad_w"))
def preprocess_test_frame(
    frame: jnp.ndarray,           # (H, W, 3) uint8
    pad_h: int, pad_w: int,
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53),
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375),
) -> jnp.ndarray:
    """Test pipeline: normalize + bottom/right pad to /32 (no resize),
    reference: configs/_base_/datasets/pvsg_vps_single_video_test.py:10-17."""
    x = frame.astype(jnp.float32)
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    h, w = frame.shape[:2]
    return jnp.pad(x, ((0, pad_h - h), (0, pad_w - w), (0, 0)))


def resize_mask_nearest(mask: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host nearest resize of an id map (annotation path; mmcv uses nearest
    for seg maps)."""
    img = Image.fromarray(mask.astype(np.int32), mode="I")
    img = img.resize((out_hw[1], out_hw[0]), Image.NEAREST)
    return np.asarray(img).astype(np.int32)


class TrainAugmentor:
    """Clip-consistent augmentation parameter sampling + GT transformation
    (the host half of the Seq* transforms)."""

    def __init__(self, cfg: DataConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

    def sample(self, img_hw: Tuple[int, int]):
        ch, cw = self.cfg.crop_size
        oh, ow = self.cfg.train_scale
        flip = bool(self.rng.random() < self.cfg.flip_prob)
        crop_y = int(self.rng.integers(0, max(oh - ch, 0) + 1))
        crop_x = int(self.rng.integers(0, max(ow - cw, 0) + 1))
        return {"flip": flip, "crop_y": crop_y, "crop_x": crop_x}

    def apply_to_masks(self, masks: np.ndarray, params: Dict) -> np.ndarray:
        """masks: (T, H, W) id maps -> resized/flipped/cropped id maps."""
        oh, ow = self.cfg.train_scale
        ch, cw = self.cfg.crop_size
        out = np.stack([resize_mask_nearest(m, (oh, ow)) for m in masks])
        if params["flip"]:
            out = out[:, :, ::-1]
        y, x = params["crop_y"], params["crop_x"]
        return out[:, y:y + ch, x:x + cw]

    def check_match(self, masks: np.ndarray) -> bool:
        """True if at least one instance id persists in EVERY cropped frame
        (reference: transforms.py:262-267 rejects clips otherwise)."""
        ids = None
        for m in masks:
            present = set(np.unique(m)) - {0}
            ids = present if ids is None else (ids & present)
        return bool(ids)
