"""Appearance embedding model + per-object masked feature extraction.

Rebuild of the UniTrack appearance path (reference:
models/unitrack/model/model.py:89-147 — ImageNet ResNet-50 cut after layer3
with down-factor 8, and models/unitrack/mask.py:21-45 extract_emb).

TPU-first differences from the reference, documented:
- The whole frame's feature map is computed once per frame on device; the
  per-object masked pixel-feature sets are gathered with a fixed budget of
  `max_pixels` per object (deterministic strided subsampling) instead of the
  reference's dynamic-shape bilinear rescale to ≤300 px — fixed shapes keep
  XLA from recompiling per object.
- ImageNet normalization happens on device, fused into the same jit.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu.models.resnet import ResNet

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def make_appearance_model(norm: str = "frozen_bn", depth: int = 50,
                          model_type: str | None = None,
                          remove_layers=("layer4",)):
    """Appearance encoder from the zoo (tracker/zoo.py). The default —
    `imagenet50` with layer4 removed — is the `imagenet50 s3` UniTrack entry
    the PVSG config uses (ResNet cut at layer3, stride 8). `depth` remains
    for the debug-scale depth-26 path used in tests."""
    if model_type is None and depth not in (18, 34, 50, 101):
        # debug/test scale: not a zoo entry
        return ResNet(depth=depth, num_stages=3, out_indices=(2,),
                      stage_strides=(1, 2, 1), norm=norm)
    from openpvsg_tpu.tracker.zoo import make_encoder

    if model_type is None:
        model_type = {18: "imagenet18", 34: "imagenet34", 50: "imagenet50",
                      101: "imagenet101"}[depth]
    model, _ = make_encoder(model_type, remove_layers, norm=norm)
    return model


def resolve_appearance_spec(tracker_cfg):
    """The ONE rule mapping tracker_cfg -> (depth, model_type,
    remove_layers) for the appearance encoder. Every consumer (the stage-2
    tool initializing weights, the tracker building the jitted extractor)
    must use this, or their param trees disagree and extraction crashes.

    Non-default model_type selects the zoo entry (which fixes its own
    depth); otherwise appearance_depth drives (standard depths map to the
    imagenet zoo entries, other depths are the debug-scale path)."""
    model_type = getattr(tracker_cfg, "model_type", "imagenet50")
    remove_layers = tuple(getattr(tracker_cfg, "remove_layers", ("layer4",)))
    depth = getattr(tracker_cfg, "appearance_depth", 50)
    if model_type != "imagenet50":
        return depth, model_type, remove_layers
    return depth, None, remove_layers


@partial(jax.jit, static_argnames=("max_pixels", "max_mask_area", "down",
                                   "depth", "model_type", "remove_layers"))
def extract_object_embeddings(
    variables: Any,
    frame: jnp.ndarray,
    masks: jnp.ndarray,
    max_pixels: int = 256,
    max_mask_area: int = 300,
    down: int = 8,
    depth: int = 50,
    model_type: str | None = None,
    remove_layers: Tuple[str, ...] = ("layer4",),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """frame: (H, W, 3) uint8/float RGB in [0, 255]; masks: (N, H, W) binary.

    Returns (feats (N, max_pixels, D) channel-L2-normalized zero-padded pixel
    features, valid (N, max_pixels) bool). One fused device call per frame.
    """
    model = make_appearance_model(depth=depth, model_type=model_type,
                                  remove_layers=remove_layers)
    x = frame.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    feat = model.apply(variables, x[None])[0][0]  # (h, w, D)
    h, w, d = feat.shape

    # nearest-resize masks to the feature grid
    N = masks.shape[0]
    m = jax.image.resize(masks.astype(jnp.float32), (N, h, w), method="nearest")
    m = m >= 0.5

    def per_object(mask):
        flat_mask = mask.reshape(-1)
        area = flat_mask.sum()
        # budget ~= max_mask_area active pixels: deterministic strided
        # subsample when the object is larger (replaces the reference's
        # sqrt(max_area/area) rescale)
        order = jnp.argsort(~flat_mask)  # active pixels first, stable
        budget = jnp.minimum(area, max_mask_area)
        take = jnp.minimum(budget, max_pixels)
        idx = jnp.arange(max_pixels)
        # spread picks evenly across the active range when area > budget
        stride = jnp.maximum(area.astype(jnp.float32) / jnp.maximum(take, 1), 1.0)
        pick = jnp.minimum((idx.astype(jnp.float32) * stride).astype(jnp.int32),
                           jnp.maximum(area - 1, 0))
        sel = order[pick]
        valid = idx < take
        f = feat.reshape(-1, d)[sel]
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        return f * valid[:, None], valid

    return jax.vmap(per_object)(m)


def mask_to_box(mask: np.ndarray, extend: int = 0) -> np.ndarray:
    """Binary mask -> tlbr box (reference: unitrack/utils/mask.py mask2box)."""
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4)
    h, w = mask.shape
    return np.array([max(xs.min() - extend, 0), max(ys.min() - extend, 0),
                     min(xs.max() + extend, w - 1), min(ys.max() + extend, h - 1)],
                    dtype=np.float64)


def remove_duplicated_boxes(boxes: np.ndarray, iou_th: float = 0.7) -> np.ndarray:
    """Indices of boxes to keep, dropping later boxes that overlap an earlier
    one above iou_th (reference: unitrack/utils/box.py remove_duplicated_box)."""
    from openpvsg_tpu.tracker.matching import box_ious

    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=int)
    ious = box_ious(boxes, boxes)
    keep = []
    for i in range(n):
        if all(ious[i, j] <= iou_th for j in keep):
            keep.append(i)
    return np.asarray(keep, dtype=int)
