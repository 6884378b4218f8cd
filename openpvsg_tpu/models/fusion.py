"""Panoptic fusion postprocessing — fully vectorized, jit-compatible.

TPU-native rebuild of MaskFormerFusionHeadCustom (reference:
models/mask2former/mask2former_fusion_head.py:30-171). The reference loops
over ≤100 kept queries in Python per frame; here the whole fusion is one
fixed-shape device computation:

  keep      = (argmax class != void) & (score > object_mask_thr)
  owner     = per-pixel argmax of score-weighted sigmoid masks
  seg valid = mask_area/original_area >= iou_thr  (overlap filtering)
  pan map   = class + instance_id * INSTANCE_OFFSET   (things; instance ids
              numbered 1.. in query order exactly like the reference loop)
            = class                                   (stuff: same-class
              queries merge into one segment)
  void      = num_classes

Returns the per-query bookkeeping (segment id, keep flag) so callers can
attach query features to segments (the return_query surface).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu import INSTANCE_OFFSET
from openpvsg_tpu.config import Mask2FormerConfig


def panoptic_fusion(
    cls_logits: jnp.ndarray,
    mask_logits: jnp.ndarray,
    num_things_classes: int,
    num_stuff_classes: int,
    object_mask_thr: float = 0.8,
    iou_thr: float = 0.8,
) -> Dict[str, jnp.ndarray]:
    """Fuse one frame (or one clip frame) of predictions.

    cls_logits:  (Q, K+1); mask_logits: (Q, H, W).
    Returns dict with:
      pan_seg     (H, W) int32 mmdet-format panoptic map
      query_keep  (Q,) bool — query contributed a segment
      segment_id  (Q,) int32 — the segment id each kept query wrote
      labels      (Q,) int32 — argmax class per query
      scores      (Q,) float32
    """
    num_classes = num_things_classes + num_stuff_classes
    Q, H, W = mask_logits.shape

    probs = jax.nn.softmax(cls_logits, axis=-1)
    scores = probs.max(axis=-1)
    labels = probs.argmax(axis=-1).astype(jnp.int32)
    sig = jax.nn.sigmoid(mask_logits)

    keep = (labels != num_classes) & (scores > object_mask_thr)

    # per-pixel ownership: argmax over queries of score-weighted masks,
    # non-kept queries excluded via -inf
    prob_masks = jnp.where(keep[:, None, None], scores[:, None, None] * sig, -jnp.inf)
    owner = prob_masks.argmax(axis=0)  # (H, W)

    binary = sig >= 0.5
    owned = (owner[None] == jnp.arange(Q)[:, None, None]) & binary  # (Q, H, W)
    mask_area = owned.sum(axis=(1, 2))
    original_area = binary.sum(axis=(1, 2))
    valid = (keep & (mask_area > 0) & (original_area > 0)
             & (mask_area >= iou_thr * original_area))

    is_thing = labels < num_things_classes
    # instance ids: 1.. in query order over valid thing queries (reference
    # increments per written segment, fusion_head.py:166-169)
    inst_id = jnp.cumsum((valid & is_thing).astype(jnp.int32))
    segment_id = jnp.where(
        is_thing, labels + inst_id * INSTANCE_OFFSET, labels).astype(jnp.int32)

    # paint: pixel takes its owner's segment id if the owner is valid and the
    # pixel is in the owner's binary mask; else void
    owner_valid = valid[owner] & jnp.take_along_axis(
        binary, owner[None], axis=0)[0]
    pan_seg = jnp.where(owner_valid, segment_id[owner], num_classes).astype(jnp.int32)

    return {
        "pan_seg": pan_seg,
        "query_keep": valid,
        "segment_id": jnp.where(valid, segment_id, -1),
        "labels": labels,
        "scores": scores,
    }


@partial(jax.jit, static_argnums=(2, 3), static_argnames=("object_mask_thr", "iou_thr"))
def panoptic_fusion_batch(cls_logits, mask_logits, num_things_classes,
                          num_stuff_classes, object_mask_thr=0.8, iou_thr=0.8):
    """vmapped fusion over a batch/clip axis: cls (N, Q, K+1),
    masks (N, Q, H, W)."""
    return jax.vmap(
        lambda c, m: panoptic_fusion(c, m, num_things_classes,
                                     num_stuff_classes, object_mask_thr, iou_thr)
    )(cls_logits, mask_logits)


def query_feats_by_segment(
    fusion: Dict[str, np.ndarray], query_feats: np.ndarray
) -> Dict[int, np.ndarray]:
    """Host-side: {segment_id: 256-d query feature}; stuff segments that
    merged several queries average their features (reference:
    mask2former_fusion_head.py:96-171 + stuff averaging in
    unitrack/data/single_video.py:60-76)."""
    out: Dict[int, list] = {}
    keep = np.asarray(fusion["query_keep"])
    seg_ids = np.asarray(fusion["segment_id"])
    for q in np.flatnonzero(keep):
        out.setdefault(int(seg_ids[q]), []).append(np.asarray(query_feats[q]))
    return {k: np.mean(v, axis=0) for k, v in out.items()}


def instance_postprocess(
    cls_logits: np.ndarray, mask_logits: np.ndarray,
    num_things_classes: int, max_per_image: int = 100,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-k instance extraction (reference:
    mask2former_fusion_head.py:192-242). Returns (labels, scores, masks)."""
    num_classes = cls_logits.shape[-1] - 1
    scores = jax.nn.softmax(jnp.asarray(cls_logits), axis=-1)[:, :-1]
    Q = scores.shape[0]
    flat = scores.reshape(-1)
    top, idx = jax.lax.top_k(flat, max_per_image)
    labels = idx % num_classes
    query_idx = idx // num_classes
    is_thing = labels < num_things_classes
    masks = jax.nn.sigmoid(jnp.asarray(mask_logits))[query_idx] >= 0.5
    return (np.asarray(labels)[np.asarray(is_thing)],
            np.asarray(top)[np.asarray(is_thing)],
            np.asarray(masks)[np.asarray(is_thing)])
