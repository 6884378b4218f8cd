"""Mask2Former training losses with point-rend sampling.

Rebuild of the reference loss stack (reference:
models/mask2former/mask2former_head.py:219-353 loss_single + mmdet
CrossEntropyLoss/DiceLoss; weights at configs/.../custom.py:97-117):

  loss_cls : softmax CE over 127 classes, weight 2.0, background class
             weight 0.1, avg_factor = Σ class_weight[label]
  loss_mask: sigmoid BCE on 12544 uncertainty-sampled points, weight 5.0,
             avg_factor = num_total_masks * num_points
  loss_dice: naive dice on the same points, weight 5.0,
             avg_factor = num_total_masks

All queries stay in fixed shapes; unassigned queries contribute through
weight masks instead of the reference's dynamic positive-only gather.
`num_total_masks` is the cross-replica mean of the gt-instance count
(mmdet reduce_mean), produced here by global sums under pjit sharding.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from openpvsg_tpu.ops.sampling import point_sample, uncertainty_sampled_points


def gather_targets(assigned: jnp.ndarray, gt_labels: jnp.ndarray,
                   gt_masks: jnp.ndarray, num_classes: int):
    """assigned: (B, Q) target index or -1. Returns per-query labels
    (background = num_classes), target masks, and positive weights."""
    B, Q = assigned.shape
    pos = assigned >= 0
    safe = jnp.maximum(assigned, 0)
    labels = jnp.where(pos, jnp.take_along_axis(gt_labels, safe, axis=1),
                       num_classes)
    tgt_masks = jnp.take_along_axis(
        gt_masks, safe[:, :, None, None, None], axis=1)
    return labels, tgt_masks, pos


def softmax_cls_loss(cls_pred: jnp.ndarray, labels: jnp.ndarray,
                     num_classes: int, cls_weight: float = 2.0,
                     bg_cls_weight: float = 0.1) -> jnp.ndarray:
    """Softmax CE with down-weighted background class; avg_factor is the
    summed class weight (mmdet CrossEntropyLoss semantics)."""
    class_weight = jnp.concatenate(
        [jnp.ones(num_classes), jnp.asarray([bg_cls_weight])])
    logp = jax.nn.log_softmax(cls_pred, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weight[labels]
    return cls_weight * (ce * w).sum() / jnp.maximum(w.sum(), 1e-6)


def invert_assignment(assigned: jnp.ndarray, n_targets: int) -> jnp.ndarray:
    """(B, Q) target-index-or--1 -> (B, N) assigned QUERY index or -1.

    The assignment is injective per batch item (each target matched by at
    most one query), so at most one query writes each valid column;
    unassigned queries write a discarded overflow column."""
    B, Q = assigned.shape
    tgt = jnp.where(assigned >= 0, assigned, n_targets)
    qi = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (B, Q))
    inv = jnp.full((B, n_targets + 1), -1, jnp.int32)
    inv = inv.at[jnp.arange(B)[:, None], tgt].set(qi)
    return inv[:, :n_targets]


def dense_mask_losses_target_layout(
    assigned: jnp.ndarray,      # (B, Q) target index or -1
    mask_pred: jnp.ndarray,     # (B, Q, T, H, W) logits
    gt_masks: jnp.ndarray,      # (B, N, T, H, W) binary
    gt_valid: jnp.ndarray,      # (B, N)
    num_total_masks: jnp.ndarray,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
) -> Dict[str, jnp.ndarray]:
    """Dense-mode loss_mask/loss_dice in TARGET layout (r5 train-tail probe,
    loss_layout='target').

    The query layout gathers GT masks to all Q query slots and multiplies
    the unmatched rows by zero — for Q=100, N<=40 that is >2x wasted HBM
    traffic on the train step's largest tensors. Here the assignment is
    INVERTED and the <=N matched prediction rows are gathered instead; the
    summand set is identical (unmatched queries contributed exactly 0), so
    the losses are exact up to fp reduction order."""
    B, Q = assigned.shape
    N = gt_valid.shape[1]
    inv = invert_assignment(assigned, N)
    valid = (inv >= 0) & gt_valid
    mp = jnp.take_along_axis(mask_pred.reshape(B, Q, -1),
                             jnp.maximum(inv, 0)[..., None], axis=1)
    mt = gt_masks.reshape(B, N, -1)
    P = mp.shape[-1]
    w = valid.astype(jnp.float32)

    bce = jnp.maximum(mp, 0) - mp * mt + jnp.log1p(jnp.exp(-jnp.abs(mp)))
    loss_mask = mask_weight * (bce * w[..., None]).sum(
        dtype=jnp.float32) / jnp.maximum(num_total_masks * P, 1.0)

    pred = jax.nn.sigmoid(mp)
    numer = 2.0 * (pred * mt).sum(-1, dtype=jnp.float32)
    denom = (pred.sum(-1, dtype=jnp.float32)
             + mt.sum(-1, dtype=jnp.float32))
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)
    loss_dice = dice_weight * (dice * w).sum(
        dtype=jnp.float32) / jnp.maximum(num_total_masks, 1.0)
    return {"loss_mask": loss_mask, "loss_dice": loss_dice}


def mask2former_layer_loss(
    rng: jax.Array,
    cls_pred: jnp.ndarray,     # (B, Q, K+1)
    mask_pred: jnp.ndarray,    # (B, Q, T, H, W)
    labels: jnp.ndarray,       # (B, Q)
    tgt_masks: jnp.ndarray,    # (B, Q, T, H, W) binary
    pos: jnp.ndarray,          # (B, Q) bool
    num_total_masks: jnp.ndarray,  # scalar (already cross-replica averaged)
    num_classes: int,
    num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    bg_cls_weight: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    B, Q, T, H, W = mask_pred.shape
    loss_cls = softmax_cls_loss(cls_pred, labels, num_classes,
                                cls_weight, bg_cls_weight)

    # ---- mask losses. dense mode (num_points <= 0): every pixel, exact,
    # matmul/elementwise only. points mode: the reference's uncertainty-
    # sampled point-rend estimate (tall-image layout for clips); pred and
    # target may live at different resolutions — sampling is in normalized
    # coordinates (the reference samples full-res GT vs stride-4 preds).
    Hm, Wm = tgt_masks.shape[-2:]
    if num_points <= 0:
        # dense mode keeps the operands' storage dtype (bf16 when the
        # mask_logits_dtype knob is on — binary targets are exact in bf16);
        # every reduction below accumulates f32 explicitly
        mp_pts = mask_pred.reshape(B * Q, -1)
        mt_pts = tgt_masks.reshape(B * Q, -1)
        num_points = mp_pts.shape[-1]
    else:
        mp = mask_pred.reshape(B * Q, T * H, W)
        mt = tgt_masks.reshape(B * Q, T * Hm, Wm).astype(jnp.float32)
        pts = uncertainty_sampled_points(
            rng, mp, num_points, oversample_ratio, importance_sample_ratio)
        pts = jax.lax.stop_gradient(pts)
        mp_pts = point_sample(mp[..., None], pts)[..., 0]   # (BQ, P)
        mt_pts = point_sample(mt[..., None], pts)[..., 0]
    posw = pos.reshape(B * Q, 1).astype(jnp.float32)

    bce = jnp.maximum(mp_pts, 0) - mp_pts * mt_pts + jnp.log1p(jnp.exp(-jnp.abs(mp_pts)))
    loss_mask = mask_weight * (bce * posw).sum(dtype=jnp.float32) / jnp.maximum(
        num_total_masks * num_points, 1.0)

    pred = jax.nn.sigmoid(mp_pts)
    numer = 2.0 * (pred * mt_pts).sum(-1, dtype=jnp.float32)
    denom = (pred.sum(-1, dtype=jnp.float32)
             + mt_pts.sum(-1, dtype=jnp.float32))
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)
    loss_dice = dice_weight * (dice * posw[:, 0]).sum() / jnp.maximum(
        num_total_masks, 1.0)

    return {"loss_cls": loss_cls, "loss_mask": loss_mask, "loss_dice": loss_dice}


def focal_cls_loss(cls_pred: jnp.ndarray, labels: jnp.ndarray,
                   num_classes: int, gamma: float = 2.0,
                   alpha: float = 0.25, weight: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal classification loss (head variant:
    Mask2FormerHeadFocal, SURVEY §2.3). Background = all-zero one-hot."""
    onehot = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
    logits = cls_pred[..., :num_classes]
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = a_t * ((1 - p_t) ** gamma) * ce
    num_pos = jnp.maximum((labels != num_classes).sum().astype(jnp.float32), 1.0)
    return weight * loss.sum() / num_pos


def _assign_all_layers(rng, cls_preds, mask_preds, gt_labels, gt_masks,
                       gt_valid, num_points, num_things_classes=None,
                       num_queries_split=None, method="hungarian",
                       match_downsample=1):
    """Hungarian assignment for EVERY decoder layer in one lockstep device
    call -> (L, B, Q); optionally split thing/stuff query groups
    (reference: loss_split_thing_stuff, mask2former_video_head.py:547-610 —
    the last num_stuff queries may only take stuff targets, the rest things).

    rngs reproduce the per-layer path exactly: layer l, item b uses
    split(split(fold_in(rng, l))[0], B)[b], the key the sequential loop
    handed to hungarian_assign (unused in dense matching)."""
    from openpvsg_tpu.train.assign import hungarian_assign_layers

    L, B = cls_preds.shape[:2]
    rngs = jnp.stack([
        jax.random.split(jax.random.split(jax.random.fold_in(rng, l))[0], B)
        for l in range(L)])                                   # (L, B, 2)
    kw = dict(num_points=num_points, method=method,
              match_downsample=match_downsample)
    if num_things_classes is None:
        return hungarian_assign_layers(rngs, cls_preds, mask_preds,
                                       gt_labels, gt_masks, gt_valid, **kw)
    Q = cls_preds.shape[2]
    n_stuff_q = num_queries_split
    is_thing_tgt = gt_labels < num_things_classes
    a_thing = hungarian_assign_layers(
        rngs, cls_preds[:, :, :Q - n_stuff_q], mask_preds[:, :, :Q - n_stuff_q],
        gt_labels, gt_masks, gt_valid & is_thing_tgt, **kw)
    a_stuff = hungarian_assign_layers(
        rngs, cls_preds[:, :, Q - n_stuff_q:], mask_preds[:, :, Q - n_stuff_q:],
        gt_labels, gt_masks, gt_valid & ~is_thing_tgt, **kw)
    return jnp.concatenate([a_thing, a_stuff], axis=2)


def mask2former_loss(
    rng: jax.Array,
    cls_preds: jnp.ndarray,    # (L, B, Q, K+1) all decoder layers
    mask_preds: jnp.ndarray,   # (L, B, Q, T, H, W)
    gt_labels: jnp.ndarray,    # (B, N)
    gt_masks: jnp.ndarray,     # (B, N, T, Hm, Wm) binary at pred resolution
    gt_valid: jnp.ndarray,     # (B, N)
    num_classes: int,
    num_points: int = 12544,
    split_thing_stuff: bool = False,
    num_things_classes: int | None = None,
    num_stuff_classes: int | None = None,
    focal: bool = False,
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
    assigner: str = "hungarian",
    match_downsample: int = 1,
    loss_layout: str = "query",  # 'target' gathers matched pred rows
                                 # instead of materializing (B, Q, ...) GT
                                 # copies — dense mode only, exact
    sem_seg_logits: jnp.ndarray | None = None,   # (B, T, H, W, K+1)
    gt_semantic: jnp.ndarray | None = None,      # (B, T, H, W) int32
    sem_seg_weight: float = 1.0,
    **kw,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Deep-supervised loss over every decoder layer (the reference's
    aux-loss structure, mask2former_head.py:529-616). Assignment is
    recomputed per layer, like the reference. NOTE: the reference's
    thing-branch aux-loss copy-paste bug (mask2former_head.py:607-613) is
    intentionally NOT reproduced — each layer uses its own losses."""

    L = cls_preds.shape[0]
    # global (cross-replica, since batch is sharded) gt count
    num_total_masks = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)

    # assignment is non-differentiable (discrete match via LAP); gradients
    # must not flow into the cost computation. All L layers are assigned in
    # one lockstep vmap — the sequential JV augmentation loops then pay one
    # region per step instead of L (exact; see hungarian_assign_layers)
    assigned_all = _assign_all_layers(
        rng,
        jax.lax.stop_gradient(cls_preds),
        jax.lax.stop_gradient(mask_preds),
        gt_labels, gt_masks, gt_valid, num_points,
        num_things_classes if split_thing_stuff else None,
        num_stuff_classes if split_thing_stuff else None,
        method=assigner, match_downsample=match_downsample)

    if loss_layout == "target" and num_points > 0:
        raise ValueError("loss_layout='target' requires dense mode "
                         "(loss_sampling='dense'): point sampling needs the "
                         "per-query layout")

    total = 0.0
    logs: Dict[str, jnp.ndarray] = {}
    for layer in range(L):
        _, r_pts = jax.random.split(jax.random.fold_in(rng, layer))
        assigned = assigned_all[layer]
        if loss_layout == "target":
            # labels per query (tiny gather); mask losses in target layout
            pos = assigned >= 0
            labels = jnp.where(
                pos, jnp.take_along_axis(gt_labels,
                                         jnp.maximum(assigned, 0), axis=1),
                num_classes)
            losses = dense_mask_losses_target_layout(
                assigned, mask_preds[layer], gt_masks, gt_valid,
                num_total_masks,
                mask_weight=kw.get("mask_weight", 5.0),
                dice_weight=kw.get("dice_weight", 5.0))
            losses["loss_cls"] = softmax_cls_loss(
                cls_preds[layer], labels, num_classes,
                kw.get("cls_weight", 2.0), kw.get("bg_cls_weight", 0.1))
        else:
            labels, tgt_masks, pos = gather_targets(
                assigned, gt_labels, gt_masks, num_classes)
            losses = mask2former_layer_loss(
                r_pts, cls_preds[layer], mask_preds[layer], labels,
                tgt_masks, pos, num_total_masks, num_classes,
                num_points=num_points, **kw)
        if focal:
            losses["loss_cls"] = focal_cls_loss(
                cls_preds[layer], labels, num_classes,
                gamma=focal_gamma, alpha=focal_alpha,
                weight=kw.get("cls_weight", 2.0))
        layer_total = sum(losses.values())
        total = total + layer_total
        tag = "" if layer == L - 1 else f".d{layer}"
        for k, v in losses.items():
            logs[k + tag] = v

    if sem_seg_logits is not None and gt_semantic is not None:
        logp = jax.nn.log_softmax(sem_seg_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, gt_semantic[..., None], axis=-1)[..., 0]
        loss_sem = sem_seg_weight * ce.mean()
        total = total + loss_sem
        logs["loss_sem_seg"] = loss_sem
    return total, logs
