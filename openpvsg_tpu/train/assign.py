"""Hungarian target assignment for Mask2Former training.

Rebuild of mmdet's MaskHungarianAssigner use (reference train_cfg:
configs/mask2former/..._custom.py:119-131; call site
models/mask2former/mask2former_head.py:148-217 _get_target_single):

  cost = 2.0 * classification cost (−softmax prob at gt label)
       + 5.0 * sigmoid-BCE mask cost on `num_points` uniformly sampled points
       + 5.0 * dice cost on the same points

The cost matrix is computed on device over PADDED targets (fixed N_max,
validity-masked); only the LAP solve crosses to the host through
jax.pure_callback (the reference equivalent host sync is scipy's
linear_sum_assignment inside the assigner).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu import native
from openpvsg_tpu.ops.sampling import point_sample

BIG_COST = 1e8


def _host_lap(cost: np.ndarray) -> np.ndarray:
    """cost (Q, N) -> assigned target index per query, -1 if unassigned.
    Padded (invalid) targets carry BIG_COST and are stripped on return."""
    cost = np.asarray(cost, dtype=np.float64)
    q, n = cost.shape
    out = np.full(q, -1, dtype=np.int32)
    ri, ci = native.linear_sum_assignment(cost)
    for i, j in zip(ri, ci):
        if cost[i, j] < BIG_COST / 2:
            out[i] = j
    return out


def classification_cost(cls_pred: jnp.ndarray, gt_labels: jnp.ndarray) -> jnp.ndarray:
    """(Q, K+1) logits x (N,) labels -> (Q, N); mmdet ClassificationCost."""
    probs = jax.nn.softmax(cls_pred, axis=-1)
    return -probs[:, gt_labels]


def mask_bce_cost(mask_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mean binary-cross-entropy over sampled points.

    mask_pts: (Q, P) logits; tgt_pts: (N, P) binary. -> (Q, N).
    mmdet CrossEntropyLossCost(use_sigmoid=True).
    """
    P = mask_pts.shape[1]
    pos = jax.nn.log_sigmoid(mask_pts)      # (Q, P)
    neg = jax.nn.log_sigmoid(-mask_pts)
    # BCE(q, n) = -[tgt_n · pos_q + (1 - tgt_n) · neg_q] averaged over P;
    # f32 accumulation regardless of operand storage dtype (bf16 knob)
    cost = -(jnp.matmul(pos, tgt_pts.T, preferred_element_type=jnp.float32)
             + jnp.matmul(neg, (1.0 - tgt_pts).T,
                          preferred_element_type=jnp.float32))
    return cost / P


def dice_cost(mask_pts: jnp.ndarray, tgt_pts: jnp.ndarray,
              eps: float = 1.0) -> jnp.ndarray:
    """Pairwise dice cost with sigmoid activation (mmdet DiceCost,
    pred_act=True, naive_dice)."""
    pred = jax.nn.sigmoid(mask_pts)
    numer = 2.0 * jnp.matmul(pred, tgt_pts.T,
                             preferred_element_type=jnp.float32)
    denom = (pred.sum(-1, dtype=jnp.float32)[:, None]
             + tgt_pts.sum(-1, dtype=jnp.float32)[None, :])
    return -(numer + eps) / (denom + eps)


def greedy_assign_from_cost(cost: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """Fully on-device greedy assignment: repeatedly take the globally
    cheapest (query, target) pair among the unassigned. Not exactly optimal
    like Hungarian, but jit-native (no host callback) — selectable via
    Mask2FormerConfig.assigner='greedy' when host round-trips are expensive
    (e.g. remote-device tunnels). cost: (Q, N) with BIG_COST at invalid
    targets. Returns (Q,) assigned target index or -1."""
    Q, N = cost.shape

    def body(_, state):
        assigned, c = state
        flat_idx = jnp.argmin(c)
        q, n = flat_idx // N, flat_idx % N
        ok = c[q, n] < BIG_COST / 2
        assigned = jnp.where(
            ok, assigned.at[q].set(n.astype(jnp.int32)), assigned)
        # retire the row and column
        c = jnp.where(ok, c.at[q, :].set(BIG_COST).at[:, n].set(BIG_COST), c)
        return assigned, c

    assigned0 = jnp.full((Q,), -1, jnp.int32)
    assigned, _ = jax.lax.fori_loop(0, n_iters, body, (assigned0, cost))
    return assigned


_INF = jnp.float32(1e30)


def lapjv_assign_from_cost(cost: jnp.ndarray) -> jnp.ndarray:
    """Fully on-device EXACT linear assignment: Jonker-Volgenant shortest
    augmenting path in lax loops — no host callback, so it compiles where
    the pure_callback Hungarian cannot (axon, PERF.md) and replaces the
    greedy assigner's unbounded suboptimality with the true optimum
    (VERDICT r2 weak #3).

    cost: (Q, N) with BIG_COST-filled columns for invalid targets (each
    column all-valid or all-BIG — how hungarian_assign builds it). Requires
    N <= Q (targets never outnumber queries in Mask2Former). Returns (Q,)
    assigned target index per query, -1 if none.

    Design for the device: persons are the (few) valid targets, objects the
    Q queries. Each augmentation is a Dijkstra over reduced costs whose body
    is O(Q) vectorized min/where work; it scans at most one new column per
    iteration, so iterations are bounded by N*(Q+N) and are typically
    ~N^2/2 (early persons hit an unassigned column immediately). Unlike the
    eps-scaled auction (tried first: the Q-N dummy bidders needed to make
    the asymmetric problem auction-sound wage ~10^4-iteration price wars),
    the path count here is structurally bounded. Exact on the true float
    costs — same semantics as the in-repo C++ LAPJV (native/pvsg_native.cpp)
    up to fp associativity in the reduced-cost updates;
    tests/test_greedy_assign.py checks the objective against the host
    Hungarian over random costs.
    """
    Q, N = cost.shape
    if N > Q:
        raise ValueError(f"lapjv assigner needs N <= Q, got ({Q=}, {N=})")
    C = cost.T.astype(jnp.float32)                # (N, Q) persons x objects
    target_valid = C[:, 0] < BIG_COST / 2         # columns all-or-nothing

    def augment(i, carry):
        v, x, y = carry                           # potentials, row->col, col->row

        def do(carry):
            v, x, y = carry
            d0 = C[i] - v
            pred0 = jnp.full((Q,), i, jnp.int32)
            scanned0 = jnp.zeros((Q,), bool)

            def dj_cond(s):
                d, pred, scanned, sink, mu = s
                return sink < 0

            def dj_body(s):
                d, pred, scanned, sink, mu = s
                dm = jnp.where(scanned, _INF, d)
                j = jnp.argmin(dm).astype(jnp.int32)
                mu = dm[j]
                free = y[j] < 0
                i2 = jnp.maximum(y[j], 0)
                # j scans FIRST: it must be excluded from its own
                # relaxation — f32 cancellation in (mu + K) - K can land
                # below mu and self-update pred[j] = i2, creating a cycle
                # the augmentation walk never exits
                scanned = scanned.at[j].set(True)
                # relax unscanned columns through i2's row
                alt = mu + C[i2] - v - (C[i2, j] - v[j])
                upd = ~free & ~scanned & (alt < d)
                d = jnp.where(upd, alt, d)
                pred = jnp.where(upd, i2, pred)
                sink = jnp.where(free, j, jnp.int32(-1))
                return d, pred, scanned, sink, mu

            d, pred, scanned, sink, mu = jax.lax.while_loop(
                dj_cond, dj_body,
                (d0, pred0, scanned0, jnp.int32(-1), jnp.float32(0)))
            # dual update on scanned columns keeps reduced costs >= 0
            v = jnp.where(scanned, v + d - mu, v)

            def aug_cond(s):
                j, x, y = s
                return j >= 0

            def aug_body(s):
                j, x, y = s
                i2 = pred[j]
                j_next = x[i2]
                y = y.at[j].set(i2)
                x = x.at[i2].set(j)
                return j_next, x, y

            _, x, y = jax.lax.while_loop(aug_cond, aug_body, (sink, x, y))
            return v, x, y

        return jax.lax.cond(target_valid[i], do, lambda c: c, (v, x, y))

    v0 = jnp.zeros((Q,), jnp.float32)
    x0 = jnp.full((N,), -1, jnp.int32)
    y0 = jnp.full((Q,), -1, jnp.int32)
    _, _, y = jax.lax.fori_loop(0, N, augment, (v0, x0, y0))
    return y


def pool_masks(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Average-pool the trailing (H, W) of (..., T, H, W) by factor d.
    Used to shrink the MATCHING-cost operands only (the losses always see
    full resolution): the assignment is a discrete argmin over per-pair
    mean costs, which is stable under 2-4x spatial pooling while cutting
    the bandwidth-bound cost-matrix traffic by d^2 (PERF.md r4: the
    assignment/loss traffic, not the backbone, caps train MFU)."""
    if d == 1:
        return x
    *lead, T, H, W = x.shape
    if H % d or W % d:
        raise ValueError(
            f"match_downsample={d} must divide the stride-4 mask grid "
            f"({H}, {W}); pad sizes are /32 so 2, 4 and 8 always divide")
    return x.reshape(*lead, T, H // d, d, W // d, d).mean(axis=(-1, -3))


def _make_single(Q: int, T: int, N: int, num_points: int, cls_weight: float,
                 mask_weight: float, dice_weight: float, method: str):
    """Per-batch-item assignment fn (rng, cls, mask, labels, masks, valid)
    -> (Q,) target index or -1; shared by the per-batch and the
    layer-batched entry points below."""

    def single(rng, cls_p, mask_p, labels, masks, valid):
        if num_points <= 0:
            # dense mode: cost over EVERY pixel (exact; requires pred and
            # target at the same resolution) — one matmul per cost term
            mp_pts = mask_p.reshape(Q, -1)
            mt_pts = masks.reshape(N, -1)
        else:
            pts = jax.random.uniform(rng, (1, num_points, 2))
            # sample pred + target masks on the same uniform points;
            # tall-image layout (T*H, W)
            Hp, Wp = mask_p.shape[-2:]
            mp = mask_p.reshape(Q, T * Hp, Wp)
            Hm, Wm = masks.shape[-2:]
            mt = masks.reshape(N, T * Hm, Wm)
            mp_pts = point_sample(mp[..., None], jnp.broadcast_to(pts, (Q, num_points, 2)))[..., 0]
            mt_pts = point_sample(mt[..., None], jnp.broadcast_to(pts, (N, num_points, 2)))[..., 0]

        cost = (cls_weight * classification_cost(cls_p, labels)
                + mask_weight * mask_bce_cost(mp_pts, mt_pts)
                + dice_weight * dice_cost(mp_pts, mt_pts))
        cost = jnp.where(valid[None, :], cost, BIG_COST)
        if method == "greedy":
            return greedy_assign_from_cost(cost, min(Q, N))
        if method == "lapjv":
            return lapjv_assign_from_cost(cost)
        assigned = jax.pure_callback(
            _host_lap, jax.ShapeDtypeStruct((Q,), jnp.int32), cost,
            vmap_method="sequential")
        return assigned

    return single


@partial(jax.jit, static_argnames=("num_points", "method", "match_downsample"))
def hungarian_assign(
    rng: jax.Array,
    cls_pred: jnp.ndarray,      # (B, Q, K+1)
    mask_pred: jnp.ndarray,     # (B, Q, T, H, W) logits
    gt_labels: jnp.ndarray,     # (B, N) int32, padded
    gt_masks: jnp.ndarray,      # (B, N, T, H, W) binary float
    gt_valid: jnp.ndarray,      # (B, N) bool
    num_points: int = 12544,
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    method: str = "hungarian",  # 'hungarian' (host LAP) | 'lapjv' (exact,
                                # on-device) | 'greedy' (device, approx)
    match_downsample: int = 1,
) -> jnp.ndarray:
    """Returns (B, Q) assigned target index (or -1). Clip masks are matched
    as one tall (T*H, W) image exactly like the video head
    (mask2former_video_head.py:162-194). match_downsample > 1 average-pools
    both mask operands before the cost (dense mode only)."""
    B, Q, T, H, W = mask_pred.shape
    N = gt_labels.shape[1]
    if match_downsample != 1:
        if num_points > 0:
            raise ValueError("match_downsample requires dense matching "
                             "(num_points <= 0 / loss_sampling='dense')")
        mask_pred = pool_masks(mask_pred, match_downsample)
        gt_masks = pool_masks(gt_masks.astype(jnp.float32), match_downsample)
    single = _make_single(Q, T, N, num_points, cls_weight, mask_weight,
                          dice_weight, method)
    rngs = jax.random.split(rng, B)
    return jax.vmap(single)(rngs, cls_pred, mask_pred, gt_labels,
                            gt_masks.astype(jnp.float32), gt_valid)


@partial(jax.jit, static_argnames=("num_points", "method", "match_downsample"))
def hungarian_assign_layers(
    rngs: jnp.ndarray,          # (L, B, 2) uint32 — per (layer, item) keys
    cls_preds: jnp.ndarray,     # (L, B, Q, K+1)
    mask_preds: jnp.ndarray,    # (L, B, Q, T, H, W) logits
    gt_labels: jnp.ndarray,     # (B, N)
    gt_masks: jnp.ndarray,      # (B, N, T, H, W)
    gt_valid: jnp.ndarray,      # (B, N)
    num_points: int = 12544,
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    method: str = "hungarian",
    match_downsample: int = 1,
) -> jnp.ndarray:
    """All decoder layers' assignments in ONE nested vmap -> (L, B, Q).

    The device assigners (lapjv/greedy) are sequential lax loops; assigning
    layer-by-layer serializes L such regions per step, while one lockstep
    vmap over (L, B) pays only the longest augmentation sequence once
    (exact — same costs, same per-(layer, item) rng as the per-layer path).
    GT tensors broadcast over the layer axis via in_axes=None, so the
    (B, N, T, H, W) masks are never materialized L times."""
    L, B, Q, T, H, W = mask_preds.shape
    N = gt_labels.shape[1]
    if match_downsample != 1:
        if num_points > 0:
            raise ValueError("match_downsample requires dense matching "
                             "(num_points <= 0 / loss_sampling='dense')")
        mask_preds = pool_masks(mask_preds, match_downsample)
        gt_masks = pool_masks(gt_masks.astype(jnp.float32), match_downsample)
    single = _make_single(Q, T, N, num_points, cls_weight, mask_weight,
                          dice_weight, method)
    inner = jax.vmap(single)                      # over B (all args)
    outer = jax.vmap(inner, in_axes=(0, 0, 0, None, None, None))  # over L
    return outer(rngs, cls_preds, mask_preds, gt_labels,
                 gt_masks.astype(jnp.float32), gt_valid)
