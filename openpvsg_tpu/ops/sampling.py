"""TPU-native sampling primitives.

These replace the CUDA kernels the reference pulls from mmcv (SURVEY.md §2.9):

- ``grid_sample`` / ``point_sample``: bilinear sampling at fractional
  locations (reference: mmcv.ops.point_sample, ATen grid_sampler; used for
  point-rend loss sampling at models/mask2former/mask2former_head.py:184-293).
- ``ms_deform_attn``: multi-scale deformable attention core (reference:
  mmcv.ops.MultiScaleDeformableAttention CUDA kernel, used by the pixel
  decoder encoder).
- ``uncertainty_sampled_points``: importance sampling of uncertain points
  (reference: mmcv.ops.get_uncertain_point_coords_with_randomness).

Design notes (TPU): sampling is expressed as 4-tap gathers over the flattened
spatial axis with `jnp.take`, which XLA lowers to dynamic-gather; all shapes
static; batch/head axes handled by vmap so the compiler sees one fused
gather+FMA graph. Convention matches torch `grid_sample(align_corners=False,
padding_mode='zeros')`: a normalized location p in [0, 1] maps to pixel
coordinate p * size - 0.5.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W, C) at fractional pixel coords x, y (any shape S).

    Out-of-range taps contribute zero (padding_mode='zeros'). Returns (*S, C).
    """
    H, W, C = img.shape
    shape = x.shape
    x = x.reshape(-1)
    y = y.reshape(-1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = img.reshape(H * W, C)

    def tap(yy, xx, w):
        valid = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
        idx = (jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)).astype(jnp.int32)
        v = jnp.take(flat, idx, axis=0)
        return v * (w * valid)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = (
        tap(y0i, x0i, wy0 * wx0)
        + tap(y0i, x0i + 1, wy0 * wx1)
        + tap(y0i + 1, x0i, wy1 * wx0)
        + tap(y0i + 1, x0i + 1, wy1 * wx1)
    )
    return out.reshape(*shape, C)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent (bilinear, zeros padding,
    align_corners=False), NHWC layout.

    img: (B, H, W, C); grid: (B, ..., 2) in [-1, 1] (x, y order).
    Returns (B, ..., C).
    """
    H, W = img.shape[1], img.shape[2]
    gx = (grid[..., 0] + 1.0) * (W / 2.0) - 0.5
    gy = (grid[..., 1] + 1.0) * (H / 2.0) - 0.5
    return jax.vmap(bilinear_sample)(img, gx, gy)


def point_sample(feats: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """mmcv.ops.point_sample equivalent, NHWC layout.

    feats: (B, H, W, C); points: (B, P, 2) normalized [0, 1] (x, y).
    Returns (B, P, C).
    """
    return grid_sample(feats, points * 2.0 - 1.0)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention aggregation.

    value:              (B, S, n_heads, head_dim), S = sum(H_l * W_l)
    spatial_shapes:     static list of (H_l, W_l)
    sampling_locations: (B, Q, n_heads, n_levels, n_points, 2) in [0, 1]
    attention_weights:  (B, Q, n_heads, n_levels, n_points), softmaxed over
                        (levels*points)
    Returns (B, Q, n_heads * head_dim).

    Equivalent to mmcv's CUDA kernel / multi_scale_deform_attn_pytorch.
    """
    B, S, n_heads, head_dim = value.shape
    n_levels = len(spatial_shapes)
    Q = sampling_locations.shape[1]

    # static level partition
    starts = []
    s = 0
    for (h, w) in spatial_shapes:
        starts.append(s)
        s += h * w
    assert s == S, f"spatial shapes {spatial_shapes} disagree with S={S}"

    out = jnp.zeros((B, Q, n_heads, head_dim), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, starts[lvl]:starts[lvl] + h * w]  # (B, hw, heads, hd)
        v = v.transpose(0, 2, 1, 3).reshape(B * n_heads, h, w, head_dim)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, heads, points, 2)
        # align_corners=False pixel mapping
        gx = loc[..., 0] * w - 0.5
        gy = loc[..., 1] * h - 0.5
        gx = gx.transpose(0, 2, 1, 3).reshape(B * n_heads, -1)  # (BH, Q*P)
        gy = gy.transpose(0, 2, 1, 3).reshape(B * n_heads, -1)
        sampled = jax.vmap(bilinear_sample)(v, gx, gy)  # (BH, Q*P, hd)
        sampled = sampled.reshape(B, n_heads, Q, -1, head_dim)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B,heads,Q,P)
        out = out + jnp.einsum("bhqpd,bhqp->bqhd", sampled, wgt)
    return out.reshape(B, Q, n_heads * head_dim)


def calculate_uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty = -|logit| (distance from the 0.5 decision boundary);
    matches mmdet's point-rend uncertainty for single-channel mask logits."""
    return -jnp.abs(logits)


def uncertainty_sampled_points(
    rng: jax.Array,
    mask_logits: jnp.ndarray,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Point-rend sampling of training points, biased to uncertain regions
    (reference: mmcv get_uncertain_point_coords_with_randomness, used at
    mask2former_head.py:284-293).

    mask_logits: (N, H, W) per-query mask logits. Returns (N, P, 2) in [0,1].
    """
    n = mask_logits.shape[0]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(rng)
    # random candidates
    cand = jax.random.uniform(k1, (n, n_sampled, 2))
    logits = point_sample(mask_logits[..., None], cand)[..., 0]  # (N, n_sampled)
    unc = calculate_uncertainty(logits)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    _, top_idx = jax.lax.top_k(unc, n_unc)
    unc_points = jnp.take_along_axis(cand, top_idx[..., None], axis=1)
    rand_points = jax.random.uniform(k2, (n, n_rand, 2))
    return jnp.concatenate([unc_points, rand_points], axis=1)
