"""Sampling-op numerics vs torch (CPU) reference implementations.

torch here is the *oracle only* — no torch in the framework itself.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from openpvsg_tpu.ops.sampling import grid_sample, ms_deform_attn, point_sample


def test_grid_sample_matches_torch(rng):
    B, H, W, C = 2, 7, 9, 4
    img = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grid = (rng.random((B, 5, 11, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_point_sample_matches_torch(rng):
    B, H, W, C, P = 2, 6, 8, 3, 50
    feats = rng.standard_normal((B, H, W, C)).astype(np.float32)
    pts = rng.random((B, P, 2)).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(feats), jnp.asarray(pts)))
    # mmcv point_sample == grid_sample on 2*p-1 with an unsqueezed dim
    grid = torch.from_numpy(pts * 2 - 1).unsqueeze(2)  # (B, P, 1, 2)
    theirs = F.grid_sample(
        torch.from_numpy(feats).permute(0, 3, 1, 2), grid,
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).squeeze(-1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _torch_msda(value, spatial_shapes, sampling_locations, attention_weights):
    """mmcv multi_scale_deform_attn_pytorch reimplemented as oracle."""
    bs, _, num_heads, embed_dims = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for level, (h, w) in enumerate(spatial_shapes):
        value_l_ = (value_list[level].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, embed_dims, h, w))
        sampling_grid_l_ = (sampling_grids[:, :, :, level].transpose(1, 2)
                            .flatten(0, 1))
        sampling_value_l_ = F.grid_sample(
            value_l_, sampling_grid_l_, mode="bilinear",
            padding_mode="zeros", align_corners=False)
        sampling_value_list.append(sampling_value_l_)
    attention_weights = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_queries, num_levels * num_points)
    output = ((torch.stack(sampling_value_list, dim=-2).flatten(-2)
               * attention_weights).sum(-1).view(bs, num_heads * embed_dims,
                                                 num_queries))
    return output.transpose(1, 2).contiguous()


def test_ms_deform_attn_matches_mmcv_pytorch(rng):
    B, heads, hd, Q, P = 2, 4, 8, 13, 4
    shapes = [(6, 8), (3, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, heads, hd)).astype(np.float32)
    locs = rng.random((B, Q, heads, L, P, 2)).astype(np.float32) * 1.2 - 0.1
    attn = rng.random((B, Q, heads, L, P)).astype(np.float32)
    attn /= attn.reshape(B, Q, heads, -1).sum(-1)[..., None, None]

    ours = np.asarray(ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn)))
    theirs = _torch_msda(
        torch.from_numpy(value), shapes, torch.from_numpy(locs),
        torch.from_numpy(attn)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
