"""Full MSDeformAttention MODULE parity vs a torch replica of mmcv's
MultiScaleDeformableAttention forward (projections -> offsets/weights ->
softmax -> normalizer -> sampling -> output proj), sharing weights through
the converter's conventions. This is the path converted reference
checkpoints execute (encoder='msda')."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openpvsg_tpu.models.pixel_decoder import MSDeformAttention


def torch_msda_forward(weights, query, value, reference_points,
                       spatial_shapes, n_heads, n_levels, n_points):
    """mmcv MultiScaleDeformableAttention.forward semantics (pytorch path)."""
    B, S, C = query.shape
    hd = C // n_heads
    v = value @ weights["value_proj_w"].T + weights["value_proj_b"]
    v = v.reshape(B, S, n_heads, hd)

    off = query @ weights["sampling_offsets_w"].T + weights["sampling_offsets_b"]
    off = off.reshape(B, S, n_heads, n_levels, n_points, 2)
    attn = query @ weights["attention_weights_w"].T + weights["attention_weights_b"]
    attn = attn.reshape(B, S, n_heads, n_levels * n_points)
    attn = F.softmax(attn, dim=-1).reshape(B, S, n_heads, n_levels, n_points)

    normalizer = torch.tensor([[w, h] for (h, w) in spatial_shapes],
                              dtype=torch.float32)
    locs = (reference_points[:, :, None, None, None, :]
            + off / normalizer[None, None, None, :, None, :])

    # multi_scale_deform_attn_pytorch
    value_list = v.split([h * w for h, w in spatial_shapes], dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = value_list[lvl].flatten(2).transpose(1, 2).reshape(
            B * n_heads, hd, h, w)
        g_l = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v_l, g_l, mode="bilinear",
                                     padding_mode="zeros",
                                     align_corners=False))
    attn_t = attn.transpose(1, 2).reshape(B * n_heads, 1, S,
                                          n_levels * n_points)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attn_t).sum(-1)
    out = out.view(B, n_heads * hd, S).transpose(1, 2)
    return out @ weights["output_proj_w"].T + weights["output_proj_b"]


def test_msda_module_matches_torch(rng):
    n_heads, n_levels, n_points, C = 4, 3, 2, 32
    shapes = [(6, 8), (3, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    B = 2

    module = MSDeformAttention(embed_dim=C, num_heads=n_heads,
                               num_levels=n_levels, num_points=n_points)
    query = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    value = jnp.asarray(rng.standard_normal((B, S, C)), jnp.float32)
    ref_list = []
    for (h, w) in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        ref_list.append(np.stack([gx, gy], -1).reshape(h * w, 2))
    refs = np.broadcast_to(np.concatenate(ref_list, 0)[None], (B, S, 2)).copy()

    params = module.init(jax.random.PRNGKey(0), query, value,
                         jnp.asarray(refs), shapes)["params"]
    # randomize the zero-initialized projections so the test is non-trivial
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    flat2 = {}
    for k, vv in flat.items():
        arr = np.asarray(vv)
        flat2[k] = jnp.asarray(
            rng.standard_normal(arr.shape).astype(np.float32) * 0.1)
    params = flax.traverse_util.unflatten_dict(flat2)

    ours = module.apply({"params": params}, query, value,
                        jnp.asarray(refs), shapes)

    # torch weights: flax Dense kernel (in, out) -> torch (out, in)
    w = {
        "value_proj_w": torch.from_numpy(np.asarray(params["value_proj"]["kernel"]).T.copy()),
        "value_proj_b": torch.from_numpy(np.asarray(params["value_proj"]["bias"])),
        "sampling_offsets_w": torch.from_numpy(np.asarray(params["sampling_offsets"]["kernel"]).T.copy()),
        "sampling_offsets_b": torch.from_numpy(np.asarray(params["sampling_offsets"]["bias"])),
        "attention_weights_w": torch.from_numpy(np.asarray(params["attention_weights"]["kernel"]).T.copy()),
        "attention_weights_b": torch.from_numpy(np.asarray(params["attention_weights"]["bias"])),
        "output_proj_w": torch.from_numpy(np.asarray(params["output_proj"]["kernel"]).T.copy()),
        "output_proj_b": torch.from_numpy(np.asarray(params["output_proj"]["bias"])),
    }
    expect = torch_msda_forward(
        w, torch.from_numpy(np.asarray(query)),
        torch.from_numpy(np.asarray(value)),
        torch.from_numpy(refs.astype(np.float32)), shapes,
        n_heads, n_levels, n_points).numpy()
    np.testing.assert_allclose(np.asarray(ours), expect, atol=2e-4)
