"""Fused stride-4 FPN chain as Pallas TPU kernels (PERF.md floor analysis;
VERDICT r2 #5).

The chain (models/pixel_decoder.py FPN loop, reference
mask2former/msdeformattn_pixel_decoder mmdet semantics):

    l   = GN1(lateral_1x1(f0))            # ConvGN, act=False
    x1  = l + bilinear_up_2x(s8)
    x2  = relu(GN2(conv3x3(x1)))          # ConvGN, act=True, zero pad
    out = mask_1x1(x2)

NOTE the normalization applies to the LATERAL only, before the upsample add
(an earlier draft normalized the sum — 1.7 max-abs wrong vs the module).

Three pallas_call launches, tiled over (batch, H-tiles):
  K1: lateral 1x1 matmul -> writes l_raw and accumulates its per-channel
      GN1 sums/sumsq.
  K2: GN1 affine (folded per-channel scale/bias) on l_raw (+ one halo ROW
      above/below via 1-row BlockSpecs), + 2x bilinear upsample computed
      in-kernel for the tile AND halo rows (vertical via banded interp
      matmuls over the full resident s8 plane, horizontal via shifted-slice
      blend + interleave), halo rows zeroed at image borders to match the
      conv's zero padding, then the 3x3 conv as 9 shifted (TH*W, C) x (C, C)
      MXU matmuls -> writes x2 + GN2 sums.
  K3: GN2 affine + relu + mask 1x1 matmul -> mask_feature.

Group statistics finalize BETWEEN launches in plain jnp (tiny (B, C)
tensors) folded into per-channel scale/bias, so the kernels never see a
cross-tile reduction barrier; the FLOP-bound 3x3 conv runs exactly once.

Weights layout matches flax: conv kernels (kh, kw, Cin, Cout), GroupNorm
eps 1e-6, groups over adjacent channels.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _vertical_interp_mats_ext(H: int, TH: int) -> np.ndarray:
    """Banded matrices U[i] (TH + 2, H//2) producing stride-4 rows
    [i*TH - 1, i*TH + TH] (clamped) of the 2x align_corners=False upsample
    from stride-8 rows: even r=2k: 0.25*in[k-1] + 0.75*in[k]; odd:
    0.75*in[k] + 0.25*in[k+1]; edges clamped. The two extra rows feed the
    3x3 conv halo (image-border halo rows are zeroed in-kernel, so their
    clamped values are inert)."""
    H8 = H // 2
    n_tiles = H // TH
    U = np.zeros((n_tiles, TH + 2, H8), np.float32)
    for i in range(n_tiles):
        for t in range(TH + 2):
            r = min(max(i * TH - 1 + t, 0), H - 1)
            k = r // 2
            if r % 2 == 0:
                U[i, t, max(k - 1, 0)] += 0.25
                U[i, t, k] += 0.75
            else:
                U[i, t, k] += 0.75
                U[i, t, min(k + 1, H8 - 1)] += 0.25
    return U


def _hblend(x):
    """Horizontal 2x bilinear on the middle axis: (R, W8, C) -> (R, 2*W8, C)
    (align_corners=False phase weights 0.25/0.75, edges clamped)."""
    left = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    even = 0.25 * left + 0.75 * x
    odd = 0.75 * x + 0.25 * right
    R, W8, C = x.shape
    return jnp.stack([even, odd], axis=2).reshape(R, 2 * W8, C)


def _group_affine(sums, sumsqs, scale, bias, count, num_groups, eps):
    """(B, C) channel sums -> per-channel (B, 1, C) scale'/bias' folding the
    group normalization: y = x * scale' + bias'."""
    B, C = sums.shape
    cg = C // num_groups
    gsum = sums.reshape(B, num_groups, cg).sum(-1)
    gsq = sumsqs.reshape(B, num_groups, cg).sum(-1)
    mean = gsum / count
    var = gsq / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg, axis=1)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    sc = rstd_c * scale[None, :]
    bi = bias[None, :] - mean_c * sc
    return sc[:, None], bi[:, None]


def fused_fpn_stride4(f0: jnp.ndarray, s8: jnp.ndarray, p: Dict[str, jnp.ndarray],
                      num_groups: int = 32, eps: float = 1e-6,
                      tile_h: int = 8, compute_dtype=jnp.float32,
                      interpret: bool = False) -> jnp.ndarray:
    """f0 (B, H, W, Cin) stride-4 backbone feats, s8 (B, H/2, W/2, C)
    encoder stride-8 output -> mask_feature (B, H, W, Cout).

    p: w_lat (1,1,Cin,C)|(Cin,C), b_lat, gn1_scale, gn1_bias,
       w_out (3,3,C,C), b_out, gn2_scale, gn2_bias,
       w_mask (1,1,C,Cout)|(C,Cout), b_mask.
    """
    B, H, W, Cin = f0.shape
    C = s8.shape[-1]
    assert H % tile_h == 0, (H, tile_h)
    nH = H // tile_h
    TH = tile_h
    cd = compute_dtype
    # blocks land in VMEM at the HBM dtype — cast everything the kernels
    # stream to the compute dtype HERE (f32 blocks at serving shapes blow
    # the 16 MB scoped-vmem budget)
    f0 = f0.astype(cd)
    s8 = s8.astype(cd)
    w_lat = p["w_lat"].reshape(Cin, C).astype(cd)
    w_mask = p["w_mask"].reshape(C, -1).astype(cd)
    Cout = w_mask.shape[-1]
    w_out = p["w_out"].astype(cd)          # (3, 3, C, C)

    U = jnp.asarray(_vertical_interp_mats_ext(H, TH), cd)  # (nH, TH+2, H/2)

    # -------- K1: l_raw = lateral 1x1 conv; GN1 channel sums over l_raw
    def k1(f0_t, wl, bl, l_out, s_out, sq_out):
        x = f0_t[0]                                   # (TH, W, Cin) cd
        lat = jnp.dot(x.reshape(TH * W, Cin), wl[...],
                      preferred_element_type=jnp.float32)
        lat = lat.reshape(TH, W, C) + bl[...].astype(jnp.float32)
        l_out[0] = lat.astype(l_out.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _():
            s_out[...] = jnp.zeros_like(s_out)
            sq_out[...] = jnp.zeros_like(sq_out)

        s_out[0, 0] += lat.sum(axis=(0, 1))
        sq_out[0, 0] += (lat * lat).sum(axis=(0, 1))

    l_raw, s1, sq1 = pl.pallas_call(
        k1,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, TH, W, Cin), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((Cin, C), lambda b, i: (0, 0)),
            pl.BlockSpec((C,), lambda b, i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), cd),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=interpret,
    )(f0, w_lat, p["b_lat"])

    sc1, bi1 = _group_affine(s1[:, 0], sq1[:, 0], p["gn1_scale"],
                             p["gn1_bias"], H * W * (C // num_groups),
                             num_groups, eps)

    # -------- K2: GN1 affine + upsample add + 3x3 conv; GN2 channel sums
    def k2(l_t, l_top, l_bot, s8_full, u_t, sc, bi, wo, bo,
           x2_out, s_out, sq_out):
        i = pl.program_id(1)
        scale = sc[0, 0].astype(jnp.float32)
        bias = bi[0, 0].astype(jnp.float32)
        # x1 rows [i*TH-1, i*TH+TH]: normalized lateral + upsample
        lat_ext = jnp.concatenate(
            [l_top[0, 0][None], l_t[0], l_bot[0, 0][None]],
            axis=0).astype(jnp.float32)
        s8_ = s8_full[0]                              # (H8, W8, C) cd
        H8, W8, _ = s8_.shape
        vert = jnp.dot(u_t[0], s8_.reshape(H8, W8 * C),
                       preferred_element_type=jnp.float32)
        up = _hblend(vert.reshape(TH + 2, W8, C))     # (TH+2, W, C)
        xn = lat_ext * scale + bias + up
        # image-border halo rows are ZERO (the conv's zero padding applies
        # to x1 itself); Mosaic has no scatter and no multi-minor-dim
        # broadcast, so rebuild with scalar-scaled border rows
        border_t = jnp.where(i > 0, 1.0, 0.0)
        border_b = jnp.where(i < nH - 1, 1.0, 0.0)
        xn = jnp.concatenate([xn[:1] * border_t, xn[1:TH + 1],
                              xn[TH + 1:] * border_b], axis=0)
        zcol = jnp.zeros((TH + 2, 1, C), jnp.float32)
        xe = jnp.concatenate([zcol, xn, zcol], axis=1).astype(cd)
        acc = jnp.zeros((TH * W, C), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                patch = xe[dy:dy + TH, dx:dx + W].reshape(TH * W, C)
                acc += jnp.dot(patch, wo[dy, dx],
                               preferred_element_type=jnp.float32)
        x2 = acc.reshape(TH, W, C) + bo[...].astype(jnp.float32)
        x2_out[0] = x2.astype(x2_out.dtype)

        @pl.when(i == 0)
        def _():
            s_out[...] = jnp.zeros_like(s_out)
            sq_out[...] = jnp.zeros_like(sq_out)

        s_out[0, 0] += x2.sum(axis=(0, 1))
        sq_out[0, 0] += (x2 * x2).sum(axis=(0, 1))

    x2, s2, sq2 = pl.pallas_call(
        k2,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, W, C),
                         lambda b, i: (b, jnp.maximum(i * TH - 1, 0), 0, 0)),
            pl.BlockSpec((1, 1, W, C),
                         lambda b, i: (b, jnp.minimum(i * TH + TH, H - 1),
                                       0, 0)),
            pl.BlockSpec((1, H // 2, W // 2, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, TH + 2, H // 2), lambda b, i: (i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((3, 3, C, C), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((C,), lambda b, i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), cd),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        interpret=interpret,
    )(l_raw, l_raw, l_raw, s8, U, sc1, bi1, w_out, p["b_out"])

    sc2, bi2 = _group_affine(s2[:, 0], sq2[:, 0], p["gn2_scale"],
                             p["gn2_bias"], H * W * (C // num_groups),
                             num_groups, eps)

    # -------- K3: GN2 affine + relu + mask 1x1
    def k3(x2_t, sc, bi, wm, bm, out):
        y = x2_t[0].astype(jnp.float32) * sc[0, 0] + bi[0, 0]
        y = jnp.maximum(y, 0.0).astype(cd)
        m = jnp.dot(y.reshape(TH * W, C), wm[...],
                    preferred_element_type=jnp.float32)
        out[0] = (m.reshape(TH, W, Cout)
                  + bm[...].astype(jnp.float32)).astype(out.dtype)

    out = pl.pallas_call(
        k3,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((C, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((Cout,), lambda b, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, Cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), cd),
        interpret=interpret,
    )(x2, sc2, bi2, w_mask, p["b_mask"])
    return out


def xla_fpn_stride4(f0, s8, p, num_groups: int = 32, eps: float = 1e-6,
                    compute_dtype=jnp.float32):
    """The unfused reference chain (same math as pixel_decoder's flax
    modules — validated to 0 max-abs against the module composition) for
    parity testing the kernel."""
    from openpvsg_tpu.ops.resize import resize_bilinear

    cd = compute_dtype
    Cin = f0.shape[-1]
    C = s8.shape[-1]

    def gn(x, scale, bias):
        B, H, W, _ = x.shape
        g = x.reshape(B, H, W, num_groups, C // num_groups).astype(jnp.float32)
        mean = g.mean(axis=(1, 2, 4), keepdims=True)
        var = ((g - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        return y * scale + bias

    lat = jax.lax.conv_general_dilated(
        f0.astype(cd), p["w_lat"].reshape(1, 1, Cin, C).astype(cd),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["b_lat"]
    l = gn(lat, p["gn1_scale"], p["gn1_bias"])
    up = resize_bilinear(s8.astype(jnp.float32), f0.shape[1:3])
    x1 = l + up
    x2 = jax.lax.conv_general_dilated(
        x1.astype(cd), p["w_out"].astype(cd), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["b_out"]
    y = jnp.maximum(gn(x2, p["gn2_scale"], p["gn2_bias"]), 0.0)
    return jax.lax.conv_general_dilated(
        y.astype(cd), p["w_mask"].reshape(1, 1, C, -1).astype(cd),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + p["b_mask"]
