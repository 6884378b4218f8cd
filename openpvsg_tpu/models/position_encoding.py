"""Sine positional encodings (2-D and 3-D), NHWC.

Numerically matches mmdet's SinePositionalEncoding (num_feats=128,
normalize=True) and the reference's SinePositionalEncoding3D (reference:
models/mask2former_vps/position_encoding.py:55-99) with all-valid masks:
coordinate embeds are cumsums starting at 1, normalized to (0, 2π].

TPU note: these are pure functions of static shapes — computed once per jit
trace and constant-folded by XLA.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def _interleave_sincos(embed: jnp.ndarray, num_feats: int, temperature: float) -> jnp.ndarray:
    """embed (...,) -> (..., num_feats) as [sin(e/t0), cos(e/t1), ...] with
    t_{2i} = t_{2i+1} = temperature^(2i/num_feats)."""
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)
    pos = embed[..., None] / dim_t
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*embed.shape, num_feats)


def sine_pos_encoding(h: int, w: int, num_feats: int = 128,
                      temperature: float = 10000.0, normalize: bool = True,
                      scale: float = 2 * math.pi, eps: float = 1e-6,
                      offset: float = 0.0) -> jnp.ndarray:
    """2-D sine positional encoding -> (H, W, 2*num_feats), channels =
    concat(pos_y, pos_x)."""
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    if normalize:
        y = (y + offset) / (h + eps) * scale
        x = (x + offset) / (w + eps) * scale
    pos_y = _interleave_sincos(y, num_feats, temperature)
    pos_x = _interleave_sincos(x, num_feats, temperature)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def sine_pos_encoding_3d(t: int, h: int, w: int, num_feats: int = 128,
                         temperature: float = 10000.0, normalize: bool = True,
                         scale: float = 2 * math.pi, eps: float = 1e-6,
                         offset: float = 0.0) -> jnp.ndarray:
    """3-D sine positional encoding -> (T, H, W, 2*num_feats):
    concat(pos_y, pos_x) + pos_z where pos_z spans all 2*num_feats channels
    (reference: position_encoding.py:74-103)."""
    pos2d = sine_pos_encoding(h, w, num_feats, temperature, normalize, scale, eps, offset)
    z = jnp.arange(1, t + 1, dtype=jnp.float32)
    if normalize:
        z = (z + offset) / (t + eps) * scale
    pos_z = _interleave_sincos(z, 2 * num_feats, temperature)  # (T, 2F)
    return pos2d[None, :, :, :] + pos_z[:, None, None, :]


def sine_embed_1d(length: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """Classic unnormalized transformer PE over positions 0..length-1 ->
    (length, dim); used by the relation TemporalTransformer (reference:
    models/relation_head/transformer.py:7-30)."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(temperature) / dim))
    pe = jnp.zeros((length, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div[: (dim + 1) // 2]))
    return pe
