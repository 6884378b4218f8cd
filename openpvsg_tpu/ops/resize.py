"""Resize ops matching torch.nn.functional.interpolate semantics."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C).

    antialias=False + half-pixel centers == torch interpolate
    align_corners=False (the mode used throughout the reference).
    """
    h, w = size
    out_shape = (*x.shape[:-3], h, w, x.shape[-1])
    if align_corners:
        raise NotImplementedError("reference only uses align_corners=False")
    return jax.image.resize(x, out_shape, method="bilinear", antialias=False)


def resize_nearest(x: jnp.ndarray, size) -> jnp.ndarray:
    h, w = size
    out_shape = (*x.shape[:-3], h, w, x.shape[-1])
    return jax.image.resize(x, out_shape, method="nearest")
