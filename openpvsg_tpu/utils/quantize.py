"""Weights-only int8 quantization for serving (VERDICT r4 next-round #8).

The r4 roofline bracket (PERF.md) closed the single-chip inference floor
question with: a >2x win requires lower precision or architecture change.
This module is the bounded experiment for the first option — backbone +
pixel-decoder kernels stored int8 in HBM with per-output-channel symmetric
scales, dequantized to the compute dtype INSIDE the jitted forward (XLA
fuses the dequant into the consumer, so the HBM read of each kernel is 1
byte/elem instead of 2).

Scope note: this halves WEIGHT traffic only. The forward's bandwidth tail
is stride-4/8 ACTIVATION traffic (PERF.md r2-r4), and the R-50 weight
working set (~50 MB bf16 per window) is a small fraction of the ~5.5 GB
physical-traffic bracket — so the predicted effect is small; the point is
to measure it and record the keep/shelve decision with data.

No reference counterpart (the reference serves fp32/fp16 torch).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

Q8_KEY = "__q8__"
SCALE_KEY = "__q8_scale__"


def _is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and Q8_KEY in node


def quantize_tree_int8(tree, scopes: Optional[Sequence[str]] = None,
                       min_elems: int = 4096,
                       leaf_name: str = "kernel"):
    """Replace selected array leaves of a nested param dict with
    ``{Q8_KEY: int8 weights, SCALE_KEY: float32 per-out-channel scales}``.

    A leaf is quantized when its key is `leaf_name` (flax conv HWIO /
    dense (in, out) kernels — output features on the LAST axis), it has
    >= 2 dims and >= min_elems elements, and its path starts inside one of
    `scopes` (None = everywhere). Biases, norm affines, embeddings and
    small kernels stay in their original dtype.

    Returns (new_tree, n_quantized, bytes_saved).
    """
    stats = {"n": 0, "saved": 0}

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        in_scope = scopes is None or any(s in path for s in scopes)
        if (in_scope and path and path[-1] == leaf_name
                and hasattr(node, "ndim") and node.ndim >= 2
                and node.size >= min_elems):
            w = np.asarray(node, np.float32)
            flat = w.reshape(-1, w.shape[-1])
            scale = np.abs(flat).max(axis=0) / 127.0
            scale = np.maximum(scale, 1e-12).astype(np.float32)
            q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
            stats["n"] += 1
            stats["saved"] += w.size * (np.dtype(node.dtype).itemsize - 1)
            return {Q8_KEY: jnp.asarray(q), SCALE_KEY: jnp.asarray(scale)}
        return node

    return walk(tree, ()), stats["n"], stats["saved"]


def dequantize_tree(tree, dtype=jnp.bfloat16, scale_mul=None):
    """Inverse of quantize_tree_int8, jit-traceable: every quantized leaf
    becomes ``q.astype(dtype) * scale`` (XLA fuses this into the consumer;
    the int8 tensor is what crosses HBM).

    scale_mul: optional scalar multiplied into every scale. bench.py passes
    a loop-carried exact 1.0 (``1 + carry * 0``) so the dequant cannot be
    hoisted out of the chained timing loop by XLA's while-loop invariant
    code motion — without it the loop would read a hoisted bf16 copy and
    the weights-only int8 A/B would measure nothing.
    """
    if _is_quantized_leaf(tree):
        s = tree[SCALE_KEY].astype(dtype)
        if scale_mul is not None:
            s = s * scale_mul.astype(dtype)
        return tree[Q8_KEY].astype(dtype) * s
    if isinstance(tree, dict):
        return {k: dequantize_tree(v, dtype, scale_mul) for k, v in tree.items()}
    return tree
