"""Association cost matrices + linear assignment for the mask tracker.

Rebuild of the reference matching library (reference:
models/unitrack/core/association/matching.py). The expensive parts —
UniTrack's bidirectional soft-reconstruction similarity over per-object
pixel-feature sets and the box-IoU matrix — run as jitted JAX kernels
(device); the LAP solve is the in-repo C++ LAPJV (host), replacing lap.lapjv
and cython_bbox.

Feature sets are fixed-size zero-padded (N, D, P) with validity masks — the
TPU discipline for the reference's ragged per-object pixel lists. Padding is
excluded from the softmaxes via -inf masking (the reference zero-pads and
lets zero vectors participate; documented divergence, same intent).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu import native


def linear_assignment(cost: np.ndarray, thresh: float):
    """LAPJV with cost limit; returns (matches (M, 2), unmatched_rows,
    unmatched_cols) — reference: matching.py:29-40."""
    cost = np.asarray(cost, dtype=np.float64)
    if cost.size == 0:
        return (np.empty((0, 2), dtype=int),
                tuple(range(cost.shape[0])), tuple(range(cost.shape[1])))
    # guard against inf entries breaking the solver: clamp to a huge finite
    # value above any cost_limit rejection threshold
    big = 1e18
    cost = np.where(np.isfinite(cost), cost, big)
    _, x, _ = native.lapjv(cost, cost_limit=thresh)
    matches = [[i, int(x[i])] for i in range(len(x)) if x[i] >= 0]
    matched_cols = {j for _, j in matches}
    u_rows = tuple(i for i in range(cost.shape[0]) if x[i] < 0)
    u_cols = tuple(j for j in range(cost.shape[1]) if j not in matched_cols)
    return np.asarray(matches, dtype=int).reshape(-1, 2), u_rows, u_cols


def box_ious(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of tlbr boxes (replaces cython_bbox.bbox_overlaps;
    reference: matching.py:43-60)."""
    a = np.asarray(a, dtype=np.float64).reshape(-1, 4)
    b = np.asarray(b, dtype=np.float64).reshape(-1, 4)
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]))
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.clip(ix2 - ix1 + 1, 0, None)
    ih = np.clip(iy2 - iy1 + 1, 0, None)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def iou_distance(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    return 1.0 - box_ious(boxes_a, boxes_b)


@partial(jax.jit, static_argnames=("tmp",))
def _reconsdot_kernel(ftrk: jnp.ndarray, trk_valid: jnp.ndarray,
                      fdet: jnp.ndarray, det_valid: jnp.ndarray,
                      tmp: float = 100.0) -> jnp.ndarray:
    """Bidirectional soft-reconstruction cosine cost.

    ftrk: (T, P, D) L2-normalized per-pixel features (zero rows = padding),
    trk_valid: (T, P) bool; likewise for detections. Returns (T, Ndet) cost.
    Reference: matching.py:194-238 `reconsdot_distance`.
    """
    T, P, D = ftrk.shape
    N, Pd, _ = fdet.shape
    ft = ftrk.reshape(T * P, D)
    fd = fdet.reshape(N * Pd, D)
    aff = ft @ fd.T  # (T*P, N*Pd)

    neg = jnp.finfo(aff.dtype).min
    dmask = det_valid.reshape(1, N * Pd)
    tmask = trk_valid.reshape(T * P, 1)

    # track pixels reconstructed from detection pixel sets. NOTE: the
    # softmaxes run over the GLOBAL pixel axis (all detections jointly /
    # all tracks jointly), matching the reference exactly (matching.py:215-216
    # softmax over dim=1 of the full (T*P, N*Pd) affinity).
    aff_td = jax.nn.softmax(jnp.where(dmask, tmp * aff, neg), axis=1)
    aff_td = aff_td.reshape(T * P, N, Pd)
    recons_ftrk = jnp.einsum("xnp,npd->xnd", aff_td, fdet)  # (T*P, N, D)
    # detection pixels reconstructed from each track's pixel set
    aff_dt = jax.nn.softmax(jnp.where(tmask, tmp * aff, neg), axis=0)
    aff_dt = aff_dt.T.reshape(N * Pd, T, P)
    recons_fdet = jnp.einsum("xtp,tpd->xtd", aff_dt, ftrk)  # (N*Pd, T, D)

    def flat_norm(x, valid, n_item, n_pix):
        # (n_item*n_pix, other, D) -> (n_item, other, n_pix*D), L2 over last
        x = x.reshape(n_item, n_pix, -1, D).transpose(0, 2, 1, 3)
        x = x * valid[:, None, :, None]
        x = x.reshape(n_item, x.shape[1], n_pix * D)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    rt = flat_norm(recons_ftrk, trk_valid, T, P)        # (T, N, P*D)
    rd = flat_norm(recons_fdet, det_valid, N, Pd)       # (N, T, Pd*D)

    ft_flat = (ftrk * trk_valid[..., None]).reshape(T, P * D)
    ft_flat = ft_flat / (jnp.linalg.norm(ft_flat, axis=-1, keepdims=True) + 1e-12)
    fd_flat = (fdet * det_valid[..., None]).reshape(N, Pd * D)
    fd_flat = fd_flat / (jnp.linalg.norm(fd_flat, axis=-1, keepdims=True) + 1e-12)

    dot_td = jnp.einsum("tnd,td->tn", rt, ft_flat)
    dot_dt = jnp.einsum("ntd,nd->nt", rd, fd_flat)
    return 1.0 - 0.5 * (dot_td + dot_dt.T)


def pad_feature_sets(feats: Sequence[np.ndarray], max_pixels: int) -> Tuple[np.ndarray, np.ndarray]:
    """List of (D, n_i) pixel-feature sets -> ((N, P, D) L2-normalized padded
    stack, (N, P) validity). Channel-normalize first (reference F.normalize
    along dim=1), then pad."""
    n = len(feats)
    d = feats[0].shape[0] if n else 0
    out = np.zeros((n, max_pixels, d), dtype=np.float32)
    valid = np.zeros((n, max_pixels), dtype=bool)
    for i, f in enumerate(feats):
        f = np.asarray(f, dtype=np.float32)
        norm = np.linalg.norm(f, axis=0, keepdims=True)
        f = f / np.maximum(norm, 1e-12)
        p = min(f.shape[1], max_pixels)
        out[i, :p] = f[:, :p].T
        valid[i, :p] = True
    return out, valid


def reconsdot_distance(track_feats: Sequence[np.ndarray],
                       det_feats: Sequence[np.ndarray],
                       max_pixels: int = 512, tmp: float = 100.0) -> np.ndarray:
    """Cost matrix between track and detection pixel-feature sets (each a
    (D, n_px) array)."""
    if len(track_feats) == 0 or len(det_feats) == 0:
        return np.zeros((len(track_feats), len(det_feats)))
    ft, vt = pad_feature_sets(track_feats, max_pixels)
    fd, vd = pad_feature_sets(det_feats, max_pixels)
    return np.asarray(_reconsdot_kernel(
        jnp.asarray(ft), jnp.asarray(vt), jnp.asarray(fd), jnp.asarray(vd), tmp=tmp))


def cosine_distance(track_feats: np.ndarray, det_feats: np.ndarray) -> np.ndarray:
    """1 - cosine similarity of flat feature vectors (reference:
    matching.py:115-132 center_emb_distance)."""
    if len(track_feats) == 0 or len(det_feats) == 0:
        return np.zeros((len(track_feats), len(det_feats)))
    a = np.asarray(track_feats, dtype=np.float32)
    b = np.asarray(det_feats, dtype=np.float32)
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return 1.0 - a @ b.T


def category_gate(cost_matrix: np.ndarray, tracks, detections) -> np.ndarray:
    """Penalize category mismatches additively (reference:
    matching.py:241-256 — used when observations carry a category column)."""
    if cost_matrix.size == 0:
        return cost_matrix
    det_c = np.array([d.category for d in detections], dtype=np.float64)
    trk_c = np.array([t.category for t in tracks], dtype=np.float64)
    return cost_matrix + np.abs(det_c[None, :] - trk_c[:, None])


def fuse_motion(kf, cost_matrix: np.ndarray, tracks, detections,
                only_position: bool = False, lambda_: float = 0.98,
                gate: bool = True) -> np.ndarray:
    """Blend appearance cost with Kalman gating distance (reference:
    matching.py:100-112)."""
    if cost_matrix.size == 0:
        return cost_matrix
    gating_dim = 2 if only_position else 4
    from openpvsg_tpu.tracker.kalman import CHI2INV95
    gating_threshold = CHI2INV95[gating_dim]
    measurements = np.asarray([d.to_xyah() for d in detections])
    for row, track in enumerate(tracks):
        gd = kf.gating_distance(track.mean, track.covariance, measurements,
                                only_position)
        if gate:
            cost_matrix[row, gd > gating_threshold] = np.inf
        cost_matrix[row] = lambda_ * cost_matrix[row] + (1 - lambda_) * gd
    return cost_matrix
