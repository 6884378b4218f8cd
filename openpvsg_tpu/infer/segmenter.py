"""Segmenter inference: batched per-frame forward, MinVIS query stitching,
and panoptic fusion.

Rebuild of the reference test paths:
  Mask2FormerCustom.simple_test (IPS)      mask2former.py:121-191
  Mask2FormerVideoCustomMinVIS.simple_test mask2former_min_vis.py:132-258
  concat_seq                               mask2former_vps/utils.py:14-89

TPU design: the reference decodes one frame per step with a D2H sync each
(SURVEY §3.2 boundary list); here the whole window of frames runs as ONE
batched jitted forward (frames on the batch axis), fusion is the vectorized
device kernel, and only the final segment maps/feature dicts cross to host.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu import INSTANCE_OFFSET
from openpvsg_tpu.config import Mask2FormerConfig
from openpvsg_tpu.data.pipeline import pad_to_divisor
from openpvsg_tpu.models.fusion import panoptic_fusion
from openpvsg_tpu.models.mask2former import Mask2Former
from openpvsg_tpu import native


def minvis_stitch(embds: np.ndarray,
                  prev: Optional[np.ndarray] = None) -> np.ndarray:
    """Frame-to-frame query alignment (reference: match_from_embds,
    mask2former_min_vis.py:244-258). embds: (T, Q, C) decoder query
    embeddings. Returns perms (T, Q): perms[t] maps aligned slot -> raw
    query index at frame t.

    With prev=None, perms[0] = identity (the reference resets alignment at
    every window — concat_seq then relies on raw id equality across
    windows). Passing the previous window's last aligned embeddings as
    `prev` chains the alignment across windows, so query slots stay
    consistent for the whole video (the rebuild's improvement; enable via
    run_query_tube_vps(chain_windows=True))."""
    T, Q, _ = embds.shape
    perms = np.zeros((T, Q), dtype=np.int32)
    start = 0
    if prev is None:
        perms[0] = np.arange(Q)
        prev = embds[0]
        start = 1
    for t in range(start, T):
        cur = embds[t]
        a = prev / np.maximum(np.linalg.norm(prev, axis=1, keepdims=True), 1e-12)
        b = cur / np.maximum(np.linalg.norm(cur, axis=1, keepdims=True), 1e-12)
        cost = 1.0 - b @ a.T            # (cur, tgt)
        ri, ci = native.linear_sum_assignment(cost.T)  # target x current
        perms[t] = ci
        prev = cur[ci]
    return perms


class SegmenterInference:
    """Owns the jitted forward + fusion for a fixed input resolution.

    Frames enter RAW (uint8 RGB, unpadded): normalization + padding are
    fused into the forward program, so H2D carries uint8 — 4x fewer tunnel
    bytes than preprocessing on device, pulling float32 to host, and
    re-uploading (the reference preprocesses per frame on host and uploads
    float tensors, mask2former.py:166-172). float inputs are treated as
    already normalized + padded (back-compat).

    With a multi-device mesh, the frame batch is sharded over the 'data'
    axis (sequence parallelism over ICI — SURVEY §5); weights replicated.
    """

    MEAN = (123.675, 116.28, 103.53)
    STD = (58.395, 57.12, 57.375)

    def __init__(self, cfg: Mask2FormerConfig, variables,
                 dtype=jnp.float32, mesh=None, pad_divisor: int = 32,
                 fold_bn: bool = True, fused_fpn: Optional[bool] = None,
                 int8_weights: Optional[bool] = None):
        import dataclasses

        # Serving-graph optimization: fold inference-mode BN affines into
        # the backbone convs (models/resnet.py:fold_frozen_bn) — exact, and
        # removes ~50 ops from the op-count-bound forward (PERF.md r2).
        if (fold_bn and cfg.backbone.kind == "resnet"
                and cfg.backbone.norm in ("frozen_bn", "sync_bn")
                and "batch_stats" in variables):
            from openpvsg_tpu.models.resnet import fold_frozen_bn

            variables = fold_frozen_bn(variables)
            cfg = dataclasses.replace(
                cfg, backbone=dataclasses.replace(cfg.backbone,
                                                  norm="folded"))
        # Opt-in: the stride-4 FPN chain as the fused Pallas kernel
        # (ops/pallas/fpn_kernel.py). Standalone it wins 1.46 -> 0.85
        # ms/window on-chip, but IN-MODEL it measured NET NEGATIVE
        # (569 -> 556 f/s back-to-back A/B): XLA's cross-chain fusion of
        # the unfused ops with their neighbors beats the kernel plus its
        # custom-call boundary. Kept as an opt-in (PERF.md r3 negative
        # result); default OFF. None = follow cfg.pixel_decoder.fused_fpn;
        # an explicit True/False overrides the config either way.
        if (fused_fpn is not None
                and fused_fpn != cfg.pixel_decoder.fused_fpn):
            cfg = dataclasses.replace(
                cfg, pixel_decoder=dataclasses.replace(cfg.pixel_decoder,
                                                       fused_fpn=fused_fpn))
        self.cfg = cfg
        self.model = Mask2Former(cfg, dtype=dtype)
        self.mesh = mesh
        self.pad_divisor = pad_divisor
        # flax silently ignores params the model never reads — catch
        # config/checkpoint structure mismatches up front
        from openpvsg_tpu.train.checkpoint import check_no_extra_params

        check_no_extra_params(self.model,
                              jnp.zeros((1, 1, 64, 64, 3), jnp.float32),
                              variables, where="SegmenterInference")
        # Weights-only int8 serving (opt-in; utils/quantize.py docstring has
        # the roofline scoping). None = follow cfg.int8_weights; fold_bn has
        # already merged BN affines so the folded kernels are what quantize.
        self._int8 = (getattr(cfg, "int8_weights", False)
                      if int8_weights is None else int8_weights)
        if self._int8:
            from openpvsg_tpu.utils.quantize import quantize_tree_int8

            variables, n_q, saved = quantize_tree_int8(
                variables, scopes=("backbone", "pixel_decoder"))
            import logging
            logging.getLogger(__name__).info(
                "int8 weights: %d kernels quantized, %.1f MB HBM saved",
                n_q, saved / 1e6)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        self.variables = variables
        self._fwd = jax.jit(self._forward)
        self._fuse = jax.jit(self._fusion)
        self._align_fuse = jax.jit(self._align_fuse_impl,
                                   static_argnums=(5, 6, 7))

    def _forward(self, variables, frames):
        """frames: (N, H, W, 3) uint8 raw (or float pre-normalized+padded);
        each frame independent (T=1). Returns (cls (N, Q, K+1),
        masks (N, Q, Hp/4, Wp/4), query (N, Q, C))."""
        if self._int8:
            from openpvsg_tpu.utils.quantize import dequantize_tree

            variables = dequantize_tree(variables, self.model.dtype)
        if frames.dtype == jnp.uint8:
            x = frames.astype(jnp.float32)
            x = (x - jnp.asarray(self.MEAN)) / jnp.asarray(self.STD)
            h, w = x.shape[1:3]
            ph, pw = pad_to_divisor(h, w, self.pad_divisor)
            x = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
        else:
            x = frames
        out = self.model.apply(variables, x[:, None])
        return (out["cls_preds"][-1], out["mask_preds"][-1][:, :, 0],
                out["query_feats"])

    def _fusion(self, cls_logits, mask_logits):
        return jax.vmap(
            lambda c, m: panoptic_fusion(
                c, m, self.cfg.num_things_classes, self.cfg.num_stuff_classes,
                self.cfg.object_mask_thr, self.cfg.iou_thr)
        )(cls_logits, mask_logits)

    def forward_frames(self, frames: np.ndarray):
        """frames: (N, H, W, 3) float32 normalized + padded. Frame axis
        sharded over the mesh when one is configured."""
        n = np.asarray(frames).shape[0]
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from openpvsg_tpu.parallel.sp import pad_frames_for_mesh

            frames, n_orig = pad_frames_for_mesh(
                np.asarray(frames), self.mesh.shape["data"])
            x = jax.device_put(jnp.asarray(frames), NamedSharding(
                self.mesh, P("data", None, None, None)))
            cls_l, mask_l, q = self._fwd(self.variables, x)
            return cls_l[:n_orig], mask_l[:n_orig], q[:n_orig]
        return self._fwd(self.variables, jnp.asarray(frames))

    @staticmethod
    def upsample_masks(mask_logits: jnp.ndarray, out_hw: Tuple[int, int]):
        """(N, Q, h, w) -> (N, Q, H, W) bilinear (align_corners=False), the
        reference's F.interpolate to image size."""
        N, Q = mask_logits.shape[:2]
        x = mask_logits.reshape(N * Q, *mask_logits.shape[2:])[..., None]
        from openpvsg_tpu.ops.resize import resize_bilinear
        x = resize_bilinear(x, out_hw)[..., 0]
        return x.reshape(N, Q, *out_hw)

    def _padded_hw(self, frames) -> Tuple[int, int]:
        h, w = frames.shape[1:3]
        if frames.dtype == np.uint8:
            return pad_to_divisor(h, w, self.pad_divisor)
        return h, w

    # ------------------------------------------------------------------
    def infer_frames_ips(self, frames: np.ndarray,
                         ori_hw: Optional[Tuple[int, int]] = None):
        """IPS path: per-frame panoptic results + per-segment query feats
        (the simple_test_with_query surface). frames are raw uint8 (or
        pre-normalized float, back-compat).

        Returns list of {'pan_results': (H, W) mmdet-format, 'query_feats':
        {segment_id: 256-d np.ndarray}} per frame.
        """
        return self.package_ips(self.infer_frames_ips_async(frames, ori_hw))

    def infer_frames_ips_async(self, frames: np.ndarray,
                               ori_hw: Optional[Tuple[int, int]] = None):
        """Dispatch-only half of infer_frames_ips: uploads the batch and
        enqueues forward + fusion WITHOUT fetching results. Returns an
        opaque handle for package_ips(). jax dispatch is asynchronous, so
        keeping >1 handle in flight overlaps batch N+1's H2D + compute
        with the host-side fetch/tracking of batch N
        (run_query_tube_ips pipeline_depth)."""
        ori_hw = ori_hw or tuple(frames.shape[1:3])
        cls_logits, mask_logits, query = self.forward_frames(frames)
        masks_up = self.upsample_masks(mask_logits, self._padded_hw(frames))
        masks_up = masks_up[:, :, :ori_hw[0], :ori_hw[1]]
        fusion = self._fuse(cls_logits, masks_up)
        return fusion, query

    def package_ips(self, handle) -> List[Dict]:
        """Blocking half of infer_frames_ips: fetch a dispatched handle's
        device results to host per-frame dicts."""
        fusion, query = handle
        return self._package(fusion, query)

    def infer_window_vps(self, frames: np.ndarray,
                         ori_hw: Optional[Tuple[int, int]] = None,
                         prev_embds: Optional[np.ndarray] = None,
                         return_embds: bool = False):
        """VPS MinVIS path: per-frame forward + query stitching + clip-mean
        logits + per-frame fusion (reference: mask2former_min_vis.py:132-224).

        prev_embds (Q, C): chain alignment from the previous window (see
        minvis_stitch). return_embds=True additionally returns the last
        frame's ALIGNED query embeddings for chaining.
        """
        ori_hw = ori_hw or tuple(frames.shape[1:3])
        cls_logits, mask_logits, query = self.forward_frames(frames)
        embds = np.asarray(query)
        perms = minvis_stitch(embds, prev=prev_embds)
        idx = jnp.asarray(perms)
        cls_aligned = jnp.take_along_axis(cls_logits, idx[:, :, None], axis=1)
        masks_aligned = jnp.take_along_axis(
            mask_logits, idx[:, :, None, None], axis=1)
        query_aligned = jnp.take_along_axis(query, idx[:, :, None], axis=1)
        cls_mean = cls_aligned.mean(axis=0, keepdims=True)
        cls_mean = jnp.broadcast_to(cls_mean, cls_aligned.shape)
        masks_up = self.upsample_masks(masks_aligned, self._padded_hw(frames))
        masks_up = masks_up[:, :, :ori_hw[0], :ori_hw[1]]
        fusion = self._fuse(cls_mean, masks_up)
        outputs = self._package(fusion, query_aligned)
        if return_embds:
            return outputs, np.asarray(query_aligned[-1])
        return outputs

    def _align_fuse_impl(self, cls_logits, mask_logits, query, idx, win_id,
                         n_win, padded_hw, ori_hw):
        """Vectorized MinVIS post-forward pass for a BATCH of windows:
        align by the host-computed perms, clip-mean the class logits per
        window (segment mean over win_id), upsample + fuse every frame in
        one program. Same math as the serial infer_window_vps body."""
        cls_a = jnp.take_along_axis(cls_logits, idx[:, :, None], axis=1)
        masks_a = jnp.take_along_axis(mask_logits, idx[:, :, None, None],
                                      axis=1)
        query_a = jnp.take_along_axis(query, idx[:, :, None], axis=1)
        sums = jax.ops.segment_sum(cls_a, win_id, num_segments=n_win)
        cnt = jax.ops.segment_sum(jnp.ones((cls_a.shape[0],), cls_a.dtype),
                                  win_id, num_segments=n_win)
        cls_mean = sums[win_id] / cnt[win_id][:, None, None]
        masks_up = self.upsample_masks(masks_a, padded_hw)
        masks_up = masks_up[:, :, :ori_hw[0], :ori_hw[1]]
        return self._fusion(cls_mean, masks_up), query_a

    def infer_windows_vps(self, frames: np.ndarray, window: int,
                          prev_embds: Optional[np.ndarray] = None,
                          chain_windows: bool = False,
                          ori_hw: Optional[Tuple[int, int]] = None,
                          return_embds: bool = False):
        """Batched VPS MinVIS path: MULTIPLE windows of `window` frames run
        as ONE forward (frame axis sharded over the mesh — on an 8-chip
        mesh all chips work instead of ceil(window/8); VERDICT r2 weak #1).
        Only the MinVIS *stitching* is inherently sequential, and it needs
        just the (T, Q, C) query embeddings — computed host-side after the
        batched forward. Results are identical to the serial
        infer_window_vps loop (tests/test_parallel.py).

        frames: (N, H, W, 3) with windows at multiples of `window` (the
        last window may be ragged). chain_windows / prev_embds as in
        minvis_stitch; returns (per-frame outputs, last aligned embds).
        """
        return self.finish_windows_vps(
            self.infer_windows_vps_async(frames, ori_hw), window,
            prev_embds=prev_embds, chain_windows=chain_windows,
            return_embds=return_embds)

    def infer_windows_vps_async(self, frames: np.ndarray,
                                ori_hw: Optional[Tuple[int, int]] = None):
        """Dispatch-only half of infer_windows_vps: upload + forward the
        window batch without fetching. The MinVIS stitch (and the
        cross-window embedding chain) only constrains finish_windows_vps —
        the FORWARD has no sequential dependency, so batch N+1's forward
        can run while batch N is stitched/fetched host-side
        (run_query_tube_vps pipeline_depth)."""
        ori_hw = ori_hw or tuple(frames.shape[1:3])
        cls_logits, mask_logits, query = self.forward_frames(frames)
        return cls_logits, mask_logits, query, self._padded_hw(frames), ori_hw

    def finish_windows_vps(self, handle, window: int,
                           prev_embds: Optional[np.ndarray] = None,
                           chain_windows: bool = False,
                           return_embds: bool = False):
        """Blocking half of infer_windows_vps: fetch the query embeddings,
        run the (sequential) MinVIS stitch, then align+fuse+package."""
        cls_logits, mask_logits, query, padded_hw, ori_hw = handle
        n = cls_logits.shape[0]
        embds = np.asarray(query)
        Q = embds.shape[1]
        perms = np.zeros((n, Q), np.int32)
        prev = prev_embds if chain_windows else None
        for lo in range(0, n, window):
            seg = embds[lo:lo + window]
            p = minvis_stitch(seg, prev=prev)
            perms[lo:lo + window] = p
            if chain_windows:
                prev = seg[-1][p[-1]]
        win_id = np.arange(n) // window
        n_win = int(win_id[-1]) + 1
        fusion, query_a = self._align_fuse(
            cls_logits, mask_logits, query, jnp.asarray(perms),
            jnp.asarray(win_id), n_win, padded_hw, ori_hw)
        outputs = self._package(fusion, query_a)
        if return_embds:
            return outputs, np.asarray(query_a[-1])
        return outputs

    def _package(self, fusion, query) -> List[Dict]:
        """Device fusion outputs -> host per-frame dicts."""
        pan = np.asarray(fusion["pan_seg"])
        keep = np.asarray(fusion["query_keep"])
        seg_ids = np.asarray(fusion["segment_id"])
        q = np.asarray(query)
        out = []
        for t in range(pan.shape[0]):
            feats: Dict[int, List[np.ndarray]] = {}
            for k in np.flatnonzero(keep[t]):
                feats.setdefault(int(seg_ids[t, k]), []).append(q[t, k])
            out.append({
                "pan_results": pan[t],
                "query_feats": {sid: np.mean(v, axis=0)
                                for sid, v in feats.items()},
            })
        return out
