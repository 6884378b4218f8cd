"""Segmenter evaluation CLI (reference: tools/test.py --eval PQ).

Runs IPS inference over the val split and reports PQ / PQ_th / PQ_st.
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, collect_rank_results, load_config,
                          reject_unused_n_time,
                          maybe_mesh, partition_videos, setup_logging)


def main():
    parser = base_parser("Evaluate the segmenter (PQ)")
    parser.add_argument("--checkpoint", required=False, default=None)
    parser.add_argument("--eval", default="PQ")
    parser.add_argument("--out", default=None, help="pickle results path")
    parser.add_argument("--split", default="val")
    parser.add_argument("--batch-size", type=int, default=8)
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.data.datasets import PVSGImageDataset
    from openpvsg_tpu.data.pipeline import pad_to_divisor
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.models.mask2former import Mask2Former

    work_dir = os.path.join(cfg.data.work_dir, cfg.name)
    logger = setup_logging(work_dir, "test")

    dataset = PVSGImageDataset(cfg.data.anno_file, cfg.data.data_dir, args.split)
    logger.info(f"eval split {args.split}: {len(dataset)} frames")
    if cfg.model.num_classes != dataset.num_classes:
        raise SystemExit(
            f"model has {cfg.model.num_classes} classes but the annotation "
            f"file defines {dataset.num_classes}; set "
            "model.num_things_classes / model.num_stuff_classes to match")

    model = Mask2Former(cfg.model)
    sample = dataset[0]["img"]
    ph, pw = pad_to_divisor(*sample.shape[:2], cfg.data.pad_divisor)
    if args.checkpoint:
        from openpvsg_tpu.train.checkpoint import load_checkpoint
        state = load_checkpoint(args.checkpoint)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 1, ph, pw, 3)))
        logger.warning("no checkpoint given: evaluating random weights")

    infer_dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    mesh = maybe_mesh()
    if mesh is not None:
        logger.info(f"frame-sharded inference over "
                    f"{mesh.devices.size} devices")
    seg = SegmenterInference(cfg.model, variables, dtype=infer_dtype,
                             mesh=mesh)

    if "VPQ" in args.eval:
        # window-k VPQ over stitched tubes: windowed MinVIS inference with
        # segment-id identity across windows (the concat_seq rule), scored
        # by eval/vpq.window_vpq per video and averaged.
        from openpvsg_tpu.data.masks import decode_palette_mask, pan_mm2hb
        from openpvsg_tpu.data.pipeline import load_frame, load_mask
        from openpvsg_tpu.data.pvsg import PVSGAnnotation, frame_paths
        from openpvsg_tpu.eval.vpq import window_vpq

        anno = PVSGAnnotation(cfg.data.anno_file)
        window = cfg.data.ref_seq_len_test
        totals = {}
        n_vids = 0
        # multi-host: each process scores its strided share of videos;
        # per-video sums are file-collected and reduced on process 0
        for vid in partition_videos(anno.video_ids(args.split)):
            frames = frame_paths(cfg.data.data_dir, vid, "frames")
            masks = frame_paths(cfg.data.data_dir, vid, "masks")
            if not frames or len(frames) != len(masks):
                continue
            objects = anno[vid]["objects"]
            gt_seq = [decode_palette_mask(
                load_mask(p), objects, dataset.class_index,
                dataset.num_classes)["gt_panoptic_seg"] for p in masks]
            pred_seq = []
            # W windows per (frame-sharded) forward; 1 on a single chip
            # (identical outputs either way — infer_windows_vps). Two
            # window batches in flight: batch N+1's upload+forward
            # overlaps batch N's fetch + pan_mm2hb host work.
            from collections import deque

            wpb = mesh.shape["data"] if mesh is not None else 1
            offsets = list(range(0, len(frames), window * wpb))
            pending, next_i = deque(), 0
            while next_i < len(offsets) or pending:
                while next_i < len(offsets) and len(pending) < 2:
                    lo = offsets[next_i]
                    raw = np.stack([load_frame(p)
                                    for p in frames[lo:lo + window * wpb]])
                    pending.append(seg.infer_windows_vps_async(raw))
                    next_i += 1
                outs = seg.finish_windows_vps(pending.popleft(), window)
                pred_seq.extend(pan_mm2hb(o["pan_results"],
                                          dataset.num_classes) for o in outs)
            m = window_vpq(pred_seq, gt_seq, dataset.num_classes,
                           len(dataset.anno.thing_classes),
                           len(dataset.anno.stuff_classes),
                           ign_id=dataset.num_classes)
            n_vids += 1
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + v
            logger.info(f"{vid}: " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(m.items())))
        parts = collect_rank_results(work_dir, "vpq", (totals, n_vids))
        if parts is not None:            # single-process, or process 0
            totals, n_vids = {}, 0
            for t, n in parts:
                n_vids += n
                for k, v in t.items():
                    totals[k] = totals.get(k, 0.0) + v
            if n_vids:
                summary = {k: v / n_vids for k, v in sorted(totals.items())}
                logger.info("mean over videos: " + " ".join(
                    f"{k}={v:.4f}" for k, v in summary.items()))
                print(summary)
        if args.eval == "VPQ":
            return

    # multi-host: strided frame partition per process; the per-frame PQ
    # stat tuples element-sum, so each rank pre-sums its share and rank 0
    # merges (file-level collection, like the reference's multi_gpu_test)
    import jax as _jax

    indices = partition_videos(range(len(dataset)))
    results = []
    bs = args.batch_size
    # two batches in flight: batch N+1's dataset decode + upload + forward
    # overlaps batch N's fetch (see run_query_tube_ips pipeline_depth)
    from collections import deque

    offsets = list(range(0, len(indices), bs))
    pending, next_i = deque(), 0
    while next_i < len(offsets) or pending:
        while next_i < len(offsets) and len(pending) < 2:
            lo = offsets[next_i]
            frames = [dataset[i]["img"] for i in indices[lo:lo + bs]]
            pending.append((lo, seg.infer_frames_ips_async(np.stack(frames))))
            next_i += 1
        lo, handle = pending.popleft()
        outs = seg.package_ips(handle)
        results.extend(o["pan_results"] for o in outs)
        if lo % (bs * 20) == 0:
            logger.info(f"{lo}/{len(indices)}")

    if args.out:
        out_path = args.out if _jax.process_count() <= 1 else (
            f"{args.out}.rank{_jax.process_index()}")
        with open(out_path, "wb") as f:
            pickle.dump(results, f)
    if "PQ" in args.eval:
        from openpvsg_tpu.eval.vpq import pq_summary

        stats = dataset.frame_stats(results, indices)
        presum = [np.sum([s[j] for s in stats], axis=0) for j in range(4)] \
            if stats else None
        parts = collect_rank_results(work_dir, "pq_stats", presum)
        if parts is None:                # non-zero rank in multi-host run
            return
        metrics = pq_summary([p for p in parts if p is not None],
                             len(dataset.anno.thing_classes),
                             len(dataset.anno.stuff_classes))
        logger.info(f"PQ={metrics['PQ']:.4f} PQ_th={metrics['PQ_th']:.4f} "
                    f"PQ_st={metrics['PQ_st']:.4f}")
        # per-class table (reference prints the mmdet PQ table)
        per_class = metrics["per_class"]
        rows = sorted(enumerate(per_class), key=lambda kv: -kv[1])
        logger.info("top per-class PQ:")
        for idx, pq in rows[:20]:
            if pq > 0:
                name = (dataset.anno.classes[idx]
                        if idx < len(dataset.anno.classes) else str(idx))
                logger.info(f"  {name:<24} {pq:.4f}")
        print({k: v for k, v in metrics.items() if k != "per_class"})


if __name__ == "__main__":
    main()
