"""MOTS tracking evaluation over stage-2 outputs: CLEAR (MOTA/MOTP), IDF1,
and HOTA per video (the natively-rebuilt subset of the reference's vendored
TrackEval harness, models/unitrack/eval/trackeval/).

Reads {work_dir}/{vid}/quantitive/masks.txt (stage-2 tubes) and the GT
palette masks, matches at mask IoU.

Usage: python tools/eval_mots.py --work-dir ... --data-dir ... [--split val]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config,
                          reject_unused_n_time, setup_logging)


def main():
    parser = base_parser("MOTS tracking metrics (CLEAR/IDF1/HOTA)")
    parser.add_argument("--split", default="val")
    parser.add_argument("--videos", nargs="*", default=None)
    parser.add_argument("--out", default=None, help="write metrics JSON here")
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    from openpvsg_tpu.data import io as data_io, rle as rle_codec
    from openpvsg_tpu.data.pipeline import load_mask
    from openpvsg_tpu.data.pvsg import PVSGAnnotation, frame_paths
    from openpvsg_tpu.eval.mot_metrics import (evaluate_hota, evaluate_jf,
                                               evaluate_mots)

    work_dir = cfg.data.work_dir
    logger = setup_logging(work_dir, "eval_mots")
    anno = PVSGAnnotation(cfg.data.anno_file)
    videos = args.videos or anno.video_ids(args.split)

    totals, n = {}, 0
    for vid in videos:
        masks_txt = os.path.join(work_dir, vid, "quantitive", "masks.txt")
        if not os.path.exists(masks_txt):
            masks_txt = os.path.join(work_dir, f"{args.split}_save_qf", vid,
                                     "quantitive", "masks.txt")
        if not os.path.exists(masks_txt):
            logger.warning(f"{vid}: no masks.txt, skipping")
            continue
        gt_files = frame_paths(cfg.data.data_dir, vid, "masks")
        if not gt_files:
            logger.warning(f"{vid}: no GT masks, skipping")
            continue
        T = len(gt_files)
        gt_frames = []
        for p in gt_files:
            m = load_mask(p)
            gt_frames.append({int(i): (m == i).astype(np.uint8)
                              for i in np.unique(m) if i != 0})
        pred_frames = [dict() for _ in range(T)]
        for e in data_io.read_masks_txt(masks_txt):
            t = e["fid"] - 1
            if 0 <= t < T:
                pred_frames[t][e["tid"]] = rle_codec.decode(e["rle"])

        m = {**evaluate_mots(gt_frames, pred_frames),
             **evaluate_hota(gt_frames, pred_frames),
             **evaluate_jf(gt_frames, pred_frames)}
        n += 1
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        logger.info(f"{vid}: " + " ".join(
            f"{k}={v:.4f}" for k, v in m.items()
            if k in ("MOTA", "MOTP", "IDF1", "HOTA", "DetA", "AssA", "J&F")))

    if n:
        summary = {k: v / n for k, v in totals.items()}
        logger.info("mean over videos: " + " ".join(
            f"{k}={v:.4f}" for k, v in summary.items()
            if k in ("MOTA", "MOTP", "IDF1", "HOTA", "DetA", "AssA")))
        print(json.dumps({k: round(v, 4) for k, v in summary.items()}))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
