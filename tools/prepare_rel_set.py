"""Stage 3: build the relation dataset — match pred tubes to GT, translate
relations, join query features -> {vid}/relations.pickle
(reference: tools/prepare_rel_set.py + prepare_rel_set_dist.py; --jobs N
replaces the _dist variant's multiprocessing.Pool(10))."""
from __future__ import annotations

import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config,
                          reject_unused_n_time, setup_logging)


def _one(vid_workdir_anno_datadir):
    vid, work_dir, anno_file, split, data_dir = vid_workdir_anno_datadir
    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation
    from openpvsg_tpu.infer.stages import run_rel_set

    anno = PVSGRelationAnnotation(anno_file, split)
    try:
        return vid, run_rel_set(vid, work_dir, anno, data_dir)
    except Exception as e:  # noqa: BLE001 — per-video isolation like the
        # reference's swallow-and-print (prepare_rel_set_dist.py:40-42),
        # but the failure is reported in the summary
        return vid, f"ERROR: {e}"


def main():
    parser = base_parser("Build relations.pickle per video")
    parser.add_argument("--split", default="train")
    parser.add_argument("--videos", nargs="*", default=None)
    parser.add_argument("--jobs", type=int, default=1)
    parser.add_argument("--skip-existing", action="store_true")
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation

    work_dir = os.path.join(cfg.data.work_dir, f"{args.split}_save_qf")
    logger = setup_logging(work_dir, "prepare_rel_set")
    anno = PVSGRelationAnnotation(cfg.data.anno_file, args.split)
    videos = args.videos or [
        v for v in anno.split_video_ids
        if os.path.exists(os.path.join(work_dir, v, "quantitive", "masks.txt"))
    ]
    if args.skip_existing:
        videos = [v for v in videos if not os.path.exists(
            os.path.join(work_dir, v, "relations.pickle"))]
    logger.info(f"{len(videos)} videos, jobs={args.jobs}")

    tasks = [(v, work_dir, cfg.data.anno_file, args.split, cfg.data.data_dir)
             for v in videos]
    if args.jobs > 1:
        with ProcessPoolExecutor(args.jobs) as ex:
            for vid, out in ex.map(_one, tasks):
                logger.info(f"{vid}: {out}")
    else:
        for t in tasks:
            vid, out = _one(t)
            logger.info(f"{vid}: {out}")


if __name__ == "__main__":
    main()
