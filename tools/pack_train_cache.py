"""Build a packed preprocessed training cache (openpvsg_tpu/data/packed.py).

One-time prep that moves the per-epoch-invariant host work (PNG decode,
resize to train_scale, mask nearest-resize, object_id->class LUTs) out of
the training loop; tools/train.py --packed-cache <dir> then feeds the
trainer from memmap shards with numpy-slice augmentation and uint8 H2D.
Equivalent surface in the reference: the fork-based mmcv dataloader workers
(reference: tools/train.py:231).

  python tools/pack_train_cache.py --config mask2former_vps \
      --data-dir data --anno-file data/pvsg.json --out work_dirs/packed
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config, reject_unused_n_time,
                          setup_logging)


def main():
    parser = base_parser("Pack a preprocessed training cache")
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", default=None,
                        help="cache dir (default {work_dir}/packed_{split})")
    parser.add_argument("--videos", nargs="*", default=None,
                        help="restrict to these video ids")
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    from openpvsg_tpu.data.packed import write_packed_cache

    out = args.out or os.path.join(cfg.data.work_dir, f"packed_{args.split}")
    logger = setup_logging(cfg.data.work_dir, "pack_train_cache")
    index = write_packed_cache(
        cfg.data.anno_file, cfg.data.data_dir, args.split, out,
        train_scale=tuple(cfg.data.train_scale), video_ids=args.videos,
        log_fn=logger.info)
    gb = (index["total_frames"]
          * (3 + 2) * index["train_scale"][0] * index["train_scale"][1] / 1e9)
    logger.info(f"packed {len(index['videos'])} videos / "
                f"{index['total_frames']} frames into {out} (~{gb:.2f} GB)")


if __name__ == "__main__":
    main()
