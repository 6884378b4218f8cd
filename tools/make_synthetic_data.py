"""Generate a synthetic PVSG-format dataset for smoke-testing the full
pipeline without the real download (no reference equivalent; their
bootstrap assumed the dataset zips)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="synthetic PVSG dataset")
    p.add_argument("--out", default="./data_synth")
    p.add_argument("--train-videos", type=int, default=2)
    p.add_argument("--val-videos", type=int, default=1)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, nargs=2, default=(64, 64))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--style", default="simple", choices=("simple", "rich"),
                   help="rich = variable object counts/motion patterns with "
                        "geometry-derived relations (capacity studies)")
    p.add_argument("--max-things", type=int, default=5,
                   help="rich mode: max moving things per video")
    p.add_argument("--oracle-stage2", default=None, metavar="WORK_DIR",
                   help="also write perfect GT-derived stage-2 outputs "
                        "(masks.txt + query_feats.pickle) for both splits "
                        "into WORK_DIR/{train,val}_save_qf — isolates "
                        "relation-head studies from segmenter quality")
    args = p.parse_args()

    from openpvsg_tpu.data.synthetic import make_dataset, write_oracle_stage2

    path = make_dataset(args.out, args.train_videos, args.val_videos,
                        args.frames, args.size[0], args.size[1], args.seed,
                        style=args.style, max_things=args.max_things)
    print(f"wrote {path}")
    if args.oracle_stage2:
        for split in ("train", "val"):
            dirs = write_oracle_stage2(args.out, path, args.oracle_stage2,
                                       split, seed=args.seed)
            print(f"oracle stage-2 [{split}]: {len(dirs)} videos")
    print(f"try: python tools/end2end_inference.py --data-dir {args.out} "
          f"--anno-file {path} --split val --set model.backbone.depth=26")


if __name__ == "__main__":
    main()
