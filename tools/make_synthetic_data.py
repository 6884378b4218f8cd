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
    args = p.parse_args()

    from openpvsg_tpu.data.synthetic import make_dataset

    path = make_dataset(args.out, args.train_videos, args.val_videos,
                        args.frames, args.size[0], args.size[1], args.seed)
    print(f"wrote {path}")
    print(f"try: python tools/end2end_inference.py --data-dir {args.out} "
          f"--anno-file {path} --split val --set model.backbone.depth=26")


if __name__ == "__main__":
    main()
