#!/usr/bin/env python
"""Harvest the round-5 data-scaling study (scripts/scaling_r5.sh) into one
committed artifact.

Parses the per-scale logs under work_dirs/scale_r5/s{24,48,96}/ — stage-1
PQ/VPQ summary dicts plus the stage-5 proxy (rel_test) and mask-grounded
protocol (rel_test_full) recall tables for the Swin + conv_interact arm —
and writes benchmarks/r5/scaling.json.

Usage: python scripts/harvest_scaling_r5.py [ROOT] [OUT]
"""
import json
import sys
from pathlib import Path

from harvest_common import last_dict, recall_table


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "work_dirs/scale_r5")
    out = Path(sys.argv[2] if len(sys.argv) > 2
               else "benchmarks/r5/scaling.json")
    study = {
        "script": "scripts/scaling_r5.sh",
        "design": "Swin-T + conv_interact; train videos subset "
                  "from ONE 96-video rich synthetic generation (seed 0) so "
                  "the 8-video val set is identical across arms; everything "
                  "else (model, epochs, LR, seed) held fixed — per-arm "
                  "epoch counts recorded below",
        "arms": {},
    }
    for d in sorted(root.glob("s*"), key=lambda p: int(p.name[1:])):
        if not (d / "done_rel").exists():
            print(f"skipping {d.name}: not finished")
            continue

        def _epochs(pattern):
            # the final checkpoint dir is epoch_<N>; record N per stage so
            # the artifact documents the actual budget the arm trained with
            nums = [int(p.name.split("_")[1]) for p in d.glob(pattern)
                    if p.name.split("_")[1].isdigit()]
            return max(nums) if nums else None

        study["arms"][d.name] = {
            "train_videos": int(d.name[1:]),
            "stage1_epochs": _epochs("mask2former_swin_vps/epoch_*"),
            "relation_epochs": _epochs("relation/rel_vps_conv_lr*/epoch_*"),
            "stage1_pq": last_dict(d / "eval_pq.log"),
            "stage1_vpq": last_dict(d / "eval_vpq.log"),
            "proxy": recall_table(d / "rel_test.log"),
            "protocol": recall_table(d / "rel_test_full.log"),
        }
    if not study["arms"]:
        raise SystemExit("no finished arms")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(study, indent=1) + "\n")
    print(f"wrote {out}")
    for name, arm in study["arms"].items():
        print(f"{name:4s} PQ={arm['stage1_pq']['PQ']:.4f} "
              f"VPQ={arm['stage1_vpq']['VPQ']:.4f} "
              f"proxy R@20={arm['proxy']['Recall@20']:5.2f} "
              f"mR@20={arm['proxy']['Mean Recall@20']:5.2f} "
              f"protocol R@20={arm['protocol']['Recall@20']:5.2f} "
              f"SoftR@20={arm['protocol']['Soft Recall@20']:5.2f}")


if __name__ == "__main__":
    main()
