#!/usr/bin/env python
"""Harvest the Swin-vs-R26 rich-cascade grid (scripts/rich_cascade_r4.sh)
into one committed artifact (VERDICT r4 next-round #1).

Parses the per-arm logs under work_dirs/rich_r4/{r26,swin}/ — stage-1
PQ/VPQ dicts and the stage-4/5 proxy (rel_test) + mask-grounded protocol
(rel_test_full) recall tables — and writes benchmarks/r5/cascade_grid.json.

Usage: python scripts/harvest_cascade_r5.py [ROOT] [OUT]
"""
import json
import sys
from pathlib import Path

from harvest_common import last_dict, recall_table


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "work_dirs/rich_r4")
    out = Path(sys.argv[2] if len(sys.argv) > 2
               else "benchmarks/r5/cascade_grid.json")
    grid = {
        "script": "scripts/rich_cascade_r4.sh",
        "data": "rich synthetic, 24 train / 8 val videos, 32f 96x128, seed 0",
        "epochs": {"segmenter": 60, "relation": 40},
        "arms": {},
    }
    for bk in ("r26", "swin"):
        w = root / bk
        arm = {
            "stage1_pq": last_dict(w / "eval_pq.log"),
            "stage1_vpq": last_dict(w / "eval_vpq.log"),
            "relation": {},
        }
        for head in ("transformer", "conv_interact"):
            arm["relation"][head] = {
                "proxy": recall_table(w / f"rel_test_{head}.log"),
                "protocol": recall_table(w / f"rel_test_full_{head}.log"),
            }
        grid["arms"][bk] = arm
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(grid, indent=1) + "\n")
    print(f"wrote {out}")
    for bk, arm in grid["arms"].items():
        pq = arm["stage1_pq"]["PQ"]
        vpq = arm["stage1_vpq"]["VPQ"]
        for head, r in arm["relation"].items():
            print(f"{bk:5s} PQ={pq:.4f} VPQ={vpq:.4f} {head:14s} "
                  f"proxy R@20={r['proxy']['Recall@20']:5.2f} "
                  f"mR@20={r['proxy']['Mean Recall@20']:5.2f} "
                  f"protocol SoftR@20={r['protocol']['Soft Recall@20']:5.2f}")


if __name__ == "__main__":
    main()
