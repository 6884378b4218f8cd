#!/usr/bin/env python
"""Harvest the oracle-tube data-scaling grids (scripts/oracle_scaling_r5.sh)
into one committed artifact: benchmarks/r5/oracle_scaling.json.

Each scale's tools/rel_capacity_study.py JSON is keyed by (variant,
capacity); this aggregator pivots them by cell across scales so the
data-scaling trend per architecture reads as one row.

Usage: python scripts/harvest_oracle_scaling_r5.py [ROOT] [OUT]
"""
import json
import sys
from pathlib import Path


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1
                else "work_dirs/oracle_scale_r5")
    out = Path(sys.argv[2] if len(sys.argv) > 2
               else "benchmarks/r5/oracle_scaling.json")
    study = {
        "script": "scripts/oracle_scaling_r5.sh",
        "design": "PERFECT GT tubes (write_oracle_stage2) -> relation heads "
                  "at 24/48/96 train videos subset from the SAME 96-video "
                  "rich generation (seed 0) as benchmarks/r5/scaling.json; "
                  "fixed 8-video val set; 40 epochs; --eval-train splits "
                  "memorization from generalization. NOTE: train_s is "
                  "incidental wall time — the s96 grid shared the chip "
                  "with the cascade study (scaling_r5.sh), so only quality "
                  "metrics are comparable across scales, not train_s",
        "scales": {},
        "cells": {},
    }
    for d in sorted(root.glob("s*"), key=lambda p: int(p.name[1:])):
        f = d / f"capacity_{d.name}.json"
        if not (d / "done_grid").exists() or not f.exists():
            print(f"skipping {d.name}: not finished")
            continue
        grid = json.loads(f.read_text())
        study["scales"][d.name] = {
            "train_videos": grid["train_videos"],
            "val_videos": grid["val_videos"],
            "epochs": grid["epochs"],
        }
        for c in grid["cells"]:
            key = f"{c['variant']}/{c['capacity']}"
            study["cells"].setdefault(key, {})[d.name] = c
    if not study["scales"]:
        raise SystemExit("no finished scales")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(study, indent=1) + "\n")
    print(f"wrote {out}")
    scales = sorted(study["scales"], key=lambda s: int(s[1:]))
    print(f"{'cell':26s} " + " ".join(
        f"{s}: val R@20 (train R@20)".ljust(26) for s in scales))
    for key, per_scale in sorted(study["cells"].items()):
        row = [f"{key:26s}"]
        for s in scales:
            c = per_scale.get(s)
            row.append("-".ljust(26) if c is None else
                       f"{c['R@20']:5.1f} ({c.get('train_R@20', -1):5.1f})"
                       .ljust(26))
        print(" ".join(row))


if __name__ == "__main__":
    main()
