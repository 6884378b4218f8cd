"""Synthetic PVSG-format dataset generator.

Builds a miniature but schema-complete dataset tree (frames, object-id
masks, pvsg.json) with moving objects and GT relations — the fixture the
test suite uses, exposed as a library + tool so every pipeline stage can be
exercised end-to-end on any machine without the real PVSG download.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image

THING = ["person", "dog", "cat", "ball", "cup"]
STUFF = ["floor", "wall", "table"]
RELATIONS = ["on", "next-to", "holding", "looking-at", "touching"]


def make_video(root: str, vid: str, n_frames: int, h: int, w: int,
               rng: np.random.Generator) -> Dict:
    """One video: a moving thing, a static thing, a stuff plane."""
    source = "vidor" if vid.split("_")[0].isdigit() else "ego4d"
    fdir = os.path.join(root, source, "frames", vid)
    mdir = os.path.join(root, source, "masks", vid)
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(mdir, exist_ok=True)

    colors = rng.integers(60, 255, (4, 3))
    for t in range(n_frames):
        img = rng.integers(0, 60, (h, w, 3)).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        # object 1: moving square (thing)
        sz = h // 5
        x0 = int((w - sz - 2) * t / max(n_frames - 1, 1)) + 1
        y0 = h // 5
        mask[y0:y0 + sz, x0:x0 + sz] = 1
        # object 2: static circle-ish blob (thing)
        yy, xx = np.mgrid[:h, :w]
        blob = (yy - h // 3) ** 2 + (xx - 3 * w // 4) ** 2 < (h // 7) ** 2
        mask[blob & (mask == 0)] = 2
        # object 3: floor strip (stuff)
        mask[int(h * 0.7):, :][mask[int(h * 0.7):, :] == 0] = 3
        for oid in (1, 2, 3):
            img[mask == oid] = colors[oid]
        Image.fromarray(img).save(os.path.join(fdir, f"{t:04d}.png"))
        Image.fromarray(mask).save(os.path.join(mdir, f"{t:04d}.png"))

    return {
        "video_id": vid,
        "meta": {"fps": 5, "num_frames": n_frames, "height": h, "width": w},
        "objects": [
            {"object_id": 1, "category": THING[0]},
            {"object_id": 2, "category": THING[1]},
            {"object_id": 3, "category": STUFF[0]},
        ],
        "relations": [
            [1, 3, "on", [[0, n_frames - 1]]],
            [1, 2, "next-to", [[n_frames // 3, 2 * n_frames // 3]]],
        ],
    }


def make_dataset(root: str, n_train: int = 2, n_val: int = 1,
                 n_frames: int = 8, h: int = 64, w: int = 64,
                 seed: int = 0) -> str:
    rng = np.random.default_rng(seed)
    data, train_ids, val_ids = [], [], []
    for i in range(n_train + n_val):
        vid = f"{1000 + i:04d}_synth{i}"
        data.append(make_video(root, vid, n_frames, h, w, rng))
        (train_ids if i < n_train else val_ids).append(vid)
    anno = {
        "objects": {"thing": THING, "stuff": STUFF},
        "relations": RELATIONS,
        "split": {"vidor": {"train": train_ids, "val": val_ids},
                  "epic_kitchen": {"train": [], "val": []},
                  "ego4d": {"train": [], "val": []}},
        "data": data,
    }
    path = os.path.join(root, "pvsg.json")
    with open(path, "w") as f:
        json.dump(anno, f)
    return path
