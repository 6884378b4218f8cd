"""Stage-boundary file formats.

The pipeline stages communicate through files exactly like the reference
(SURVEY.md §0): `masks.txt` MOTS RLE lines, `query_feats.pickle`, and
`relations.pickle`. Formats are kept bit/name-compatible so outputs
interoperate with reference tooling.

masks.txt line format: `frame id cid imh imw rle`
(reference: models/unitrack/utils/io.py:14-36 write_mots_results).
"""
from __future__ import annotations

import os
import pickle
from collections import Counter
from typing import Dict, List, Sequence, Tuple

import numpy as np

from openpvsg_tpu.data import rle as rle_codec


def write_masks_txt(path: str, results: Sequence[Tuple[int, List[Dict], List[int]]]):
    """results: per frame (frame_id, rles, track_ids) where each rle dict has
    'size', 'counts' and 'class_id'."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for frame_id, rles, track_ids in results:
            for rle, track_id in zip(rles, track_ids):
                if track_id < 0:
                    continue
                imh, imw = rle["size"]
                f.write(f"{frame_id} {track_id} {rle['class_id']} "
                        f"{imh} {imw} {rle['counts']}\n")


def read_masks_txt(path: str) -> List[Dict]:
    """-> list of {fid, tid, cid, rle} (masks NOT decoded)."""
    out = []
    with open(path, "r") as f:
        for line in f:
            frame_id, track_id, cid, h, w, counts = line.strip().split()
            out.append({
                "fid": int(frame_id), "tid": int(track_id), "cid": int(cid),
                "rle": {"size": (int(h), int(w)), "counts": counts},
            })
    return out


def get_pred_mask_tubes(path: str) -> Dict[int, Dict]:
    """masks.txt -> {track_id: {'cid': majority class, 'mask': [{frame_id-1:
    mask}, ...]}} (reference: utils/relation_matching.py:65-105; note the
    reference's frame ids in masks.txt are 1-based and shifted to 0-based
    here)."""
    entries = read_masks_txt(path)
    by_tid: Dict[int, List[Dict]] = {}
    for e in entries:
        by_tid.setdefault(e["tid"], []).append(e)
    tubes: Dict[int, Dict] = {}
    for tid, items in by_tid.items():
        class_ids = [it["cid"] for it in items]
        tube_class = Counter(class_ids).most_common(1)[0][0]
        mask_list = [{it["fid"] - 1: rle_codec.decode(it["rle"])} for it in items]
        tubes[tid] = {"cid": tube_class, "mask": mask_list}
    return tubes


def save_pickle(path: str, data):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)


def load_pickle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
