"""CLI integration test: end2end_inference on the synthetic micro-dataset
with a tiny random-weight model, exercising argument parsing, config
overrides, and the full stage chain through the actual tool entrypoint."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W, T = 48, 48, 4
VID = "1000_cli0"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    fdir = root / "vidor" / "frames" / VID
    mdir = root / "vidor" / "masks" / VID
    fdir.mkdir(parents=True)
    mdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(T):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[8:20, 8:20] = 1
        mask[32:, :] = 2
        Image.fromarray(img).save(fdir / f"{t:04d}.png")
        Image.fromarray(mask).save(mdir / f"{t:04d}.png")
    anno = {
        "objects": {"thing": ["person", "dog", "cat"], "stuff": ["floor", "wall"]},
        "relations": ["on", "next-to", "holding"],
        "split": {"vidor": {"train": [VID], "val": [VID]},
                  "epic_kitchen": {"train": [], "val": []},
                  "ego4d": {"train": [], "val": []}},
        "data": [{"video_id": VID, "meta": {},
                  "objects": [{"object_id": 1, "category": "dog"},
                              {"object_id": 2, "category": "floor"}],
                  "relations": [[1, 2, "on", [[0, T - 1]]]]}],
    }
    (root / "pvsg.json").write_text(json.dumps(anno))
    return str(root)


def test_end2end_cli(data_root, tmp_path):
    out_dir = str(tmp_path / "e2e")
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENPVSG_PLATFORM="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "end2end_inference.py"),
        "--config", "mask2former_vps",
        "--data-dir", data_root,
        "--anno-file", os.path.join(data_root, "pvsg.json"),
        "--out-dir", out_dir,
        "--ps-type", "vps",
        "--split", "val",
        "--set",
        "model.backbone.depth=26",
        "model.num_queries=8",
        "model.num_things_classes=3",
        "model.num_stuff_classes=2",
        "model.pixel_decoder.encoder_layers=1",
        "model.decoder.num_layers=3",
        "model.object_mask_thr=0.01",
        "model.iou_thr=0.1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    vid_dir = os.path.join(out_dir, VID)
    assert os.path.exists(os.path.join(vid_dir, "quantitive", "masks.txt"))
    assert os.path.exists(os.path.join(vid_dir, "query_feats.pickle"))
    assert os.path.exists(os.path.join(vid_dir, "triplets.json"))
