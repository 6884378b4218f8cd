"""Training CLI integration: a few real optimizer steps of the segmenter
through tools/train.py on the synthetic micro-dataset (CPU), verifying the
full stage-1 path — dataset, augmentation, padding, jitted DP step,
checkpoint save."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 9 frames: the global batch on the virtual 8-device mesh is
# max(samples_per_gpu//4, 8) = 8; the IPS dataset yields one sample per
# frame and the VPS dataset one 2-frame clip per start frame (T-1 = 8) —
# fewer samples than devices would mean zero batches per epoch.
H, W, T = 64, 64, 9
VID = "1000_tr0"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    fdir = root / "vidor" / "frames" / VID
    mdir = root / "vidor" / "masks" / VID
    fdir.mkdir(parents=True)
    mdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(T):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[10:30, 10:30] = 1
        mask[40:, :] = 2
        Image.fromarray(img).save(fdir / f"{t:04d}.png")
        Image.fromarray(mask).save(mdir / f"{t:04d}.png")
    anno = {
        "objects": {"thing": ["person", "dog", "cat"], "stuff": ["floor", "wall"]},
        "relations": ["on", "next-to"],
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


@pytest.mark.parametrize("preset", ["mask2former_ips", "mask2former_vps"])
def test_train_cli_steps(data_root, tmp_path, preset):
    work_dir = str(tmp_path / "work" / preset)
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENPVSG_PLATFORM="cpu")
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train.py"),
        "--config", preset,
        "--data-dir", data_root,
        "--anno-file", os.path.join(data_root, "pvsg.json"),
        "--work-dir", work_dir,
        "--epochs", "1",
        "--max-instances", "4",
        "--set",
        "model.backbone.depth=26",
        "model.num_queries=8",
        "model.num_things_classes=3",
        "model.num_stuff_classes=2",
        "model.pixel_decoder.encoder_layers=1",
        "model.decoder.num_layers=2",
        "data.train_scale=48,64",
        "data.crop_size=48,64",
        "train.samples_per_gpu=4",
        "train.log_interval=1",
        "train.warmup_iters=1",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=850,
                          env=env, cwd=REPO)
    assert proc.returncode == 0, (proc.stderr[-3000:], proc.stdout[-1000:])
    ckpts = [d for d in os.listdir(os.path.join(work_dir, preset))
             if d.startswith("epoch_")]
    assert ckpts, f"no checkpoint saved; {os.listdir(os.path.join(work_dir, preset))}"


def test_train_cli_auto_resume_continues_epochs(data_root, tmp_path):
    """--auto-resume must CONTINUE at the epoch after the newest checkpoint
    (r4: resume previously restored state.step but replayed every epoch
    from 0, retraining — and overwriting — completed checkpoints)."""
    work_dir = str(tmp_path / "work" / "resume")
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENPVSG_PLATFORM="cpu")

    def run(epochs):
        cmd = [
            sys.executable, os.path.join(REPO, "tools", "train.py"),
            "--config", "mask2former_ips",
            "--data-dir", data_root,
            "--anno-file", os.path.join(data_root, "pvsg.json"),
            "--work-dir", work_dir,
            "--epochs", str(epochs),
            "--max-instances", "4",
            "--auto-resume",
            "--set",
            "model.backbone.depth=26", "model.num_queries=8",
            "model.num_things_classes=3", "model.num_stuff_classes=2",
            "model.pixel_decoder.encoder_layers=1",
            "model.decoder.num_layers=2", "data.train_scale=48,64",
            "data.crop_size=48,64", "train.samples_per_gpu=4",
            "train.log_interval=1", "train.warmup_iters=1",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=850, env=env, cwd=REPO)
        assert proc.returncode == 0, (proc.stderr[-3000:],
                                      proc.stdout[-1000:])
        return proc.stderr + proc.stdout

    run(1)
    ck = os.path.join(work_dir, "mask2former_ips")
    assert os.path.isdir(os.path.join(ck, "epoch_1"))
    mtime1 = os.path.getmtime(os.path.join(ck, "epoch_1"))
    out = run(2)
    assert "resumed from" in out and "epoch 1)" in out, out[-2000:]
    # epoch 0 was NOT replayed: epoch_1 untouched, epoch_2 created, and
    # the second run logged only epoch-1 steps
    assert os.path.isdir(os.path.join(ck, "epoch_2"))
    assert os.path.getmtime(os.path.join(ck, "epoch_1")) == mtime1
    assert "epoch 0 step" not in out


def test_config_roundtrip_all_presets(tmp_path):
    """save_config/load_config_file must reproduce every preset exactly
    (json has no tuples — sequence fields are re-tupled on load)."""
    from openpvsg_tpu.config import (PRESETS, apply_overrides, get_config,
                                     load_config_file, save_config)

    for name in PRESETS:
        cfg = get_config(name)
        cfg = apply_overrides(cfg, {"model.num_queries": 7})
        p = str(tmp_path / f"{name}.json")
        save_config(cfg, p)
        restored = load_config_file(p)
        assert restored == cfg, name
        assert get_config(p) == cfg  # --config <path> route


def test_missing_config_json_raises_file_not_found(tmp_path):
    """A .json --config is always a path; a missing one must raise
    FileNotFoundError, not fall through to 'unknown preset'."""
    from openpvsg_tpu.config import get_config

    with pytest.raises(FileNotFoundError, match="does not exist"):
        get_config(str(tmp_path / "nope.json"))
