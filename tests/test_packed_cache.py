"""Packed preprocessed-sample cache (data/packed.py): pack-time contents,
sampler parity with the PNG path's targets, and the --packed-cache train
CLI path (uint8 batches normalized in-step)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from openpvsg_tpu.config import DataConfig
from openpvsg_tpu.data.packed import (PackedSampler, PackedTrainCache,
                                      write_packed_cache)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H, W, T = 48, 64, 9
VID = "1001_pk0"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed_data")
    fdir = root / "vidor" / "frames" / VID
    mdir = root / "vidor" / "masks" / VID
    fdir.mkdir(parents=True)
    mdir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for t in range(T):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[8 + t:24 + t, 8:24] = 1   # moving thing
        mask[36:, :] = 2               # stuff
        Image.fromarray(img).save(fdir / f"{t:04d}.png")
        Image.fromarray(mask).save(mdir / f"{t:04d}.png")
    anno = {
        "objects": {"thing": ["person", "dog", "cat"],
                    "stuff": ["floor", "wall"]},
        "relations": ["on", "next-to"],
        "split": {"vidor": {"train": [VID], "val": []},
                  "epic_kitchen": {"train": [], "val": []},
                  "ego4d": {"train": [], "val": []}},
        "data": [{"video_id": VID, "meta": {},
                  "objects": [{"object_id": 1, "category": "dog"},
                              {"object_id": 2, "category": "floor"}],
                  "relations": [[1, 2, "on", [[0, T - 1]]]]}],
    }
    (root / "pvsg.json").write_text(json.dumps(anno))
    return str(root)


@pytest.fixture(scope="module")
def cache_dir(data_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cache") / "packed")
    write_packed_cache(os.path.join(data_root, "pvsg.json"), data_root,
                       "train", out, train_scale=(H, W))
    return out


def test_pack_contents(cache_dir, data_root):
    cache = PackedTrainCache(cache_dir)
    assert cache.index["total_frames"] == T
    assert len(cache.videos) == 1 and cache.videos[0]["video_id"] == VID
    # frames at native scale are stored verbatim (no resize applied)
    raw = np.asarray(Image.open(os.path.join(
        data_root, "vidor", "frames", VID, "0003.png")))
    np.testing.assert_array_equal(np.asarray(cache.frames[3]), raw)
    m = np.asarray(cache.masks[3])
    assert set(np.unique(m)) == {0, 1, 2}
    # LUT: object 1 -> dog (class 1), object 2 -> floor (class 3)
    np.testing.assert_array_equal(cache.luts[0],
                                  [cache.num_classes, 1, 3])


def test_sampler_matches_png_path_targets(cache_dir, data_root):
    """With augmentation pinned (flip_prob 0, crop == train_scale) the
    packed sampler's targets must equal the PNG path's decode."""
    from openpvsg_tpu.data.datasets import PVSGVideoDataset

    cfg = DataConfig(train_scale=(H, W), crop_size=(H, W), flip_prob=0.0,
                     pad_divisor=16)
    cache = PackedTrainCache(cache_dir)
    sampler = PackedSampler(cache, cfg, video=True, seed=0)
    ds = PVSGVideoDataset(os.path.join(data_root, "pvsg.json"), data_root,
                          "train", cfg.ref_seq_index)
    assert len(sampler) == len(ds) == T - 1
    for i in (0, 3, T - 2):
        s = sampler(i)
        item = ds[i]
        tgt = ds.clip_targets(item["pan_masks"], item["objects"])
        np.testing.assert_array_equal(s["gt_labels"], tgt["gt_labels"])
        ph, pw = sampler.ph, sampler.pw
        ref = np.pad(tgt["gt_mask_tubes"],
                     ((0, 0), (0, 0), (0, ph - H), (0, pw - W)))
        np.testing.assert_array_equal(s["gt_mask_tubes"], ref)
        assert s["images"].dtype == np.uint8
        np.testing.assert_array_equal(
            s["images"][:, :H, :W], item["imgs"])


def test_sampler_crop_flip_consistency(cache_dir):
    """Random crop/flip: image and mask must receive the same transform —
    verify by checking the thing instance's pixels line up."""
    cfg = DataConfig(train_scale=(H, W), crop_size=(32, 48), flip_prob=1.0,
                     pad_divisor=16)
    cache = PackedTrainCache(cache_dir)
    sampler = PackedSampler(cache, cfg, video=True, seed=3)
    s = sampler(2)
    assert s["images"].shape == (2, 32, 48, 3)
    assert s["gt_mask_tubes"].shape[2:] == (32, 48)
    # reconstruct: flipped+cropped frame pixels equal the packed frame's
    vi, fidx = sampler.index[2]
    raw = np.asarray(cache.frames[fidx])[:, :, ::-1]  # flip
    found = False
    for y in range(H - 32 + 1):
        for x in range(W - 48 + 1):
            if np.array_equal(raw[:, y:y + 32, x:x + 48], s["images"]):
                found = True
    assert found, "cropped images are not a window of the flipped frames"


def test_uint8_trainer_step_matches_float_path(cache_dir):
    """SegmenterTrainer on a uint8 batch must produce the same loss as the
    equivalent pre-normalized float batch."""
    import jax.random as jrandom

    from openpvsg_tpu.config import Mask2FormerConfig, TrainConfig
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=8,
        backbone=__import__("openpvsg_tpu.config", fromlist=["BackboneConfig"]
                            ).BackboneConfig(depth=26),
    )
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        pixel_decoder=dataclasses.replace(cfg.pixel_decoder,
                                          encoder_layers=1),
        decoder=dataclasses.replace(cfg.decoder, num_layers=2))
    mean, std = (123.675, 116.28, 103.53), (58.395, 57.12, 57.375)

    rng = np.random.default_rng(0)
    imgs8 = rng.integers(0, 255, (2, 1, 48, 64, 3), dtype=np.uint8)
    imgsf = (imgs8.astype(np.float32) - np.asarray(mean)) / np.asarray(std)
    batch = {
        "gt_labels": np.zeros((2, 3), np.int32),
        "gt_masks": rng.integers(0, 2, (2, 3, 1, 12, 16)).astype(np.uint8),
        "gt_valid": np.ones((2, 3), bool),
    }
    tr = SegmenterTrainer(cfg, TrainConfig(), example_shape=(1, 48, 64),
                          norm_mean=mean, norm_std=std)
    key = jrandom.PRNGKey(0)
    logs8 = tr.step({**batch, "images": imgs8}, key)
    tr2 = SegmenterTrainer(cfg, TrainConfig(), example_shape=(1, 48, 64))
    logsf = tr2.step({**batch, "images": imgsf.astype(np.float32)}, key)
    np.testing.assert_allclose(float(logs8["loss"]), float(logsf["loss"]),
                               rtol=1e-5)


def test_train_cli_packed(data_root, tmp_path):
    """tools/train.py --packed-cache end to end: pack, then one epoch."""
    work_dir = str(tmp_path / "work")
    cache = str(tmp_path / "cache")
    env = dict(os.environ, JAX_PLATFORMS="cpu", OPENPVSG_PLATFORM="cpu")
    common = [
        "--data-dir", data_root,
        "--anno-file", os.path.join(data_root, "pvsg.json"),
        "--work-dir", work_dir,
        "--set",
        "data.train_scale=48,64",
        "data.crop_size=48,64",
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pack_train_cache.py"),
         "--out", cache] + common,
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--config", "mask2former_ips", "--packed-cache", cache,
         "--epochs", "1", "--max-instances", "4"] + common + [
         "model.backbone.depth=26", "model.num_queries=8",
         "model.num_things_classes=3", "model.num_stuff_classes=2",
         "model.pixel_decoder.encoder_layers=1", "model.decoder.num_layers=2",
         "train.samples_per_gpu=4", "train.log_interval=1",
         "train.warmup_iters=1"],
        capture_output=True, text=True, timeout=850, env=env, cwd=REPO)
    assert proc.returncode == 0, (proc.stderr[-3000:], proc.stdout[-1000:])
    out_dir = os.path.join(work_dir, "mask2former_ips")
    assert any(d.startswith("epoch_") for d in os.listdir(out_dir))
