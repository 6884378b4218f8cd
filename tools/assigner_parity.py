"""Assigner training parity: hungarian (host) vs lapjv (on-device exact,
the 'auto' TPU default since r3) vs greedy (on-device approximation)
(VERDICT r1 #5 / r2 weak #3).

Trains the same tiny IPS model on identical synthetic batches with each
assigner and compares loss curves and final PQ, on the CPU mesh where the
host-callback Hungarian is available as ground truth.

Usage: python tools/assigner_parity.py [--steps 120] [--out FILE]
(runs on CPU regardless of platform: Hungarian needs host callbacks)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def tiny_cfg(assigner: str):
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)

    return Mask2FormerConfig(
        num_things_classes=5, num_stuff_classes=3, num_queries=12,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=64),
        decoder=TransformerDecoderConfig(num_layers=3, ffn_channels=64),
        assigner=assigner,
        object_mask_thr=0.3, iou_thr=0.5)


def build_batches(data_root: str, n_steps: int, batch: int, seed: int):
    """Fixed batch sequence shared by both runs (identical data order)."""
    from openpvsg_tpu.data.datasets import PVSGImageDataset

    ds = PVSGImageDataset(os.path.join(data_root, "pvsg.json"), data_root,
                          "train")
    rng = np.random.default_rng(seed)
    H, W = ds[0]["img"].shape[:2]
    hm, wm = H // 4, W // 4
    N = 6
    batches = []
    for _ in range(n_steps):
        idxs = rng.integers(0, len(ds), batch)
        images = np.zeros((batch, 1, H, W, 3), np.float32)
        gt_labels = np.zeros((batch, N), np.int32)
        gt_masks = np.zeros((batch, N, 1, hm, wm), np.uint8)
        gt_valid = np.zeros((batch, N), bool)
        for i, idx in enumerate(idxs):
            item = ds[int(idx)]
            img = item["img"].astype(np.float32)
            mean = np.asarray((123.675, 116.28, 103.53), np.float32)
            std = np.asarray((58.395, 57.12, 57.375), np.float32)
            images[i, 0] = (img - mean) / std
            # dataset items carry decoded GT (gt_labels / gt_masks) directly
            n = min(len(item["gt_labels"]), N)
            gt_labels[i, :n] = item["gt_labels"][:n]
            gt_valid[i, :n] = True
            for j in range(n):
                gt_masks[i, j, 0] = item["gt_masks"][j][::4, ::4][:hm, :wm]
        batches.append({"images": images, "gt_labels": gt_labels,
                        "gt_masks": gt_masks, "gt_valid": gt_valid})
    return ds, batches


def run(assigner: str, batches, data_root: str):
    from openpvsg_tpu.config import TrainConfig
    from openpvsg_tpu.data.datasets import PVSGImageDataset
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    cfg = tiny_cfg(assigner)
    H, W = batches[0]["images"].shape[2:4]
    trainer = SegmenterTrainer(
        cfg, TrainConfig(seed=0, lr=5e-4, warmup_iters=10),
        steps_per_epoch=len(batches), example_shape=(1, H, W))
    key = jax.random.PRNGKey(42)
    losses = []
    for b in batches:
        key, sub = jax.random.split(key)
        logs = trainer.step(b, sub)
        losses.append(float(logs["loss"]))

    # eval PQ on the train split (synthetic videos have random palettes, so
    # cross-video generalization is meaningless — the question is whether the
    # assigner let the model learn the task at all)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    seg = SegmenterInference(cfg, variables)
    ds = PVSGImageDataset(os.path.join(data_root, "pvsg.json"), data_root,
                          "train")
    results = []
    for lo in range(0, len(ds), 8):
        frames = np.stack([ds[i]["img"]
                           for i in range(lo, min(lo + 8, len(ds)))])
        results.extend(o["pan_results"]
                       for o in seg.infer_frames_ips(frames))
    metrics = ds.evaluate(results)
    return losses, {k: float(v) for k, v in metrics.items()
                    if k != "per_class"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--out", default="assigner_parity.json")
    p.add_argument("--data-root", default="/tmp/pvsg_assigner_parity")
    p.add_argument("--only", default=None,
                   help="internal: run one assigner and emit its fragment")
    args = p.parse_args()

    from openpvsg_tpu.data.synthetic import make_dataset

    if not os.path.exists(os.path.join(args.data_root, "pvsg.json")):
        make_dataset(args.data_root, n_train=3, n_val=1, n_frames=10,
                     h=96, w=96, seed=0)

    if args.only:
        _, batches = build_batches(args.data_root, args.steps, args.batch,
                                   seed=1)
        losses, metrics = run(args.only, batches, args.data_root)
        frag = {
            "loss_first10": round(float(np.mean(losses[:10])), 4),
            "loss_last10": round(float(np.mean(losses[-10:])), 4),
            "loss_curve_every10": [round(l, 3) for l in losses[::10]],
            **{k: round(v, 4) for k, v in metrics.items()},
        }
        with open(f"{args.out}.{args.only}", "w") as f:
            json.dump(frag, f)
        print(args.only, json.dumps(frag), flush=True)
        return

    import subprocess
    import sys

    report = {"steps": args.steps, "batch": args.batch}
    # lapjv (r3): the on-device EXACT assigner that 'auto' now picks on
    # TPU — expected to track hungarian step-for-step (same optimum, ties
    # aside), with greedy as the documented approximation. One SUBPROCESS
    # per assigner: executables leak across in-process runs — a stale
    # pure_callback (hungarian) executable gets hit by the callback-free
    # lapjv program and dies with "supplied 631 buffers but compiled
    # program expected 635" (jax.clear_caches() does not prevent it).
    for assigner in ("hungarian", "lapjv", "greedy"):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--only", assigner, "--steps", str(args.steps),
             "--batch", str(args.batch), "--out", args.out,
             "--data-root", args.data_root],
            check=True, env=dict(os.environ, OPENPVSG_PLATFORM="cpu"))
        with open(f"{args.out}.{assigner}") as f:
            report[assigner] = json.load(f)
        os.remove(f"{args.out}.{assigner}")

    h = report["hungarian"]
    report["delta"] = {}
    for name in ("lapjv", "greedy"):
        g = report[name]
        report["delta"][name] = {
            "final_loss_rel": round((g["loss_last10"] - h["loss_last10"])
                                    / max(abs(h["loss_last10"]), 1e-9), 4),
            "pq_abs": round(g.get("PQ", 0.0) - h.get("PQ", 0.0), 4),
        }
    print(json.dumps(report["delta"]))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
