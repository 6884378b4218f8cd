"""Measure steady-state stage-1 training step time INCLUDING host data work
(VERDICT r3 missing #2): device-only step vs PNG-decode-per-step loader vs
the packed preprocessed cache (data/packed.py).

Timing discipline for the axon tunnel (CLAUDE.md): steps chain through the
donated TrainState, so fetching the LAST step's loss scalar forces the whole
chain; one D2H round-trip is amortized over --steps. Warmup steps run first
so compile time never pollutes the measurement.

  python tools/bench_input_pipeline.py --config mask2former_ips \
      --data-dir data --anno-file data/pvsg.json \
      --packed-cache work_dirs/packed_train --steps 30 --out pipeline.json
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config, reject_unused_n_time,
                          setup_logging)
from tools.train import pad_targets


def main():
    parser = base_parser("Benchmark the training input pipeline")
    parser.add_argument("--packed-cache", default=None, metavar="DIR",
                        help="also benchmark the packed-cache path")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--batch", type=int, default=None,
                        help="global batch (default: the train tool's rule)")
    parser.add_argument("--max-instances", type=int, default=40)
    parser.add_argument("--num-workers", type=int, default=None)
    parser.add_argument("--skip-png", action="store_true",
                        help="skip the PNG-path measurement (slow)")
    parser.add_argument("--only", default=None,
                        help="comma list of device,png,packed — run only "
                             "these sections. NOTE for axon: mixing the "
                             "f32 and uint8 train-step executables in ONE "
                             "process panics the tunnel client (same "
                             "family as the r3 executable-cache collision; "
                             "see PERF.md r4) — run packed in its own "
                             "process")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.data.datasets import PVSGImageDataset, PVSGVideoDataset
    from openpvsg_tpu.data.loader import PrefetchLoader
    from openpvsg_tpu.data.masks import decode_palette_mask
    from openpvsg_tpu.data.pipeline import (TrainAugmentor, pad_to_divisor,
                                            preprocess_clip)
    from openpvsg_tpu.parallel.mesh import make_mesh
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    logger = setup_logging(cfg.data.work_dir, "bench_input_pipeline")
    video = cfg.model.video
    T = cfg.model.num_frames if video else 1
    ch, cw = cfg.data.crop_size
    ph, pw = pad_to_divisor(ch, cw, cfg.data.pad_divisor)
    n_dev = len(jax.devices())
    batch = args.batch or max(cfg.train.samples_per_gpu // 4, n_dev)
    batch = (batch // n_dev) * n_dev or n_dev
    num_workers = args.num_workers or cfg.data.num_workers
    mesh = make_mesh(n_data=n_dev) if n_dev > 1 else None

    trainer = SegmenterTrainer(cfg.model, cfg.train, mesh=mesh,
                               example_shape=(T, ph, pw),
                               norm_mean=tuple(cfg.data.mean),
                               norm_std=tuple(cfg.data.std))
    key = jax.random.PRNGKey(0)
    seed = cfg.train.seed

    # --- sample makers (mirrors tools/train.py) ---------------------------
    if video:
        dataset = PVSGVideoDataset(cfg.data.anno_file, cfg.data.data_dir,
                                   "train", cfg.data.ref_seq_index)
    else:
        dataset = PVSGImageDataset(cfg.data.anno_file, cfg.data.data_dir,
                                   "train")
    aug = TrainAugmentor(cfg.data, seed)

    def make_sample_png(idx: int):
        item = dataset[int(idx)]
        frames = item["imgs"] if video else item["img"][None]
        pans = item.get("pan_masks")
        if pans is None and "pan_mask" in item:
            pans = item["pan_mask"][None]
        if pans is None:
            return None
        for _ in range(10):
            params = aug.sample(frames.shape[1:3])
            masks_t = aug.apply_to_masks(pans, params)
            if aug.check_match(masks_t):
                break
        oh, ow = cfg.data.train_scale
        imgs = np.asarray(preprocess_clip(
            jnp.asarray(frames), oh, ow, params["flip"],
            jnp.int32(params["crop_y"]), jnp.int32(params["crop_x"]),
            ch, cw, ph, pw, tuple(cfg.data.mean), tuple(cfg.data.std)))
        if video:
            tgt = dataset.clip_targets(masks_t, item["objects"])
        else:
            d = decode_palette_mask(masks_t[0], item["objects"],
                                    dataset.class_index, dataset.num_classes)
            tgt = {"gt_labels": d["gt_labels"],
                   "gt_mask_tubes": d["gt_masks"][:, None]}
        mt = tgt["gt_mask_tubes"]
        if mt.shape[0]:
            mt = np.pad(mt, ((0, 0), (0, 0), (0, ph - ch), (0, pw - cw)))
        if not len(tgt["gt_labels"]):
            return None
        return {"images": imgs, "gt_labels": tgt["gt_labels"],
                "gt_mask_tubes": mt}

    only = set(args.only.split(",")) if args.only else None

    makers = {}
    if (only is None or "png" in only) and not args.skip_png:
        makers["png"] = (make_sample_png, len(dataset))
    if args.packed_cache and (only is None or "packed" in only):
        from openpvsg_tpu.data.packed import PackedSampler, PackedTrainCache
        cache = PackedTrainCache(args.packed_cache)
        sampler = PackedSampler(cache, cfg.data, video=video, seed=seed)

        def make_sample_packed(idx: int):
            s = sampler(int(idx))
            return s if (s is not None and len(s["gt_labels"])) else None

        makers["packed"] = (make_sample_packed, len(sampler))

    collate = lambda ss: pad_targets(ss, args.max_instances)
    rng = np.random.default_rng(seed)

    def run_loader(make_sample, n_samples, n_steps):
        """Feed the trainer n_steps batches through the PrefetchLoader,
        cycling epochs; returns wall seconds for the final n_steps (after
        warmup) with the chain forced once at the end."""
        done = 0
        t0 = None
        while done < args.warmup + n_steps:
            order = rng.permutation(n_samples)
            loader = PrefetchLoader(make_sample, order, batch, collate,
                                    num_workers=num_workers)
            for b in loader:
                logs = trainer.step(b, key)
                done += 1
                if done == args.warmup:
                    float(logs["loss"])          # force everything so far
                    t0 = time.perf_counter()
                if done == args.warmup + n_steps:
                    break
            if t0 is None and done >= args.warmup:
                float(logs["loss"])
                t0 = time.perf_counter()
        final = float(logs["loss"])              # forces the whole chain
        return time.perf_counter() - t0, final

    results = {"batch": batch, "steps": args.steps, "T": T,
               "crop": [ch, cw], "pad": [ph, pw], "n_dev": n_dev,
               "platform": jax.devices()[0].platform}

    # --- device-only: one staged batch reused every step -------------------
    if makers:
        mk, n = next(iter(makers.values()))
    else:  # --only device with --skip-png: stage from the packed cache
        from openpvsg_tpu.data.packed import PackedSampler, PackedTrainCache
        _c = PackedTrainCache(args.packed_cache)
        _s = PackedSampler(_c, cfg.data, video=video, seed=seed)
        mk, n = (lambda i: _s(int(i))), len(_s)
    samples = []
    i = 0
    while len(samples) < batch and i < n:
        s = mk(i)
        if s is not None:
            samples.append(s)
        i += 1
    while len(samples) < batch:
        samples.append(samples[len(samples) % max(len(samples), 1)])
    staged = collate(samples)
    if only is None or "device" in only:
        for _ in range(args.warmup):
            logs = trainer.step(staged, key)
        float(logs["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logs = trainer.step(staged, key)
        float(logs["loss"])
        dev_s = time.perf_counter() - t0
        results["device_only_ms_per_step"] = round(
            1e3 * dev_s / args.steps, 2)
        logger.info(
            f"device-only: {results['device_only_ms_per_step']} ms/step "
            f"(includes per-step H2D of the host batch)")

    # --- loader-fed -------------------------------------------------------
    for name, (mk, n) in makers.items():
        wall, loss = run_loader(mk, n, args.steps)
        ms = 1e3 * wall / args.steps
        results[f"{name}_ms_per_step"] = round(ms, 2)
        if "device_only_ms_per_step" in results:
            results[f"{name}_overhead_pct"] = round(
                100 * (ms - results["device_only_ms_per_step"])
                / results["device_only_ms_per_step"], 1)
        logger.info(f"{name}: {ms:.2f} ms/step (loss {loss:.3f})")

    # --- host-only sample cost (no device work) ----------------------------
    for name, (mk, n) in makers.items():
        t0 = time.perf_counter()
        cnt = min(n, 4 * batch)
        for i in range(cnt):
            mk(i % n)
        results[f"{name}_host_ms_per_sample"] = round(
            1e3 * (time.perf_counter() - t0) / cnt, 2)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
