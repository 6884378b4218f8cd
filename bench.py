"""Benchmark: Mask2Former VPS clip-inference throughput (frames/sec/chip).

The reference's only emitted throughput number is tracking fps
(models/unitrack/test_mots_from_mask2former.py:47-49); the BASELINE.json
north star is frames/sec/chip for VPS inference. This benchmark runs the
flagship Mask2Former-VPS R-50 forward (backbone + MSDeformAttn pixel decoder
+ 9-layer masked-attention decoder) at the PVSG eval resolution, bfloat16
compute, and reports processed frames per second on one chip.

Timing methodology: on this image's axon TPU tunnel, block_until_ready does
not synchronize, so iterations are chained inside one jitted lax.scan whose
carry feeds back into the input (defeating CSE) and the wall clock is closed
by forcing a scalar to host. Scan overhead is subtracted via a short run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 50 (the BASELINE.md target: ≥ 50 frames/sec/chip =
5-FPS source × 10 real-time factor).
"""
from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # the remote-compile tunnel occasionally drops a response mid-compile;
    # retry the whole measurement rather than losing the round's number
    last = None
    for attempt in range(3):
        try:
            return _run()
        except Exception as e:  # noqa: BLE001 — tunnel flakes are opaque
            last = e
            time.sleep(10)
    raise last


def _run():
    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = mask2former_vps().model
    on_tpu = jax.devices()[0].platform != "cpu"
    import os as _os
    if on_tpu and _os.environ.get("OPENPVSG_BENCH_FUSED_FPN") == "1":
        # A/B toggle for the fused stride-4 FPN Pallas kernel
        # (ops/pallas/fpn_kernel.py): standalone it wins 1.46 -> 0.85 ms,
        # but in-model it measured SLOWER (578 -> 547 f/s) — the pallas
        # boundary costs XLA's cross-chain fusions more than the kernel
        # saves, so it is NOT the serving default (see PERF.md r3).
        import dataclasses

        cfg = dataclasses.replace(
            cfg, pixel_decoder=dataclasses.replace(cfg.pixel_decoder,
                                                   fused_fpn=True))
    # PVSG eval resolution (360, 480) padded to /32 -> (384, 480);
    # CPU fallback uses a small shape so the bench still runs anywhere.
    if on_tpu:
        T, H, W = 4, 384, 480
        dtype = jnp.bfloat16
    else:
        T, H, W = 2, 96, 128
        dtype = jnp.float32

    model = Mask2Former(cfg, dtype=dtype)
    x0 = jnp.zeros((1, T, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    quant = _os.environ.get("OPENPVSG_BENCH_INT8") == "1"
    if quant:
        # A/B toggle for weights-only int8 serving (utils/quantize.py):
        # backbone + pixel-decoder kernels stored int8, dequantized in the
        # loop BODY with a carry-dependent scale so licm cannot hoist the
        # dequant out of the timing loop (see dequantize_tree docstring).
        from openpvsg_tpu.utils.quantize import (dequantize_tree,
                                                 quantize_tree_int8)

        variables, _n_q, _saved = quantize_tree_int8(
            variables, scopes=("backbone", "pixel_decoder"))

    @jax.jit
    def chain(variables, images, iters):
        def body(i, carry):
            v = variables
            if quant:
                v = dequantize_tree(variables, dtype,
                                    scale_mul=1.0 + carry * 0.0)
            out = model.apply(v, images + carry * 1e-12)
            return out["mask_preds"][-1].mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((1, T, H, W, 3)) * 0.5, jnp.float32)

    n_short, n_long = (2, 22) if on_tpu else (1, 4)
    float(chain(variables, images, n_short))  # compile once (dynamic count)
    # median of several pairs: the tunnel intermittently degrades to
    # seconds-per-call (PERF.md round 2) and a single polluted pair would
    # report garbage; the median of 5 rides out a transient
    deltas = []
    for _ in range(5 if on_tpu else 1):
        t0 = time.perf_counter()
        float(chain(variables, images, n_short))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(variables, images, n_long))
        t_long = time.perf_counter() - t0
        deltas.append((t_long - t_short) / (n_long - n_short))
    per_iter = float(np.median(deltas))
    frames_per_sec = T / per_iter
    target = 50.0  # BASELINE.md: >= 50 frames/sec/chip
    record = {
        "metric": "vps_inference_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 3),
        "unit": "frames/sec",
        "vs_baseline": round(frames_per_sec / target, 4),
    }
    if _os.environ.get("OPENPVSG_BENCH_TRAIN", "1") != "0":
        # default-on (VERDICT r3 weak #6: the BENCH artifact was
        # inference-only): training throughput at the PERF.md operating
        # point (B=4, T=2, N=20, bf16), extra keys on the same line.
        # Guarded: a train-side tunnel flake must not lose the round's
        # inference number. Adds a ~3-5 min train-step compile.
        try:
            record.update(_train_metric(on_tpu))
        except Exception as e:  # noqa: BLE001 — tunnel flakes are opaque
            record["train_metric_error"] = repr(e)[:200]
    print(json.dumps(record))


def _train_metric(on_tpu):
    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    cfg = mask2former_vps()
    if on_tpu:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, backbone=dataclasses.replace(
                    cfg.model.backbone, dtype="bfloat16")))
        B, N, H, W = 4, 20, 384, 480
    else:
        B, N, H, W = 2, 4, 96, 128
    T = cfg.model.num_frames
    trainer = SegmenterTrainer(cfg.model, cfg.train, example_shape=(T, H, W))
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((B, T, H, W, 3)).astype(np.float32)),
        "gt_labels": jnp.asarray(
            rng.integers(0, cfg.model.num_classes, (B, N)), jnp.int32),
        "gt_masks": jnp.asarray(
            rng.integers(0, 2, (B, N, T, H // 4, W // 4)).astype(np.float32)),
        "gt_valid": jnp.ones((B, N), bool),
    }
    key = jax.random.PRNGKey(0)

    def run(k):
        logs = None
        for _ in range(k):
            logs = trainer.step(batch, key)  # chains through donated state
        return float(logs["loss"])

    run(1)
    deltas = []
    n_short, n_long = (2, 10) if on_tpu else (1, 3)
    for _ in range(5 if on_tpu else 1):
        t0 = time.perf_counter()
        run(n_short)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n_long)
        tl = time.perf_counter() - t0
        deltas.append((tl - ts) / (n_long - n_short))
    sec = float(np.median(deltas))
    return {"train_ms_per_step": round(1e3 * sec, 2),
            "train_clip_frames_per_sec_per_chip": round(B * T / sec, 2),
            "train_batch": [B, T, H, W], "train_instances": N}


if __name__ == "__main__":
    main()
