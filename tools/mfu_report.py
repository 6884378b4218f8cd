"""MFU / roofline accounting for the flagship paths (VERDICT r3 missing #4).

For (a) the VPS inference forward at the bench shape and (b) the B=4 VPS
train step, reports:

  - FLOPs and HBM bytes from XLA's post-fusion cost analysis of the exact
    compiled executable (jit .lower().compile().cost_analysis()), plus the
    executable's HBM footprint (memory_analysis),
  - measured wall time per call via the tunnel-safe chained harness
    (bench.py methodology: chained iterations inside one jit, scalar forced
    to host, short/long difference, median of pairs),
  - achieved TFLOP/s and GB/s vs device peaks -> MFU% and HBM-utilization%,
  - the roofline verdict: arithmetic intensity (flops/byte) vs the device
    ridge point (peak_flops / peak_bw) says which wall the path is on.

Optionally --calibrate measures the ACHIEVABLE ceilings on this rig (big
bf16 matmul for FLOP/s, big fp32 elementwise stream for GB/s) so the MFU
denominator can be the measured ceiling rather than the datasheet.

  python tools/mfu_report.py --mode both --calibrate --out mfu_r4.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.common  # noqa: F401  (OPENPVSG_PLATFORM handling)

# datasheet peaks per device kind (bf16 matmul TFLOP/s, HBM GB/s)
PEAKS = {
    "TPU v5 lite": (197.0, 819.0),   # v5e
    "TPU v5": (459.0, 1228.0),       # v5p
    "TPU v4": (275.0, 1228.0),
    "TPU v6 lite": (918.0, 1640.0),  # v6e / Trillium
    "cpu": (1.0, 50.0),              # placeholder so the tool runs anywhere
}


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    mem = compiled.memory_analysis()
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "hbm_args_mb": mem.argument_size_in_bytes / 1e6,
        "hbm_temp_mb": mem.temp_size_in_bytes / 1e6,
        "hbm_out_mb": mem.output_size_in_bytes / 1e6,
    }


def _timed_chain(make_chain, on_tpu: bool):
    """make_chain(iters) -> float scalar; returns seconds/iter via the
    short/long difference, median of pairs (PERF.md methodology)."""
    n_short, n_long = (2, 12) if on_tpu else (1, 3)
    make_chain(n_short)  # compile
    deltas = []
    for _ in range(5 if on_tpu else 1):
        t0 = time.perf_counter()
        make_chain(n_short)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        make_chain(n_long)
        tl = time.perf_counter() - t0
        deltas.append((tl - ts) / (n_long - n_short))
    return float(np.median(deltas))


def measure_infer(cfg, on_tpu: bool):
    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.models.mask2former import Mask2Former

    if on_tpu:
        T, H, W = 4, 384, 480
        dtype = jnp.bfloat16
    else:
        T, H, W = 2, 96, 128
        dtype = jnp.float32
    model = Mask2Former(cfg.model, dtype=dtype)
    x0 = jnp.zeros((1, T, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images)
        return out["mask_preds"][-1].mean().astype(jnp.float32)

    cost = _cost(jax.jit(forward).lower(variables, x0).compile())

    @jax.jit
    def chain(variables, images, iters):
        def body(i, carry):
            return forward(variables, images + carry * 1e-12)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((1, T, H, W, 3)) * .5,
                         jnp.float32)
    sec = _timed_chain(lambda n: float(chain(variables, images, n)), on_tpu)
    return {"shape": [1, T, H, W], "frames_per_call": T,
            "seconds_per_call": sec, **cost}


def measure_train(cfg, on_tpu: bool, batch: int = 4, n_instances: int = 20):
    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    if on_tpu:
        T, H, W = cfg.model.num_frames if cfg.model.video else 1, 384, 480
        N = n_instances  # 20 = the PERF.md r2/r3 operating point
    else:
        T, H, W = cfg.model.num_frames if cfg.model.video else 1, 96, 128
        N, batch = 4, 2
    trainer = SegmenterTrainer(cfg.model, cfg.train,
                               example_shape=(T, H, W))
    rng = np.random.default_rng(0)
    batch_d = {
        "images": jnp.asarray(
            rng.standard_normal((batch, T, H, W, 3)).astype(np.float32)),
        "gt_labels": jnp.asarray(
            rng.integers(0, cfg.model.num_classes, (batch, N)), jnp.int32),
        "gt_masks": jnp.asarray(
            rng.integers(0, 2, (batch, N, T, H // 4, W // 4))
            .astype(np.float32)),
        "gt_valid": jnp.ones((batch, N), bool),
    }
    key = jax.random.PRNGKey(0)
    cost = _cost(trainer._step_fn.lower(trainer.state, batch_d, key)
                 .compile())

    # timing: chain K steps through the donated TrainState, force the last
    # loss; subtract the short run (amortizes the D2H round-trip floor)
    def run(k):
        logs = None
        for _ in range(k):
            logs = trainer.step(batch_d, key)
        return float(logs["loss"])

    run(1)  # compile (already compiled above; warms dispatch)
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
    return {"shape": [batch, T, H, W], "clip_frames_per_step": batch * T,
            "seconds_per_call": sec, **cost}


def calibrate(on_tpu: bool):
    """Measured ceilings: big bf16 matmul (FLOP/s) + big elementwise stream
    (HBM GB/s)."""
    import jax
    import jax.numpy as jnp

    n = 8192 if on_tpu else 512

    @jax.jit
    def mm_chain(a, iters):
        def body(i, c):
            return (a @ (a + c * 1e-12)).mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    a = jnp.ones((n, n), jnp.bfloat16)
    sec = _timed_chain(lambda k: float(mm_chain(a, k)), on_tpu)
    mm_tflops = 2 * n ** 3 / sec / 1e12

    m = (1 << 28) if on_tpu else (1 << 20)  # 1 GiB fp32 on TPU

    @jax.jit
    def stream_chain(x, iters):
        def body(i, c):
            return (x + c).sum() * 1e-12  # reads 4m bytes, reduces
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    x = jnp.ones((m,), jnp.float32)
    sec = _timed_chain(lambda k: float(stream_chain(x, k)), on_tpu)
    stream_gbps = 4 * m / sec / 1e9
    return {"matmul_tflops": round(mm_tflops, 1),
            "stream_gbps": round(stream_gbps, 1)}


def main():
    p = argparse.ArgumentParser(description="MFU / roofline report")
    p.add_argument("--mode", default="both",
                   choices=["infer", "train", "both"])
    p.add_argument("--calibrate", action="store_true")
    p.add_argument("--train-instances", type=int, default=20,
                   help="padded GT instances N in the train batch (cost "
                        "scales with N via the dense QxN loss matrices)")
    p.add_argument("--peak-tflops", type=float, default=None)
    p.add_argument("--peak-gbps", type=float, default=None)
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="dotted config overrides, e.g. "
                        "model.match_downsample=2 (A/B of matching knobs)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    from openpvsg_tpu.config import (apply_overrides, mask2former_vps,
                                     parse_set_args)

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    kind = dev.device_kind if on_tpu else "cpu"
    peak_tflops, peak_gbps = PEAKS.get(kind, (197.0, 819.0))
    if args.peak_tflops:
        peak_tflops = args.peak_tflops
    if args.peak_gbps:
        peak_gbps = args.peak_gbps

    cfg = apply_overrides(mask2former_vps(), parse_set_args(args.set))
    if on_tpu:
        # match the serving/r3 operating point: bf16 compute (PERF.md r2/r3
        # train-step numbers are bf16; fp32 would halve the MXU rate and
        # make MFU incomparable)
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, backbone=dataclasses.replace(
                    cfg.model.backbone, dtype="bfloat16")))
    report = {"device_kind": kind, "peak_tflops_bf16": peak_tflops,
              "peak_hbm_gbps": peak_gbps,
              "ridge_flops_per_byte": round(1e3 * peak_tflops / peak_gbps,
                                            1)}
    if args.calibrate:
        report["calibration"] = calibrate(on_tpu)

    sections = []
    if args.mode in ("infer", "both"):
        sections.append(("infer", measure_infer(cfg, on_tpu)))
    if args.mode in ("train", "both"):
        sections.append(("train", measure_train(
            cfg, on_tpu, n_instances=args.train_instances)))

    for name, r in sections:
        sec = r["seconds_per_call"]
        r["achieved_tflops"] = round(r["flops"] / sec / 1e12, 2)
        r["achieved_gbps"] = round(r["bytes_accessed"] / sec / 1e9, 1)
        r["mfu_pct"] = round(100 * r["achieved_tflops"] / peak_tflops, 1)
        r["hbm_util_pct"] = round(100 * r["achieved_gbps"] / peak_gbps, 1)
        r["flops_per_byte"] = round(r["flops"] / max(r["bytes_accessed"], 1),
                                    1)
        r["bound"] = ("compute" if r["flops_per_byte"]
                      > 1e3 * peak_tflops / peak_gbps else "memory")
        r["ms_per_call"] = round(1e3 * sec, 2)
        del r["seconds_per_call"]
        report[name] = r

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
