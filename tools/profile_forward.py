"""Profile the flagship VPS forward on device and print the op-time
breakdown (the PERF.md table generator).

Runs N chained iterations under jax.profiler (works through the axon
tunnel), parses the trace.json.gz, and aggregates device-stream op durations
by fusion category and by op name.

Usage: python tools/profile_forward.py [--iters 12] [--out trace_dir]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("OPENPVSG_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["OPENPVSG_PLATFORM"])


def classify(name: str) -> str:
    n = name.lower()
    if "convolution" in n or n.startswith("conv"):
        return "convolution"
    if "convert" in n:
        return "convert"
    if n.startswith("copy") or "copy" in n or "transpose" in n:
        return "copy/relayout"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "dot"
    if "reduce_window" in n:
        return "reduce_window"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter"
    return "other"


def parse_trace(log_dir: str, iters: int):
    paths = glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {log_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device-stream events only: pid names containing TPU/device core
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in trace["traceEvents"] if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    cat_us = collections.Counter()
    cat_n = collections.Counter()
    op_us = collections.Counter()
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        c = classify(e.get("name", ""))
        cat_us[c] += e["dur"]
        cat_n[c] += 1
        op_us[e.get("name", "?")[:70]] += e["dur"]
    return cat_us, cat_n, op_us


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--out", default="/tmp/pvsg_trace")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--train", action="store_true",
                   help="profile the PERF.md training step (B=4 two-frame "
                        "clips, bf16, dense losses) instead of inference")
    p.add_argument("--relation", action="store_true",
                   help="profile the relation-head grad step at the PERF.md "
                        "reference bucket (100 tubes, 900 frames, 50 pairs)")
    p.add_argument("--batch", type=int, default=0,
                   help="--train only: override the clip batch size "
                        "(default 4 on TPU; sweep to measure per-sample "
                        "amortization of the fixed per-step costs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.models.mask2former import Mask2Former

    on_tpu = jax.devices()[0].platform != "cpu"
    T, H, W = (4, 384, 480) if on_tpu else (2, 96, 128)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = mask2former_vps().model
    rng = np.random.default_rng(0)

    if args.relation:
        from openpvsg_tpu.config import RelationHeadConfig
        from openpvsg_tpu.models.relation.heads import RelationModel
        from openpvsg_tpu.train.relation import make_train_step

        rcfg = RelationHeadConfig()
        N, TT, P, R = ((100, 900, 50, rcfg.num_relations) if on_tpu
                       else (20, 128, 10, rcfg.num_relations))
        model = RelationModel.from_config(rcfg)
        feats0 = jnp.zeros((N, TT, rcfg.d_model))
        pair0 = jnp.zeros((P, TT, 2 * rcfg.d_model))
        params = model.init(jax.random.PRNGKey(0), feats0, pair0)["params"]
        grad_step = make_train_step(model, np.ones(R, np.float32))
        batch = {
            "feats": jnp.asarray(
                rng.standard_normal((N, TT, rcfg.d_model)), jnp.float32),
            "tube_valid": jnp.ones((N,), bool),
            "frame_valid": jnp.ones((TT,), bool),
            "pair_idx": jnp.asarray(
                rng.integers(0, N, (P, 2)), jnp.int32),
            "pair_valid": jnp.ones((P,), bool),
            "gt_matrix": jnp.asarray(
                rng.random((N, N)) < 0.05, jnp.float32),
            "gt_span": jnp.asarray(
                rng.random((P, TT, R)) < 0.02, jnp.float32),
            "gt_prob": jnp.asarray(rng.random((P, R)) < 0.1, jnp.float32),
        }
        float(grad_step(params, batch)[0])  # compile + warmup
        jax.profiler.start_trace(args.out)
        for _ in range(args.iters):
            loss = grad_step(params, batch)[0]
        float(loss)
        jax.profiler.stop_trace()
    elif args.train:
        import dataclasses

        from openpvsg_tpu.config import TrainConfig
        from openpvsg_tpu.train.segmenter import SegmenterTrainer

        B, T = (4, 2) if on_tpu else (2, 2)
        if args.batch:
            B = args.batch
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(
                cfg.backbone,
                dtype="bfloat16" if on_tpu else "float32"))
        trainer = SegmenterTrainer(cfg, TrainConfig(),
                                   example_shape=(T, H, W))
        N = 8
        batch = {
            "images": jnp.asarray(
                rng.standard_normal((B, T, H, W, 3)) * 0.5, jnp.float32),
            "gt_labels": jnp.asarray(
                rng.integers(0, cfg.num_classes, (B, N)), jnp.int32),
            "gt_masks": jnp.asarray(
                rng.random((B, N, T, H // 4, W // 4)) < 0.2, jnp.uint8),
            "gt_valid": jnp.ones((B, N), bool),
        }
        key = jax.random.PRNGKey(0)
        trainer.step(batch, key)  # compile + warmup
        jax.profiler.start_trace(args.out)
        for _ in range(args.iters):
            trainer.step(batch, key)
        # force completion: pull a scalar
        float(jax.tree_util.tree_leaves(trainer.state.params)[0].ravel()[0])
        jax.profiler.stop_trace()
    else:
        model = Mask2Former(cfg, dtype=dtype)
        x = jnp.asarray(
            rng.standard_normal((1, T, H, W, 3)) * 0.5, jnp.float32)
        v = model.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def chain(v, x, iters):
            def body(i, c):
                out = model.apply(v, x + c * 1e-12)
                return out["mask_preds"][-1].mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(chain(v, x, 2))  # compile
        jax.profiler.start_trace(args.out)
        float(chain(v, x, args.iters))
        jax.profiler.stop_trace()

    cat_us, cat_n, op_us = parse_trace(args.out, args.iters)
    total = sum(cat_us.values())
    print(f"\n== device op time by category ({args.iters} iters, "
          f"{total / args.iters:.0f} us/iter total) ==")
    for c, us in cat_us.most_common():
        print(f"{c:<18} {us / args.iters:8.0f} us/iter  "
              f"({cat_n[c] / args.iters:6.1f} ops/iter)")
    print(f"\n== top {args.top} ops ==")
    for name, us in op_us.most_common(args.top):
        print(f"{us / args.iters:8.0f} us/iter  {name}")


if __name__ == "__main__":
    main()
