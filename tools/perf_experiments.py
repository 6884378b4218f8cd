"""TPU inference perf experiments (VERDICT r1 #4: chase the relayout/convert
tail — 8.0 ms/4-frame window measured, ~2-3 ms FLOP-bound estimate).

Variants of the flagship VPS forward, measured with the chained-iteration
harness from PERF.md (the axon tunnel does not honor block_until_ready):

  baseline      f32 params, bf16 compute (round-1 bench configuration)
  bf16_params   params pre-cast to bf16 once — removes per-use f32->bf16
                weight converts
  fast_norm     + LN/GN statistics computed in bf16
                (force_float32_reductions=False) — removes the
                convert_reduce_fusion ops (864 us/window in the r1 trace)

Usage: python tools/perf_experiments.py [--variants a,b,c] [--out FILE]
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


def measure(model, variables, x, on_tpu: bool) -> float:
    """ms per forward window (chained, short/long differenced)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(variables, images, iters):
        def body(i, carry):
            out = model.apply(variables, images + carry * 1e-12)
            return out["mask_preds"][-1].mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    n_short, n_long = (2, 22) if on_tpu else (1, 3)
    repeats = 5 if on_tpu else 1
    float(chain(variables, x, n_short))  # compile
    debug = bool(os.environ.get("PERF_DEBUG"))
    # median of per-repeat deltas: min() lets one noisy pair (b < a over
    # the ~25-30 ms tunnel floor) report an impossible 0
    deltas = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(variables, x, n_short))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(variables, x, n_long))
        b = time.perf_counter() - t0
        if debug:
            print(f"  pair: short={a * 1000:.2f} ms long={b * 1000:.2f} ms",
                  flush=True)
        deltas.append((b - a) / (n_long - n_short) * 1000)
    # tunnel-polluted pairs (long run "faster" than short) are invalid, not
    # zero-cost — drop them so the median can't collapse to 0 and divide the
    # subsequent fps computation (ADVICE r2); fail loudly if none survive
    valid = [d for d in deltas if d > 0]
    if not valid:
        raise RuntimeError(
            f"all {len(deltas)} timing pairs were tunnel-polluted "
            f"(non-positive deltas {deltas}); rerun when the tunnel is quiet")
    return float(np.median(valid))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="perf_experiments.json")
    p.add_argument("--variants", default="baseline,bf16_params,fast_norm")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.models.mask2former import Mask2Former

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        T, H, W = 4, 384, 480
        dtype = jnp.bfloat16
    else:
        T, H, W = 2, 96, 128
        dtype = jnp.float32

    cfg = mask2former_vps().model
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, T, H, W, 3)) * 0.5, jnp.float32)

    base_model = Mask2Former(cfg, dtype=dtype)
    v_f32 = base_model.init(jax.random.PRNGKey(0), x)
    v_cast = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, v_f32)

    report = {"shape": [T, H, W], "dtype": str(dtype.__name__),
              "platform": jax.devices()[0].platform}
    want = set(args.variants.split(","))

    if "baseline" in want:
        ms = measure(base_model, v_f32, x, on_tpu)
        report["baseline_ms"] = round(ms, 3)
        report["baseline_fps"] = round(T / (ms / 1000), 1)
        print("baseline:", report["baseline_ms"], "ms", flush=True)

    if "bf16_params" in want:
        ms = measure(base_model, v_cast, x, on_tpu)
        report["bf16_params_ms"] = round(ms, 3)
        report["bf16_params_fps"] = round(T / (ms / 1000), 1)
        print("bf16_params:", report["bf16_params_ms"], "ms", flush=True)

    if "fast_norm" in want:
        fn_model = Mask2Former(cfg, dtype=dtype, fast_norm=True)
        ms = measure(fn_model, v_f32, x, on_tpu)
        report["fast_norm_ms"] = round(ms, 3)
        report["fast_norm_fps"] = round(T / (ms / 1000), 1)
        print("fast_norm:", report["fast_norm_ms"], "ms", flush=True)

    if "fold_bn" in want:
        import dataclasses

        from openpvsg_tpu.models.resnet import fold_frozen_bn

        v_fold = fold_frozen_bn(v_f32)
        cfg_fold = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, norm="folded"))
        fold_model = Mask2Former(cfg_fold, dtype=dtype)
        ms = measure(fold_model, v_fold, x, on_tpu)
        report["fold_bn_ms"] = round(ms, 3)
        report["fold_bn_fps"] = round(T / (ms / 1000), 1)
        print("fold_bn:", report["fold_bn_ms"], "ms", flush=True)

    if "sep_maxpool" in want:
        # stem maxpool as separable shifted-slice maxima (bit-exact vs
        # nn.max_pool, verified incl. odd shapes) — reduce_window_max
        # measured 245 us vs a ~36 us bandwidth floor (PERF.md)
        import flax.linen as flax_nn

        def sep_maxpool_3x3s2(x, window, strides=None, padding=None):
            neg = -jnp.inf
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)),
                         constant_values=neg)
            r = jnp.maximum(jnp.maximum(xp[:, 0:-2:2], xp[:, 1:-1:2]),
                            xp[:, 2::2])
            rp = jnp.pad(r, ((0, 0), (0, 0), (1, 1), (0, 0)),
                         constant_values=neg)
            return jnp.maximum(
                jnp.maximum(rp[:, :, 0:-2:2], rp[:, :, 1:-1:2]),
                rp[:, :, 2::2])

        orig_pool = flax_nn.max_pool
        import openpvsg_tpu.models.resnet as resnet_mod

        resnet_mod.nn.max_pool = sep_maxpool_3x3s2
        try:
            ms = measure(Mask2Former(cfg, dtype=dtype), v_f32, x, on_tpu)
        finally:
            resnet_mod.nn.max_pool = orig_pool
        report["sep_maxpool_ms"] = round(ms, 3)
        report["sep_maxpool_fps"] = round(T / (ms / 1000), 1)
        print("sep_maxpool:", report["sep_maxpool_ms"], "ms", flush=True)

    if "t8" in want:
        # double window: per-frame cost should FALL if the model is
        # op-count-bound (fixed per-op cost amortized over 2x frames),
        # RISE if bandwidth-bound (the (Q,T,h,w) mask tensors double)
        T8 = T * 2
        x8 = jnp.asarray(
            rng.standard_normal((1, T8, H, W, 3)) * 0.5, jnp.float32)
        ms = measure(base_model, v_f32, x8, on_tpu)
        report["t8_ms"] = round(ms, 3)
        report["t8_fps"] = round(T8 / (ms / 1000), 1)
        print("t8:", report["t8_ms"], "ms", flush=True)

    if "fast_norm_bf16p" in want:
        fn_model = Mask2Former(cfg, dtype=dtype, fast_norm=True)
        ms = measure(fn_model, v_cast, x, on_tpu)
        report["fast_norm_bf16p_ms"] = round(ms, 3)
        report["fast_norm_bf16p_fps"] = round(T / (ms / 1000), 1)
        print("fast_norm_bf16p:", report["fast_norm_bf16p_ms"], "ms",
              flush=True)

    print(json.dumps(report))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
