"""Measure the fused stride-4 FPN Pallas kernel vs the XLA chain on the
real chip at serving shapes (PERF.md floor analysis; VERDICT r2 #5).

Chained-iteration timing (the axon tunnel ignores block_until_ready —
CLAUDE.md): N iterations inside one jit, output perturbs the next input to
defeat CSE; short/long difference cancels the dispatch floor; median of
pairs rejects tunnel pollution.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="fpn_kernel_tpu.json")
    ap.add_argument("--tile-h", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.ops.pallas.fpn_kernel import (fused_fpn_stride4,
                                                    xla_fpn_stride4)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        B, H, W, Cin, C, Cout, G = 4, 96, 120, 256, 256, 256, 32
        cd = jnp.bfloat16
    else:
        B, H, W, Cin, C, Cout, G = 2, 32, 40, 96, 64, 48, 8
        cd = jnp.float32

    rng = np.random.default_rng(0)
    p = {
        "w_lat": rng.standard_normal((1, 1, Cin, C)) * 0.1,
        "b_lat": rng.standard_normal(C) * 0.1,
        "gn1_scale": rng.standard_normal(C) * 0.5 + 1.0,
        "gn1_bias": rng.standard_normal(C) * 0.1,
        "w_out": rng.standard_normal((3, 3, C, C)) * 0.05,
        "b_out": rng.standard_normal(C) * 0.1,
        "gn2_scale": rng.standard_normal(C) * 0.5 + 1.0,
        "gn2_bias": rng.standard_normal(C) * 0.1,
        "w_mask": rng.standard_normal((1, 1, C, Cout)) * 0.1,
        "b_mask": rng.standard_normal(Cout) * 0.1,
    }
    p = {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
    f0 = jnp.asarray(rng.standard_normal((B, H, W, Cin)) * 0.5, jnp.float32)
    s8 = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)) * 0.5,
                     jnp.float32)

    def chain(fn):
        def run(f0, s8, iters):
            def body(_, carry):
                out = fn(f0 + carry * 1e-12, s8, p)
                return out.mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return jax.jit(run, static_argnums=2)

    fused = chain(lambda a, b, pp: fused_fpn_stride4(
        a, b, pp, num_groups=G, tile_h=args.tile_h, compute_dtype=cd,
        interpret=not on_tpu))
    ref = chain(lambda a, b, pp: xla_fpn_stride4(
        a, b, pp, num_groups=G, compute_dtype=cd))

    n_short, n_long = (3, 33) if on_tpu else (1, 3)
    repeats = 5 if on_tpu else 2

    results = {}
    for name, f in (("xla", ref), ("fused", fused)):
        float(f(f0, s8, n_short))           # compile
        deltas = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(f0, s8, n_short))
            a = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(f(f0, s8, n_long))
            b = time.perf_counter() - t0
            d = (b - a) / (n_long - n_short) * 1000
            if d > 0:
                deltas.append(d)
        ms = float(np.median(deltas)) if deltas else float("nan")
        results[name] = ms
        print(f"{name}: {ms:.3f} ms per chain step "
              f"(B={B} {H}x{W} C={C})", flush=True)

    # correctness on-device too
    o1 = np.asarray(fused_fpn_stride4(f0, s8, p, num_groups=G,
                                      tile_h=args.tile_h, compute_dtype=cd,
                                      interpret=not on_tpu),
                    np.float32)
    o2 = np.asarray(xla_fpn_stride4(f0, s8, p, num_groups=G,
                                    compute_dtype=cd), np.float32)
    rel = float(np.abs(o1 - o2).max() / max(np.abs(o2).max(), 1e-6))
    results["max_rel_diff"] = rel
    print(f"on-device max rel diff fused vs xla: {rel:.2e}")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
