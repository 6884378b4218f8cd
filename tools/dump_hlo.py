"""Dump the optimized HLO of the flagship forward and aggregate copy/fusion
ops by shape — identifies what the relayout copies (PERF.md) actually move.

Usage: python tools/dump_hlo.py [--out /tmp/vps.hlo.txt]
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("OPENPVSG_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["OPENPVSG_PLATFORM"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/vps.hlo.txt")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--chain", action="store_true",
                   help="dump the fori_loop-chained program (trace-name "
                        "compatible with profile_forward.py)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.models.mask2former import Mask2Former

    on_tpu = jax.devices()[0].platform != "cpu"
    T, H, W = (4, 384, 480) if on_tpu else (2, 96, 128)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = mask2former_vps().model
    model = Mask2Former(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, T, H, W, 3)) * 0.5, jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, x):
        out = model.apply(v, x)
        return out["cls_preds"][-1], out["mask_preds"][-1]

    if args.chain:
        # the same fori_loop-chained program profile_forward.py traces, so
        # fusion.NNNN names in its trace resolve directly in this dump
        @jax.jit
        def chain(v, x, iters):
            def body(i, c):
                out = model.apply(v, x + c * 1e-12)
                return out["mask_preds"][-1].mean().astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        compiled = chain.lower(v, x, 12).compile()
    else:
        compiled = fwd.lower(v, x).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB HLO to {args.out}")

    # aggregate copy ops by result shape
    copy_shapes = collections.Counter()
    transpose_shapes = collections.Counter()
    for m in re.finditer(r"=\s+([a-z0-9\[\],{}]+)\s+copy\(", txt):
        copy_shapes[m.group(1)] += 1
    for m in re.finditer(r"=\s+([a-z0-9\[\],{}]+)\s+transpose\(", txt):
        transpose_shapes[m.group(1)] += 1
    print(f"\n== copy ops by shape (total {sum(copy_shapes.values())}) ==")
    for shape, n in copy_shapes.most_common(args.top):
        print(f"{n:5d} x {shape}")
    print(f"\n== transpose ops by shape (total {sum(transpose_shapes.values())}) ==")
    for shape, n in transpose_shapes.most_common(args.top):
        print(f"{n:5d} x {shape}")


if __name__ == "__main__":
    main()
