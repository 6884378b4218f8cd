"""Fused stride-4 FPN Pallas kernel vs the unfused XLA chain (PERF.md floor
analysis; VERDICT r2 #5): bit-close outputs in interpret mode, including
tile-boundary halo rows and the conv's zero border padding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.ops.pallas.fpn_kernel import (fused_fpn_stride4,
                                                xla_fpn_stride4)


def _params(rng, Cin, C, Cout):
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
    return {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}


@pytest.mark.parametrize("tile_h", [8, 16])
def test_fused_fpn_matches_xla(rng, tile_h):
    B, H, W, Cin, C, Cout, G = 2, 32, 40, 96, 64, 48, 8
    p = _params(rng, Cin, C, Cout)
    f0 = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    s8 = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)), jnp.float32)

    ref = np.asarray(xla_fpn_stride4(f0, s8, p, num_groups=G))
    got = np.asarray(fused_fpn_stride4(f0, s8, p, num_groups=G,
                                       tile_h=tile_h, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_fused_fpn_single_tile(rng):
    """tile_h == H: no interior halos, both borders in one tile."""
    B, H, W, Cin, C, Cout, G = 1, 16, 24, 32, 32, 16, 4
    p = _params(rng, Cin, C, Cout)
    f0 = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    s8 = jnp.asarray(rng.standard_normal((B, H // 2, W // 2, C)), jnp.float32)
    ref = np.asarray(xla_fpn_stride4(f0, s8, p, num_groups=G))
    got = np.asarray(fused_fpn_stride4(f0, s8, p, num_groups=G,
                                       tile_h=H, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
