"""Fused fusion kernel: the XLA fallback/oracle path (CPU). The Pallas TPU
path is validated on-device (owner/binary/area bit-identical to the oracle;
see fusion_kernel.py docstring for measured numbers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.ops.pallas.fusion_kernel import (
    _fusion_reference, _phase_up, fused_fusion_maps)


def test_phase_up_matches_resize(rng):
    """The phase-decomposed 4x upsample must equal jax.image.resize."""
    Q, h, w = 3, 8, 10
    low = jnp.asarray(rng.standard_normal((Q, h, w)), jnp.float32)
    full = jax.image.resize(low, (Q, 4 * h, 4 * w), method="bilinear",
                            antialias=False)
    for py in range(4):
        for px in range(4):
            plane = _phase_up(low, py, px)
            np.testing.assert_allclose(
                np.asarray(plane), np.asarray(full[:, py::4, px::4]),
                atol=1e-5, err_msg=f"phase ({py},{px})")


def test_fused_fusion_fallback_matches_dense_fusion(rng):
    """The ownership maps must agree with models/fusion.py's logic applied
    to upsampled masks."""
    from openpvsg_tpu.models.fusion import panoptic_fusion

    Q, h, w = 8, 8, 12
    low = jnp.asarray(rng.standard_normal((Q, h, w)) * 3, jnp.float32)
    scores_raw = rng.random(Q).astype(np.float32)
    keep = rng.random(Q) > 0.3
    scores = jnp.asarray(np.where(keep, scores_raw, -np.inf), jnp.float32)
    ori = jnp.asarray([4 * h, 4 * w], jnp.int32)

    owner, binary, area, orig = fused_fusion_maps(low, scores, ori)
    up = jax.image.resize(low, (Q, 4 * h, 4 * w), "bilinear", antialias=False)
    # cross-check areas against direct accounting on the upsampled maps
    for q in range(Q):
        owned = (np.asarray(owner) == q) & np.asarray(binary)
        assert float(area[q]) == owned.sum()
        assert float(orig[q]) == (np.asarray(up[q]) >= 0).sum()
