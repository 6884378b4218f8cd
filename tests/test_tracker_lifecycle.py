"""Tracker lifecycle: occlusion (lost -> re_activate with the same id) and
track-buffer expiry (lost -> removed); masked cross-attention actually
excludes tokens."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openpvsg_tpu.config import TrackerConfig
from openpvsg_tpu.tracker.variants import EmbedAssociationTracker


def _mask_at(cx, cy, H=48, W=48, r=5):
    m = np.zeros((H, W), np.uint8)
    m[cy - r:cy + r, cx - r:cx + r] = 1
    return m


def _step(tracker, masks, feats):
    qf = [{"query_feat": f, "cls_id": 0} for f in feats]
    return tracker.update(np.zeros((48, 48, 3), np.float32),
                          np.stack(masks) if masks else np.zeros((0, 48, 48), np.uint8),
                          qf)


def test_occlusion_reactivates_same_id(rng):
    tracker = EmbedAssociationTracker(TrackerConfig(track_buffer=10))
    feat = rng.standard_normal(256).astype(np.float32)
    # frames 1-2: object visible
    out, _ = _step(tracker, [_mask_at(10, 10)], [feat])
    out, _ = _step(tracker, [_mask_at(12, 10)], [feat])
    tid = out[0].track_id
    # frames 3-4: occluded (no detections)
    out, _ = _step(tracker, [], [])
    assert not out
    out, _ = _step(tracker, [], [])
    # frame 5: reappears with the same appearance
    out, _ = _step(tracker, [_mask_at(14, 10)], [feat])
    assert len(out) == 1
    assert out[0].track_id == tid, "lost track must re-activate, not re-id"
    # still only one tube
    assert len(tracker.query_feat_tubes) == 1


def test_track_buffer_expiry(rng):
    tracker = EmbedAssociationTracker(TrackerConfig(track_buffer=2))
    feat = rng.standard_normal(256).astype(np.float32)
    _step(tracker, [_mask_at(10, 10)], [feat])
    _step(tracker, [_mask_at(10, 10)], [feat])
    for _ in range(4):  # exceed the buffer
        _step(tracker, [], [])
    out, _ = _step(tracker, [_mask_at(10, 10)], [feat])
    # expired track removed -> the reappearance becomes a NEW id
    assert len(tracker.query_feat_tubes) == 2


def test_masked_attention_excludes_tokens(rng):
    """A query whose mask excludes tokens must be invariant to them (tested
    at the MHA level — a full decoder layer mixes queries via self-attn)."""
    from openpvsg_tpu.models.transformer_decoder import MultiheadAttention

    mha = MultiheadAttention(num_heads=4, dim=32)
    Q, S = 3, 10
    q = jnp.asarray(rng.standard_normal((1, Q, 32)), jnp.float32)
    kv = rng.standard_normal((1, S, 32)).astype(np.float32)
    mask = np.ones((1, Q, S), bool)
    mask[0, 0, 5:] = False  # query 0 sees only tokens 0-4
    params = mha.init(jax.random.PRNGKey(0), q, jnp.asarray(kv),
                      jnp.asarray(kv), mask=jnp.asarray(mask))

    out1 = mha.apply(params, q, jnp.asarray(kv), jnp.asarray(kv),
                     mask=jnp.asarray(mask))
    kv2 = kv.copy()
    kv2[0, 5:] += rng.standard_normal((5, 32)).astype(np.float32) * 10
    out2 = mha.apply(params, q, jnp.asarray(kv2), jnp.asarray(kv2),
                     mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1)[0, 0], np.asarray(out2)[0, 0],
                               atol=1e-5)
    assert np.abs(np.asarray(out1)[0, 1:] - np.asarray(out2)[0, 1:]).max() > 1e-3
