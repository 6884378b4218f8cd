"""Round-4 matching-path optimizations:

1. hungarian_assign_layers — ALL decoder layers assigned in one lockstep
   nested vmap (the sequential JV/greedy loops then serialize one region
   per train step instead of L). Must be bit-identical to the per-layer
   hungarian_assign loop for every method, in dense AND points mode
   (the per-(layer, item) rng stream is reproduced exactly).
2. match_downsample — average-pool both MATCHING-cost operands (losses
   stay full-res). Assignment is stable on separated masks; the knob is
   rejected at config time in points mode.

Reference semantics preserved: the per-layer assignment structure is
mask2former_head.py:529-616 (assignment recomputed per decoder layer).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.train.assign import (hungarian_assign,
                                       hungarian_assign_layers, pool_masks)
from openpvsg_tpu.train.losses import mask2former_loss


def _case(rng, L=3, B=2, Q=8, N=5, T=2, H=16, W=24, K=6):
    cls = jnp.asarray(rng.standard_normal((L, B, Q, K + 1)), jnp.float32)
    mp = jnp.asarray(rng.standard_normal((L, B, Q, T, H, W)) * 3, jnp.float32)
    lab = jnp.asarray(rng.integers(0, K, (B, N)), jnp.int32)
    gm = jnp.asarray(rng.integers(0, 2, (B, N, T, H, W)), jnp.float32)
    gv = jnp.asarray(rng.random((B, N)) > 0.2)
    return cls, mp, lab, gm, gv


def _layer_rngs(key, L, B):
    # the stream mask2former_loss used when assigning layer-by-layer:
    # layer l, item b -> split(split(fold_in(key, l))[0], B)[b]
    return jnp.stack([
        jax.random.split(jax.random.split(jax.random.fold_in(key, l))[0], B)
        for l in range(L)])


@pytest.mark.parametrize("method", ["hungarian", "lapjv", "greedy"])
def test_layer_batched_matches_per_layer_dense(rng, method):
    cls, mp, lab, gm, gv = _case(rng)
    L, B = cls.shape[:2]
    key = jax.random.PRNGKey(7)
    per_layer = jnp.stack([
        hungarian_assign(
            jax.random.split(jax.random.fold_in(key, l))[0],
            cls[l], mp[l], lab, gm, gv, num_points=0, method=method)
        for l in range(L)])
    batched = hungarian_assign_layers(
        _layer_rngs(key, L, B), cls, mp, lab, gm, gv,
        num_points=0, method=method)
    np.testing.assert_array_equal(np.asarray(per_layer), np.asarray(batched))


def test_layer_batched_matches_per_layer_points(rng):
    """Points mode draws per-(layer, item) uniform sample points from the
    rng — the batched path must consume the identical key stream."""
    cls, mp, lab, gm, gv = _case(rng)
    L, B = cls.shape[:2]
    key = jax.random.PRNGKey(3)
    per_layer = jnp.stack([
        hungarian_assign(
            jax.random.split(jax.random.fold_in(key, l))[0],
            cls[l], mp[l], lab, gm, gv, num_points=64, method="hungarian")
        for l in range(L)])
    batched = hungarian_assign_layers(
        _layer_rngs(key, L, B), cls, mp, lab, gm, gv,
        num_points=64, method="hungarian")
    np.testing.assert_array_equal(np.asarray(per_layer), np.asarray(batched))


def test_match_downsample_stable_on_separated_masks(rng):
    """Pooling the cost operands 2x must not flip the assignment when the
    prediction actually matches a target (the operating regime)."""
    B, Q, N, T, H, W = 2, 6, 4, 2, 16, 24
    gm = jnp.asarray(rng.integers(0, 2, (B, N, T, H, W)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, 5, (B, N)), jnp.int32)
    gv = jnp.ones((B, N), bool)
    # queries 0..N-1 predict targets N-1..0 cleanly, rest background
    perm = list(range(N))[::-1]
    mp = np.full((B, Q, T, H, W), -8.0, np.float32)
    for b in range(B):
        for q, n in enumerate(perm):
            mp[b, q] = np.where(np.asarray(gm[b, n]) > 0, 8.0, -8.0)
    cls = jnp.zeros((B, Q, 6), jnp.float32)
    args = (cls, jnp.asarray(mp), lab, gm, gv)
    a1 = hungarian_assign(jax.random.PRNGKey(0), *args, num_points=0,
                          method="lapjv")
    a2 = hungarian_assign(jax.random.PRNGKey(0), *args, num_points=0,
                          method="lapjv", match_downsample=2)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.asarray(a1)[0, :N].tolist() == perm


def test_match_downsample_loss_runs_and_guards(rng):
    cls, mp, lab, gm, gv = _case(rng)
    loss1, _ = mask2former_loss(jax.random.PRNGKey(0), cls, mp, lab, gm, gv,
                                6, num_points=0, assigner="lapjv",
                                match_downsample=1)
    loss2, _ = mask2former_loss(jax.random.PRNGKey(0), cls, mp, lab, gm, gv,
                                6, num_points=0, assigner="lapjv",
                                match_downsample=2)
    # losses are full-res either way; only the (discrete) assignment may
    # differ, so both are finite and the same order of magnitude
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    with pytest.raises(ValueError, match="dense matching"):
        hungarian_assign(jax.random.PRNGKey(0), cls[0], mp[0], lab, gm, gv,
                         num_points=64, match_downsample=2)
    with pytest.raises(ValueError, match="must divide"):
        pool_masks(jnp.zeros((1, 2, 15, 24)), 2)


def test_match_downsample_config_guard():
    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.train.segmenter import check_assigner_capacity

    cfg = mask2former_vps().model
    bad = dataclasses.replace(cfg, match_downsample=2, loss_sampling="points")
    with pytest.raises(ValueError, match="loss_sampling='dense'"):
        check_assigner_capacity(bad, 0, platform="cpu")
    with pytest.raises(ValueError, match=">= 1"):
        check_assigner_capacity(
            dataclasses.replace(cfg, match_downsample=0), 0, platform="cpu")
    # valid combination passes
    check_assigner_capacity(
        dataclasses.replace(cfg, match_downsample=2), 0, platform="cpu")


def test_trainer_builds_with_match_downsample():
    """The knob plumbs through SegmenterTrainer and a step runs (tiny CPU
    shapes); points mode + downsample is rejected at construction."""
    import dataclasses as dc

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    cfg = mask2former_vps()
    model = dc.replace(
        cfg.model, num_queries=8, match_downsample=2,
        backbone=dc.replace(cfg.model.backbone, depth=26),
        pixel_decoder=dc.replace(cfg.model.pixel_decoder, encoder_layers=1),
        decoder=dc.replace(cfg.model.decoder, num_layers=1))
    T, H, W = cfg.model.num_frames, 32, 32
    trainer = SegmenterTrainer(model, cfg.train, example_shape=(T, H, W))
    B, N = 1, 3
    r = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(r.standard_normal((B, T, H, W, 3)), jnp.float32),
        "gt_labels": jnp.asarray(r.integers(0, 5, (B, N)), jnp.int32),
        "gt_masks": jnp.asarray(r.integers(0, 2, (B, N, T, H // 4, W // 4)),
                                jnp.float32),
        "gt_valid": jnp.ones((B, N), bool),
    }
    logs = trainer.step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    with pytest.raises(ValueError, match="loss_sampling='dense'"):
        SegmenterTrainer(dc.replace(model, loss_sampling="points"),
                         cfg.train, example_shape=(T, H, W))


def test_bf16_mask_logits_knob_parity(rng):
    """model.mask_logits_dtype='bfloat16' (r5 train-tail probe): losses on
    bf16 logits + bf16 binary targets with f32-accumulated reductions track
    the f32 path closely, and assignments on an easy (well-separated) case
    are identical."""
    cls, mp, lab, gm, gv = _case(rng)
    loss32, logs32 = mask2former_loss(
        jax.random.PRNGKey(0), cls, mp, lab, gm, gv, 6, num_points=0,
        assigner="lapjv")
    loss16, logs16 = mask2former_loss(
        jax.random.PRNGKey(0), cls.astype(jnp.bfloat16),
        mp.astype(jnp.bfloat16), lab, gm.astype(jnp.bfloat16), gv, 6,
        num_points=0, assigner="lapjv")
    assert float(loss16) == pytest.approx(float(loss32), rel=2e-2)
    for k in logs32:
        assert float(logs16[k]) == pytest.approx(
            float(logs32[k]), rel=3e-2, abs=1e-3), k


def test_bf16_mask_logits_trainer_step():
    """The config knob plumbs end-to-end: a trainer step runs with
    bfloat16 mask logits and produces a finite loss; the model's mask
    logits actually come out bf16."""
    import dataclasses as dc

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.models.mask2former import Mask2Former
    from openpvsg_tpu.train.segmenter import SegmenterTrainer

    cfg = mask2former_vps()
    model_cfg = dc.replace(
        cfg.model, num_queries=8, mask_logits_dtype="bfloat16",
        backbone=dc.replace(cfg.model.backbone, depth=26),
        pixel_decoder=dc.replace(cfg.model.pixel_decoder, encoder_layers=1),
        decoder=dc.replace(cfg.model.decoder, num_layers=1))
    T, H, W = cfg.model.num_frames, 32, 32
    m = Mask2Former(model_cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, 3)))
    out = m.apply(v, jnp.zeros((1, T, H, W, 3)))
    assert out["mask_preds"].dtype == jnp.bfloat16

    trainer = SegmenterTrainer(model_cfg, cfg.train, example_shape=(T, H, W))
    B, N = 1, 3
    r = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(r.standard_normal((B, T, H, W, 3)), jnp.float32),
        "gt_labels": jnp.asarray(r.integers(0, 5, (B, N)), jnp.int32),
        "gt_masks": jnp.asarray(r.integers(0, 2, (B, N, T, H // 4, W // 4)),
                                jnp.float32),
        "gt_valid": jnp.ones((B, N), bool),
    }
    logs = trainer.step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))


@pytest.mark.parametrize("method", ["lapjv", "greedy"])
def test_target_layout_loss_parity(rng, method):
    """loss_layout='target' (r5): identical assignments feed both layouts,
    and every per-layer loss term matches the query layout to fp-order
    tolerance (the summand sets are identical by construction)."""
    cls, mp, lab, gm, gv = _case(rng)
    kw = dict(num_points=0, assigner=method)
    loss_q, logs_q = mask2former_loss(jax.random.PRNGKey(0), cls, mp, lab,
                                      gm, gv, 6, loss_layout="query", **kw)
    loss_t, logs_t = mask2former_loss(jax.random.PRNGKey(0), cls, mp, lab,
                                      gm, gv, 6, loss_layout="target", **kw)
    np.testing.assert_allclose(float(loss_t), float(loss_q), rtol=1e-5)
    for k in logs_q:
        np.testing.assert_allclose(float(logs_t[k]), float(logs_q[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)


def test_target_layout_grads_match(rng):
    """Gradients through the target layout match the query layout (the
    take_along_axis transpose scatter must hit the same pred rows)."""
    cls, mp, lab, gm, gv = _case(rng, L=2)

    def make_loss(layout):
        def f(mp_):
            loss, _ = mask2former_loss(jax.random.PRNGKey(0), cls, mp_, lab,
                                       gm, gv, 6, num_points=0,
                                       assigner="lapjv", loss_layout=layout)
            return loss
        return f

    g_q = jax.grad(make_loss("query"))(mp)
    g_t = jax.grad(make_loss("target"))(mp)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_q),
                               rtol=1e-4, atol=1e-7)


def test_target_layout_guards():
    import dataclasses as dc

    from openpvsg_tpu.config import mask2former_vps
    from openpvsg_tpu.train.segmenter import check_assigner_capacity

    cfg = mask2former_vps().model
    with pytest.raises(ValueError, match="per-query layout"):
        check_assigner_capacity(
            dc.replace(cfg, loss_layout="target", loss_sampling="points"),
            0, platform="cpu")
    with pytest.raises(ValueError, match="'query' or 'target'"):
        check_assigner_capacity(dc.replace(cfg, loss_layout="bogus"), 0,
                                platform="cpu")
    check_assigner_capacity(dc.replace(cfg, loss_layout="target"), 0,
                            platform="cpu")
