"""Training-stack tests: Hungarian assignment semantics, loss finiteness and
gradient flow, optimizer param groups, multi-chip dryrun on the virtual CPU
mesh."""
import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                 PixelDecoderConfig, TrainConfig,
                                 TransformerDecoderConfig)
from openpvsg_tpu.train.assign import (
    classification_cost, dice_cost, hungarian_assign, mask_bce_cost)
from openpvsg_tpu.train.losses import mask2former_loss
from openpvsg_tpu.train.segmenter import _decay_mask, _param_labels


def test_classification_cost():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    gt = jnp.asarray([0, 1])
    cost = classification_cost(logits, gt)
    assert cost[0, 0] < -0.99 and cost[1, 1] < -0.99
    assert cost[0, 1] > -0.01


def test_mask_bce_cost_matches_direct(rng):
    q, n, p = 3, 2, 50
    mp = jnp.asarray(rng.standard_normal((q, p)), jnp.float32)
    mt = jnp.asarray((rng.random((n, p)) > 0.5), jnp.float32)
    cost = mask_bce_cost(mp, mt)
    import scipy.special
    for i in range(q):
        for j in range(n):
            bce = -(np.asarray(mt)[j] * np.log(scipy.special.expit(np.asarray(mp)[i]))
                    + (1 - np.asarray(mt)[j]) * np.log(scipy.special.expit(-np.asarray(mp)[i])))
            assert float(cost[i, j]) == pytest.approx(bce.mean(), abs=1e-4)


def test_hungarian_assign_prefers_matching_masks(rng):
    """Queries whose mask+class agree with a GT instance must win it."""
    B, Q, T, H, W, N = 1, 4, 1, 16, 16, 2
    gt_masks = np.zeros((B, N, T, H, W), np.float32)
    gt_masks[0, 0, :, :8] = 1
    gt_masks[0, 1, :, 8:] = 1
    gt_labels = np.asarray([[2, 5]], np.int32)
    # queries 1 and 3 reproduce gt 0 / gt 1
    mask_pred = np.full((B, Q, T, H, W), -8.0, np.float32)
    mask_pred[0, 1] = np.where(gt_masks[0, 0] > 0, 8.0, -8.0)
    mask_pred[0, 3] = np.where(gt_masks[0, 1] > 0, 8.0, -8.0)
    cls_pred = np.zeros((B, Q, 7), np.float32)
    cls_pred[0, 1, 2] = 10.0
    cls_pred[0, 3, 5] = 10.0
    assigned = hungarian_assign(
        jax.random.PRNGKey(0), jnp.asarray(cls_pred), jnp.asarray(mask_pred),
        jnp.asarray(gt_labels), jnp.asarray(gt_masks),
        jnp.ones((B, N), bool), num_points=128)
    a = np.asarray(assigned)[0]
    assert a[1] == 0 and a[3] == 1
    assert (a == -1).sum() == Q - N  # one query per target


def test_hungarian_assign_respects_validity(rng):
    B, Q, T, H, W, N = 1, 3, 1, 8, 8, 2
    assigned = hungarian_assign(
        jax.random.PRNGKey(0),
        jnp.zeros((B, Q, 5)), jnp.zeros((B, Q, T, H, W)),
        jnp.zeros((B, N), jnp.int32), jnp.zeros((B, N, T, H, W)),
        jnp.asarray([[True, False]]), num_points=32)
    a = np.asarray(assigned)[0]
    assert (a == 1).sum() == 0  # invalid target never assigned
    assert (a == 0).sum() == 1


def test_loss_finite_and_grads_flow(rng):
    L, B, Q, T, H, W, N, K = 2, 1, 4, 1, 16, 16, 2, 5
    cls_preds = jnp.asarray(rng.standard_normal((L, B, Q, K + 1)), jnp.float32)
    mask_preds = jnp.asarray(rng.standard_normal((L, B, Q, T, H, W)), jnp.float32)
    gt_labels = jnp.asarray([[1, 3]], jnp.int32)
    gt_masks = jnp.asarray((rng.random((B, N, T, H, W)) > 0.5), jnp.float32)
    gt_valid = jnp.ones((B, N), bool)

    def f(mp):
        loss, _ = mask2former_loss(
            jax.random.PRNGKey(0), cls_preds, mp, gt_labels, gt_masks,
            gt_valid, num_classes=K, num_points=64)
        return loss

    loss, grad = jax.value_and_grad(f)(mask_preds)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_param_groups():
    params = {
        "backbone": {"conv1": {"kernel": np.zeros(1)},
                     "bn1": {"scale": np.zeros(1), "bias": np.zeros(1)}},
        "head": {"query_embed": np.zeros(1),
                 "cls_embed": {"kernel": np.zeros(1), "bias": np.zeros(1)}},
    }
    labels = flax.traverse_util.flatten_dict(_param_labels(params))
    assert labels[("backbone", "conv1", "kernel")] == "backbone"
    assert labels[("head", "query_embed")] == "no_decay"
    assert labels[("head", "cls_embed", "kernel")] == "default"
    mask = flax.traverse_util.flatten_dict(_decay_mask(params))
    assert mask[("backbone", "conv1", "kernel")] is True
    assert mask[("backbone", "bn1", "scale")] is False
    assert mask[("head", "cls_embed", "bias")] is False
    assert mask[("head", "query_embed")] is False


def test_dryrun_multichip_cpu_mesh():
    """The driver's multi-chip validation path on the 8-device CPU mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    n = min(8, len(jax.devices()))
    __graft_entry__.dryrun_multichip(n)
