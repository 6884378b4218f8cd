"""Dense-vs-points loss equivalence: with same-resolution pred/target, the
dense mode must be the exact objective that point sampling estimates —
assignment decisions must agree on well-separated cases, and dense loss
values must be finite with flowing gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.train.assign import hungarian_assign
from openpvsg_tpu.train.losses import mask2former_loss


def test_dense_assignment_matches_points_on_clear_case(rng):
    B, Q, T, H, W, N = 1, 4, 1, 16, 16, 2
    gt_masks = np.zeros((B, N, T, H, W), np.float32)
    gt_masks[0, 0, :, :8] = 1
    gt_masks[0, 1, :, 8:] = 1
    gt_labels = jnp.asarray([[1, 2]], jnp.int32)
    mask_pred = np.full((B, Q, T, H, W), -6.0, np.float32)
    mask_pred[0, 0] = np.where(gt_masks[0, 1] > 0, 6.0, -6.0)
    mask_pred[0, 2] = np.where(gt_masks[0, 0] > 0, 6.0, -6.0)
    cls_pred = np.zeros((B, Q, 6), np.float32)
    cls_pred[0, 0, 2] = 9.0
    cls_pred[0, 2, 1] = 9.0

    a_dense = hungarian_assign(
        jax.random.PRNGKey(0), jnp.asarray(cls_pred), jnp.asarray(mask_pred),
        gt_labels, jnp.asarray(gt_masks), jnp.ones((B, N), bool),
        num_points=0)
    a_points = hungarian_assign(
        jax.random.PRNGKey(0), jnp.asarray(cls_pred), jnp.asarray(mask_pred),
        gt_labels, jnp.asarray(gt_masks), jnp.ones((B, N), bool),
        num_points=256)
    np.testing.assert_array_equal(np.asarray(a_dense), np.asarray(a_points))
    assert np.asarray(a_dense)[0, 0] == 1 and np.asarray(a_dense)[0, 2] == 0


def test_dense_loss_grads(rng):
    L, B, Q, T, H, W, N, K = 2, 1, 4, 2, 8, 8, 2, 5
    cls_preds = jnp.asarray(rng.standard_normal((L, B, Q, K + 1)), jnp.float32)
    mask_preds = jnp.asarray(rng.standard_normal((L, B, Q, T, H, W)), jnp.float32)
    gt_labels = jnp.asarray([[1, 3]], jnp.int32)
    gt_masks = jnp.asarray((rng.random((B, N, T, H, W)) > 0.5), jnp.float32)

    def f(mp):
        loss, _ = mask2former_loss(
            jax.random.PRNGKey(0), cls_preds, mp, gt_labels, gt_masks,
            jnp.ones((B, N), bool), num_classes=K, num_points=0)
        return loss

    loss, grad = jax.value_and_grad(f)(mask_preds)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grad).sum()) > 0
