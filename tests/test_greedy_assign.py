"""On-device greedy assignment vs Hungarian: identical on well-separated
costs, valid (one-to-one, validity-respecting) always."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.train.assign import (BIG_COST, greedy_assign_from_cost,
                                       hungarian_assign)


def test_greedy_valid_and_one_to_one(rng):
    cost = jnp.asarray(rng.random((6, 4)), jnp.float32)
    cost = cost.at[:, 3].set(BIG_COST)  # invalid target
    a = np.asarray(greedy_assign_from_cost(cost, 4))
    assigned = a[a >= 0]
    assert len(set(assigned.tolist())) == len(assigned)  # one-to-one
    assert (a != 3).all()                                # invalid never used
    assert (a >= 0).sum() == 3


def test_greedy_matches_host_lap_on_separated_case(rng):
    B, Q, T, H, W, N = 1, 4, 1, 16, 16, 2
    gt_masks = np.zeros((B, N, T, H, W), np.float32)
    gt_masks[0, 0, :, :8] = 1
    gt_masks[0, 1, :, 8:] = 1
    gt_labels = jnp.asarray([[1, 2]], jnp.int32)
    mask_pred = np.full((B, Q, T, H, W), -6.0, np.float32)
    mask_pred[0, 1] = np.where(gt_masks[0, 0] > 0, 6.0, -6.0)
    mask_pred[0, 3] = np.where(gt_masks[0, 1] > 0, 6.0, -6.0)
    cls_pred = np.zeros((B, Q, 6), np.float32)
    cls_pred[0, 1, 1] = 9.0
    cls_pred[0, 3, 2] = 9.0
    args = (jnp.asarray(cls_pred), jnp.asarray(mask_pred), gt_labels,
            jnp.asarray(gt_masks), jnp.ones((B, N), bool))
    a_h = hungarian_assign(jax.random.PRNGKey(0), *args, num_points=0)
    a_g = hungarian_assign(jax.random.PRNGKey(0), *args, num_points=0,
                           method="greedy")
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(a_g))
