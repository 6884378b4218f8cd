"""Relation-head tests: losses vs torch oracle, pair proposal decomposition
vs explicit loop, model shapes, trainer smoke test."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openpvsg_tpu.config import RelationHeadConfig
from openpvsg_tpu.models.relation.heads import (
    PairProposalNetwork, RelationModel, build_relation_model)
from openpvsg_tpu.models.relation.losses import rew_bce_loss, zlpr_loss
from openpvsg_tpu.models.relation.utils import (
    concatenate_sub_obj, generate_gt_matrix, pick_top_pairs_eval,
    generate_results, reshape_and_filter)


def torch_zlpr(y_true, y_pred):
    y_pred = (1 - 2 * y_true) * y_pred
    y_pred_neg = y_pred - y_true * 9999
    y_pred_pos = y_pred - (1 - y_true) * 9999
    zeros = torch.zeros_like(y_pred[..., :1])
    neg = torch.logsumexp(torch.cat([y_pred_neg, zeros], dim=-1), dim=-1)
    pos = torch.logsumexp(torch.cat([y_pred_pos, zeros], dim=-1), dim=-1)
    return (neg + pos).mean()


def test_zlpr_matches_torch(rng):
    y_true = (rng.random((4, 57)) > 0.8).astype(np.float32)
    y_pred = rng.standard_normal((4, 57)).astype(np.float32) * 3
    ours = float(zlpr_loss(jnp.asarray(y_true), jnp.asarray(y_pred)))
    theirs = float(torch_zlpr(torch.from_numpy(y_true), torch.from_numpy(y_pred)))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_rew_bce_matches_torch(rng):
    y_true = (rng.random((6, 57)) > 0.7).astype(np.float32)
    y_pred = rng.standard_normal((6, 57)).astype(np.float32)
    counts = rng.integers(1, 100, 57).astype(np.float32)
    ours = float(rew_bce_loss(jnp.asarray(y_true), jnp.asarray(y_pred),
                              jnp.asarray(counts)))
    pw = torch.from_numpy(counts.sum() / counts)
    theirs = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(y_pred), torch.from_numpy(y_true), pos_weight=pw))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_pair_proposal_equals_loop(rng):
    """The einsum decomposition must equal MLP(concat(s_i, o_j)) per pair."""
    N, T, D, H = 5, 7, 16, 32
    model = PairProposalNetwork(feature_dim=D, hidden_dim=H)
    sub = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    obj = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sub, obj)
    mat = np.asarray(model.apply(params, sub, obj))

    w1 = np.asarray(params["params"]["fc1_kernel"])
    b1 = np.asarray(params["params"]["fc1_bias"])
    w2 = np.asarray(params["params"]["fc2"]["kernel"])
    b2 = np.asarray(params["params"]["fc2"]["bias"])
    s = np.asarray(sub).max(1)
    o = np.asarray(obj).max(1)
    for i in range(N):
        for j in range(N):
            expect = 0.0
            if i != j:
                h = np.maximum(np.concatenate([s[i], o[j]]) @ w1 + b1, 0)
                expect = float(h @ w2 + b2)
            assert mat[i, j] == pytest.approx(expect, abs=1e-4)


@pytest.mark.parametrize("name", ["vanilla", "filter", "conv", "transformer"])
def test_temporal_models_shapes(name, rng):
    P, T, D, R = 3, 11, 64, 57
    model = build_relation_model(name, D, R)
    x = jnp.asarray(rng.standard_normal((P, T, D)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    span, prob = model.apply(params, x)
    assert span.shape == (P, T, R)
    assert prob.shape == (P, R)
    # relation_pred is max over time of pred_head outputs
    assert np.isfinite(np.asarray(span)).all()


def test_handcrafted_filter_matches_torch_conv(rng):
    """The depthwise binomial filter must equal the reference conv1d."""
    from openpvsg_tpu.models.relation.heads import HandcraftedFilter
    P, T, D = 2, 9, 8
    x = rng.standard_normal((P, T, D)).astype(np.float32)
    kernel = torch.tensor([0.25, 0.5, 1.0, 0.5, 0.25]).view(1, 1, -1).repeat(D, 1, 1)
    expect = F.conv1d(torch.from_numpy(x).permute(0, 2, 1), kernel,
                      padding=2, groups=D).permute(0, 2, 1).numpy()
    # reproduce just the filtering stage
    pad = 2
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    k = np.array([0.25, 0.5, 1.0, 0.5, 0.25], np.float32)
    ours = sum(k[i] * xp[:, i:i + T, :] for i in range(5))
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_generate_gt_matrix_and_filter():
    rels = [
        {"subject_index": 0, "object_index": 1, "relation": 3,
         "relation_span": np.array([0, 1, 1, 0, 1])},
        {"subject_index": 2, "object_index": 0, "relation": 5,
         "relation_span": np.array([1, 1, 0, 0, 0])},
    ]
    pairs = [[0, 1], [1, 2]]
    gt_span, gt_prob = generate_gt_matrix(rels, pairs, (2, 3, 7), (1, 4))
    assert gt_prob[0, 3] == 1 and gt_prob.sum() == 1
    np.testing.assert_array_equal(gt_span[0, :, 3], [1, 1, 0])
    span_pred = np.random.default_rng(0).standard_normal((2, 3, 7))
    gt_f, pred_f = reshape_and_filter(gt_span, span_pred)
    assert gt_f.shape == (1, 3)  # only the one nonzero row survives


def test_pick_top_pairs_eval():
    m = np.array([[9.0, 0.5, 0.2],
                  [0.8, 9.0, 0.1],
                  [0.9, 0.3, 9.0]])
    pairs = pick_top_pairs_eval(m, 3)
    assert pairs[0] == [2, 0] and pairs[1] == [1, 0] and pairs[2] == [0, 1]
    assert all(s != o for s, o in pairs)


def test_relation_trainer_smoke(rng):
    from openpvsg_tpu.train.relation import RelationTrainer

    cfg = RelationHeadConfig(max_tubes=10, max_frames=64, accumulation_steps=2)
    trainer = RelationTrainer(cfg, relation_count=np.ones(57), rng_seed=0)
    feats = rng.standard_normal((4, 30, 256)).astype(np.float32)
    rels = [{"subject_index": 0, "object_index": 1, "relation": 2,
             "relation_span": np.ones(30)}]
    before = jax.tree_util.tree_leaves(trainer.params)[0].copy()
    r1 = trainer.step(feats, rels)
    assert r1 is not None and np.isfinite(r1[0])
    r2 = trainer.step(feats, rels)  # triggers the optimizer step
    after = jax.tree_util.tree_leaves(trainer.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
