"""Padding invariance of the relation head: with validity masks, padded
tubes/frames must not change any valid output — the property that makes
bucketed static shapes exact rather than approximate."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.models.relation.heads import RelationModel


@pytest.fixture(scope="module")
def setup(rng=np.random.default_rng(0)):
    model = RelationModel(model_name="transformer", feature_dim=32)
    feats = rng.standard_normal((4, 10, 32)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.zeros((2, 10, 64)))["params"]
    return model, params, feats


def test_padded_encode_matches_unpadded(setup):
    model, params, feats = setup
    out = model.apply({"params": params}, jnp.asarray(feats))
    # pad tubes 4->7 and frames 10->16 with zeros + masks
    fp = np.zeros((7, 16, 32), np.float32)
    fp[:4, :10] = feats
    tv = np.asarray([1, 1, 1, 1, 0, 0, 0], bool)
    fv = np.asarray([1] * 10 + [0] * 6, bool)
    out_p = model.apply({"params": params}, jnp.asarray(fp),
                        tube_valid=jnp.asarray(tv), frame_valid=jnp.asarray(fv))
    np.testing.assert_allclose(np.asarray(out_p["sub_feats"])[:4, :10],
                               np.asarray(out["sub_feats"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p["pred_matrix"])[:4, :4],
                               np.asarray(out["pred_matrix"]), atol=2e-5)


def test_padded_predict_matches_unpadded(setup):
    model, params, feats = setup
    rng = np.random.default_rng(1)
    pair_feats = rng.standard_normal((3, 10, 64)).astype(np.float32)
    span, prob = model.apply({"params": params}, jnp.asarray(pair_feats),
                             method=RelationModel.predict)
    pf = np.zeros((3, 16, 64), np.float32)
    pf[:, :10] = pair_feats
    fv = jnp.asarray([1] * 10 + [0] * 6, bool)
    span_p, prob_p = model.apply({"params": params}, jnp.asarray(pf), fv,
                                 method=RelationModel.predict)
    np.testing.assert_allclose(np.asarray(span_p)[:, :10], np.asarray(span),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob_p), np.asarray(prob), atol=2e-5)


def test_eval_bucketing_end_to_end(setup):
    from openpvsg_tpu.eval.rel_eval import evaluate_video

    model, params, feats = setup
    pairs, results = evaluate_video(model, params, feats, num_top_pairs=6)
    assert pairs and results
    assert all(0 <= s < 4 and 0 <= o < 4 for s, o in pairs)
    assert all(len(r["relation_span"]) == 10 for r in results)
