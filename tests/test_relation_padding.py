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


@pytest.mark.parametrize("pairwise", [True, False])
def test_eval_device_gather_parity(setup, pairwise):
    """The r4 device-side pair gather (indices up, binarized spans down)
    returns the same pairs and the same ranked triplets as the r1-r3
    host gather — padded pair rows are batch-independent, so results
    match exactly."""
    from openpvsg_tpu.eval.rel_eval import evaluate_video

    model, params, feats = setup
    p_host, r_host = evaluate_video(model, params, feats, num_top_pairs=6,
                                    pairwise=pairwise, device_gather=False)
    p_dev, r_dev = evaluate_video(model, params, feats, num_top_pairs=6,
                                  pairwise=pairwise, device_gather=True)
    assert p_host == p_dev
    assert len(r_host) == len(r_dev) > 0
    for h, d in zip(r_host, r_dev):
        assert (h["subject_index"], h["object_index"], h["relation"]) == \
               (d["subject_index"], d["object_index"], d["relation"])
        np.testing.assert_array_equal(h["relation_span"],
                                      d["relation_span"])


@pytest.mark.parametrize("name", ["vanilla", "transformer"])
def test_pair_interaction_padding_and_grad(name):
    """pair_interaction=True (beyond-reference [s,o,s-o,s*o] input) keeps
    the padding-invariance property and trains; the default tree is
    unchanged (guarded by comparing param counts with/without the knob)."""
    rng = np.random.default_rng(2)
    base = RelationModel(model_name=name, feature_dim=32)
    model = RelationModel(model_name=name, feature_dim=32,
                          pair_interaction=True)
    feats = jnp.asarray(rng.standard_normal((4, 10, 32)), jnp.float32)
    pair = rng.standard_normal((3, 10, 64)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), feats,
                        jnp.asarray(pair))["params"]
    base_params = base.init(jax.random.PRNGKey(0), feats,
                            jnp.asarray(pair))["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    n_base = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base_params))
    assert n > n_base  # temporal model widened by the interaction terms

    span, prob = model.apply({"params": params}, jnp.asarray(pair),
                             method=RelationModel.predict)
    assert span.shape == (3, 10, 57) and prob.shape == (3, 57)
    pf = np.zeros((3, 16, 64), np.float32)
    pf[:, :10] = pair
    fv = jnp.asarray([1] * 10 + [0] * 6, bool)
    span_p, prob_p = model.apply({"params": params}, jnp.asarray(pf), fv,
                                 method=RelationModel.predict)
    np.testing.assert_allclose(np.asarray(span_p)[:, :10], np.asarray(span),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(prob_p), np.asarray(prob),
                               atol=2e-5)

    def loss(p):
        s, pr = model.apply({"params": p}, jnp.asarray(pair),
                            method=RelationModel.predict)
        return (s ** 2).mean() + (pr ** 2).mean()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_pair_interaction_trainer_end_to_end():
    """RelationTrainer picks the knob up from RelationHeadConfig."""
    import dataclasses

    from openpvsg_tpu.config import RelationHeadConfig
    from openpvsg_tpu.train.relation import RelationTrainer

    rng = np.random.default_rng(3)
    cfg = RelationHeadConfig(model_name="vanilla", num_relations=5,
                             accumulation_steps=1, pair_interaction=True,
                             max_tubes=4, max_frames=12)
    trainer = RelationTrainer(cfg, np.ones(5), rng_seed=0)
    feats = rng.standard_normal((3, 8, 256)).astype(np.float32)
    rels = [{"subject_index": 0, "object_index": 1, "relation": 2,
             "relation_span": np.ones(8, np.float32)}]
    res = trainer.step(feats, rels)
    out = res if res else trainer.flush()
    assert out is not None and np.isfinite(out[0])
