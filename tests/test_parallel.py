"""Multi-chip sharding tests on the virtual 8-device CPU mesh: frame-axis
sharded inference and pair-sharded relation scoring agree with single-device
results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.parallel.mesh import make_mesh
from openpvsg_tpu.parallel.sp import (pad_frames_for_mesh,
                                      sharded_frame_forward,
                                      sharded_pair_predict)


@pytest.fixture(scope="module")
def mesh():
    n = min(8, len(jax.devices()))
    return make_mesh(n_data=n)


def test_mesh_axes(mesh):
    assert mesh.axis_names == ("data", "time")
    assert mesh.shape["data"] >= 1


def test_sharded_frame_forward_matches_single(mesh, rng):
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=32))
    model = Mask2Former(cfg)
    n = mesh.shape["data"]
    frames = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3)))

    def apply_fn(v, fr):
        out = model.apply(v, fr[:, None])  # each frame its own clip
        return out["cls_preds"][-1], out["mask_preds"][-1]

    cls_sh, masks_sh = sharded_frame_forward(mesh, apply_fn, variables, frames)
    cls_1, masks_1 = jax.jit(apply_fn)(variables, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(cls_sh), np.asarray(cls_1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks_sh), np.asarray(masks_1), atol=1e-3)


def test_pad_frames(mesh):
    frames = np.zeros((5, 4, 4, 3))
    padded, n = pad_frames_for_mesh(frames, 4)
    assert padded.shape[0] == 8 and n == 5


def test_sharded_pair_predict(mesh, rng):
    from openpvsg_tpu.models.relation.heads import RelationModel

    model = RelationModel(model_name="transformer", feature_dim=32)
    pair_feats = rng.standard_normal((5, 6, 64)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 6, 32)), jnp.zeros((2, 6, 64)))["params"]

    def predict(p, x):
        return model.apply({"params": p}, x, method=RelationModel.predict)

    span_sh, prob_sh = sharded_pair_predict(mesh, predict, params, pair_feats)
    span_1, prob_1 = jax.jit(predict)(params, jnp.asarray(pair_feats))
    np.testing.assert_allclose(np.asarray(span_sh), np.asarray(span_1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(prob_sh), np.asarray(prob_1), atol=1e-4)
