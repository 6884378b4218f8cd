"""End-to-end pipeline test on a synthetic micro-dataset.

Builds a tiny PVSG-format tree (frames, palette masks, pvsg.json), then runs
the full cascade with a tiny random-weight model:

  stage 2 (IPS): inference + tracking -> masks.txt + query_feats.pickle
  stage 2 (VPS): windowed MinVIS      -> masks.txt + query_feats.pickle
  stage 3:       tube matching        -> relations.pickle
  stage 4/5:     relation dataset loads; trainer takes a step; proxy eval runs

This mirrors the reference's integration-run QA strategy (SURVEY.md §4) in a
deterministic, CI-sized form.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax

from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                 PixelDecoderConfig, RelationHeadConfig,
                                 TrackerConfig, TransformerDecoderConfig)


H, W, T_FRAMES = 64, 64, 6
VID = "1000_test0"  # vidor-style id


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pvsg_data")
    frames_dir = root / "vidor" / "frames" / VID
    masks_dir = root / "vidor" / "masks" / VID
    frames_dir.mkdir(parents=True)
    masks_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    for t in range(T_FRAMES):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        # object 1: moving square; object 2: static floor strip
        mask = np.zeros((H, W), dtype=np.uint8)
        x0 = 8 + 2 * t
        mask[8:24, x0:x0 + 16] = 1
        mask[48:, :] = 2
        img[mask == 1] = [250, 30, 30]
        img[mask == 2] = [30, 250, 30]
        Image.fromarray(img).save(frames_dir / f"{t:04d}.png")
        Image.fromarray(mask).save(masks_dir / f"{t:04d}.png")

    anno = {
        "objects": {"thing": ["person", "dog", "cat"], "stuff": ["floor", "wall"]},
        "relations": ["on", "next-to", "holding"],
        "split": {"vidor": {"train": [VID], "val": [VID]},
                  "epic_kitchen": {"train": [], "val": []},
                  "ego4d": {"train": [], "val": []}},
        "data": [{
            "video_id": VID,
            "meta": {"fps": 5},
            "objects": [
                {"object_id": 1, "category": "dog"},
                {"object_id": 2, "category": "floor"},
            ],
            "relations": [[1, 2, "on", [[0, T_FRAMES - 1]]]],
        }],
    }
    with open(root / "pvsg.json", "w") as f:
        json.dump(anno, f)
    return str(root)


def tiny_model_cfg():
    return Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=8,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=1, ffn_channels=64),
        decoder=TransformerDecoderConfig(num_layers=3, ffn_channels=64),
        object_mask_thr=0.01, iou_thr=0.1,  # random weights: keep everything
    )


@pytest.fixture(scope="module")
def segmenter():
    import jax.numpy as jnp
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.models.mask2former import Mask2Former

    cfg = tiny_model_cfg()
    model = Mask2Former(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, H, W, 3)))
    return SegmenterInference(cfg, variables)


def test_datasets_load(dataset_dir):
    from openpvsg_tpu.data.datasets import PVSGImageDataset, PVSGVideoDataset

    ds = PVSGImageDataset(os.path.join(dataset_dir, "pvsg.json"), dataset_dir,
                          "train")
    assert len(ds) == T_FRAMES
    item = ds[0]
    assert item["img"].shape == (H, W, 3)
    assert set(item["gt_instance_ids"].tolist()) == {1, 2}
    assert item["gt_masks"].shape[0] == 2
    # regression: items must carry the objects list — decoding the
    # augmented mask without it silently yields all-void labels (the IPS
    # trainer then learns to predict only background, DEMO.md)
    assert item["objects"], "image dataset item missing objects"
    assert not np.all(item["gt_labels"] == ds.num_classes)

    vds = PVSGVideoDataset(os.path.join(dataset_dir, "pvsg.json"), dataset_dir,
                           "train", ref_seq_index=(0, 1))
    assert len(vds) == T_FRAMES - 1
    clip = vds[0]
    assert clip["imgs"].shape == (2, H, W, 3)
    tgt = vds.clip_targets(clip["pan_masks"], clip["objects"])
    assert tgt["gt_mask_tubes"].shape == (2, 2, H, W)


def test_image_dataset_pq_oracle(dataset_dir):
    """Feeding GT back as prediction must give PQ == per-class-perfect."""
    from openpvsg_tpu import INSTANCE_OFFSET
    from openpvsg_tpu.data.datasets import PVSGImageDataset

    ds = PVSGImageDataset(os.path.join(dataset_dir, "pvsg.json"), dataset_dir,
                          "train")
    results = []
    for i in range(len(ds)):
        item = ds[i]
        sem = item["gt_semantic_seg"].astype(np.int64)
        inst = item["pan_mask"].astype(np.int64)
        # build mmdet-format map: thing -> cls + inst*OFFSET, stuff -> cls
        mm = np.where((sem < 3) & (inst > 0), sem + inst * INSTANCE_OFFSET, sem)
        results.append(mm)
    out = ds.evaluate(results)
    # dog (cls 1) and floor (cls 3) perfect; 2 of 5 classes present
    assert out["PQ_th"] == pytest.approx(1.0 / 3)
    assert out["PQ_st"] == pytest.approx(1.0 / 2)


@pytest.mark.parametrize("stage", ["ips", "vps"])
def test_stage2_produces_valid_outputs(dataset_dir, segmenter, stage, tmp_path):
    from openpvsg_tpu.data import io as data_io
    from openpvsg_tpu.data.pvsg import frame_paths
    from openpvsg_tpu.infer import stages
    from openpvsg_tpu.tracker.appearance import make_appearance_model
    from openpvsg_tpu.tracker.tracker import MaskAssociationTracker
    import jax.numpy as jnp

    save_root = str(tmp_path / stage / VID)
    frames = frame_paths(dataset_dir, VID, "frames")
    assert len(frames) == T_FRAMES

    if stage == "ips":
        app = make_appearance_model(depth=26)
        app_vars = app.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, H, W, 3)))
        tracker = MaskAssociationTracker(
            TrackerConfig(appearance_depth=26), appearance_variables=app_vars)
        n = stages.run_query_tube_ips(segmenter, tracker, frames, save_root,
                                      batch_size=3)
    else:
        n = stages.run_query_tube_vps(segmenter, frames, save_root, window=2)

    masks_txt = os.path.join(save_root, "quantitive", "masks.txt")
    assert os.path.exists(masks_txt)
    entries = data_io.read_masks_txt(masks_txt)
    if entries:  # random weights may or may not keep segments
        from openpvsg_tpu.data import rle as rle_codec
        m = rle_codec.decode(entries[0]["rle"])
        assert m.shape == (H, W)
    tubes = data_io.load_pickle(os.path.join(save_root, "query_feats.pickle"))
    assert len(tubes) == n


def test_stage2_ips_pipeline_depth_parity(dataset_dir, segmenter, tmp_path):
    """pipeline_depth only changes dispatch/fetch ordering, never results:
    depth=3 must produce byte-identical masks.txt and equal tube features
    to the strictly serial depth=1 loop."""
    from openpvsg_tpu.data import io as data_io
    from openpvsg_tpu.data.pvsg import frame_paths
    from openpvsg_tpu.infer import stages
    from openpvsg_tpu.tracker.appearance import make_appearance_model
    from openpvsg_tpu.tracker.tracker import MaskAssociationTracker
    import jax.numpy as jnp

    frames = frame_paths(dataset_dir, VID, "frames")
    app = make_appearance_model(depth=26)
    app_vars = app.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))

    outs = {}
    for depth in (1, 3):
        save_root = str(tmp_path / f"d{depth}" / VID)
        tracker = MaskAssociationTracker(
            TrackerConfig(appearance_depth=26), appearance_variables=app_vars)
        n = stages.run_query_tube_ips(segmenter, tracker, frames, save_root,
                                      batch_size=2, pipeline_depth=depth)
        with open(os.path.join(save_root, "quantitive", "masks.txt"),
                  "rb") as f:
            outs[depth] = (n, f.read(), data_io.load_pickle(
                os.path.join(save_root, "query_feats.pickle")))

    assert outs[1][0] == outs[3][0]
    assert outs[1][1] == outs[3][1]
    t1, t3 = outs[1][2], outs[3][2]
    assert jax.tree.structure(t1) == jax.tree.structure(t3)
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("chain", [False, True])
def test_stage2_vps_pipeline_depth_parity(dataset_dir, segmenter, chain,
                                          tmp_path):
    """VPS pipeline_depth must not change results even when the MinVIS
    alignment is chained across windows (the chain constrains only the
    host-side stitch, never the dispatched forward)."""
    from openpvsg_tpu.data import io as data_io
    from openpvsg_tpu.data.pvsg import frame_paths
    from openpvsg_tpu.infer import stages

    frames = frame_paths(dataset_dir, VID, "frames")
    outs = {}
    for depth in (1, 3):
        save_root = str(tmp_path / f"c{chain}_d{depth}" / VID)
        n = stages.run_query_tube_vps(segmenter, frames, save_root, window=2,
                                      chain_windows=chain,
                                      pipeline_depth=depth)
        with open(os.path.join(save_root, "quantitive", "masks.txt"),
                  "rb") as f:
            outs[depth] = (n, f.read())
    assert outs[1] == outs[3]


def test_stage3_and_relation_training(dataset_dir, tmp_path):
    """Stage 3 with oracle tubes (GT as predictions) -> relations.pickle ->
    relation dataset -> one training step -> proxy eval."""
    from openpvsg_tpu.data import io as data_io, rle as rle_codec
    from openpvsg_tpu.data.datasets import PVSGRelationDataset
    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation
    from openpvsg_tpu.infer import stages

    work_dir = str(tmp_path / "work")
    rng = np.random.default_rng(0)

    # oracle stage-2 outputs: pred tubes == GT tubes
    results, tubes_feats = [], {1: {}, 2: {}}
    for t in range(T_FRAMES):
        mask = np.asarray(Image.open(
            os.path.join(dataset_dir, "vidor", "masks", VID, f"{t:04d}.png")))
        rles, tids = [], []
        for oid, cid in ((1, 1), (2, 3)):
            rle = rle_codec.encode((mask == oid).astype(np.uint8))
            rle["class_id"] = cid
            rles.append(rle)
            tids.append(oid)
            tubes_feats[oid][t] = {
                "query_feat": rng.standard_normal(256).astype(np.float32),
                "cls_id": cid}
        results.append((t + 1, rles, tids))
    data_io.write_masks_txt(
        os.path.join(work_dir, VID, "quantitive", "masks.txt"), results)

    from openpvsg_tpu.tracker.tubes import SimpleTube
    tubes = []
    for tid in (1, 2):
        tube = SimpleTube(tid)
        for t in range(T_FRAMES):
            tube.append(tubes_feats[tid].get(t))
        tubes.append(tube)
    data_io.save_pickle(os.path.join(work_dir, VID, "query_feats.pickle"), tubes)

    anno = PVSGRelationAnnotation(os.path.join(dataset_dir, "pvsg.json"), "train")
    out = stages.run_rel_set(VID, work_dir, anno, dataset_dir)
    assert out is not None
    payload = data_io.load_pickle(out)
    assert len(payload["relations"]) == 1
    rel = payload["relations"][0]
    assert rel["subject_index"] == 1 and rel["object_index"] == 2
    assert rel["relation"] == 0  # 'on'
    assert rel["relation_span"].sum() >= 5

    # stage 4: dataset + one training step
    ds = PVSGRelationDataset(os.path.join(dataset_dir, "pvsg.json"), "train",
                             work_dir)
    assert len(ds) == 1
    item = ds[0]
    assert item["feats"].shape == (2, T_FRAMES, 256)

    from openpvsg_tpu.train.relation import RelationTrainer
    cfg = RelationHeadConfig(accumulation_steps=1, max_frames=64)
    trainer = RelationTrainer(cfg, relation_count=np.ones(3 if False else 57))
    res = trainer.step(item["feats"], item["relations"])
    assert res is not None and np.isfinite(res[0])

    # stage 5 proxy eval
    from openpvsg_tpu.eval.rel_eval import evaluate
    metrics = evaluate(trainer.model, trainer.params, [item],
                       num_top_pairs=2, relation_names=["on", "next-to", "holding"]
                       + [f"r{i}" for i in range(54)])
    assert 0.0 <= metrics["pair_recall_20"] <= 1.0
    assert 20 in metrics
