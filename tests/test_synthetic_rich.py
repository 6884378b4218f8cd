"""Rich synthetic mode + oracle stage-2 + relation capacity knobs
(data/synthetic.py rich generator, RelationModel.from_config)."""
import os

import numpy as np
import pytest

from openpvsg_tpu.data.synthetic import (RICH_RELATIONS, _bool_spans,
                                         make_dataset, write_oracle_stage2)


def test_bool_spans():
    assert _bool_spans([0, 1, 1, 1, 0, 1, 1, 1, 1], min_len=3) == \
        [[1, 3], [5, 8]]
    assert _bool_spans([1, 1], min_len=3) == []
    assert _bool_spans([1] * 4, min_len=3) == [[0, 3]]


@pytest.fixture(scope="module")
def rich_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rich"))
    path = make_dataset(root, n_train=2, n_val=1, n_frames=16,
                        h=80, w=112, seed=3, style="rich", max_things=4)
    return root, path


def test_rich_dataset_schema(rich_root):
    import json
    root, path = rich_root
    anno = json.load(open(path))
    assert anno["relations"] == RICH_RELATIONS
    from openpvsg_tpu.data.pipeline import load_mask
    from openpvsg_tpu.data.pvsg import frame_paths

    for v in anno["data"]:
        ids = {o["object_id"] for o in v["objects"]}
        kinds = {o["object_id"]: o["category"] for o in v["objects"]}
        assert len(v["objects"]) >= 3  # floor + >= 2 things
        assert v["relations"], v["video_id"]
        for sub, obj, rname, spans in v["relations"]:
            assert sub in ids and obj in ids and rname in RICH_RELATIONS
            # subjects are always things (generator contract)
            assert kinds[sub] in ("person", "dog", "cat", "ball", "cup")
            for s, e in spans:
                assert 0 <= s <= e < v["meta"]["num_frames"]
        # every mask pixel id belongs to the objects list
        for p in frame_paths(root, v["video_id"], "masks"):
            m = load_mask(p)
            assert set(np.unique(m)) - {0} <= ids


def test_rich_relation_diversity(rich_root):
    import json
    _, path = rich_root
    anno = json.load(open(path))
    names = {r[2] for v in anno["data"] for r in v["relations"]}
    assert len(names) >= 4, names  # geometry yields several predicate types


def test_oracle_stage2_contract(rich_root, tmp_path):
    root, path = rich_root
    work = str(tmp_path / "work")
    dirs = write_oracle_stage2(root, path, work, "train", seed=0)
    assert len(dirs) == 2

    from openpvsg_tpu.data import io as data_io

    vid_dir = dirs[0]
    rows = data_io.read_masks_txt(
        os.path.join(vid_dir, "quantitive", "masks.txt"))
    assert rows and min(r["fid"] for r in rows) == 1  # 1-based frame ids
    tubes = data_io.load_pickle(os.path.join(vid_dir, "query_feats.pickle"))
    feats, valid = tubes[0].as_array(16)
    assert feats.shape == (16, 256)
    assert np.linalg.norm(feats[valid], axis=1).min() > 0

    # stage 3 runs unmodified on the oracle outputs
    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation
    from openpvsg_tpu.infer.stages import run_rel_set

    anno = PVSGRelationAnnotation(path, "train")
    vid = os.path.basename(vid_dir)
    out = run_rel_set(vid, os.path.join(work, "train_save_qf"), anno, root)
    assert out is not None
    payload = data_io.load_pickle(out)
    # feats: {tube_id: (T, D)} keyed by matched tube
    assert all(np.asarray(f).shape[-1] == 256
               for f in payload["feats"].values())
    assert payload["relations"], "oracle tubes must match GT relations"
    # perfect tubes -> every GT relation whose tubes span >= 5 frames
    # survives the matching
    for rel in payload["relations"]:
        assert 0 <= rel["relation"] < len(RICH_RELATIONS)


def test_relation_model_capacity_knobs():
    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.config import RelationHeadConfig
    from openpvsg_tpu.models.relation.heads import RelationModel

    feats = jnp.zeros((4, 8, 32))
    pairs = jnp.zeros((3, 8, 64))

    base_cfg = RelationHeadConfig(d_model=32, num_relations=5)
    m_ref = RelationModel.from_config(base_cfg)
    # from_config with defaults == the plain default construction
    m_plain = RelationModel(model_name="transformer", feature_dim=32,
                            num_relations=5)
    p_ref = m_ref.init(jax.random.PRNGKey(0), feats, pairs)["params"]
    p_plain = m_plain.init(jax.random.PRNGKey(0), feats, pairs)["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_plain)

    import dataclasses
    big = dataclasses.replace(base_cfg, encoder_layers=3, temporal_layers=2,
                              encoder_ffn=768, temporal_ffn=768)
    m_big = RelationModel.from_config(big)
    p_big = m_big.init(jax.random.PRNGKey(0), feats, pairs)["params"]
    assert "layer_2" in p_big["subject_encoder"]       # encoder_layers=3
    assert "layer_1" in p_big["temporal"]              # temporal_layers=2
    assert "layer_2" not in p_ref["subject_encoder"]
    n_ref = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(p_ref))
    n_big = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(p_big))
    assert n_big > n_ref

    # conv kernel/layers plumbed
    conv = dataclasses.replace(base_cfg, model_name="conv", conv_kernel=3,
                               temporal_layers=2)
    m_conv = RelationModel.from_config(conv)
    p_conv = m_conv.init(jax.random.PRNGKey(0), feats, pairs)["params"]
    assert p_conv["temporal"]["conv_0"]["kernel"].shape[0] == 3
    assert "conv_1" in p_conv["temporal"]
