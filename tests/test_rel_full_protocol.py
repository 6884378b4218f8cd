"""Final mask-grounded protocol end-to-end: with oracle tubes (pred == GT)
and a relation model doctored to rank the GT triplet first, evaluate_full
must score R@K = 1. Exercises the same code path as tools/rel_test_full.py.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

T_FRAMES, H, W = 6, 32, 32
VID = "1000_full0"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("full_proto")
    data_dir = root / "data"
    mdir = data_dir / "vidor" / "masks" / VID
    fdir = data_dir / "vidor" / "frames" / VID
    mdir.mkdir(parents=True)
    fdir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for t in range(T_FRAMES):
        mask = np.zeros((H, W), np.uint8)
        mask[4:12, 4:12] = 1
        mask[20:, :] = 2
        Image.fromarray(mask).save(mdir / f"{t:04d}.png")
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
                        ).save(fdir / f"{t:04d}.png")
    anno = {
        "objects": {"thing": ["person", "dog"], "stuff": ["floor"]},
        "relations": ["on", "next-to"],
        "split": {"vidor": {"train": [], "val": [VID]},
                  "epic_kitchen": {"train": [], "val": []},
                  "ego4d": {"train": [], "val": []}},
        "data": [{"video_id": VID, "meta": {},
                  "objects": [{"object_id": 1, "category": "dog"},
                              {"object_id": 2, "category": "floor"}],
                  "relations": [[1, 2, "on", [[0, T_FRAMES - 1]]]]}],
    }
    (data_dir / "pvsg.json").write_text(json.dumps(anno))

    # oracle stage-2/3 outputs in a work dir
    from openpvsg_tpu.data import io as data_io, rle as rle_codec

    work_dir = str(root / "val_save_qf")
    results = []
    for t in range(T_FRAMES):
        mask = np.asarray(Image.open(mdir / f"{t:04d}.png"))
        rles, tids = [], []
        for oid, cid in ((1, 1), (2, 2)):  # dog=cls1, floor=cls2 (thing+stuff)
            r = rle_codec.encode((mask == oid).astype(np.uint8))
            r["class_id"] = cid
            rles.append(r)
            tids.append(oid)
        results.append((t + 1, rles, tids))
    data_io.write_masks_txt(
        os.path.join(work_dir, VID, "quantitive", "masks.txt"), results)
    feats = {1: np.tile(np.array([1.0] + [0] * 255, np.float32), (T_FRAMES, 1)),
             2: np.tile(np.array([0.0, 1.0] + [0] * 254, np.float32), (T_FRAMES, 1))}
    payload = {"feats": feats, "relations": [
        {"subject_index": 1, "object_index": 2, "relation": 0,
         "relation_span": np.ones(T_FRAMES)}]}
    data_io.save_pickle(os.path.join(work_dir, VID, "relations.pickle"), payload)
    return str(data_dir), work_dir


def test_evaluate_full_oracle(setup):
    data_dir, work_dir = setup
    from openpvsg_tpu.data.datasets import PVSGRelationDataset
    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation
    from openpvsg_tpu.eval.rel_full_eval import evaluate_full
    from openpvsg_tpu.models.relation.heads import RelationModel

    anno_file = os.path.join(data_dir, "pvsg.json")
    ds = PVSGRelationDataset(anno_file, "val", work_dir, return_mask=True)
    assert len(ds) == 1
    anno = PVSGRelationAnnotation(anno_file, "val")

    model = RelationModel(model_name="transformer")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 256)),
                        jnp.zeros((2, 4, 512)))["params"]

    out = evaluate_full(model, params, (ds[i] for i in range(len(ds))),
                        anno, data_dir, num_top_pairs=2,
                        relation_names=anno.relations)
    m = out["metrics"]
    # GT tubes == pred tubes: with only 2 tubes and K >= 2 candidate pairs
    # and 2 relations each, the GT triplet must appear within the top-K
    # ranked results and score vIoU 1.0 whenever the predicted span logits
    # are positive anywhere; weak and strict recall coincide here or are 0/1
    for K in (20, 50, 100):
        assert 0.0 <= m[K]["recall"] <= 1.0
        assert m[K]["weak_recall"] >= m[K]["recall"]
    assert out["soft_metrics"][20]["total" if False else "recall"] is not None


def test_evaluate_full_with_forced_perfect_ranking(setup):
    """Bypass model ranking: hand the evaluator a prediction list containing
    exactly the GT triplet with a full span -> strict R@20 == 1."""
    data_dir, work_dir = setup
    from openpvsg_tpu.data.datasets import PVSGRelationDataset
    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation
    from openpvsg_tpu.eval import rel_full_eval
    from openpvsg_tpu.models.relation import utils as rutils

    anno_file = os.path.join(data_dir, "pvsg.json")
    ds = PVSGRelationDataset(anno_file, "val", work_dir, return_mask=True)
    anno = PVSGRelationAnnotation(anno_file, "val")

    class OracleModel:
        def apply(self, variables, *args, **kwargs):
            import jax.numpy as jnp
            if kwargs.get("method") is not None or (
                    len(args) == 1 and args[0].ndim == 3 and args[0].shape[-1] == 512):
                P, T = args[0].shape[0], args[0].shape[1]
                span = jnp.full((P, T, 2), 5.0)     # all-positive spans
                prob = jnp.zeros((P, 2)).at[:, 0].set(9.0)  # relation 0 tops
                return span, prob
            feats = args[0]
            n, t, d = feats.shape
            # pair (0 -> 1) scores highest
            mat = jnp.zeros((n, n)).at[0, 1].set(9.0)
            return {"sub_feats": feats, "obj_feats": feats, "pred_matrix": mat}

    out = rel_full_eval.evaluate_full(
        OracleModel(), None, (ds[i] for i in range(len(ds))), anno, data_dir,
        num_top_pairs=2, relation_names=anno.relations)
    assert out["metrics"][20]["recall"] == pytest.approx(1.0)
    assert out["soft_metrics"][20]["recall"] == pytest.approx(1.0)
