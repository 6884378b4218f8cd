"""Stage 2 (IPS): per-video inference + tracking -> mask tubes
(reference: tools/prepare_query_tube_ips.py)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config, maybe_mesh,
                          partition_videos, reject_unused_n_time,
                          setup_logging)


def main():
    parser = base_parser("IPS query-tube extraction")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--appearance-checkpoint", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--videos", nargs="*", default=None)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--pipeline-depth", type=int, default=2,
                        help="frame batches kept in flight on the device; "
                             "overlaps H2D + forward of batch N+1 with the "
                             "fetch + tracking of batch N (1 = serial; "
                             "results identical at any depth)")
    parser.add_argument("--save-images", action="store_true",
                        help="write qualititive/ tracking overlays")
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.data.pvsg import PVSGAnnotation, frame_paths
    from openpvsg_tpu.data.pipeline import pad_to_divisor
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.infer.stages import run_query_tube_ips
    from openpvsg_tpu.models.mask2former import Mask2Former
    from openpvsg_tpu.tracker.appearance import make_appearance_model
    from openpvsg_tpu.tracker.tracker import MaskAssociationTracker

    save_dir = os.path.join(cfg.data.work_dir, f"{args.split}_save_qf")
    logger = setup_logging(save_dir, "prepare_qf_ips")

    anno = PVSGAnnotation(cfg.data.anno_file)
    videos = args.videos or anno.video_ids(args.split)
    videos = partition_videos(videos)
    logger.info(f"{len(videos)} videos")

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
        logger.warning("no checkpoint: random weights")
    infer_dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    mesh = maybe_mesh()
    if mesh is not None:
        logger.info(f"frame-sharded inference over "
                    f"{mesh.devices.size} devices")
    seg = SegmenterInference(cfg.model, variables, dtype=infer_dtype,
                             mesh=mesh)

    # zoo entry + layer surgery resolved by the SAME rule the tracker's
    # jitted extractor uses — a mismatch means disagreeing param trees
    from openpvsg_tpu.tracker.appearance import resolve_appearance_spec

    app_depth, app_type, app_remove = resolve_appearance_spec(cfg.tracker)
    app = make_appearance_model(depth=app_depth, model_type=app_type,
                                remove_layers=app_remove)
    if args.appearance_checkpoint:
        from openpvsg_tpu.train.checkpoint import (
            convert_torchvision_resnet, torch_state_dict_to_numpy)
        app_vars = convert_torchvision_resnet(
            torch_state_dict_to_numpy(args.appearance_checkpoint))
    else:
        app_vars = app.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
        logger.warning("no appearance checkpoint: random weights")

    for vid in videos:
        frames = frame_paths(cfg.data.data_dir, vid, "frames")
        if not frames:
            logger.warning(f"{vid}: no frames, skipping")
            continue
        tracker = MaskAssociationTracker(cfg.tracker,
                                         appearance_variables=app_vars)
        save_root = os.path.join(save_dir, vid)
        n = run_query_tube_ips(seg, tracker, frames, save_root,
                               batch_size=args.batch_size,
                               save_images=args.save_images,
                               pipeline_depth=args.pipeline_depth)
        logger.info(f"{vid}: {len(frames)} frames -> {n} tubes")


if __name__ == "__main__":
    main()
