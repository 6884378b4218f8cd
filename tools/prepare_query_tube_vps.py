"""Stage 2 (VPS): per-video windowed MinVIS inference -> mask tubes
(reference: tools/prepare_query_tube_vps.py; note the reference as committed
iterated only ego4d — line 237 — this iterates every source)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config, maybe_mesh,
                          partition_videos, reject_unused_n_time,
                          setup_logging)


def main():
    parser = base_parser("VPS query-tube extraction")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--save-images", action="store_true",
                        help="write qualititive/ tracking overlays")
    parser.add_argument("--chain-windows", action="store_true",
                        help="chain MinVIS alignment across windows "
                             "(stronger than the reference's raw-id rule)")
    parser.add_argument("--videos", nargs="*", default=None)
    parser.add_argument("--window", type=int, default=None)
    parser.add_argument("--pipeline-depth", type=int, default=2,
                        help="window batches kept in flight on the device; "
                             "overlaps batch N+1's upload+forward with "
                             "batch N's fetch + MinVIS stitch (1 = serial; "
                             "results identical at any depth)")
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)

    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.data.pvsg import PVSGAnnotation, frame_paths
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    from openpvsg_tpu.infer.stages import run_query_tube_vps
    from openpvsg_tpu.models.mask2former import Mask2Former

    save_dir = os.path.join(cfg.data.work_dir, f"{args.split}_save_qf")
    logger = setup_logging(save_dir, "prepare_qf_vps")

    anno = PVSGAnnotation(cfg.data.anno_file)
    videos = args.videos or anno.video_ids(args.split)
    videos = partition_videos(videos)
    window = args.window or cfg.data.ref_seq_len_test

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

    for vid in videos:
        frames = frame_paths(cfg.data.data_dir, vid, "frames")
        if not frames:
            logger.warning(f"{vid}: no frames, skipping")
            continue
        save_root = os.path.join(save_dir, vid)
        n = run_query_tube_vps(seg, frames, save_root, window=window,
                               save_images=args.save_images,
                               chain_windows=args.chain_windows,
                               pipeline_depth=args.pipeline_depth)
        logger.info(f"{vid}: {len(frames)} frames -> {n} tubes")


if __name__ == "__main__":
    main()
