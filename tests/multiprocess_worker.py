"""Worker process for tests/test_multiprocess.py (NOT a test module).

Drives the ACTUAL multi-host tool code path — tools.common.init_distributed
-> local-device mesh (maybe_mesh) -> partition_videos -> stage-2 VPS
inference into the shared work_dir -> collect_rank_results barrier — under
a real 2-process jax.distributed runtime (reference equivalent: mmcv
init_dist + rank-strided multi_gpu_test, /root/reference/tools/train.py:
84-87,173 and tools/prepare_query_tube_ips.py:248-250).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--work-dir", required=True)
    args = p.parse_args()

    from tools.common import (collect_rank_results, init_distributed,
                              maybe_mesh, partition_videos)

    ns = argparse.Namespace(dist_coordinator=args.coordinator,
                            dist_num_processes=args.num_processes,
                            dist_process_id=args.process_id,
                            dist_init=False)
    init_distributed(ns)
    assert jax.process_count() == args.num_processes
    assert jax.process_index() == args.process_id

    # the tools' mesh rule: local devices only in multi-process runs
    mesh = maybe_mesh()
    assert mesh is not None, "expected a local 2-device mesh"
    assert mesh.devices.size == len(jax.local_devices())

    all_videos = sorted(os.listdir(args.data_dir))
    videos = partition_videos(all_videos)
    assert videos == all_videos[args.process_id::args.num_processes]

    import jax.numpy as jnp
    import numpy as np

    from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                     PixelDecoderConfig,
                                     TransformerDecoderConfig)
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
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, 32, 32, 3)))
    seg = SegmenterInference(cfg, variables, mesh=mesh)

    done = []
    for vid in videos:
        vdir = os.path.join(args.data_dir, vid)
        files = [os.path.join(vdir, f) for f in sorted(os.listdir(vdir))]
        n = run_query_tube_vps(seg, files, os.path.join(args.work_dir, vid),
                               window=2)
        done.append((vid, n))

    merged = collect_rank_results(args.work_dir, "mp_test",
                                  {"pid": args.process_id, "done": done})
    if jax.process_index() == 0:
        assert merged is not None and len(merged) == args.num_processes
        with open(os.path.join(args.work_dir, "summary.json"), "w") as f:
            json.dump(merged, f)
    else:
        assert merged is None
    print(f"worker {args.process_id} OK: {done}", flush=True)


if __name__ == "__main__":
    main()
