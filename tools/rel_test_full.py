"""Stage 5 (final protocol): mask-grounded relation evaluation against raw
pvsg.json GT (reference: tools/rel_test_full.py) — R@K / mR@K / weak / soft
with vIoU thresholds 0.5 / 0.1; appends to work_dirs/relation/main_results.csv."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import base_parser, load_config, maybe_mesh, setup_logging
from tools.rel_test import load_relation_params, make_relation_executor


def main():
    parser = base_parser("Relation final (mask-grounded) evaluation")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model-name", default="transformer")
    parser.add_argument("--split", default="val")
    parser.add_argument("--num-top-pairs", type=int, default=100)
    parser.add_argument("--mark", default="standard")
    args = parser.parse_args()
    cfg = load_config(args)

    from openpvsg_tpu.data.datasets import PVSGRelationDataset
    from openpvsg_tpu.data.pvsg import PVSGRelationAnnotation
    from openpvsg_tpu.eval.rel_full_eval import evaluate_full, save_metrics_to_csv
    from openpvsg_tpu.models.relation.heads import RelationModel

    work_dir = os.path.join(cfg.data.work_dir, f"{args.split}_save_qf")
    csv_path = os.path.join(cfg.data.work_dir, "relation", "main_results.csv")
    logger = setup_logging(os.path.dirname(csv_path), "rel_test_full")

    ds = PVSGRelationDataset(cfg.data.anno_file, args.split, work_dir,
                             return_mask=True)
    anno = PVSGRelationAnnotation(cfg.data.anno_file, args.split)
    # honor config capacity overrides (--set relation.num_relations=K
    # etc.) — the checkpoint's shapes must match the model's
    model = RelationModel.from_config(cfg.relation,
                                      model_name=args.model_name)
    params = load_relation_params(args.checkpoint, args.model_name)

    mesh = maybe_mesh(n_time=args.n_time)
    executor = make_relation_executor(mesh, model, params)
    if executor is not None:
        logger.info(f"relation scoring on a (data={mesh.shape['data']}, "
                    f"time={mesh.shape['time']}) mesh")
    out = evaluate_full(model, params, (ds[i] for i in range(len(ds))),
                        anno, cfg.data.data_dir, args.num_top_pairs,
                        executor=executor)
    for tag, metrics in (("", out["metrics"]), ("Soft ", out["soft_metrics"])):
        for K in (20, 50, 100):
            m = metrics[K]
            print("-" * 67)
            print(f"{tag}Recall@{K}: {100 * m['recall']:.2f}")
            print(f"{tag}Mean Recall@{K}: {100 * m['mean_recall']:.2f}")
            print(f"{tag}Weak Recall@{K}: {100 * m['weak_recall']:.2f}")
            print(f"{tag}Weak Mean Recall@{K}: {100 * m['weak_mean_recall']:.2f}")
    save_metrics_to_csv(out["metrics"], [], (20, 50, 100), csv_path,
                        f"{args.model_name}_{args.mark}")


if __name__ == "__main__":
    main()
