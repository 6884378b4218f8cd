"""Stage 5 (proxy): feature-level relation evaluation (reference:
tools/rel_test.py) — Pair Recall@20 and R@K/mR@K on relations.pickle GT."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import base_parser, load_config, maybe_mesh, setup_logging


def make_relation_executor(mesh, model, params):
    """TimeShardedRelation over the CLI mesh (pairs sharded over 'data',
    frames over 'time'); None when no mesh is available."""
    if mesh is None:
        return None
    from openpvsg_tpu.parallel.tp import TimeShardedRelation

    return TimeShardedRelation(mesh, model, params)


def load_relation_params(checkpoint: str, model_name: str):
    """Load either an orbax checkpoint or a reference .pth bundle."""
    if checkpoint.endswith(".pth"):
        from openpvsg_tpu.train.checkpoint import (
            convert_relation_bundle, torch_state_dict_to_numpy)
        import torch
        bundle = torch.load(checkpoint, map_location="cpu", weights_only=False)
        bundle = {k: torch_state_dict_to_numpy(v) for k, v in bundle.items()}
        return convert_relation_bundle(bundle, model_name)["params"]
    from openpvsg_tpu.train.checkpoint import load_checkpoint
    return load_checkpoint(checkpoint)["params"]


def main():
    parser = base_parser("Relation proxy evaluation (feature-level)")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--model-name", default="transformer")
    parser.add_argument("--split", default="val")
    parser.add_argument("--num-top-pairs", type=int, default=100)
    args = parser.parse_args()
    cfg = load_config(args)

    from openpvsg_tpu.data.datasets import PVSGRelationDataset
    from openpvsg_tpu.eval.rel_eval import evaluate
    from openpvsg_tpu.models.relation.heads import RelationModel

    work_dir = os.path.join(cfg.data.work_dir, f"{args.split}_save_qf")
    logger = setup_logging(os.path.dirname(args.checkpoint) or ".", "rel_test")
    ds = PVSGRelationDataset(cfg.data.anno_file, args.split, work_dir)
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
    metrics = evaluate(model, params, (ds[i] for i in range(len(ds))),
                       args.num_top_pairs, ds.relations, executor=executor)
    print(f"Pair Recall@20: {100 * metrics['pair_recall_20']:.2f}")
    for K in (20, 50, 100):
        m = metrics[K]
        print("-" * 67)
        print(f"Recall@{K}: {100 * m['recall']:.2f}")
        print(f"Mean Recall@{K}: {100 * m['mean_recall']:.2f}")
        print(f"Weak Recall@{K}: {100 * m['weak_recall']:.2f}")
        print(f"Weak Mean Recall@{K}: {100 * m['weak_mean_recall']:.2f}")


if __name__ == "__main__":
    main()
