"""Stage 4: relation-head training (reference: tools/rel_train.py).

100 epochs, batch = 1 video, grad accumulation 32, Adam 1e-4; per-epoch
checkpoint + proxy evaluation (R@K on feature-level GT).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.common import (base_parser, load_config, maybe_mesh,
                          reject_unused_n_time, setup_logging)


def main():
    parser = base_parser("Train the relation head")
    parser.add_argument("--model-name", default=None,
                        help="vanilla | filter | conv | transformer")
    parser.add_argument("--ps-type", default="ips", help="ips | vps")
    parser.add_argument("--epochs", type=int, default=None)
    args = parser.parse_args()
    reject_unused_n_time(args)
    cfg = load_config(args)
    rel_cfg = cfg.relation
    if args.model_name:
        import dataclasses
        rel_cfg = dataclasses.replace(rel_cfg, model_name=args.model_name)

    from openpvsg_tpu.data.datasets import PVSGRelationDataset
    from openpvsg_tpu.eval.rel_eval import evaluate
    from openpvsg_tpu.eval.rel_full_eval import save_metrics_to_csv
    from openpvsg_tpu.train.checkpoint import save_checkpoint
    from openpvsg_tpu.train.relation import (DataParallelRelationTrainer,
                                             RelationTrainer)

    work_dir = os.path.join(cfg.data.work_dir, "train_save_qf")
    work_dir_eval = os.path.join(cfg.data.work_dir, "val_save_qf")
    save_dir = os.path.join(
        cfg.data.work_dir, "relation",
        f"rel_{args.ps_type}_{rel_cfg.model_name}_lr{rel_cfg.lr}")
    logger = setup_logging(save_dir, "rel_train")
    csv_path = os.path.join(save_dir, "result.csv")

    train_ds = PVSGRelationDataset(cfg.data.anno_file, "train", work_dir)
    eval_ds = PVSGRelationDataset(cfg.data.anno_file, "val", work_dir_eval)
    logger.info(f"train videos: {len(train_ds)}; eval videos: {len(eval_ds)}")

    # relation frequency counts for the reweighted BCE (reference:
    # rel_train.py:93-97 — ones + occurrence counts over the train set)
    relation_count = np.ones(rel_cfg.num_relations)
    for i in range(len(train_ds)):
        for rel in train_ds[i]["relations"]:
            relation_count[int(rel["relation"])] += 1

    # multi-device: shard the gradient accumulation over the mesh 'data'
    # axis — same accumulate-then-divide semantics, n_data videos per
    # device step (tests/test_relation_dp.py proves param parity)
    mesh = maybe_mesh()
    if mesh is not None:
        logger.info(f"data-parallel accumulation over "
                    f"{mesh.shape['data']} devices")
        trainer = DataParallelRelationTrainer(rel_cfg, relation_count, mesh,
                                              rng_seed=args.seed)
    else:
        trainer = RelationTrainer(rel_cfg, relation_count, rng_seed=args.seed)
    rng = np.random.default_rng(args.seed)
    epochs = args.epochs or rel_cfg.epochs

    for epoch in range(epochs):
        order = rng.permutation(len(train_ds))
        last_res = None
        for step, idx in enumerate(order):
            item = train_ds[int(idx)]
            res = trainer.step(item["feats"], item["relations"])
            # DP mode returns a result only at bucket-queue fills, which
            # need not align with the accumulation boundary — log the most
            # recent one at each boundary
            last_res = res or last_res
            if last_res and (step + 1) % rel_cfg.accumulation_steps == 0:
                loss, aux = last_res
                logger.info(
                    f"epoch {epoch + 1} video {step + 1}: "
                    f"{aux['loss_pair']:.2f}|{aux['loss_prob']:.2f}|"
                    f"{aux['loss_span']:.2f} loss {loss:.2f}")
        trainer.flush()

        save_checkpoint(os.path.join(save_dir, f"epoch_{epoch + 1}"),
                        {"params": trainer.params})
        logger.info("Evaluation starts...")
        metrics = evaluate(
            trainer.model, trainer.params,
            (eval_ds[i] for i in range(len(eval_ds))),
            rel_cfg.num_top_pairs, eval_ds.relations)
        logger.info(f"Pair Recall@20: {100 * metrics['pair_recall_20']:.2f}")
        for K in (20, 50, 100):
            m = metrics[K]
            logger.info(f"R@{K}: {100 * m['recall']:.2f} "
                        f"mR@{K}: {100 * m['mean_recall']:.2f}")
        save_metrics_to_csv(
            metrics, [metrics["pair_recall_20"]], (20, 50, 100), csv_path,
            f"{rel_cfg.model_name}_epoch{epoch + 1}")


if __name__ == "__main__":
    main()
