"""Relation-head evaluation: the fast feature-level proxy protocol
(reference: tools/rel_test.py:16-113) and its aggregation.

The relation model runs jitted on padded shapes; the ranked-triplet R@K
accounting is host-side (tiny).

Wire discipline (r4): by default the pair gather happens ON DEVICE — the
encoder outputs never leave the chip; only the (N, N) pair matrix comes
down, the chosen pair indices go back up, and spans return binarized
(bool). At the reference's (100, 900, 256) scale that replaces ~420 MB of
host<->device traffic per video (sub/obj down + gathered pair feats up)
with ~6 MB. The same discipline covers the mesh path
(TimeShardedRelation.predict_pairs — the gather rides the replicated tube
axis, collective-free). device_gather=False restores the r1-r3 host
gather (the parity oracle).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu.eval.rel_metrics import (
    final_metrics, pair_recall_at_k, span_iou)
from openpvsg_tpu.models.relation.heads import RelationModel
from openpvsg_tpu.models.relation.utils import (
    concatenate_sub_obj, generate_pairwise_results, generate_results,
    pick_top_pairs_eval)

K_VALUES = (20, 50, 100)


TUBE_BUCKETS = (20, 50, 100, 200)
FRAME_BUCKETS = (128, 256, 512, 1024, 2048)
PAIR_BUCKETS = (25, 50, 100, 200)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


@lru_cache(maxsize=8)
def _fwd_fn(model: RelationModel):
    """Jitted encoder forward (r4): one dispatch per bucket shape instead of
    per-op eager dispatch — on the tunnel each eager op pays dispatch
    latency; under jit the whole forward is one executable."""

    @jax.jit
    def f(params, feats, tube_valid, frame_valid):
        return model.apply({"params": params}, feats, tube_valid=tube_valid,
                           frame_valid=frame_valid)

    return f


@lru_cache(maxsize=8)
def _gather_fn(model: RelationModel):
    """Jitted device-side pair gather. Invalid frames are zeroed so the
    gathered tensor is bit-identical to the host-built one (which pads the
    frame tail with zeros) — the two modes then feed the SAME _predict_fn
    executable with the same inputs, making parity bitwise by construction.
    (jit and eager compilations of the same math are NOT bitwise equal —
    measured up to 7e-3 on trained-checkpoint probabilities — so parity
    must come from sharing the executable, not from 'same formula'.)"""

    @jax.jit
    def f(sub, obj, s_idx, o_idx, frame_valid):
        pair = jnp.concatenate([jnp.take(sub, s_idx, axis=0),
                                jnp.take(obj, o_idx, axis=0)], axis=-1)
        return pair * frame_valid[None, :, None]

    return f


@lru_cache(maxsize=8)
def _predict_fn(model: RelationModel):
    """Jitted span/prob head on bucketed pair features (cached per model
    instance; flax modules are frozen dataclasses, hence hashable).
    Per-pair rows are batch-independent in every temporal head, so padded
    pair rows cannot perturb real rows."""

    @jax.jit
    def f(params, pair, frame_valid):
        span, prob = model.apply({"params": params}, pair, frame_valid,
                                 method=RelationModel.predict)
        # binarize on device: generate_results thresholds at logit 0 anyway,
        # and bool is 4x less wire than f32
        return span > 0, prob

    return f


def evaluate_video(model: RelationModel, params, feats: np.ndarray,
                   num_top_pairs: int = 100, pairwise: bool = True,
                   executor=None, device_gather: bool = True):
    """Forward one video: returns (selected_pairs, ranked results).

    Shapes are padded to buckets (validity-masked — results match unpadded
    exactly) so XLA compiles a handful of programs instead of one per video.

    executor: optional parallel.tp.TimeShardedRelation — shards the frame
    axis over the mesh 'time' axis and the pair axis over 'data' (identical
    results, proven in tests/test_parallel.py); None = single-device apply.
    device_gather: gather pair features on device (see module docstring) —
    single-device via _gather_fn + _predict_fn, mesh via
    executor.predict_pairs; False = host gather (parity oracle; on a
    single device both modes share the _predict_fn executable, so results
    are bitwise identical and only the wire traffic differs).
    """
    n, t, d = feats.shape
    nb = _bucket(n, TUBE_BUCKETS)
    tb = _bucket(t, FRAME_BUCKETS)
    fp = np.zeros((nb, tb, d), np.float32)
    fp[:n, :t] = feats
    tube_valid = np.zeros(nb, bool)
    tube_valid[:n] = True
    frame_valid = np.zeros(tb, bool)
    frame_valid[:t] = True

    if executor is not None:
        out = executor.propose(fp, tube_valid=tube_valid,
                               frame_valid=frame_valid)
    else:
        out = _fwd_fn(model)(params, jnp.asarray(fp),
                             jnp.asarray(tube_valid),
                             jnp.asarray(frame_valid))
    pred_matrix = np.asarray(out["pred_matrix"])[:n, :n]
    selected_pairs = pick_top_pairs_eval(pred_matrix, num_top_pairs)
    if not selected_pairs:
        return [], []

    gen = generate_pairwise_results if pairwise else generate_results
    P = len(selected_pairs)
    pb = _bucket(P, PAIR_BUCKETS)
    idx = np.zeros((pb, 2), np.int32)
    idx[:P] = np.asarray(selected_pairs, np.int32)

    if device_gather and executor is not None:
        span_bin, prob = executor.predict_pairs(out, idx, frame_valid)
        span_pred = np.asarray(span_bin)[:P, :t].astype(np.float32)
        results = gen(span_pred, np.asarray(prob)[:P], selected_pairs)
        return selected_pairs, results

    if executor is None:
        # single device: both modes run the SAME jitted _predict_fn on
        # bit-identical bucketed pair tensors — only where the gather
        # happens (and hence the wire traffic) differs
        if device_gather:
            pair = _gather_fn(model)(out["sub_feats"], out["obj_feats"],
                                     jnp.asarray(idx[:, 0]),
                                     jnp.asarray(idx[:, 1]),
                                     jnp.asarray(frame_valid))
        else:
            sub = np.asarray(out["sub_feats"])[:n, :t]
            obj = np.asarray(out["obj_feats"])[:n, :t]
            pair_feats = concatenate_sub_obj(sub, obj, selected_pairs)
            pf = np.zeros((pb, tb, pair_feats.shape[-1]), np.float32)
            pf[:P, :t] = pair_feats
            pair = jnp.asarray(pf)
        span_bin, prob = _predict_fn(model)(params, pair,
                                            jnp.asarray(frame_valid))
        span_pred = np.asarray(span_bin)[:P, :t].astype(np.float32)
        results = gen(span_pred, np.asarray(prob)[:P], selected_pairs)
        return selected_pairs, results

    # mesh executor, host gather (the oracle path): the pair axis is
    # bucketed exactly like the device-gather path so executor.predict
    # compiles the same shapes and both modes share the executable —
    # bitwise-identical results, only the wire traffic differs
    sub = np.asarray(out["sub_feats"])[:n, :t]
    obj = np.asarray(out["obj_feats"])[:n, :t]
    pair_feats = concatenate_sub_obj(sub, obj, selected_pairs)
    pf = np.zeros((pb, tb, pair_feats.shape[-1]), np.float32)
    pf[:P, :t] = pair_feats
    span_pred, prob = executor.predict(pf, frame_valid=frame_valid)
    span_pred = np.asarray(span_pred)[:P, :t]
    results = gen(span_pred, np.asarray(prob)[:P], selected_pairs)
    return selected_pairs, results


def evaluate(model: RelationModel, params, dataset,
             num_top_pairs: int, relation_names: Sequence[str],
             pairwise: bool = True, executor=None) -> Dict:
    """dataset yields {'feats': (N, T, D), 'relations': [...]}. Returns
    {'pair_recall_20', K: {recall, mean_recall, weak_recall,
    weak_mean_recall}} (reference: rel_test.py evaluate)."""
    recall_dict = {
        K: {idx: {"name": name, "total": 0, "hit": 0, "weak_hit": 0}
            for idx, name in enumerate(relation_names)}
        for K in K_VALUES
    }
    pair_recalls: List[float] = []

    for item in dataset:
        feats = np.asarray(item["feats"], dtype=np.float32)
        gt_relations = item["relations"]
        selected_pairs, results = evaluate_video(
            model, params, feats, num_top_pairs, pairwise,
            executor=executor)
        gt_pairs = [[int(r["subject_index"]), int(r["object_index"])]
                    for r in gt_relations]
        pair_recalls.append(pair_recall_at_k(
            [tuple(p) for p in selected_pairs],
            [tuple(p) for p in gt_pairs], 20))

        for gt in gt_relations:
            rel_key = (int(gt["subject_index"]), int(gt["object_index"]),
                       int(gt["relation"]))
            for K in K_VALUES:
                recall_dict[K][rel_key[2]]["total"] += 1
            for idx, result in enumerate(results):
                if (result["subject_index"], result["object_index"],
                        result["relation"]) == rel_key:
                    t_iou = span_iou(np.asarray(gt["relation_span"]).reshape(-1),
                                     result["relation_span"])
                    for K in K_VALUES:
                        if idx < K:
                            recall_dict[K][rel_key[2]]["weak_hit"] += 1
                            if t_iou >= 0.5:
                                recall_dict[K][rel_key[2]]["hit"] += 1
                    break

    out = final_metrics(recall_dict, K_VALUES)
    out["pair_recall_20"] = float(np.mean(pair_recalls)) if pair_recalls else 0.0
    return out
