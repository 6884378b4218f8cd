"""MOTS tracking metrics: CLEAR (MOTA/MOTP) + IDF1 over mask tubes.

The reference vendors ~10 kLoC of TrackEval/MOTS/poseval harnesses that the
PVSG pipeline imports but never calls (SURVEY §2.5 'inert'). This module
provides the actually-useful subset natively: per-frame mask matching at
IoU > 0.5 (Hungarian), CLEAR event accounting, and global IDF1 via one
assignment over accumulated id-overlap counts.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from openpvsg_tpu import native


FrameMasks = Dict[int, np.ndarray]  # track_id -> binary mask


def _frame_match(gt: FrameMasks, pred: FrameMasks, iou_thr: float = 0.5):
    gids = sorted(gt.keys())
    pids = sorted(pred.keys())
    if not gids or not pids:
        return [], gids, pids
    gt_map = np.full(next(iter(gt.values())).shape, -1, np.int32)
    for i, g in enumerate(gids):
        gt_map[gt[g].astype(bool)] = i
    pr_map = np.full(gt_map.shape, -1, np.int32)
    for j, p in enumerate(pids):
        pr_map[pred[p].astype(bool)] = j
    iou = native.pairwise_mask_iou(gt_map, pr_map, len(gids), len(pids))
    cost = 1.0 - iou
    ri, ci = native.linear_sum_assignment(cost)
    matches = [(gids[i], pids[j], iou[i, j])
               for i, j in zip(ri, ci) if iou[i, j] > iou_thr]
    mg = {m[0] for m in matches}
    mp = {m[1] for m in matches}
    return (matches, [g for g in gids if g not in mg],
            [p for p in pids if p not in mp])


def evaluate_mots(gt_frames: Sequence[FrameMasks],
                  pred_frames: Sequence[FrameMasks],
                  iou_thr: float = 0.5) -> Dict[str, float]:
    """-> {MOTA, MOTP, IDF1, id_switches, fp, fn, matches}."""
    tp = fp = fn = idsw = 0
    iou_sum = 0.0
    last_match: Dict[int, int] = {}
    id_overlap: Dict[Tuple[int, int], int] = {}
    gt_count: Dict[int, int] = {}
    pr_count: Dict[int, int] = {}
    n_gt_total = 0

    for gt, pred in zip(gt_frames, pred_frames):
        matches, miss_g, miss_p = _frame_match(gt, pred, iou_thr)
        tp += len(matches)
        fn += len(miss_g)
        fp += len(miss_p)
        n_gt_total += len(gt)
        for g, p, iou in matches:
            iou_sum += iou
            if g in last_match and last_match[g] != p:
                idsw += 1
            last_match[g] = p
            id_overlap[(g, p)] = id_overlap.get((g, p), 0) + 1
        for g in gt:
            gt_count[g] = gt_count.get(g, 0) + 1
        for p in pred:
            pr_count[p] = pr_count.get(p, 0) + 1

    mota = 1.0 - (fn + fp + idsw) / max(n_gt_total, 1)
    motp = iou_sum / max(tp, 1)

    # IDF1: optimal global gt-id <-> pred-id assignment over overlap counts
    gids = sorted(gt_count)
    pids = sorted(pr_count)
    idtp = 0
    if gids and pids:
        overlap = np.zeros((len(gids), len(pids)))
        for (g, p), c in id_overlap.items():
            overlap[gids.index(g), pids.index(p)] = c
        ri, ci = native.linear_sum_assignment(-overlap)
        idtp = int(overlap[ri, ci].sum())
    denom = sum(gt_count.values()) + sum(pr_count.values())
    idf1 = 2.0 * idtp / max(denom, 1)

    return {"MOTA": mota, "MOTP": motp, "IDF1": idf1,
            "id_switches": idsw, "fp": fp, "fn": fn, "matches": tp}


def _frame_similarity(gt: FrameMasks, pred: FrameMasks):
    """(gt_ids, pred_ids, mask-IoU matrix) for one frame."""
    gids = sorted(gt.keys())
    pids = sorted(pred.keys())
    if not gids or not pids:
        return gids, pids, np.zeros((len(gids), len(pids)))
    gt_map = np.full(next(iter(gt.values())).shape, -1, np.int32)
    for i, g in enumerate(gids):
        gt_map[gt[g].astype(bool)] = i
    pr_map = np.full(gt_map.shape, -1, np.int32)
    for j, p in enumerate(pids):
        pr_map[pred[p].astype(bool)] = j
    return gids, pids, native.pairwise_mask_iou(gt_map, pr_map,
                                                len(gids), len(pids))


def evaluate_hota(gt_frames: Sequence[FrameMasks],
                  pred_frames: Sequence[FrameMasks]) -> Dict[str, float]:
    """HOTA over mask tubes, TrackEval semantics (reference:
    models/unitrack/eval/trackeval/metrics/hota.py:38-118): per-alpha
    Hungarian matching on global-alignment-weighted similarity, then
    HOTA(a) = sqrt(DetA(a) * AssA(a)), averaged over
    alpha in {0.05..0.95}. Similarity is mask IoU.

    Returns {HOTA, DetA, AssA, LocA} (means over the alpha grid).
    """
    alphas = np.arange(0.05, 0.99, 0.05)
    eps = np.finfo(float).eps

    # index tracks
    gid_index: Dict[int, int] = {}
    pid_index: Dict[int, int] = {}
    per_frame = []
    for gt, pred in zip(gt_frames, pred_frames):
        gids, pids, sim = _frame_similarity(gt, pred)
        for g in gids:
            gid_index.setdefault(g, len(gid_index))
        for p in pids:
            pid_index.setdefault(p, len(pid_index))
        per_frame.append((np.asarray([gid_index[g] for g in gids], int),
                          np.asarray([pid_index[p] for p in pids], int),
                          np.asarray(sim)))
    n_gt, n_pr = len(gid_index), len(pid_index)
    if n_gt == 0 or n_pr == 0:
        z = float(n_gt == 0 and n_pr == 0)
        return {"HOTA": z, "DetA": z, "AssA": z, "LocA": 1.0}

    # pass 1: global alignment scores
    potential = np.zeros((n_gt, n_pr))
    gt_count = np.zeros((n_gt, 1))
    pr_count = np.zeros((1, n_pr))
    for gids, pids, sim in per_frame:
        if len(gids) and len(pids):
            denom = sim.sum(0)[None, :] + sim.sum(1)[:, None] - sim
            sim_iou = np.zeros_like(sim)
            m = denom > eps
            sim_iou[m] = sim[m] / denom[m]
            potential[gids[:, None], pids[None, :]] += sim_iou
        gt_count[gids] += 1
        pr_count[0, pids] += 1
    global_align = potential / (gt_count + pr_count - potential)

    # pass 2: per-alpha matching
    A = len(alphas)
    tp = np.zeros(A)
    fn = np.zeros(A)
    fp = np.zeros(A)
    loca = np.zeros(A)
    matches_counts = [np.zeros((n_gt, n_pr)) for _ in alphas]
    for gids, pids, sim in per_frame:
        if len(gids) == 0:
            fp += len(pids)
            continue
        if len(pids) == 0:
            fn += len(gids)
            continue
        score = global_align[gids[:, None], pids[None, :]] * sim
        ri, ci = native.linear_sum_assignment(-score)
        for a, alpha in enumerate(alphas):
            ok = sim[ri, ci] >= alpha - eps
            n = int(ok.sum())
            tp[a] += n
            fn[a] += len(gids) - n
            fp[a] += len(pids) - n
            if n:
                loca[a] += sim[ri[ok], ci[ok]].sum()
                matches_counts[a][gids[ri[ok]], pids[ci[ok]]] += 1

    det_a = tp / np.maximum(1, tp + fn + fp)
    ass_a = np.zeros(A)
    for a in range(A):
        mc = matches_counts[a]
        pair_ass = mc / np.maximum(1, gt_count + pr_count - mc)
        ass_a[a] = np.sum(mc * pair_ass) / np.maximum(1, tp[a])
    loca = np.maximum(1e-10, loca) / np.maximum(1e-10, tp)
    hota = np.sqrt(det_a * ass_a)
    return {"HOTA": float(hota.mean()), "DetA": float(det_a.mean()),
            "AssA": float(ass_a.mean()), "LocA": float(loca.mean())}
