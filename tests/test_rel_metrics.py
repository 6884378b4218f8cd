"""Relation metric tests with hand-computed values."""
import numpy as np
import pytest

from openpvsg_tpu.eval.rel_metrics import (
    GtTubeCache, calculate_viou, final_metrics, mask_iou, pair_recall_at_k,
    span_iou)


def test_span_iou():
    a = np.array([1, 1, 0, 0, 1])
    b = np.array([1, 0, 0, 1, 1])
    assert span_iou(a, b) == pytest.approx(2 / 4)
    assert span_iou(np.zeros(3), np.zeros(3)) == 0.0


def test_mask_iou():
    a = np.array([[1, 1], [0, 0]], dtype=bool)
    b = np.array([[1, 0], [1, 0]], dtype=bool)
    assert mask_iou(a, b) == pytest.approx(1 / 3)


def test_pair_recall():
    sel = [(0, 1), (1, 2), (3, 4)]
    gt = [(1, 2), (5, 6)]
    assert pair_recall_at_k(sel, gt, k=20) == pytest.approx(0.5)
    assert pair_recall_at_k(sel, gt, k=1) == 0.0
    assert pair_recall_at_k(sel, [], k=5) == 0.0


def test_final_metrics():
    d = {
        20: {0: {"hit": 1, "weak_hit": 2, "total": 2},
             1: {"hit": 0, "weak_hit": 0, "total": 0},
             2: {"hit": 2, "weak_hit": 2, "total": 4}},
    }
    out = final_metrics(d, [20])
    assert out[20]["recall"] == pytest.approx(3 / 6)
    assert out[20]["weak_recall"] == pytest.approx(4 / 6)
    # mean over relations with total != 0: (1/2 + 2/4) / 2
    assert out[20]["mean_recall"] == pytest.approx(0.5)


def test_calculate_viou_hand_case():
    # 4 frames, 4x4 masks. Object ids: subject=1, object=2.
    T, H, W = 4, 4, 4
    pan = np.zeros((T, H, W), dtype=np.int32)
    # subject present frames 0-2 (top-left), object frames 1-3 (bottom-right)
    for t in range(0, 3):
        pan[t, :2, :2] = 1
    for t in range(1, 4):
        pan[t, 2:, 2:] = 2
    tubes = GtTubeCache(pan)

    # predictions: perfect masks in frames 1-2, predicted span = frames 1-2
    pred_sub = {1: pan[1] == 1, 2: pan[2] == 1}
    pred_obj = {1: pan[1] == 2, 2: pan[2] == 2}
    pred_span = np.array([0, 1, 1, 0])

    # GT relation span covers frames 0..3; both present only in frames 1,2
    iou, iou_weak = calculate_viou(
        (1, 2, [[0, 3]]), (pred_sub, pred_obj, pred_span), tubes)
    assert iou == pytest.approx(1.0)  # hit frames {1,2} == gt_real frames
    assert iou_weak == pytest.approx(1.0)

    # restrict predicted span to frame 1 only -> hit∩span={1}, gt_real={1,2}
    iou2, weak2 = calculate_viou(
        (1, 2, [[0, 3]]), (pred_sub, pred_obj, np.array([0, 1, 0, 0])), tubes)
    assert iou2 == pytest.approx(0.5)
    assert weak2 == pytest.approx(1.0)  # weak ignores predicted span
