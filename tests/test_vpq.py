"""PQ/VPQ kernel tests against hand-computed values and the reference
algorithm's documented semantics (datasets/datasets/utils.py:31-104)."""
import numpy as np
import pytest

from openpvsg_tpu.eval.vpq import pq_summary, vpq_eval

NUM = 5  # tiny class space for hand computation
MAX_INS = 10000
IGN = NUM


def seg(cls, ins=0):
    return cls * MAX_INS + ins


def test_perfect_match():
    gt = np.full((10, 10), seg(2, 1), dtype=np.int64)
    pred = gt.copy()
    iou, tp, fn, fp = vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN)
    assert tp[2] == 1 and iou[2] == pytest.approx(1.0)
    assert fn.sum() == 0 and fp.sum() == 0


def test_half_overlap_is_fn_fp():
    """IoU == 0.5 is NOT a TP (strict > 0.5)."""
    gt = np.zeros((2, 4), dtype=np.int64)
    gt[:, :2] = seg(1, 1)
    gt[:, 2:] = seg(2, 1)
    pred = np.zeros((2, 4), dtype=np.int64)
    pred[:, :3] = seg(1, 1)  # IoU vs gt = 4/6 > 0.5 -> TP
    pred[:, 3:] = seg(2, 1)  # IoU vs gt = 2/4 = 0.5 -> not a TP
    iou, tp, fn, fp = vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN)
    assert tp[1] == 1 and iou[1] == pytest.approx(4 / 6)
    assert tp[2] == 0 and fn[2] == 1 and fp[2] == 1


def test_void_overlap_shrinks_union():
    """Pred overlap with void gt is subtracted from the union."""
    gt = np.full((1, 8), seg(IGN), dtype=np.int64)  # void everywhere...
    gt[0, :4] = seg(3, 1)  # ...except 4 px of class 3
    pred = np.full((1, 8), seg(3, 1), dtype=np.int64)  # predicts everywhere
    iou, tp, fn, fp = vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN)
    # union = 4 + 8 - 4 - (overlap with void = 4) = 4 -> IoU 1.0
    assert tp[3] == 1 and iou[3] == pytest.approx(1.0)


def test_mostly_ignored_pred_not_fp():
    gt = np.full((1, 10), seg(IGN), dtype=np.int64)
    gt[0, :2] = seg(1, 1)
    pred = np.full((1, 10), seg(2, 1), dtype=np.int64)  # 80% over ignore
    iou, tp, fn, fp = vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN)
    assert fp[2] == 0  # ignored-overlap ratio 0.8 > 0.5 -> skipped
    assert fn[1] == 1


def test_class_confusion():
    gt = np.full((4, 4), seg(1, 1), dtype=np.int64)
    pred = np.full((4, 4), seg(2, 1), dtype=np.int64)
    iou, tp, fn, fp = vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN)
    assert tp.sum() == 0 and fn[1] == 1 and fp[2] == 1


def test_instance_separation():
    gt = np.zeros((2, 8), dtype=np.int64)
    gt[:, :4] = seg(1, 1)
    gt[:, 4:] = seg(1, 2)
    pred = gt.copy()
    iou, tp, fn, fp = vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN)
    assert tp[1] == 2 and iou[1] == pytest.approx(2.0)


def test_pq_summary_matches_reference_formula():
    stats = []
    gt = np.full((10, 10), seg(0, 1), dtype=np.int64)
    pred = gt.copy()
    stats.append(vpq_eval([pred, gt], num_classes=NUM, ign_id=IGN))
    out = pq_summary(stats, num_thing_classes=3, num_stuff_classes=2)
    # class 0 has PQ 1.0; others 0 -> mean over 5 classes = 0.2
    assert out["PQ"] == pytest.approx(1.0 / 5)
    assert out["PQ_th"] == pytest.approx(1.0 / 3)
    assert out["PQ_st"] == pytest.approx(0.0)


def test_window_vpq_oracle_perfect_tubes():
    """GT fed back as prediction: VPQ@k == PQ for all k (VERDICT r1 #10).
    2 classes, both present, so the all-class mean is exactly 1."""
    from openpvsg_tpu.eval.vpq import window_vpq

    T = 6
    gt_seq = []
    for t in range(T):
        m = np.full((8, 8), seg(1, 0), np.int64)   # stuff-ish background
        m[2:5, 2 + 0:5 + 0] = seg(0, 1)            # moving thing, stable id
        gt_seq.append(m)
    out = window_vpq(gt_seq, gt_seq, num_classes=2, num_thing_classes=1,
                     num_stuff_classes=1, windows=(1, 2, 4), ign_id=2)
    assert out["VPQ@1"] == pytest.approx(1.0)
    assert out["VPQ@2"] == pytest.approx(1.0)
    assert out["VPQ@4"] == pytest.approx(1.0)
    assert out["VPQ"] == pytest.approx(1.0)


def test_window_vpq_penalizes_id_switch():
    """An instance-id switch mid-video is invisible to VPQ@1 but breaks the
    cross-frame tube match for k > 1 — the metric's entire point."""
    from openpvsg_tpu.eval.vpq import window_vpq

    T = 4
    gt_seq, pred_seq = [], []
    for t in range(T):
        g = np.full((8, 8), seg(1, 0), np.int64)
        g[2:6, 2:6] = seg(0, 1)
        p = g.copy()
        if t >= 2:  # tracker id switch at frame 2
            p[2:6, 2:6] = seg(0, 7)
        gt_seq.append(g)
        pred_seq.append(p)
    out = window_vpq(pred_seq, gt_seq, num_classes=2, num_thing_classes=1,
                     num_stuff_classes=1, windows=(1, 2), ign_id=2)
    assert out["VPQ@1"] == pytest.approx(1.0)
    # the window spanning the switch: thing tube is half id-1 half id-7 ->
    # each piece has IoU 0.5 with the GT tube (not > 0.5) -> unmatched
    assert out["VPQ@2"] < 1.0


def test_window_vpq_skips_oversized_windows():
    from openpvsg_tpu.eval.vpq import window_vpq

    m = [np.full((4, 4), seg(0, 1), np.int64)] * 2
    out = window_vpq(m, m, num_classes=1, num_thing_classes=1,
                     num_stuff_classes=0, windows=(1, 8), ign_id=1)
    assert "VPQ@8" not in out and out["VPQ@1"] == pytest.approx(1.0)
