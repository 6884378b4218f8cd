"""Assignment solver tests: LAPJV vs scipy, cost-limit semantics, pairwise IoU."""
import numpy as np
import pytest
import scipy.optimize

from openpvsg_tpu import native


def test_hungarian_matches_scipy(rng):
    for _ in range(30):
        nr = int(rng.integers(1, 12))
        nc = int(rng.integers(1, 12))
        cost = rng.random((nr, nc))
        ri, ci = native.linear_sum_assignment(cost)
        sri, sci = scipy.optimize.linear_sum_assignment(cost)
        assert cost[ri, ci].sum() == pytest.approx(cost[sri, sci].sum(), abs=1e-9)


def test_lapjv_square_optimal():
    cost = np.array([[4.0, 1.0, 3.0],
                     [2.0, 0.0, 5.0],
                     [3.0, 2.0, 2.0]])
    total, x, y = native.lapjv(cost, cost_limit=np.inf)
    assert total == pytest.approx(5.0)
    assert set(zip(range(3), x.tolist())) == {(0, 1), (1, 0), (2, 2)}
    for j, i in enumerate(y.tolist()):
        assert x[i] == j


def test_lapjv_cost_limit_rejects():
    """Matches above the limit must be left unassigned (reference semantics:
    matching.py linear_assignment with thresh)."""
    cost = np.array([[0.95, 0.99], [0.99, 0.96]])
    total, x, y = native.lapjv(cost, cost_limit=0.9)
    assert (x == -1).all() and (y == -1).all()
    cost2 = np.array([[0.1, 0.99], [0.99, 0.96]])
    _, x2, y2 = native.lapjv(cost2, cost_limit=0.9)
    assert x2[0] == 0 and y2[0] == 0
    assert x2[1] == -1 and y2[1] == -1


def test_lapjv_rectangular(rng):
    cost = rng.random((3, 6))
    total, x, y = native.lapjv(cost, cost_limit=np.inf)
    assert (x >= 0).all()
    assert (y >= 0).sum() == 3
    sri, sci = scipy.optimize.linear_sum_assignment(cost)
    assert total == pytest.approx(cost[sri, sci].sum(), abs=1e-9)


def test_pairwise_mask_iou(rng):
    gt = rng.integers(-1, 3, size=(40, 30)).astype(np.int32)
    pred = rng.integers(-1, 4, size=(40, 30)).astype(np.int32)
    out = native.pairwise_mask_iou(gt, pred, 3, 4)
    for g in range(3):
        for p in range(4):
            a = gt == g
            b = pred == p
            union = np.logical_or(a, b).sum()
            expect = np.logical_and(a, b).sum() / union if union else 0.0
            assert out[g, p] == pytest.approx(expect, abs=1e-12)


def test_native_lib_builds():
    assert native.have_native(), "C++ native library failed to build"
