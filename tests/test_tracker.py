"""Tracker tests: Kalman vs reference formulation, state machine with
scripted detections, matching costs."""
import numpy as np
import pytest

from openpvsg_tpu.config import TrackerConfig
from openpvsg_tpu.tracker.kalman import KalmanFilter, tlwh_to_xyah
from openpvsg_tpu.tracker import matching
from openpvsg_tpu.tracker.tracks import IdCounter, STrack, TrackState
from openpvsg_tpu.tracker.tubes import QueryFeatTube


def test_kalman_predict_update_consistency():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([10.0, 20.0, 0.5, 8.0]))
    assert mean.shape == (8,) and cov.shape == (8, 8)
    m2, c2 = kf.predict(mean, cov)
    np.testing.assert_allclose(m2[:4], mean[:4])  # zero velocity -> static
    assert np.all(np.diag(c2) >= np.diag(cov) - 1e-12)  # uncertainty grows
    m3, c3 = kf.update(m2, c2, np.array([11.0, 21.0, 0.5, 8.0]))
    # update moves the state toward the measurement
    assert 10.0 < m3[0] <= 11.0 and 20.0 < m3[1] <= 21.0
    assert np.all(np.diag(c3)[:4] <= np.diag(c2)[:4] + 1e-12)


def test_kalman_multi_predict_matches_single():
    kf = KalmanFilter()
    means, covs = [], []
    for i in range(5):
        m, c = kf.initiate(np.array([i * 10.0, 5.0, 1.0, 4.0 + i]))
        m[4:] = np.arange(4) * 0.1 * (i + 1)
        means.append(m)
        covs.append(c)
    bm, bc = kf.multi_predict(np.stack(means), np.stack(covs))
    for i in range(5):
        sm, sc = kf.predict(means[i], covs[i])
        np.testing.assert_allclose(bm[i], sm, atol=1e-12)
        np.testing.assert_allclose(bc[i], sc, atol=1e-12)


def test_gating_distance_zero_at_mean():
    kf = KalmanFilter()
    mean, cov = kf.initiate(np.array([10.0, 20.0, 0.5, 8.0]))
    d = kf.gating_distance(mean, cov, mean[None, :4])
    assert d[0] == pytest.approx(0.0, abs=1e-9)
    far = mean[:4] + np.array([100.0, 0, 0, 0])
    assert kf.gating_distance(mean, cov, far[None])[0] > 1000


def test_box_ious():
    a = np.array([[0, 0, 9, 9]])   # 10x10 (inclusive convention)
    b = np.array([[0, 0, 9, 9], [5, 5, 14, 14], [20, 20, 29, 29]])
    ious = matching.box_ious(a, b)
    assert ious[0, 0] == pytest.approx(1.0)
    assert ious[0, 1] == pytest.approx(25 / 175)
    assert ious[0, 2] == 0.0


def test_reconsdot_identical_sets_lowest_cost(rng):
    d, p = 16, 12
    f1 = rng.standard_normal((d, p)).astype(np.float32)
    f2 = rng.standard_normal((d, p)).astype(np.float32)
    cost = matching.reconsdot_distance([f1, f2], [f1, f2], max_pixels=32)
    assert cost.shape == (2, 2)
    assert cost[0, 0] < cost[0, 1]
    assert cost[1, 1] < cost[1, 0]
    assert cost[0, 0] == pytest.approx(0.0, abs=1e-3)


def test_linear_assignment_threshold():
    cost = np.array([[0.2, 0.95], [0.95, 0.3]])
    matches, u_rows, u_cols = matching.linear_assignment(cost, thresh=0.5)
    assert set(map(tuple, matches.tolist())) == {(0, 0), (1, 1)}
    matches, u_rows, u_cols = matching.linear_assignment(cost, thresh=0.1)
    assert len(matches) == 0
    assert u_rows == (0, 1) and u_cols == (0, 1)


def _scripted_tracker():
    """Tracker over synthetic 3-frame sequence with two moving objects."""
    from openpvsg_tpu.tracker.tracker import MaskAssociationTracker
    import jax
    from openpvsg_tpu.tracker.appearance import make_appearance_model

    model = make_appearance_model(depth=26)
    H, W = 64, 64
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, H, W, 3), np.float32))

    cfg = TrackerConfig(appearance_depth=26)
    tracker = MaskAssociationTracker(cfg, appearance_variables=variables)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(3, H, W, 3)).astype(np.float32)

    def mask_at(cx, cy, r=6):
        yy, xx = np.mgrid[:H, :W]
        return ((np.abs(yy - cy) <= r) & (np.abs(xx - cx) <= r)).astype(np.uint8)

    tubes_per_frame = []
    for t in range(3):
        masks = np.stack([mask_at(16 + 4 * t, 16), mask_at(48 - 4 * t, 48)])
        qf = [{"query_feat": np.ones(256, np.float32) * (i + 1), "cls_id": i}
              for i in range(2)]
        out, n_tubes = tracker.update(frames[t], masks, qf)
        tubes_per_frame.append((out, n_tubes))
    return tracker, tubes_per_frame


def test_tracker_maintains_identity():
    tracker, per_frame = _scripted_tracker()
    out, n_tubes = per_frame[-1]
    assert n_tubes == 2
    ids = sorted(t.track_id for t in out)
    assert ids == [1, 2]
    # tubes recorded a feature for every frame
    tubes = tracker.finalize(total_frames=3)
    for tube in tubes:
        feats, valid = tube.as_array(3)
        assert valid.all()
    # identity consistent: tube 1 always cls 0's feature (constant 1.0)
    f0, _ = tubes[0].as_array(3)
    assert np.allclose(f0, 1.0) or np.allclose(f0, 2.0)


def test_tube_gap_padding():
    tube = QueryFeatTube(2, 1, {"query_feat": np.ones(4), "cls_id": 3})
    tube.update({"query_feat": np.full(4, 2.0), "cls_id": 3}, 5)
    tube.complete_empty_postfix(6)
    feats, valid = tube.as_array(6, dim=4)
    np.testing.assert_array_equal(valid, [False, True, False, False, True, False])
    assert feats[1, 0] == 1.0 and feats[4, 0] == 2.0
