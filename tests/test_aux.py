"""Tests for auxiliary subsystems: loss variants, MOTS metrics, mAP harness,
tracker variants, profiling, cosine schedule, config overrides."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openpvsg_tpu.config import apply_overrides, get_config


def test_config_overrides():
    cfg = get_config("mask2former_vps")
    assert cfg.model.video and cfg.model.backbone.norm == "sync_bn"
    cfg2 = apply_overrides(cfg, {"train.lr": "5e-05", "model.num_queries": "64",
                                 "model.pixel_decoder.encoder": "msda"})
    assert cfg2.train.lr == 5e-5
    assert cfg2.model.num_queries == 64
    assert cfg2.model.pixel_decoder.encoder == "msda"


def test_focal_cls_loss_finite(rng):
    from openpvsg_tpu.train.losses import focal_cls_loss

    cls_pred = jnp.asarray(rng.standard_normal((2, 5, 7)), jnp.float32)
    labels = jnp.asarray([[0, 6, 2, 6, 6], [1, 1, 6, 6, 6]], jnp.int32)
    loss = focal_cls_loss(cls_pred, labels, num_classes=6)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_split_thing_stuff_assignment(rng):
    """Stuff targets must land on the tail queries, things on the head."""
    from openpvsg_tpu.train.losses import _assign_all_layers

    B, Q, T, H, W = 1, 6, 1, 16, 16
    n_things, n_stuff_q = 2, 2
    gt_labels = jnp.asarray([[0, 3]], jnp.int32)  # thing cls 0, stuff cls 3
    gt_masks = np.zeros((B, 2, T, H, W), np.float32)
    gt_masks[0, 0, :, :8] = 1
    gt_masks[0, 1, :, 8:] = 1
    mask_pred = np.full((B, Q, T, H, W), -5.0, np.float32)
    mask_pred[0, 0] = np.where(gt_masks[0, 0] > 0, 5.0, -5.0)   # thing query
    mask_pred[0, 5] = np.where(gt_masks[0, 1] > 0, 5.0, -5.0)   # stuff query
    cls_pred = np.zeros((B, Q, 5), np.float32)
    cls_pred[0, 0, 0] = 8.0
    cls_pred[0, 5, 3] = 8.0
    assigned = _assign_all_layers(
        jax.random.PRNGKey(0), jnp.asarray(cls_pred)[None],
        jnp.asarray(mask_pred)[None], gt_labels, jnp.asarray(gt_masks),
        jnp.ones((1, 2), bool), num_points=64,
        num_things_classes=n_things, num_queries_split=n_stuff_q)
    a = np.asarray(assigned)[0, 0]
    assert a[0] == 0           # thing target on a head query
    assert a[5] == 1           # stuff target on a tail query
    # no stuff target ever lands in the head block and vice versa
    assert all(a[q] != 1 for q in range(Q - n_stuff_q))
    assert all(a[q] != 0 for q in range(Q - n_stuff_q, Q))


def test_sem_seg_loss_path(rng):
    from openpvsg_tpu.train.losses import mask2former_loss

    L, B, Q, T, H, W, N, K = 1, 1, 3, 1, 8, 8, 1, 4
    loss, logs = mask2former_loss(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.standard_normal((L, B, Q, K + 1)), jnp.float32),
        jnp.asarray(rng.standard_normal((L, B, Q, T, H, W)), jnp.float32),
        jnp.zeros((B, N), jnp.int32),
        jnp.asarray((rng.random((B, N, T, H, W)) > 0.5), jnp.float32),
        jnp.ones((B, N), bool), K, num_points=32,
        sem_seg_logits=jnp.asarray(rng.standard_normal((B, T, H, W, K + 1)),
                                   jnp.float32),
        gt_semantic=jnp.asarray(rng.integers(0, K + 1, (B, T, H, W)), jnp.int32))
    assert "loss_sem_seg" in logs and np.isfinite(float(loss))


def test_mots_metrics_perfect_and_degraded():
    from openpvsg_tpu.eval.mot_metrics import evaluate_mots

    H, W = 16, 16
    def mk(tid_to_box):
        out = {}
        for tid, (y, x) in tid_to_box.items():
            m = np.zeros((H, W), np.uint8)
            m[y:y + 6, x:x + 6] = 1
            out[tid] = m
        return out

    gt = [mk({1: (0, 0), 2: (8, 8)}) for _ in range(4)]
    # perfect tracking
    res = evaluate_mots(gt, gt)
    assert res["MOTA"] == pytest.approx(1.0)
    assert res["IDF1"] == pytest.approx(1.0)
    assert res["id_switches"] == 0
    # identity switch halfway
    pred = [mk({5: (0, 0), 6: (8, 8)}) for _ in range(2)] + \
           [mk({6: (0, 0), 5: (8, 8)}) for _ in range(2)]
    res2 = evaluate_mots(gt, pred)
    assert res2["id_switches"] == 2
    assert res2["IDF1"] == pytest.approx(0.5)


def test_map_harness():
    from openpvsg_tpu.eval.metric import Result, evaluate, voc_ap

    T, H, W = 4, 8, 8
    tube_a = np.zeros((T, H, W), bool)
    tube_a[:, :4] = True
    tube_b = np.zeros((T, H, W), bool)
    tube_b[:, 4:] = True
    gt = Result(vid="v", seg_masks={1: tube_a, 2: tube_b},
                relations=[{"triplet": ((1, 0), (2, 3), 5),
                            "durs": [[1, 4]]}])
    pred_good = Result(vid="v", seg_masks={10: tube_a, 20: tube_b},
                       relations=[{"triplet": ((10, 0), (20, 3), 5),
                                   "durs": [[1, 4]], "score": 0.9}])
    mean_ap, rec = evaluate([gt], [pred_good], viou_threshold=0.5)
    assert mean_ap == pytest.approx(1.0)
    assert rec[10] == pytest.approx(1.0)
    pred_bad = Result(vid="v", seg_masks={10: tube_b},
                      relations=[{"triplet": ((10, 0), (10, 3), 5),
                                  "durs": [[1, 4]], "score": 0.9}])
    mean_ap2, rec2 = evaluate([gt], [pred_bad], viou_threshold=0.5)
    assert mean_ap2 == 0.0


def test_embed_tracker_variant(rng):
    from openpvsg_tpu.config import TrackerConfig
    from openpvsg_tpu.tracker.variants import EmbedAssociationTracker

    tracker = EmbedAssociationTracker(TrackerConfig())
    H, W = 32, 32
    def mask_at(cx, cy):
        m = np.zeros((H, W), np.uint8)
        m[cy - 4:cy + 4, cx - 4:cx + 4] = 1
        return m

    feats = [rng.standard_normal(256).astype(np.float32) for _ in range(2)]
    for t in range(3):
        masks = np.stack([mask_at(8 + 2 * t, 8), mask_at(24 - 2 * t, 24)])
        qf = [{"query_feat": feats[i], "cls_id": i} for i in range(2)]
        out, n = tracker.update(np.zeros((H, W, 3), np.float32), masks, qf)
    assert n == 2
    assert sorted(t.track_id for t in out) == [1, 2]


def test_profiling_and_logging(tmp_path):
    from openpvsg_tpu.utils.logging import MetricsLogger
    from openpvsg_tpu.utils.profiling import StageTimer, Timer

    t = Timer()
    t.tic()
    t.toc()
    assert t.calls == 1
    st = StageTimer()
    with st.stage("a"):
        pass
    assert "a" in st.summary()
    ml = MetricsLogger(str(tmp_path))
    ml.log({"loss": 1.5}, step=3)
    assert (tmp_path / "metrics.jsonl").exists()


def test_cosine_schedule():
    from openpvsg_tpu.train.segmenter import cosine_warmup_schedule

    sched = cosine_warmup_schedule(1e-3, 1e-7, warmup_epochs=5,
                                   num_epochs=100, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-7)
    assert float(sched(50)) == pytest.approx(1e-3)
    assert float(sched(999)) < 1e-4


# ---------------------------------------------------------------- HOTA
def _square_mask(x0, size=4, hw=(16, 16)):
    m = np.zeros(hw, np.uint8)
    m[4:4 + size, x0:x0 + size] = 1
    return m


def test_hota_perfect_tracking():
    from openpvsg_tpu.eval.mot_metrics import evaluate_hota

    frames = [{1: _square_mask(2 + t), 2: _square_mask(10)} for t in range(6)]
    out = evaluate_hota(frames, frames)
    assert out["HOTA"] == pytest.approx(1.0)
    assert out["DetA"] == pytest.approx(1.0)
    assert out["AssA"] == pytest.approx(1.0)
    assert out["LocA"] == pytest.approx(1.0)


def test_hota_id_switch_halves_assa():
    """One GT track, pred switches id at T/2: DetA stays 1, each pred
    fragment has association 0.5 -> AssA = 0.5, HOTA = sqrt(0.5)
    (hand-computed from the TrackEval definition)."""
    from openpvsg_tpu.eval.mot_metrics import evaluate_hota

    T = 8
    gt = [{1: _square_mask(4)} for _ in range(T)]
    pred = [{(10 if t < T // 2 else 20): _square_mask(4)} for t in range(T)]
    out = evaluate_hota(gt, pred)
    assert out["DetA"] == pytest.approx(1.0)
    assert out["AssA"] == pytest.approx(0.5)
    assert out["HOTA"] == pytest.approx(np.sqrt(0.5))


def test_hota_missed_detections_hit_deta():
    from openpvsg_tpu.eval.mot_metrics import evaluate_hota

    T = 4
    gt = [{1: _square_mask(4)} for _ in range(T)]
    pred = [{1: _square_mask(4)} if t % 2 == 0 else {} for t in range(T)]
    out = evaluate_hota(gt, pred)
    # half the dets missed: DetA = tp/(tp+fn+fp) = 2/(2+2+0) = 0.5
    assert out["DetA"] == pytest.approx(0.5)
    assert out["HOTA"] < 1.0


def test_jf_perfect_tracking():
    from openpvsg_tpu.eval.mot_metrics import evaluate_jf

    frames = [{1: _square_mask(2 + t), 2: _square_mask(10)}
              for t in range(4)]
    out = evaluate_jf(frames, frames)
    assert out["J"] == pytest.approx(1.0)
    assert out["F"] == pytest.approx(1.0)
    assert out["J&F"] == pytest.approx(1.0)


def test_jf_id_relabel_invariant():
    """J&F associates tracks globally, so a consistent pred relabel is
    free (the DAVIS correspondence is recovered by the assignment)."""
    from openpvsg_tpu.eval.mot_metrics import evaluate_jf

    gt = [{1: _square_mask(2), 2: _square_mask(10)} for _ in range(3)]
    pred = [{7: _square_mask(2), 9: _square_mask(10)} for _ in range(3)]
    out = evaluate_jf(gt, pred)
    assert out["J&F"] == pytest.approx(1.0)


def test_jf_half_overlap_j():
    """4x4 square shifted by 2 columns: IoU = 8/24 = 1/3 exactly."""
    from openpvsg_tpu.eval.mot_metrics import evaluate_jf

    gt = [{1: _square_mask(4)} for _ in range(2)]
    pred = [{1: _square_mask(6)} for _ in range(2)]
    out = evaluate_jf(gt, pred)
    assert out["J"] == pytest.approx(1 / 3)
    assert 0.0 < out["F"] <= 1.0


def test_jf_missing_prediction_zero():
    from openpvsg_tpu.eval.mot_metrics import evaluate_jf

    gt = [{1: _square_mask(4)} for _ in range(2)]
    out = evaluate_jf(gt, [{} for _ in range(2)])
    assert out["J"] == pytest.approx(0.0)
    assert out["F"] == pytest.approx(0.0)


def test_jf_pred_persisting_beyond_gt_penalized():
    """TrackEval JAndF averages over ALL timesteps with missing detections
    as empty masks (j_and_f.py:49-64): a prediction persisting after the GT
    object disappears scores IoU 0 there, while an exact prediction scores
    the empty-empty IoU of 1."""
    from openpvsg_tpu.eval.mot_metrics import evaluate_jf

    m = _square_mask(4)
    gt = [{1: m}, {1: m}, {}, {}]
    exact = evaluate_jf(gt, [{1: m}, {1: m}, {}, {}])
    persist = evaluate_jf(gt, [{1: m}, {1: m}, {1: m}, {1: m}])
    assert exact["J"] == pytest.approx(1.0)
    assert exact["F"] == pytest.approx(1.0)
    assert persist["J"] == pytest.approx(0.5)   # (1 + 1 + 0 + 0) / 4
    assert persist["F"] == pytest.approx(0.5)
