"""MOTDT strategy semantics (the reference evaluate_motdt alternate,
mot_evaluator.py:503-625): candidate pool (dets + track predictions),
two-stage appearance/IoU association, detection-only births."""

import numpy as np

from busca_tpu.trackers.motdt import MotdtConfig, MotdtTracker


def _det(x, y, w=30.0, h=60.0):
    return np.array([x, y, x + w, y + h])


def _feat(seed, d=8):
    rng = np.random.RandomState(seed)
    f = rng.randn(d)
    return f / np.linalg.norm(f)


def test_single_object_keeps_id():
    trk = MotdtTracker(MotdtConfig())
    f = _feat(0)
    ids = []
    for t in range(8):
        out = trk.update(_det(10 + 3 * t, 20)[None], np.array([0.9]),
                         f[None])
        ids.extend([o.track_id for o in out])
    assert len(set(ids)) == 1


def test_track_prediction_survives_detector_dropout():
    """The candidate pool includes the Kalman prediction, so a track whose
    detection was missed keeps outputting at its predicted box (the paper's
    core mechanism)."""
    trk = MotdtTracker(MotdtConfig(min_det_score=0.5))
    f = _feat(1)
    for t in range(6):
        trk.update(_det(10 + 3 * t, 20)[None], np.array([0.9]), f[None])
    tid = trk.tracks[0].track_id
    # 2 frames of dropout: no detections at all
    for t in range(6, 8):
        out = trk.update(np.zeros((0, 4)), np.zeros((0,)),
                         np.zeros((0, 8)))
        assert [o.track_id for o in out] == [tid]
    # the predicted box keeps moving with the estimated velocity
    assert out[0].tlwh[0] > 10 + 3 * 5 - 1


def test_appearance_beats_iou_on_crossing():
    """Two crossing objects with distinct embeddings: stage-1 appearance
    matching keeps identities even when boxes overlap heavily."""
    cfg = MotdtConfig(use_tracking=False)
    trk = MotdtTracker(cfg)
    fa, fb = _feat(2), _feat(3)
    for t in range(6):
        boxes = np.stack([_det(10 + 8 * t, 20), _det(90 - 8 * t, 20)])
        out = trk.update(boxes, np.array([0.9, 0.9]), np.stack([fa, fb]))
    by_feat = {}
    for o in trk.tracks:
        da = 1 - float(o.smooth_feat @ fa)
        db = 1 - float(o.smooth_feat @ fb)
        by_feat[o.track_id] = "a" if da < db else "b"
    assert sorted(by_feat.values()) == ["a", "b"]
    assert len(by_feat) == 2


def test_low_score_detections_do_not_birth_tracks():
    trk = MotdtTracker(MotdtConfig(min_cls_score=0.3, min_det_score=0.5))
    trk.update(_det(10, 20)[None], np.array([0.4]), _feat(4)[None])
    assert len(trk.tracks) == 0


def test_lost_tracks_expire():
    trk = MotdtTracker(MotdtConfig(max_time_lost=2, use_tracking=False))
    trk.update(_det(10, 20)[None], np.array([0.9]), _feat(5)[None])
    for _ in range(4):
        trk.update(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0, 8)))
    assert len(trk.tracks) == 0


def test_cli_surface():
    from busca_tpu.eval.run import make_tracker, shim_for_runner

    trk = make_tracker("motdt", {"track_thresh": 0.35}, engine=None)
    assert isinstance(trk, MotdtTracker)
    assert trk.cfg.min_cls_score == 0.35
    shim = shim_for_runner("motdt", trk)
    out = shim.update(_det(10, 20)[None], np.array([0.9]), 1.0, None)
    assert isinstance(out, list)
