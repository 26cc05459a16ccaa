"""SORT strategy semantics (the reference evaluate_sort alternate,
mot_evaluator.py:258-379): Kalman xysr filter, IoU-optimal association with
threshold rejection, min_hits/max_age lifecycle."""

import numpy as np

from busca_tpu.trackers.sort import (
    SortConfig,
    SortTracker,
    SortTrack,
    _tlbr_to_z,
    _x_to_tlbr,
)


def _det(x, y, w=30.0, h=60.0):
    return np.array([x, y, x + w, y + h])


def test_z_roundtrip():
    b = np.array([10.0, 20.0, 50.0, 100.0])
    z = _tlbr_to_z(b)
    assert np.allclose(z, [30, 60, 40 * 80, 40 / 80])
    x = np.zeros(7)
    x[:4] = z
    np.testing.assert_allclose(_x_to_tlbr(x), b, atol=1e-9)


def test_single_object_keeps_id_and_follows_motion():
    trk = SortTracker(SortConfig(det_thresh=0.5, min_hits=3))
    ids = []
    for t in range(10):
        out = trk.update(_det(10 + 4 * t, 20)[None], np.array([0.9]))
        ids.extend([o.track_id for o in out])
    assert len(set(ids)) == 1
    # after convergence the filter's velocity tracks the motion: predict-only
    # state should stay near the next true box
    track = trk.tracks[0]
    x_pred = track.x.copy()
    x_pred[:3] += x_pred[4:]
    pred_box = _x_to_tlbr(x_pred)
    true_next = _det(10 + 4 * 10, 20)
    assert abs(pred_box[0] - true_next[0]) < 3.0


def test_min_hits_gates_output_after_warmup():
    # after frame_count > min_hits, a brand-new track needs min_hits updates
    trk = SortTracker(SortConfig(det_thresh=0.5, min_hits=3))
    for t in range(5):  # warm past the initial frames with one object
        trk.update(_det(10 + 4 * t, 20)[None], np.array([0.9]))
    # a second object appears far away
    out6 = trk.update(
        np.stack([_det(10 + 4 * 5, 20), _det(300, 200)]),
        np.array([0.9, 0.9]),
    )
    assert len(out6) == 1  # newcomer not reported yet (hit_streak < min_hits)
    for t in range(6, 9):
        out = trk.update(
            np.stack([_det(10 + 4 * t, 20), _det(300, 200)]),
            np.array([0.9, 0.9]),
        )
    assert len(out) == 2  # reported once its streak reaches min_hits


def test_low_scores_do_not_start_tracks():
    trk = SortTracker(SortConfig(det_thresh=0.6))
    trk.update(_det(10, 20)[None], np.array([0.3]))
    assert len(trk.tracks) == 0


def test_iou_threshold_rejects_teleport():
    trk = SortTracker(SortConfig(det_thresh=0.5, min_hits=1))
    trk.update(_det(10, 20)[None], np.array([0.9]))
    id0 = trk.tracks[0].track_id
    # object teleports — IoU 0 with the prediction, match must be rejected
    trk.update(_det(500, 400)[None], np.array([0.9]))
    ids = {t.track_id for t in trk.tracks}
    assert id0 in ids and len(ids) == 2  # old track coasting + new track


def test_max_age_removes_stale_tracks():
    trk = SortTracker(SortConfig(det_thresh=0.5, max_age=2, min_hits=1))
    trk.update(_det(10, 20)[None], np.array([0.9]))
    for _ in range(4):
        trk.update(np.zeros((0, 4)), np.zeros((0,)))
    assert len(trk.tracks) == 0


def test_scale_maps_back_to_original_coords():
    trk = SortTracker(SortConfig(det_thresh=0.5, min_hits=1))
    out = trk.update(_det(20, 40)[None] * 2.0, np.array([0.9]), scale=2.0)
    np.testing.assert_allclose(out[0].tlwh, [20, 40, 30, 60], atol=1e-6)


def test_cli_surface():
    from busca_tpu.eval.run import make_tracker

    trk = make_tracker("sort", {"track_thresh": 0.4}, engine=None)
    assert isinstance(trk, SortTracker)
    assert trk.cfg.det_thresh == 0.4
