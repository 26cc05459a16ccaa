"""StrongSORT strategy: cascade/IoU association, NSA Kalman, EMA features,
conf-filtered BUSCA memories, third-round rescue."""

import numpy as np

from busca_tpu.trackers.strongsort import (
    NearestNeighborMetric,
    SSTrack,
    StrongSortConfig,
    StrongSortTracker,
)
from test_byte_tracker import StubEngine

FRAME = np.zeros((240, 320, 3), dtype=np.uint8)


def _objects(t):
    b1 = np.array([50 + 3 * t, 60, 90 + 3 * t, 160])
    b2 = np.array([200, 100 + 2 * t, 240, 190 + 2 * t])
    feats = np.eye(2, 8)  # distinct, constant appearance per object
    return np.stack([b1, b2]), np.array([0.9, 0.85]), feats


def _run(tracker, frames, dropout=(), drop_obj=0):
    outs = []
    for t in range(frames):
        boxes, scores, feats = _objects(t)
        if t in dropout:
            keep = [i for i in range(2) if i != drop_obj]
            boxes, scores, feats = boxes[keep], scores[keep], feats[keep]
        tracker.predict()
        outs.append(tracker.update(boxes, scores, feats, FRAME))
    return outs


def test_stable_tracking():
    trk = StrongSortTracker(StrongSortConfig())
    outs = _run(trk, 12)
    # confirmed after n_init=3 frames
    assert len(outs[2]) == 2
    ids3 = sorted(t.track_id for t in outs[3])
    ids11 = sorted(t.track_id for t in outs[11])
    assert ids3 == ids11


def test_appearance_gallery_matching():
    m = NearestNeighborMetric(matching_threshold=0.3, budget=5)
    f1 = np.array([1.0, 0, 0]) ; f2 = np.array([0, 1.0, 0])
    m.partial_fit([f1, f2], [1, 2], [1, 2])
    cost = m.distance(np.stack([f2, f1]), [1, 2])
    assert cost[0, 1] < 0.01 and cost[1, 0] < 0.01  # matched pairs cheap
    assert cost[0, 0] > 0.9 and cost[1, 1] > 0.9


def test_nsa_kalman_trusts_confident_measurements():
    from busca_tpu.core.hostmath import HostKalman

    kf = HostKalman()
    z0 = np.array([[100.0, 100.0, 0.5, 80.0]])
    m, c = kf.initiate(z0)
    m, c = kf.predict(m, c)
    z = np.array([[120.0, 100.0, 0.5, 80.0]])
    m_hi, _ = kf.update(m, c, z, confidence=np.array([0.99]))
    m_lo, _ = kf.update(m, c, z, confidence=np.array([0.01]))
    # high confidence -> the estimate moves further toward the measurement
    assert abs(m_hi[0, 0] - 120.0) < abs(m_lo[0, 0] - 120.0)


def test_busca_rescue_and_conf_filtered_memory():
    cfg = StrongSortConfig(use_busca=True)
    trk = StrongSortTracker(cfg, assoc_engine=StubEngine(kalman_prob=1.0))
    outs = _run(trk, 30, dropout=range(15, 20))
    # identity preserved through the dropout
    ids_before = sorted(t.track_id for t in outs[13])
    ids_after = sorted(t.track_id for t in outs[28])
    assert ids_before == ids_after
    # during dropout the rescued track stays in the confirmed output
    assert len(outs[16]) == 2

    # memory admission: the BUSCA-rescued frames carry conf 0.10000001 and
    # must NOT appear in the conf-filtered memory views
    track = [t for t in trk.tracks if t.is_confirmed()][0]
    thr = cfg.min_confidence + cfg.minimum_conf_modifier
    assert trk.conf_threshold == thr
    assert all(c >= thr for c in
               [c for c in track.conf_mem if c >= thr])
    n_below = sum(1 for c in track.conf_mem if c < thr)
    assert n_below > 0  # the rescue frames are recorded but filtered
    assert len(track.images_mem) == sum(
        1 for c, im in zip(track.conf_mem, track._images_mem)
        if c >= thr and im is not None
    )


def test_busca_skips_old_tracks():
    """Only confirmed age-1 tracks enter the third round."""
    cfg = StrongSortConfig(use_busca=True, max_age=30)
    stub = StubEngine(kalman_prob=1.0)
    trk = StrongSortTracker(cfg, assoc_engine=stub)
    # run long enough to confirm, then drop the object for many frames:
    # rescue fires on the first dropout frame(s); once time_since_update > 1
    # (no rescue due to unreliable memory), the track leaves the pool
    outs = _run(trk, 10, dropout=range(5, 10))
    # with short memory (< seq_len) rescue is impossible -> track coasted out
    assert len(outs[7]) == 1


def test_deepsort_alias_vanilla_flags():
    """--tracker deepsort = vanilla DeepSORT: cascade, gallery, plain Kalman
    (the reference's evaluate_deepsort alternate, mot_evaluator.py:380-502)."""
    from busca_tpu.eval.run import make_tracker

    trk = make_tracker("deepsort", {}, engine=None)
    cfg = trk.cfg
    assert not cfg.nsa and not cfg.ema and not cfg.mc and not cfg.woc
    assert cfg.max_cosine_distance == 0.2 and cfg.nn_budget == 100
    # explicit kwargs still win
    trk2 = make_tracker("deepsort", {"nsa": True}, engine=None)
    assert trk2.cfg.nsa
