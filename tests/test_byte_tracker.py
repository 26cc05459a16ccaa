"""BYTE tracker behavior: the 2-round association, memory gating, and the
BUSCA third round (driven by a stub engine for determinism)."""

import numpy as np

from busca_tpu.core import hostmath
from busca_tpu.trackers.byte import (
    ByteTracker,
    ByteTrackerConfig,
    detection_coverage,
    KALMAN_CANDIDATE_CONF,
)
from busca_tpu.trackers.base import Track

FRAME = np.zeros((240, 320, 3), dtype=np.uint8)


class StubEngine:
    """Always (or never) votes for the Kalman candidate."""

    def __init__(self, kalman_prob=1.0):
        self.kalman_prob = kalman_prob
        self.calls = 0

    def _center_distances(self, tracks, dets):
        if len(tracks) == 0 or len(dets) == 0:
            return np.zeros((len(tracks), len(dets)))
        a = np.stack([t.tlbr for t in tracks])
        b = np.stack([d.tlbr for d in dets])
        return hostmath.center_distance(a, b)

    def associate(self, tracks, dets, dists_matrix=None, *,
                  extra_kalman_candidates=(), **kw):
        self.calls += 1
        if len(tracks) == 0:
            return None, None
        if len(dets) == 0 and len(extra_kalman_candidates) == 0:
            return None, None
        t, d = len(tracks), len(dets)
        probs = np.zeros((t, d + len(extra_kalman_candidates)))
        for i in range(t):
            probs[i, d + i] = self.kalman_prob
        reliable = np.array(
            [len(tr.images_mem) >= 11 for tr in tracks], dtype=bool
        )
        return probs, reliable


def _objects(t):
    """Two constant-velocity objects; returns tlbr boxes + scores."""
    b1 = np.array([50 + 3 * t, 60, 90 + 3 * t, 160])
    b2 = np.array([200, 100 + 2 * t, 240, 190 + 2 * t])
    return np.stack([b1, b2]), np.array([0.9, 0.85])


def _run(tracker, frames, dropout=(), drop_obj=0):
    """Run the tracker; detections for drop_obj vanish in dropout frames."""
    outputs = []
    for t in range(frames):
        boxes, scores = _objects(t)
        if t in dropout:
            keep = [i for i in range(2) if i != drop_obj]
            boxes, scores = boxes[keep], scores[keep]
        outputs.append(tracker.update(boxes, scores, 1.0, FRAME))
    return outputs


def test_stable_tracking_without_busca():
    trk = ByteTracker(ByteTrackerConfig())
    outs = _run(trk, 10)
    assert len(outs[-1]) == 2
    ids0 = sorted(t.track_id for t in outs[1])
    ids9 = sorted(t.track_id for t in outs[-1])
    assert ids0 == ids9  # no identity switches


def test_dropout_loses_track_without_busca():
    trk = ByteTracker(ByteTrackerConfig())
    outs = _run(trk, 12, dropout=range(5, 12))
    # the dropped object's track leaves the active output
    assert len(outs[6]) == 1


def test_busca_rescues_track_through_dropout():
    cfg = ByteTrackerConfig(use_busca=True)
    trk = ByteTracker(cfg, assoc_engine=StubEngine(kalman_prob=1.0))
    # 12+ detection frames first so the memory reaches seq_len=11
    outs = _run(trk, 26, dropout=range(13, 18))
    # during dropout, the track is kept alive at the Kalman position
    assert len(outs[15]) == 2
    # after reappearing, the identity is preserved
    ids_before = sorted(t.track_id for t in outs[12])
    ids_after = sorted(t.track_id for t in outs[24])
    assert ids_before == ids_after


def test_busca_rejects_low_prob():
    cfg = ByteTrackerConfig(use_busca=True)
    stub = StubEngine(kalman_prob=0.2)  # below busca_thresh=0.5
    trk = ByteTracker(cfg, assoc_engine=stub)
    outs = _run(trk, 20, dropout=range(13, 20))
    assert stub.calls > 0
    assert len(outs[15]) == 1  # not rescued


def test_busca_requires_complete_memory():
    # dropout starts before the memory has seq_len=11 entries -> unreliable
    cfg = ByteTrackerConfig(use_busca=True)
    trk = ByteTracker(cfg, assoc_engine=StubEngine(kalman_prob=1.0))
    outs = _run(trk, 8, dropout=range(4, 8))
    assert len(outs[5]) == 1


def test_reliable_gate_blocks_third_round():
    # p = [inf, inf] makes is_reliable always False -> BUSCA skipped
    cfg = ByteTrackerConfig(use_busca=True, reliable_thresh=[1e9, 1e9])
    stub = StubEngine(kalman_prob=1.0)
    trk = ByteTracker(cfg, assoc_engine=stub)
    outs = _run(trk, 14, dropout=range(6, 10))
    assert stub.calls == 0
    assert len(outs[7]) == 1


def test_memory_gating_second_round():
    """Low-score detections must not extend memory when
    transformer_update_mems_only_first_round is on."""
    cfg = ByteTrackerConfig(use_busca=True, track_thresh=0.6)
    trk = ByteTracker(cfg, assoc_engine=StubEngine())
    b, s = _objects(0)
    trk.update(b, s, 1.0, FRAME)
    track = trk.tracked[0]
    mem_len = len(track.images_mem)
    # next frame: same boxes but low scores -> second-round match
    b, _ = _objects(1)
    trk.update(b, np.array([0.3, 0.3]), 1.0, FRAME)
    assert len(track.images_mem) == mem_len  # memory not extended
    assert track.state == 1  # still tracked


def test_kalman_candidate_conf_value():
    assert KALMAN_CANDIDATE_CONF == 0.10000001


def test_detection_coverage_counts_union():
    frame = np.zeros((100, 200, 3), dtype=np.uint8)
    t1 = Track(np.array([0.0, 0.0, 50, 50]), 0.9)   # tlwh
    t2 = Track(np.array([25.0, 25.0, 50, 50]), 0.9)  # overlaps t1
    cov = detection_coverage(frame, [t1, t2])
    # union of two 51x51 inclusive-filled squares with 26x26 overlap
    union = 51 * 51 * 2 - 26 * 26
    np.testing.assert_allclose(cov["area_covered"], union / (100 * 200))
    assert cov["area_covered_per_obj"] == cov["area_covered"] / 2
    assert len(cov["bbox_areas"]) == 2
    # reference's axis-swapped normalization: (w/h_frame)*(h/w_frame)
    np.testing.assert_allclose(cov["bbox_areas"][0], (50 / 100) * (50 / 200))


def test_third_round_selection_without_kalman_columns():
    """A probs matrix lacking Kalman columns (no crops were available, so
    no extra candidates were built) must yield no survivals — not an
    IndexError (recover_only_kalman has nothing to recover)."""
    from busca_tpu.trackers.base import select_third_round_matches

    probs = np.full((2, 3), 0.9)  # width == n_dets: no Kalman columns
    matches, u_track = select_third_round_matches(
        probs, [True, True], n_dets=3, n_pool=2, thresh=0.5
    )
    assert matches == [] and u_track == [0, 1]


def test_mems_stay_paired_through_imageless_frames():
    """A BUSCA memory entry is a (crop, box, conf) triple consumed by
    index; an imageless update (failed imread) must not push a box-only
    entry, and the first crop after an imageless birth must trim the
    unpaired box history."""
    img = np.zeros((8, 4, 3), np.uint8)

    # imageless frame mid-life: dropped from memory, lists stay paired
    t = Track(np.array([0.0, 0.0, 4.0, 8.0]), 0.9, image=img)
    t.activate(1)
    t.update(Track(np.array([1.0, 0, 4, 8]), 0.9, image=None), 2)
    t.update(Track(np.array([2.0, 0, 4, 8]), 0.9, image=img + 1), 3)
    assert len(t.images_mem) == len(t.tlwh_mem) == len(t.conf_mem) == 2
    assert t.tlwh_mem[-1][0] == 2.0  # the imaged frames' boxes survive

    # imageless birth: unpaired history trimmed at the first crop
    t2 = Track(np.array([0.0, 0.0, 4.0, 8.0]), 0.9, image=None)
    t2.activate(1)
    t2.update(Track(np.array([5.0, 0, 4, 8]), 0.8, image=img), 2)
    assert len(t2.images_mem) == len(t2.tlwh_mem) == len(t2.conf_mem) == 1
    assert t2.tlwh_mem[0][0] == 5.0 and t2.conf_mem[0] == 0.8
