"""CenterTrack dict IO and TransCenter feedback-hook adapters."""

import numpy as np

from busca_tpu.trackers.byte import ByteTrackerConfig
from busca_tpu.trackers.centertrack import CenterTrackAdapter
from busca_tpu.trackers.transcenter import (
    TransCenterByteTracker,
    boxes_to_center_priors,
)

FRAME = np.zeros((240, 320, 3), dtype=np.uint8)


def _results(t):
    return [
        {"bbox": np.array([50 + 3 * t, 60, 90 + 3 * t, 160]), "score": 0.9,
         "class": 1},
        {"bbox": np.array([200, 100 + 2 * t, 240, 190 + 2 * t]), "score": 0.85,
         "class": 1},
        {"bbox": np.array([10, 10, 30, 30]), "score": 0.95, "class": 3},  # car
    ]


def test_centertrack_dict_io():
    adapter = CenterTrackAdapter(ByteTrackerConfig(), new_thresh=0.4)
    for t in range(6):
        out = adapter.step(_results(t), FRAME)
    assert len(out) == 2  # the class-3 detection is ignored
    for d in out:
        assert set(d) >= {"score", "bbox", "ct", "active", "tracking_id", "class"}
        assert d["class"] == 1
        np.testing.assert_allclose(
            d["ct"], [(d["bbox"][0] + d["bbox"][2]) / 2,
                      (d["bbox"][1] + d["bbox"][3]) / 2],
        )
    ids = sorted(d["tracking_id"] for d in out)
    out2 = adapter.step(_results(6), FRAME)
    assert sorted(d["tracking_id"] for d in out2) == ids


def test_centertrack_empty_and_reset():
    adapter = CenterTrackAdapter(ByteTrackerConfig())
    out = adapter.step([], FRAME)
    assert out == []
    adapter.step(_results(0), FRAME)
    adapter.reset()
    assert adapter.tracks == []
    assert adapter.tracker.frame_id == 0


def test_transcenter_position_feedback():
    trk = TransCenterByteTracker(ByteTrackerConfig())
    assert trk.get_detector_positions() is None  # no tracks yet
    for t in range(4):
        boxes = np.array(
            [[50 + 3 * t, 60, 90 + 3 * t, 160], [200, 100, 240, 190]],
            dtype=np.float64,
        )
        trk.update(boxes, np.array([0.9, 0.85]), scale=0.5, frame=FRAME)
    pos = trk.get_detector_positions()
    assert pos is not None and pos.shape == (2, 4)
    # detector coordinates = original * scale
    pos_orig = trk.get_detector_positions(use_detector_coordinates=False)
    np.testing.assert_allclose(pos, pos_orig * 0.5, rtol=1e-5)

    priors = boxes_to_center_priors(pos, down_ratio=4)
    np.testing.assert_allclose(
        priors, (pos[:, :2] + pos[:, 2:]) / 2 / 4, rtol=1e-6
    )
    assert boxes_to_center_priors(None) is None


def test_centertrack_reset_keeps_new_thresh():
    """Per-video reset must preserve the adapter's fresh-track threshold
    (the reference's Tracker(opt) is rebuilt with opt.new_thresh each
    video, utils/tracker.py:11); previously reset() reverted it to the
    BYTE default track_thresh + 0.1."""
    from busca_tpu.trackers.centertrack import CenterTrackAdapter

    a = CenterTrackAdapter(ByteTrackerConfig(track_thresh=0.6),
                           new_thresh=0.35, frame_rate=14)
    assert a.tracker.det_thresh == 0.35
    buf = a.tracker.buffer_size
    a.reset()
    assert a.tracker.det_thresh == 0.35
    # frame_rate must survive too (14 fps MOT17-05/-06: buffer_size 14,
    # not the 30 fps default's 30)
    assert a.tracker.buffer_size == buf
