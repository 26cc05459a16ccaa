"""Bounded appearance memory (``mem_cap``) — the long-stream serving mode.

The reference grows every live track's crop memory for the track's whole
life (byte_tracker.py:150-156) and only ever *samples* seq_len of it
(network.py:247-279); fine for 1-2k-frame MOT sequences, a leak for
hours-long serving streams (~150 KB/frame/track).  ``mem_cap`` keeps at
most N entries evenly spaced over the admitted history by stride doubling
(Track._compact_mems).  Default None == exact reference behavior (pinned
by the composed oracle suite, which never sets it).
"""

import numpy as np
import pytest

from busca_tpu.trackers import ByteTracker, ByteTrackerConfig
from busca_tpu.trackers.base import Track

H, W = 32, 16


def _crop(rng):
    return rng.randint(0, 255, (H, W, 3), dtype=np.uint8)


def _run_updates(track, n, rng):
    """Drive ``n`` gated memory updates; the detection's score encodes the
    update tick so surviving entries are identifiable in conf_mem."""
    for tick in range(n):
        det = Track(
            np.array([50.0 + tick, 60.0, 30, 60]), float(tick),
            image=_crop(rng),
        )
        track.update(det, frame_id=tick + 2)


def test_default_is_unbounded(rng):
    t = Track(np.array([50.0, 60, 30, 60]), 0.9, image=_crop(rng))
    t.activate(1)
    _run_updates(t, 200, rng)
    assert len(t.images_mem) == 201  # birth + every update, like the reference


@pytest.mark.parametrize("cap", [8, 16])
def test_capped_memory_bounded_even_and_newest(rng, cap):
    t = Track(np.array([50.0, 60, 30, 60]), -1.0, image=_crop(rng))
    t.mem_cap = cap
    t.activate(1)
    n = 500
    for tick in range(n):
        det = Track(
            np.array([50.0 + tick, 60.0, 30, 60]), float(tick),
            image=_crop(rng),
        )
        t.update(det, frame_id=tick + 2)
        # bound holds after EVERY update, not just at the end
        assert len(t.images_mem) < cap
        assert len(t.tlwh_mem) == len(t.images_mem) == len(t.conf_mem)
        # the newest admitted entry is always retained
        admitted = [c for c in t.conf_mem if c >= 0]
        assert admitted, "memory lost all real entries"
        last_admit = max(admitted)
        assert t.conf_mem[-1] == last_admit
    ticks = np.array([c for c in t.conf_mem if c >= 0])
    # even coverage: surviving ticks are uniformly spaced at the final
    # stride and span (almost) the whole history
    diffs = np.diff(ticks)
    assert len(set(diffs.tolist())) == 1, f"uneven spacing {diffs}"
    stride = int(diffs[0])
    assert ticks[-1] > n - 1 - stride  # newest end covered
    assert ticks[0] < 2 * stride  # oldest end covered
    # boxes/crops stay index-paired with their ticks
    for conf, box in zip(t.conf_mem, t.tlwh_mem):
        if conf >= 0:
            assert box[0] == 50.0 + conf


def test_cap_set_midlife_compacts_existing_history(rng):
    t = Track(np.array([50.0, 60, 30, 60]), -1.0, image=_crop(rng))
    t.activate(1)
    _run_updates(t, 100, rng)
    assert len(t.images_mem) == 101
    t.mem_cap = 32
    det = Track(np.array([200.0, 60, 30, 60]), 999.0, image=_crop(rng))
    t.update(det, frame_id=200)
    assert len(t.images_mem) < 32  # converges in one update (looped halving)
    assert t.conf_mem[-1] == 999.0  # newest survives the halvings
    _run_updates(t, 100, rng)
    assert len(t.images_mem) < 32


def test_imageless_track_boxes_also_bounded(rng):
    """BUSCA-off runs carry box/conf memory only; the cap bounds those too."""
    t = Track(np.array([50.0, 60, 30, 60]), 0.9)
    t.mem_cap = 8
    t.activate(1)
    for tick in range(200):
        det = Track(np.array([50.0 + tick, 60.0, 30, 60]), float(tick))
        t.update(det, frame_id=tick + 2)
        assert len(t.tlwh_mem) < 8
        assert not t.images_mem


def test_tracker_propagates_mem_cap(rng):
    Track.reset_id_counter()
    cfg = ByteTrackerConfig(track_thresh=0.5, mem_cap=8,
                            use_camera_motion_compensation=False)
    tracker = ByteTracker(cfg)
    box = np.array([[40.0, 40, 80, 120]])
    for f in range(120):
        online = tracker.update(box + f, np.array([0.9]))
    assert len(online) == 1
    tr = online[0]
    assert tr.mem_cap == 8
    assert len(tr.tlwh_mem) < 8
    # one continuous object must keep one ID despite compaction
    assert tr.track_id == 1


def test_mem_cap_validation():
    with pytest.raises(ValueError, match="mem_cap"):
        ByteTracker(ByteTrackerConfig(mem_cap=1))


def test_capped_track_feeds_engine(rng):
    """A compacted track flows through the association engine unchanged
    (the broader-memory sampler consumes whatever list it is handed)."""
    from busca_tpu.assoc.engine import _get_track_mem

    t = Track(np.array([50.0, 60, 30, 60]), 0.9, image=_crop(rng))
    t.mem_cap = 12
    t.activate(1)
    _run_updates(t, 300, rng)
    crops, boxes = _get_track_mem(t, 5, use_broader_memory=True)
    assert len(crops) == 5 and boxes.shape == (5, 4)
    for c in crops:
        assert c.shape == (H, W, 3)
