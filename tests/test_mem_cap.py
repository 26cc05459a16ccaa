"""Bounded appearance memory (``mem_cap``) — the long-stream serving mode.

The reference grows every live track's crop memory for the track's whole
life (byte_tracker.py:150-156) and only ever *samples* seq_len of it
(network.py:247-279); fine for 1-2k-frame MOT sequences, a leak for
hours-long serving streams (~150 KB/frame/track).  ``mem_cap`` keeps at
most N entries in two regions — a dense tail of the most recent N//2
admissions plus an even-stride archive of the older history
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
def test_capped_memory_bounded_dense_tail_even_archive(rng, cap):
    """The two-region invariants: len <= cap at every update; the NEWEST
    admission is always the last stored entry (zero staleness — the
    non-broader sampler reads the tail); birth is always retained (full
    span for the broader sampler); right after each compaction the list is
    exactly [even-stride archive][dense tail]."""
    t = Track(np.array([50.0, 60, 30, 60]), -1.0, image=_crop(rng))
    t.mem_cap = cap
    t.activate(1)
    n = 500
    tail_n = cap // 2
    prev_len = len(t.conf_mem)
    compactions = 0
    for tick in range(n):
        det = Track(
            np.array([50.0 + tick, 60.0, 30, 60]), float(tick),
            image=_crop(rng),
        )
        t.update(det, frame_id=tick + 2)
        # bound holds after EVERY update, not just at the end
        assert len(t.images_mem) <= cap
        assert len(t.tlwh_mem) == len(t.images_mem) == len(t.conf_mem)
        # the newest admission is ALWAYS the last stored entry (the old
        # stride-gating design could leave it minutes stale; review r4)
        assert t.conf_mem[-1] == float(tick)
        # birth (admission 0) always survives — full stored span
        assert t.conf_mem[0] == -1.0
        if len(t.conf_mem) < prev_len + 1:  # a compaction just ran
            compactions += 1
            confs = t.conf_mem
            # dense tail: the last tail_n entries are consecutive admissions
            tail = confs[-tail_n:]
            assert tail == [tail[0] + i for i in range(len(tail))]
            # even-stride archive: admission indices (conf+1; birth=-1 ->
            # 0) are consecutive multiples of one stride
            arch = np.array([c + 1 for c in confs[:-tail_n]])
            diffs = np.diff(arch)
            assert len(set(diffs.tolist())) <= 1, f"uneven archive {arch}"
            if len(diffs):
                assert arch[0] == 0 and arch[-1] == arch[0] + diffs[0] * (
                    len(arch) - 1
                )
        prev_len = len(t.conf_mem)
    assert compactions >= 3, "stream too short to exercise compaction"
    # boxes/crops stay index-paired with their admissions
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
    assert len(t.images_mem) <= 32  # one compaction converges
    assert t.conf_mem[-1] == 999.0  # newest entry survives
    assert t.conf_mem[0] == -1.0  # birth survives
    _run_updates(t, 100, rng)
    assert len(t.images_mem) <= 32


def test_imageless_track_boxes_also_bounded(rng):
    """BUSCA-off runs carry box/conf memory only; the cap bounds those too."""
    t = Track(np.array([50.0, 60, 30, 60]), 0.9)
    t.mem_cap = 8
    t.activate(1)
    for tick in range(200):
        det = Track(np.array([50.0 + tick, 60.0, 30, 60]), float(tick))
        t.update(det, frame_id=tick + 2)
        assert len(t.tlwh_mem) <= 8
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
    assert len(tr.tlwh_mem) <= 8
    # one continuous object must keep one ID despite compaction
    assert tr.track_id == 1


def test_mem_cap_validation():
    with pytest.raises(ValueError, match="mem_cap"):
        ByteTracker(ByteTrackerConfig(mem_cap=1))


def test_mem_cap_must_cover_ghost_velocity_window():
    """GHOST's bounded position history doubles as the velocity-window
    source; a cap below last_n_frames would silently shorten the velocity
    estimate (tracking_utils.py:457-476 reads the last_n tail)."""
    from busca_tpu.trackers.ghost import GhostConfig, GhostTracker

    with pytest.raises(ValueError, match="last_n_frames"):
        GhostTracker(GhostConfig(mem_cap=8, last_n_frames=16))
    GhostTracker(GhostConfig(mem_cap=16, last_n_frames=5))  # fine


def test_mem_cap_rejected_for_unsupported_tracker():
    """sort/motdt keep no crop memory; a silently dropped --mem-cap would
    mislead the operator into believing memory is bounded (review r4)."""
    from busca_tpu.eval.run import make_tracker

    for name in ("sort", "motdt"):
        with pytest.raises(ValueError, match="mem-cap"):
            make_tracker(name, {"mem_cap": 64}, None)


def test_imageless_update_burns_no_admission(rng):
    """An imageless frame on a track that carries crops is dropped from
    memory (the triple-alignment contract) WITHOUT consuming an admission
    slot — the stored tail stays gap-free (review r4)."""
    t = Track(np.array([50.0, 60, 30, 60]), -1.0, image=_crop(rng))
    t.mem_cap = 8
    t.activate(1)
    _run_updates(t, 5, rng)
    n0 = len(t.conf_mem)
    t.update(Track(np.array([99.0, 60, 30, 60]), 0.7), frame_id=50)
    assert len(t.conf_mem) == n0  # dropped, not appended box-only
    det = Track(np.array([55.0, 60, 30, 60]), 5.0, image=_crop(rng))
    t.update(det, frame_id=51)
    # admissions stay consecutive across the imageless frame
    assert t.conf_mem[-3:] == [3.0, 4.0, 5.0]


def test_strongsort_track_capped(rng):
    """SSTrack honors mem_cap with the shared two-region compaction; the
    conf-filtered memory views stay index-paired."""
    from busca_tpu.core import hostmath
    from busca_tpu.trackers.strongsort import SSTrack

    tr = SSTrack(np.array([60.0, 80, 0.5, 60]), 1, 3, 30, None, -1.0,
                 _crop(rng), conf_threshold=0.0)
    tr.mem_cap = 8
    for tick in range(300):
        xyah = np.array([60.0 + tick, 80, 0.5, 60])
        tr.update(xyah, float(tick), None, _crop(rng))
        assert len(tr.conf_mem) <= 8
        assert len(tr._tlwh_mem) == len(tr._images_mem) == len(tr.conf_mem)
        assert tr.conf_mem[-1] == float(tick)  # newest always stored
        assert tr.conf_mem[0] == -1.0  # birth survives
    # conf-filtered views stay aligned triples
    assert len(tr.tlwh_mem) >= len(tr.images_mem)


def test_ghost_track_capped(rng):
    """GhostTrack honors mem_cap; the position history is bounded too
    (warp_position_history would otherwise cost O(stream) per frame)."""
    from busca_tpu.trackers.ghost import GhostTrack

    tr = GhostTrack(1, np.array([10.0, 20, 40, 80]), rng.randn(8), -1.0,
                    1, image=_crop(rng))
    tr.mem_cap = 8
    for tick in range(300):
        pos = np.array([10.0 + tick, 20, 40 + tick, 80])
        tr.add_detection(pos, rng.randn(8), float(tick), tick + 2,
                         image=_crop(rng))
        assert len(tr.conf_mem) <= 8
        assert len(tr._tlwh_mem) == len(tr._images_mem) == len(tr.conf_mem)
        assert tr.conf_mem[-1] == float(tick)
        assert tr.conf_mem[0] == -1.0
        assert len(tr.last_pos) <= 8 and len(tr.past_frames) <= 8
    # velocity still computable from the bounded tail
    tr.update_velocity(5)
    assert np.isfinite(tr.last_v).all()


def test_strongsort_ghost_config_propagation(rng):
    from busca_tpu.trackers import (
        GhostConfig,
        GhostTracker,
        StrongSortConfig,
        StrongSortTracker,
    )

    st = StrongSortTracker(StrongSortConfig(mem_cap=16))
    st._initiate(np.array([60.0, 80, 0.5, 60]), 0.9, None, _crop(rng))
    assert st.tracks[0].mem_cap == 16
    with pytest.raises(ValueError, match="mem_cap"):
        StrongSortTracker(StrongSortConfig(mem_cap=2))

    gt = GhostTracker(GhostConfig(mem_cap=16))
    gt.frame_id = 1
    gt._new_track(np.array([10.0, 20, 40, 80]), rng.randn(8), 0.9,
                  _crop(rng))
    assert gt.tracks[1].mem_cap == 16
    with pytest.raises(ValueError, match="mem_cap"):
        GhostTracker(GhostConfig(mem_cap=3))


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
