"""Tracker-state snapshot / restore (serve/snapshot.py): a stream resumed
from a snapshot in a fresh process continues bit-identically to the
uninterrupted run — the elastic-recovery capability the reference lacks
(SURVEY §5.3: tracker state dies with the process; the only lifecycle
primitive is the per-video reset, mot_evaluator.py:166-173)."""

import pickle
import socket
import threading

import jax
import numpy as np
import pytest

from busca_tpu.serve.snapshot import (
    restore_bytes,
    snapshot_bytes,
)
from busca_tpu.trackers.base import Track
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

H, W = 32, 16
SEQ_LEN, NUM_CAN = 3, 2


@pytest.fixture(scope="module", name="engine")
def _engine_fixture():
    from busca_tpu.assoc.engine import AssociationEngine
    from busca_tpu.models.busca import BuscaConfig, BuscaModel

    cfg = BuscaConfig(num_layer=1, reid_num_classes=5,
                      reid_layers=(1, 1, 1, 1))
    model = BuscaModel(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, SEQ_LEN, H, W, 3), np.float32),
        np.zeros((1, NUM_CAN, H, W, 3), np.float32),
        np.zeros((1, SEQ_LEN, 4), np.float32),
        np.zeros((1, NUM_CAN, 4), np.float32),
    )
    return AssociationEngine(
        cfg, {"params": variables["params"]}, seq_len=SEQ_LEN,
        num_candidates=NUM_CAN, crop_hw=(H, W), buckets=(1, 2, 4),
    )


def _byte_cfg():
    return ByteTrackerConfig(
        track_thresh=0.3, use_busca=True, busca_thresh=0.01,
        seq_len=SEQ_LEN, num_candidates=NUM_CAN, crop_hw=(H, W),
        use_camera_motion_compensation=False,
    )


def _stream(num_frames=24):
    from busca_tpu.eval.synthetic import default_dropout_sequence

    seq = default_dropout_sequence(num_frames)
    return [
        (seq.frame(t), *seq.detections(t)) for t in range(num_frames)
    ]


def _outputs(online):
    return sorted(
        (int(t.track_id), tuple(np.round(np.asarray(t.tlwh, float), 6)))
        for t in online
    )


def test_byte_snapshot_resume_identical(engine):
    """Snapshot mid-stream, continue the original, then replay the tail on
    a restored tracker in a simulated fresh process (id counter reset to
    1): frame-by-frame identical ids and boxes, including tracks BORN after
    the restore point."""
    stream = _stream()
    cut = 10

    Track.reset_id_counter()
    tracker = ByteTracker(_byte_cfg(), engine)
    for frame, boxes, scores in stream[:cut]:
        tracker.update(boxes, scores, 1.0, frame)
    blob = snapshot_bytes(tracker)

    # the snapshot must not disturb the live tracker: its handles are back
    assert tracker.engine is engine

    expected = [
        _outputs(tracker.update(boxes, scores, 1.0, frame))
        for frame, boxes, scores in stream[cut:]
    ]

    # fresh-process simulation: the global id counter starts over; restore
    # must advance it back past every id the snapshot carries
    Track.reset_id_counter()
    restored = restore_bytes(blob, engine=engine)
    assert restored is not tracker
    assert restored.engine is engine
    got = [
        _outputs(restored.update(boxes, scores, 1.0, frame))
        for frame, boxes, scores in stream[cut:]
    ]
    assert got == expected
    # the dropout-rescue window is inside the replayed tail: the third
    # round actually ran on the restored side
    assert any(len(o) for o in got)


def test_snapshot_ids_never_collide_when_counter_is_ahead(engine):
    """Restoring into a process whose id counter is AHEAD of the snapshot
    must not regress it: new tracks keep minting fresh ids."""
    stream = _stream(8)
    Track.reset_id_counter()
    tracker = ByteTracker(_byte_cfg(), engine)
    for frame, boxes, scores in stream[:4]:
        tracker.update(boxes, scores, 1.0, frame)
    blob = snapshot_bytes(tracker)
    old_ids = {t.track_id for t in tracker.tracked + tracker.lost}

    # another tracker in the same process mints more ids
    burned = {Track.next_id() for _ in range(5)}

    restored = restore_bytes(blob, engine=engine)
    fresh_id = Track.next_id()
    assert fresh_id not in burned
    assert fresh_id not in {
        t.track_id for t in restored.tracked + restored.lost
    }
    assert old_ids  # the scenario actually had live tracks
    assert fresh_id > max(old_ids | burned)


def test_restore_without_engine_fails_loudly(engine):
    stream = _stream(6)
    tracker = ByteTracker(_byte_cfg(), engine)
    for frame, boxes, scores in stream:
        tracker.update(boxes, scores, 1.0, frame)
    blob = snapshot_bytes(tracker)
    with pytest.raises(ValueError, match="use_busca"):
        restore_bytes(blob)


def test_snapshot_strongsort_shim_chain_roundtrip():
    """The FeatureShim -> StrongSortTracker wrapper chain snapshots and
    restores through a donor built by the same factory (the server's
    restore path); the continuation matches the uninterrupted run."""
    from busca_tpu.eval.run import FeatureShim
    from busca_tpu.trackers.strongsort import (
        StrongSortConfig,
        StrongSortTracker,
    )

    def factory():
        return FeatureShim(
            StrongSortTracker(StrongSortConfig(n_init=1)),
            None, (H, W), call_predict=True,
        )

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
              for _ in range(10)]
    boxes = np.array([[8.0, 8, 24, 40], [50.0, 10, 70, 44]])

    shim = factory()
    for f in frames[:5]:
        shim.update(boxes, np.array([0.9, 0.8]), 1.0, f)
    blob = snapshot_bytes(shim)
    expected = [
        _outputs(shim.update(boxes, np.array([0.9, 0.8]), 1.0, f))
        for f in frames[5:]
    ]

    restored = restore_bytes(blob, donor=factory())
    assert restored.trk is not shim.trk
    got = [
        _outputs(restored.update(boxes, np.array([0.9, 0.8]), 1.0, f))
        for f in frames[5:]
    ]
    assert got == expected
    assert any(len(o) == 2 for o in expected)


def test_snapshot_ghost_roundtrip():
    from busca_tpu.trackers.ghost import GhostConfig, GhostTracker

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
              for _ in range(8)]
    boxes = np.array([[8.0, 8, 24, 40]])
    feats = rng.randn(1, 16)

    trk = GhostTracker(GhostConfig())
    for f in frames[:4]:
        trk.update(boxes, np.array([0.9]), feats, f)
    blob = snapshot_bytes(trk)
    def key(tracks):
        return sorted(
            (int(t.track_id), tuple(np.round(np.asarray(t.pos, float), 6)))
            for t in tracks
        )

    expected = [key(trk.update(boxes, np.array([0.9]), feats, f))
                for f in frames[4:]]
    restored = restore_bytes(blob)
    got = [key(restored.update(boxes, np.array([0.9]), feats, f))
           for f in frames[4:]]
    assert got == expected
    assert any(expected), "stream never produced tracks"
    assert restored.frame_id == trk.frame_id
    assert set(restored.tracks) == set(trk.tracks)


def test_restricted_unpickler_rejects_forbidden_globals():
    """A snapshot blob cannot smuggle arbitrary constructors: anything
    outside busca_tpu/numpy/stdlib containers is refused at load."""

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    blob = pickle.dumps(
        {"version": 1, "counters": {}, "tracker": Evil()},
        protocol=pickle.HIGHEST_PROTOCOL,
    )
    with pytest.raises(pickle.UnpicklingError, match="forbidden"):
        restore_bytes(blob)


def test_restore_rejects_wrong_version(engine):
    tracker = ByteTracker(_byte_cfg(), engine)
    blob = snapshot_bytes(tracker)
    payload = pickle.loads(blob)
    payload["version"] = 99
    with pytest.raises(ValueError, match="format"):
        restore_bytes(pickle.dumps(payload))


def test_server_snapshot_restore_across_servers():
    """A client streams to server A, snapshots, and resumes on a freshly
    built server B (fresh-process simulation: id counter reset): the
    remaining frames produce identical replies to the uninterrupted run."""
    from test_server import _frames, _tiny_detector

    from busca_tpu.serve.server import TrackingClient, TrackingServer

    detector = _tiny_detector()

    def factory():
        # permissive thresholds so the random-weight tiny detector's
        # outputs actually become tracks (the equality is the point)
        return ByteTracker(ByteTrackerConfig(track_thresh=0.01), None)

    def make_server():
        return TrackingServer(detector, factory, min_box_area=0.0,
                              vertical_thresh=None)

    def serve(server):
        srv_sock, cli_sock = socket.socketpair()
        t = threading.Thread(
            target=server.serve_connection, args=(srv_sock,), daemon=True
        )
        t.start()
        return TrackingClient(cli_sock)

    frames = _frames(np.random.RandomState(0), n=8)

    # uninterrupted reference run
    Track.reset_id_counter()
    ref_client = serve(make_server())
    assert ref_client.start("seq")["ok"]
    ref = [ref_client.frame(f) for f in frames]
    ref_client.stop()

    # interrupted run: 4 frames on server A, snapshot, resume on server B
    Track.reset_id_counter()
    client_a = serve(make_server())
    assert client_a.start("seq")["ok"]
    for f in frames[:4]:
        client_a.frame(f)
    header, blob = client_a.snapshot()
    assert header["frame_id"] == 4
    client_a.stop()

    Track.reset_id_counter()  # server B = a fresh process
    client_b = serve(make_server())
    reply = client_b.restore(blob, frame_id=header["frame_id"],
                             name=header["name"])
    assert reply["ok"], reply
    got = [client_b.frame(f) for f in frames[4:]]
    client_b.stop()

    for r, g in zip(ref[4:], got):
        assert r["frame_id"] == g["frame_id"]
        assert r["tracks"] == g["tracks"]
    assert any(r["tracks"] for r in ref[4:]), "reference tail saw no tracks"


def test_server_snapshot_without_sequence_errors():
    from test_server import _tiny_detector

    from busca_tpu.serve.server import TrackingClient, TrackingServer

    def factory():
        return ByteTracker(ByteTrackerConfig(), None)

    server = TrackingServer(_tiny_detector(), factory)
    srv_sock, cli_sock = socket.socketpair()
    threading.Thread(
        target=server.serve_connection, args=(srv_sock,), daemon=True
    ).start()
    client = TrackingClient(cli_sock)
    with pytest.raises(RuntimeError, match="no sequence"):
        client.snapshot()
    client.stop()
