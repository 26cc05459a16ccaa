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


def test_restore_accepts_version1_blobs(engine):
    """r4 blobs (version 1: same counters-as-ints + tracker payload, no
    'meta' key) must keep restoring across the format-2 upgrade — losing a
    held snapshot on deploy is the exact failure the feature exists to
    prevent.  Class-level id counters are not part of instance pickles, so
    the IdCounter migration does not affect old blobs."""
    from busca_tpu.serve.snapshot import restore_with_meta

    tracker = ByteTracker(_byte_cfg(), engine)
    for frame, boxes, scores in _stream(6):
        tracker.update(boxes, scores, 1.0, frame)
    blob = snapshot_bytes(tracker)
    payload = pickle.loads(blob)
    payload["version"] = 1
    del payload["meta"]
    restored, meta = restore_with_meta(pickle.dumps(payload), engine=engine)
    assert meta == {}
    assert _outputs(restored.tracked) == _outputs(tracker.tracked)


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


# --------------------------------------------------------------------------
# r5: exact-allowlist security model, HMAC signing, meta, stateful detectors
# --------------------------------------------------------------------------


def _audit_and_restore(blob, **kw):
    """Restore through the production restricted unpickler (the allowlist
    itself is the thing under test)."""
    from busca_tpu.serve.snapshot import restore_bytes

    return restore_bytes(blob, **kw)


def test_allowlist_covers_every_tracker_flavor(engine):
    """Every tracker flavor snapshots AND restores under the exact
    (module, name) allowlist — a newly-pickled class must be added to
    snapshot._ALLOWED deliberately, not admitted by prefix."""
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
              for _ in range(6)]
    boxes = np.array([[8.0, 8, 24, 40], [50.0, 10, 70, 44]])
    scores = np.array([0.9, 0.8])
    feats = rng.randn(2, 16)

    from busca_tpu.eval.run import FeatureShim, make_tracker, shim_for_runner
    from busca_tpu.trackers.ghost import GhostConfig, GhostTracker
    from busca_tpu.trackers.motdt import MotdtTracker
    from busca_tpu.trackers.sort import SortTracker
    from busca_tpu.trackers.strongsort import (
        StrongSortConfig,
        StrongSortTracker,
    )
    from busca_tpu.trackers.transcenter import TransCenterByteTracker

    built = []
    trk = ByteTracker(_byte_cfg(), engine)
    for f in frames:
        trk.update(boxes, scores, 1.0, f)
    built.append(("byte", trk, dict(engine=engine)))

    cfg = _byte_cfg()
    cfg.mem_cap = 8
    trk = ByteTracker(cfg, engine)
    for f in frames:
        trk.update(boxes, scores, 1.0, f)
    built.append(("byte+mem_cap", trk, dict(engine=engine)))

    shim = FeatureShim(StrongSortTracker(StrongSortConfig(n_init=1)),
                       None, (H, W), call_predict=True)
    for f in frames:
        shim.update(boxes, scores, 1.0, f)
    built.append(("strongsort", shim, {}))

    g = GhostTracker(GhostConfig())
    for f in frames:
        g.update(boxes, scores, feats, f)
    built.append(("ghost", g, {}))

    s = SortTracker()
    for _ in frames:
        s.update(boxes, scores)
    built.append(("sort", s, {}))

    m = MotdtTracker()
    for f in frames:
        m.update(boxes, scores, feats, f)
    built.append(("motdt", m, {}))

    ct = shim_for_runner(
        "centertrack", make_tracker("centertrack", {"track_thresh": 0.3},
                                    None), None)
    for f in frames:
        ct.update(np.array([[8.0, 8, 24, 40]]), np.array([0.9]), 1.0, f)
    built.append(("centertrack", ct, {}))

    tc = TransCenterByteTracker(ByteTrackerConfig(
        track_thresh=0.3, use_camera_motion_compensation=False), None)
    for f in frames:
        tc.update(boxes, scores, 1.0, f)
    built.append(("transcenter", tc, {}))

    for name, tracker, kw in built:
        blob = snapshot_bytes(tracker)
        restored = _audit_and_restore(blob, **kw)
        assert type(restored).__name__ == type(tracker).__name__, name


def test_unpickler_rejects_numpy_call_gadgets():
    """A module-prefix allowlist would admit numpy's private exec helper
    (numpy.testing._private.utils.runstring) and any busca_tpu function as
    a call gadget; the exact allowlist refuses both by name."""
    from busca_tpu.serve.snapshot import _RestrictedUnpickler

    for mod, name in [
        ("numpy.testing._private.utils", "runstring"),
        ("numpy", "load"),
        ("busca_tpu.serve.snapshot", "save"),
        ("busca_tpu.trackers.base", "IdCounter"),  # class, but not state
        ("builtins", "eval"),
        ("os", "system"),
    ]:
        class Evil:
            def __reduce__(self, _m=mod, _n=name):
                import importlib

                target = importlib.import_module(_m)
                for part in _n.split("."):
                    target = getattr(target, part)
                return (target, ("nop",))

        blob = pickle.dumps({"version": 2, "counters": {}, "meta": {},
                             "tracker": Evil()},
                            protocol=pickle.HIGHEST_PROTOCOL)
        with pytest.raises(pickle.UnpicklingError, match="forbidden"):
            restore_bytes(blob)


def test_hmac_signed_roundtrip_and_rejections(engine):
    """With a key: signed blobs restore; unsigned blobs and tampered blobs
    are refused BEFORE unpickling."""
    from busca_tpu.serve.snapshot import restore_with_meta

    key = b"test-hmac-key-32-bytes-aaaaaaaaa"
    stream = _stream(8)
    tracker = ByteTracker(_byte_cfg(), engine)
    for frame, boxes, scores in stream[:4]:
        tracker.update(boxes, scores, 1.0, frame)

    blob = snapshot_bytes(tracker, meta={"frame_id": 4}, key=key)
    restored, meta = restore_with_meta(blob, engine=engine, key=key)
    assert meta["frame_id"] == 4

    # unsigned blob + key -> refused
    raw = snapshot_bytes(tracker)
    with pytest.raises(ValueError, match="unsigned"):
        restore_bytes(raw, engine=engine, key=key)

    # flipped byte in the payload -> tag mismatch
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="HMAC"):
        restore_bytes(bytes(bad), engine=engine, key=key)

    # wrong key -> tag mismatch
    with pytest.raises(ValueError, match="HMAC"):
        restore_bytes(blob, engine=engine, key=b"other-key")

    # no key configured: the signed blob still restores (unpickler-only
    # trust level, documented in verify_blob)
    assert restore_bytes(blob, engine=engine) is not None


def test_server_restore_uses_blob_frame_id():
    """The stream position rides INSIDE the snapshot blob: a client that
    restores without a frame_id resumes numbering where the snapshot left
    off instead of silently rewinding to 0 (which would also re-trigger
    the frame_id==0 detector reset)."""
    from test_server import _frames, _tiny_detector

    from busca_tpu.serve.server import TrackingClient, TrackingServer

    detector = _tiny_detector()

    def factory():
        return ByteTracker(ByteTrackerConfig(track_thresh=0.01), None)

    def serve():
        server = TrackingServer(detector, factory, min_box_area=0.0,
                                vertical_thresh=None)
        srv_sock, cli_sock = socket.socketpair()
        threading.Thread(target=server.serve_connection, args=(srv_sock,),
                         daemon=True).start()
        return TrackingClient(cli_sock)

    frames = _frames(np.random.RandomState(0), n=6)
    client_a = serve()
    assert client_a.start("seq")["ok"]
    for f in frames[:3]:
        client_a.frame(f)
    header, blob = client_a.snapshot()
    client_a.stop()

    client_b = serve()
    reply = client_b.restore(blob)  # no frame_id, no name
    assert reply["ok"], reply
    assert reply["frame_id"] == 3
    assert reply["name"] == "seq"
    r = client_b.frame(frames[3])
    assert r["frame_id"] == 4
    client_b.stop()


class _StatefulStubDetector:
    """Minimal feedback detector with cross-frame state: detection = the
    brightest pixel's box, SHIFTED by the previous frame's brightness delta
    — so any reset/transient after restore changes the output stream."""

    uses_feedback = True

    def __init__(self):
        self.reset_calls = 0
        self.reset()

    def reset(self):
        self.reset_calls += 1
        self._pre = None

    def state_dict(self):
        return {"pre": None if self._pre is None else np.asarray(self._pre)}

    def load_state_dict(self, state):
        self._pre = state.get("pre")

    def detect(self, frame, current_pos=None):
        class Out:
            pass

        mean = float(np.asarray(frame, np.float32).mean())
        prev = mean if self._pre is None else float(self._pre)
        shift = (mean - prev) * 0.1
        self._pre = mean

        o = Out()
        o.boxes_tlbr = np.array([[10.0 + shift, 10.0, 30.0 + shift, 42.0]])
        o.scores = np.array([0.9])
        o.scale = 1.0
        o.image = np.asarray(frame)
        return o


def test_server_stateful_detector_snapshot_resume_bitequal():
    """A restored stream with a STATEFUL feedback detector is bit-equal to
    the unbroken run — the detector's cross-frame state rides in the blob
    (the reference's TransCenter pre_sample, transcenter.py:89-92,194) and
    restore does NOT reset it."""
    from busca_tpu.serve.server import TrackingClient, TrackingServer

    def factory():
        Track.reset_id_counter()
        return ByteTracker(ByteTrackerConfig(track_thresh=0.3), None)

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
              for _ in range(8)]

    def serve(detector):
        server = TrackingServer(detector, factory, min_box_area=0.0,
                                vertical_thresh=None)
        srv_sock, cli_sock = socket.socketpair()
        threading.Thread(target=server.serve_connection, args=(srv_sock,),
                         daemon=True).start()
        return TrackingClient(cli_sock)

    det_ref = _StatefulStubDetector()
    ref_client = serve(det_ref)
    assert ref_client.start("seq")["ok"]
    ref = [ref_client.frame(f) for f in frames]
    ref_client.stop()

    det_a = _StatefulStubDetector()
    client_a = serve(det_a)
    assert client_a.start("seq")["ok"]
    for f in frames[:4]:
        client_a.frame(f)
    _, blob = client_a.snapshot()
    client_a.stop()

    det_b = _StatefulStubDetector()
    client_b = serve(det_b)
    resets_before = det_b.reset_calls
    reply = client_b.restore(blob)
    assert reply["ok"], reply
    # the captured state was LOADED, not reset
    assert det_b.reset_calls == resets_before
    assert det_b._pre == det_a._pre
    got = [client_b.frame(f) for f in frames[4:]]
    client_b.stop()

    for r, g in zip(ref[4:], got):
        assert r["frame_id"] == g["frame_id"]
        assert r["tracks"] == g["tracks"]
    assert any(r["tracks"] for r in ref[4:])


def test_lockstep_server_snapshot_restore():
    """--lockstep serves the same snapshot/restore commands as the
    sequential server (they once replied 'unknown cmd'): snapshot one
    stream mid-run, restore it on a second lockstep server, identical
    continuation."""
    from test_lockstep_server import _StubBatchDetector, _marked_sequences

    from busca_tpu.serve.lockstep import LockstepTrackingServer
    from busca_tpu.serve.server import TrackingClient

    dets, frames = _marked_sequences(n_seqs=1, n_frames=12)

    def factory():
        return ByteTracker(ByteTrackerConfig(track_thresh=0.3), None)

    def serve():
        server = LockstepTrackingServer(
            _StubBatchDetector(dets), factory, tick_timeout=0.05,
        )
        server.start_scheduler()
        srv_sock, cli_sock = socket.socketpair()
        threading.Thread(target=server.serve_connection, args=(srv_sock,),
                         daemon=True).start()
        return server, TrackingClient(cli_sock)

    # unbroken reference
    Track.reset_id_counter()
    server_r, client_r = serve()
    assert client_r.start("seq")["ok"]
    ref = [client_r.frame(f) for f in frames[0]]
    client_r.stop()
    server_r.close()

    Track.reset_id_counter()
    server_a, client_a = serve()
    assert client_a.start("seq")["ok"]
    for f in frames[0][:6]:
        client_a.frame(f)
    header, blob = client_a.snapshot()
    assert header["frame_id"] == 6
    client_a.stop()
    server_a.close()

    Track.reset_id_counter()
    server_b, client_b = serve()
    reply = client_b.restore(blob)
    assert reply["ok"], reply
    assert reply["frame_id"] == 6
    got = [client_b.frame(f) for f in frames[0][6:]]
    client_b.stop()
    server_b.close()

    for r, g in zip(ref[6:], got):
        assert r["frame_id"] == g["frame_id"]
        assert r["tracks"] == g["tracks"]
    assert any(r["tracks"] for r in ref[6:])


def test_id_counter_is_thread_safe_under_snapshot():
    """Concurrent next_id() + snapshot peek/advance mint no duplicate ids
    (the itertools.count read-then-replace race the IdCounter replaces)."""
    from busca_tpu.serve.snapshot import _counter_classes

    Track.reset_id_counter()
    minted = []
    stop = threading.Event()

    def mint():
        while not stop.is_set():
            minted.append(Track.next_id())

    threads = [threading.Thread(target=mint) for _ in range(4)]
    for t in threads:
        t.start()
    for _ in range(200):
        with_lock = _counter_classes()["base.Track"]
        with_lock._count.peek()
        with_lock._count.advance_to(1)  # no-op advance exercises the lock
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert len(minted) == len(set(minted)), "duplicate track ids minted"


@pytest.mark.slow
def test_real_stateful_detector_state_dict_resume():
    """The REAL stateful detectors' state_dict/load_state_dict: a tiny
    CenterTrack detector resumed from captured state produces the same
    detections as the unbroken run (its pre_images analog,
    adapters/CenterTrack detector.py:100-104), and a tiny TransCenter
    detector the same for pre_sample (transcenter.py:89-92)."""
    from busca_tpu.eval.detector import (
        CenterTrackDetector,
        TransCenterDetector,
    )
    from busca_tpu.models.centertrack import CenterTrackConfig
    from busca_tpu.models.transcenter import TransCenterConfig

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 255, (48, 80, 3), dtype=np.uint8)
              for _ in range(4)]

    def run(det, fs, detect):
        return [detect(det, f) for f in fs]

    def check(build, detect, outputs_close):
        ref = build()
        ref.reset()
        want = run(ref, frames, detect)

        a = build()
        a.reset()
        run(a, frames[:2], detect)
        state = a.state_dict()
        assert state["pre_canvas"] is not None

        b = build()
        b.reset()
        b.load_state_dict(state)
        got = run(b, frames[2:], detect)
        for w, g in zip(want[2:], got):
            outputs_close(w, g)

    ct_cfg = CenterTrackConfig.tiny()

    def build_ct(_cache={}):
        if "v" not in _cache:
            d = CenterTrackDetector(ct_cfg, test_size=(32, 64),
                                    out_thresh=0.0)
            _cache["v"] = d.variables
            return d
        return CenterTrackDetector(ct_cfg, variables=_cache["v"],
                                   test_size=(32, 64), out_thresh=0.0)

    def detect_ct(det, f):
        results, _, _ = det.detect(f, tracks=[])
        return [(r["bbox"], r["score"]) for r in results]

    def close_ct(w, g):
        assert len(w) == len(g)
        for (wb, ws), (gb, gs) in zip(w, g):
            np.testing.assert_allclose(wb, gb, rtol=1e-5, atol=1e-5)
            assert abs(ws - gs) < 1e-6

    check(build_ct, detect_ct, close_ct)

    tc_cfg = TransCenterConfig.tiny()

    def build_tc(_cache={}):
        if "v" not in _cache:
            d = TransCenterDetector(tc_cfg, test_size=(32, 64),
                                    out_thresh=0.0)
            _cache["v"] = d.variables
            return d
        return TransCenterDetector(tc_cfg, variables=_cache["v"],
                                   test_size=(32, 64), out_thresh=0.0)

    def detect_tc(det, f):
        out = det.detect(f, current_pos=np.zeros((0, 4)))
        return (np.asarray(out.boxes_tlbr), np.asarray(out.scores))

    def close_tc(w, g):
        np.testing.assert_allclose(w[0], g[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(w[1], g[1], rtol=1e-5, atol=1e-5)

    check(build_tc, detect_tc, close_tc)
