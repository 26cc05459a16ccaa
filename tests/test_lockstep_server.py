"""Lockstep serving (serve/lockstep.py): N concurrent client streams, one
batched detector call + one batched third round per tick, per-stream results
identical to the sequential per-sequence loop."""

import socket
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from busca_tpu.eval.synthetic import default_dropout_sequence
from busca_tpu.serve.lockstep import LockstepTrackingServer
from busca_tpu.serve.server import TrackingClient
from busca_tpu.trackers.base import Track
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

from test_byte_tracker import StubEngine
from test_lockstep_busca import _canon


class _StubBatchDetector:
    """Content-keyed stub: each frame's [0,0] pixel encodes (seq, t), so
    detections are deterministic regardless of tick composition/order."""

    def __init__(self, dets_per_seq):
        self.dets = dets_per_seq
        self.batch_sizes = []

    def detect_batch(self, frames):
        frames = np.asarray(frames)
        self.batch_sizes.append(len(frames))

        class Out:
            pass

        outs = []
        for f in frames:
            si, t = int(f[0, 0, 0]), int(f[0, 0, 1])
            boxes, scores = self.dets[si][t]
            o = Out()
            o.boxes_tlbr = boxes
            o.scores = scores
            o.scale = 1.0
            o.image = f
            outs.append(o)
        return outs

    def detect(self, frame):
        return self.detect_batch(np.asarray(frame)[None])[0]


def _mk_tracker():
    return ByteTracker(
        ByteTrackerConfig(use_busca=True),
        assoc_engine=StubEngine(kalman_prob=1.0),
    )


def _marked_sequences(n_seqs=3, n_frames=20):
    seqs = [default_dropout_sequence(n_frames, seed=s) for s in range(n_seqs)]
    dets, frames = [], []
    for si, s in enumerate(seqs):
        dets.append([s.detections(t) for t in range(n_frames)])
        fs = []
        for t in range(n_frames):
            f = s.frame(t).copy()
            f[0, 0] = (si, t, 0)
            fs.append(f)
        frames.append(fs)
    return dets, frames


def _sequential_reference(dets, frames):
    want = []
    for si in range(len(dets)):
        Track.reset_id_counter()
        trk = _mk_tracker()
        rows = []
        from busca_tpu.eval.runner import filter_output_tracks

        for t, (boxes_scores, frame) in enumerate(zip(dets[si], frames[si])):
            boxes, scores = boxes_scores
            online = trk.update(boxes, scores, 1.0, frame)
            tlwhs, ids, confs = filter_output_tracks(online, 100.0, 1.6)
            rows.append((t + 1, tlwhs, ids, confs))
        want.append(_canon(rows))
    return want


def test_lockstep_server_matches_sequential_and_batches():
    dets, frames = _marked_sequences(n_seqs=3, n_frames=20)
    detector = _StubBatchDetector(dets)
    server = LockstepTrackingServer(
        detector, _mk_tracker, tick_timeout=0.25
    )
    server.start_scheduler()

    conns = [socket.socketpair() for _ in range(3)]
    serv_threads = [
        threading.Thread(
            target=server.serve_connection, args=(srv,), daemon=True
        )
        for srv, _ in conns
    ]
    for t in serv_threads:
        t.start()

    barrier = threading.Barrier(3)

    def run_client(si):
        client = TrackingClient(conns[si][1])
        assert client.start(f"seq-{si}")["ok"]
        rows = []
        for t, frame in enumerate(frames[si]):
            barrier.wait(timeout=30)  # submit each tick together
            r = client.frame(frame)
            assert r["ok"], r
            rows.append((
                t + 1,
                [trk["tlwh"] for trk in r["tracks"]],
                [trk["id"] for trk in r["tracks"]],
                [trk["score"] for trk in r["tracks"]],
            ))
        client.stop()
        return rows

    with ThreadPoolExecutor(3) as pool:
        got = list(pool.map(run_client, range(3)))
    for t in serv_threads:
        t.join(timeout=10)
    server.close()

    want = _sequential_reference(dets, frames)
    for si in range(3):
        assert _canon(got[si]) == want[si], f"stream {si} diverged"

    # the scheduler actually batched: with 3 synchronized streams most ticks
    # coalesce (pad buckets make full ticks 4-wide)
    assert max(detector.batch_sizes) >= 2, detector.batch_sizes
    assert sum(detector.batch_sizes) >= 60  # every frame was served


def test_straggler_does_not_stall_peers():
    dets, frames = _marked_sequences(n_seqs=2, n_frames=3)
    server = LockstepTrackingServer(
        _StubBatchDetector(dets), _mk_tracker, tick_timeout=0.05
    )
    server.start_scheduler()
    conns = [socket.socketpair() for _ in range(2)]
    threads = [
        threading.Thread(
            target=server.serve_connection, args=(srv,), daemon=True
        )
        for srv, _ in conns
    ]
    for t in threads:
        t.start()
    fast = TrackingClient(conns[0][1])
    slow = TrackingClient(conns[1][1])
    fast.start("fast")
    slow.start("slow")  # active but never sends a frame
    import time

    t0 = time.monotonic()
    for t in range(3):
        r = fast.frame(frames[0][t])
        assert r["ok"]
    # 3 frames each waiting <= tick_timeout for the idle peer
    assert time.monotonic() - t0 < 3.0
    fast.stop()
    slow.stop()
    for t in threads:
        t.join(timeout=10)
    server.close()


def test_chaotic_joins_and_leaves_keep_streams_independent():
    """Streams of different lengths joining at staggered times: every
    stream's results must equal its own sequential loop regardless of the
    tick compositions it happened to share."""
    lengths = [6, 14, 10, 18, 4]
    dets, frames = _marked_sequences(n_seqs=5, n_frames=20)
    dets = [d[:n] for d, n in zip(dets, lengths)]
    frames = [f[:n] for f, n in zip(frames, lengths)]
    detector = _StubBatchDetector([d + d[-1:] * 20 for d in dets])
    server = LockstepTrackingServer(detector, _mk_tracker, tick_timeout=0.02)
    server.start_scheduler()
    conns = [socket.socketpair() for _ in range(5)]
    serv_threads = [
        threading.Thread(
            target=server.serve_connection, args=(srv,), daemon=True
        )
        for srv, _ in conns
    ]
    for t in serv_threads:
        t.start()
    import time

    def run_client(si):
        time.sleep(0.01 * si)  # staggered joins
        client = TrackingClient(conns[si][1])
        assert client.start(f"seq-{si}")["ok"]
        rows = []
        for t, frame in enumerate(frames[si]):
            r = client.frame(frame)
            assert r["ok"], r
            rows.append((
                t + 1,
                [trk["tlwh"] for trk in r["tracks"]],
                [trk["id"] for trk in r["tracks"]],
                [trk["score"] for trk in r["tracks"]],
            ))
        client.stop()  # early leavers shrink the active set
        return rows

    with ThreadPoolExecutor(5) as pool:
        got = list(pool.map(run_client, range(5)))
    for t in serv_threads:
        t.join(timeout=10)
    server.close()
    want = _sequential_reference(dets, frames)
    for si in range(5):
        assert _canon(got[si]) == want[si], f"stream {si} diverged"


def test_lockstep_server_with_dp_sharded_live_detector():
    """Multi-chip serving: the lockstep server over a dp=8-sharded live
    detector on the virtual mesh — client batches pad 2 -> pow2 -> dp=8 and
    every stream gets its replies (numeric sharded==unsharded equality is
    pinned separately in test_sharded_numerics)."""
    from busca_tpu.eval.detector import YoloxDetector, init_variables
    from busca_tpu.models.yolox import YoloxConfig
    from busca_tpu.parallel.mesh import make_mesh

    cfg = YoloxConfig(depth=0.33, width=0.125, num_classes=1)
    det = YoloxDetector(
        cfg, init_variables(cfg, (64, 96)), test_size=(64, 96),
        conf_thresh=0.05, max_outputs=16, pre_nms_topk=64,
    ).shard_lockstep(make_mesh(8, tp_size=1))

    server = LockstepTrackingServer(det, _mk_tracker, tick_timeout=0.25)
    server.start_scheduler()
    conns = [socket.socketpair() for _ in range(2)]
    threads = [
        threading.Thread(
            target=server.serve_connection, args=(srv,), daemon=True
        )
        for srv, _ in conns
    ]
    for t in threads:
        t.start()
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (48, 80, 3)).astype(np.uint8)
              for _ in range(3)]

    def run_client(si):
        client = TrackingClient(conns[si][1])
        assert client.start(f"s{si}")["ok"]
        out = [client.frame(f) for f in frames]
        client.stop()
        return out

    with ThreadPoolExecutor(2) as pool:
        got = list(pool.map(run_client, range(2)))
    for t in threads:
        t.join(timeout=10)
    server.close()
    for replies in got:
        assert all(r["ok"] for r in replies), replies
        assert [r["frame_id"] for r in replies] == [1, 2, 3]


def test_tick_error_isolated_to_unserviced_streams():
    """A stream whose output breaks mid-tick gets an error reply; a stream
    already serviced in the same tick keeps its good reply, and the
    scheduler keeps serving afterwards."""
    dets, frames = _marked_sequences(n_seqs=2, n_frames=4)

    class _Poison:
        pass  # lacks .tlwh -> filter_output_tracks raises

    made = []

    def factory():
        trk = _mk_tracker()
        if len(made) == 1:  # the second stream to start
            orig = trk.update_deferred
            calls = [0]

            def poisoned(*a, **k):
                calls[0] += 1
                if calls[0] == 1:
                    # a generator returning poison output on frame 1 only;
                    # the scheduler's final loop chokes on it AFTER the
                    # first stream was already serviced
                    def gen():
                        return [_Poison()]
                        yield  # pragma: no cover - generator marker

                    return gen()
                return orig(*a, **k)

            trk.update_deferred = poisoned
        made.append(trk)
        return trk

    server = LockstepTrackingServer(
        _StubBatchDetector(dets), factory, tick_timeout=0.25
    )
    server.start_scheduler()
    conns = [socket.socketpair() for _ in range(2)]
    threads = [
        threading.Thread(
            target=server.serve_connection, args=(srv,), daemon=True
        )
        for srv, _ in conns
    ]
    for t in threads:
        t.start()
    a = TrackingClient(conns[0][1])
    b = TrackingClient(conns[1][1])
    assert a.start("a")["ok"]
    assert b.start("b")["ok"]

    barrier = threading.Barrier(2)
    replies = {0: [], 1: []}

    def run(si, client):
        for t in range(4):
            barrier.wait(timeout=30)
            replies[si].append(client.frame(frames[si][t]))
        client.stop()

    ta = threading.Thread(target=run, args=(0, a), daemon=True)
    tb = threading.Thread(target=run, args=(1, b), daemon=True)
    ta.start(), tb.start()
    ta.join(timeout=30), tb.join(timeout=30)
    for t in threads:
        t.join(timeout=10)
    server.close()

    # stream a: every frame fine (serviced before b in each tick)
    assert all(r["ok"] for r in replies[0]), replies[0]
    # stream b: exactly its first frame errored, later frames recovered
    assert not replies[1][0]["ok"]
    assert all(r["ok"] for r in replies[1][1:]), replies[1]


def test_unix_socket_lockstep_serving(tmp_path):
    dets, frames = _marked_sequences(n_seqs=2, n_frames=4)
    path = str(tmp_path / "lock.sock")
    server = LockstepTrackingServer(
        _StubBatchDetector(dets), _mk_tracker, tick_timeout=0.05
    )
    t = threading.Thread(
        target=server.serve_unix, args=(path,),
        kwargs={"max_connections": 2}, daemon=True,
    )
    t.start()
    import time

    def stream(si):
        for _ in range(100):
            try:
                client = TrackingClient.connect_unix(path)
                break
            except (FileNotFoundError, ConnectionRefusedError):
                time.sleep(0.05)
        else:
            raise AssertionError("socket never came up")
        client.start(f"s{si}")
        out = [client.frame(f)["ok"] for f in frames[si]]
        client.stop()
        return out

    with ThreadPoolExecutor(2) as pool:
        oks = list(pool.map(stream, range(2)))
    assert all(all(o) for o in oks)
    t.join(timeout=30)
    assert not t.is_alive()


def test_mixed_resolution_tick_batches_one_association(monkeypatch):
    """Streams at different resolutions split the detector batch by shape
    but must share ONE batched third-round association per tick (the
    association runs on fixed-size crops, resolution-independent)."""
    import busca_tpu.serve.lockstep as lockstep_mod
    from busca_tpu.trackers import base as base_mod

    dets, frames = _marked_sequences(n_seqs=2, n_frames=6)
    # sequence 1 gets letterboxed to a different resolution
    frames[1] = [
        np.pad(f, ((0, 16), (0, 0), (0, 0))) for f in frames[1]
    ]
    det = _StubBatchDetector(dets)

    calls = []
    real = base_mod.service_deferred_updates

    def counting(pending):
        calls.append(len(pending))
        return real(pending)

    monkeypatch.setattr(base_mod, "service_deferred_updates", counting)

    server = lockstep_mod.LockstepTrackingServer(
        det, _mk_tracker, tick_timeout=0.5
    )
    server.start_scheduler()
    try:
        import threading

        sessions = []
        for si in range(2):
            with server._lock:
                s = lockstep_mod._Session(next(server._sid))
                server._sessions[s.sid] = s
                s.tracker = _mk_tracker()
            sessions.append(s)
        for t in range(6):
            replies = {}

            def submit(s, f):
                replies[s.sid] = server._submit_frame(
                    s, {"cmd": "frame", "shape": list(f.shape)},
                    f.tobytes(),
                )

            ths = [
                threading.Thread(target=submit, args=(s, frames[si][t]))
                for si, s in enumerate(sessions)
            ]
            for th in ths:
                th.start()
            for th in ths:
                th.join(timeout=30)
            assert all(r["ok"] for r in replies.values()), replies
    finally:
        server.close()

    # two resolutions per tick, but whenever BOTH streams deferred a third
    # round in the same tick the association ran once for both
    assert any(c == 2 for c in calls), calls
