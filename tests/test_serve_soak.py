"""Serving soak: a >=5k-frame stream through the real server stack with
--mem-cap on, a mid-stream snapshot/restore, and the unbounded comparison
arm — the r4 serving features proven as a whole (VERDICT r4 task 10).

Three arms over ONE deterministic synthetic stream (bouncing objects +
periodic detector dropouts, eval/memcap_delta._long_stream_sequence):

  A. capped (mem_cap=64), interrupted at mid-stream by a wire
     snapshot -> restored onto a FRESH server process object;
  B. capped, unbroken — arm A must match it reply-for-reply (snapshot
     bit-exactness at soak scale);
  C. unbounded reference semantics — arm B's metrics must stay within the
     measured mem-cap deviation bound (PARITY.md: zero delta at
     cap >= ~5x seq_len), and its memory must actually grow unboundedly
     (the contrast that proves the cap engaged).

Host RSS stays bounded on the capped arm (the crop stores are the only
per-frame growth; device-side banks are capacity-fixed by construction,
pinned separately by tests/test_bank.py).  The BUSCA engine is the
deterministic StubEngine: the soak targets the serving/tracker/memory
stack, not model numerics (those have their own oracles)."""

import socket
import threading

import numpy as np
import pytest

from busca_tpu.eval.memcap_delta import _long_stream_sequence
from busca_tpu.eval.metrics import evaluate_clear
from busca_tpu.serve.server import TrackingClient, TrackingServer
from busca_tpu.trackers.base import Track
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig
from busca_tpu.utils.memory import get_ram_usage

from test_byte_tracker import StubEngine

N_FRAMES = 5000
CUT = 2500
MEM_CAP = 64
SEQ_SEED = 4


class _ScriptedDetector:
    """Sequential stub detector: detections precomputed for the whole
    stream, consumed in order (one stream per server, like the serving
    contract).  ``start`` positions a restored server at the cut."""

    def __init__(self, dets, start=0):
        self.dets = dets
        self.i = start

    def detect(self, frame_bgr):
        class Out:
            pass

        boxes, scores = self.dets[self.i]
        self.i += 1
        o = Out()
        o.boxes_tlbr = boxes
        o.scores = scores
        o.scale = 1.0
        o.image = np.asarray(frame_bgr)
        return o


def _precompute_dets():
    seq = _long_stream_sequence(SEQ_SEED, N_FRAMES, drop_period=250,
                                drop_len=8)
    return [seq.detections(t) for t in range(N_FRAMES)]


def _frames():
    """Fresh frame iterator: a new sequence object replayed from t=0 is
    deterministic (frame() draws from the sequence's own stateful rng)."""
    seq = _long_stream_sequence(SEQ_SEED, N_FRAMES, drop_period=250,
                                drop_len=8)
    for t in range(N_FRAMES):
        yield seq.frame(t)


def _serve(detector, factory, made):
    def tracking_factory():
        trk = factory()
        made.append(trk)
        return trk

    server = TrackingServer(detector, tracking_factory, min_box_area=0.0,
                            vertical_thresh=None)
    srv_sock, cli_sock = socket.socketpair()
    threading.Thread(target=server.serve_connection, args=(srv_sock,),
                     daemon=True).start()
    return TrackingClient(cli_sock)


def _factory(engine, mem_cap):
    def make():
        return ByteTracker(
            ByteTrackerConfig(track_thresh=0.5, use_busca=True,
                              busca_thresh=0.5, crop_hw=(64, 32),
                              use_camera_motion_compensation=False,
                              mem_cap=mem_cap),
            engine,
        )
    return make


def _reply_key(reply):
    return (reply["frame_id"],
            tuple(sorted((t["id"], tuple(round(v, 6) for v in t["tlwh"]))
                         for t in reply["tracks"])))


def _pred_of(replies):
    pred = {}
    for r in replies:
        if r["tracks"]:
            pred[r["frame_id"]] = (
                np.array([t["tlwh"] for t in r["tracks"]]),
                np.array([t["id"] for t in r["tracks"]], int),
                np.array([t["score"] for t in r["tracks"]]),
            )
    return pred


@pytest.mark.slow
def test_serving_soak_memcap_snapshot_restore():
    dets = _precompute_dets()
    gt = _long_stream_sequence(SEQ_SEED, N_FRAMES).ground_truth()

    # ---- arm B: capped, unbroken ------------------------------------
    Track.reset_id_counter()
    made_b = []
    client = _serve(_ScriptedDetector(dets), _factory(StubEngine(), MEM_CAP),
                    made_b)
    assert client.start("soak")["ok"]
    replies_b = []
    rss_at_1k = None
    for t, frame in enumerate(_frames()):
        replies_b.append(client.frame(frame))
        if t == 999:
            rss_at_1k = get_ram_usage()
    rss_at_end = get_ram_usage()
    client.stop()

    # bounded host memory: the capped arm's RSS growth over the last 4k
    # frames stays small (unbounded would grow ~6 KB/crop * 3 tracks/frame
    # ~ 70 MB); generous noise margin for allocator slack
    growth_mb = (rss_at_end - rss_at_1k) / 2**20
    assert growth_mb < 50, f"capped-arm RSS grew {growth_mb:.0f} MB"

    # every surviving track's memory is within the cap and spans the life
    trk_b = made_b[-1]
    pool = trk_b.tracked + trk_b.lost
    assert pool, "soak stream ended with no live tracks"
    for tr in pool:
        assert len(tr.images_mem) <= MEM_CAP
    max_adm = max(tr._mem_clock for tr in pool)
    assert max_adm > 4 * MEM_CAP, (
        f"stream too short to engage compaction: {max_adm} admissions"
    )

    # ---- arm A: capped, snapshot at CUT, restored on a fresh server --
    Track.reset_id_counter()
    made_a = []
    engine_a = StubEngine()
    client_a = _serve(_ScriptedDetector(dets),
                      _factory(engine_a, MEM_CAP), made_a)
    assert client_a.start("soak")["ok"]
    frames_iter = _frames()
    replies_a = []
    for t in range(CUT):
        replies_a.append(client_a.frame(next(frames_iter)))
    header, blob = client_a.snapshot()
    assert header["frame_id"] == CUT
    client_a.stop()

    Track.reset_id_counter()  # fresh-process simulation
    made_a2 = []
    client_a2 = _serve(_ScriptedDetector(dets, start=CUT),
                       _factory(engine_a, MEM_CAP), made_a2)
    reply = client_a2.restore(blob)
    assert reply["ok"], reply
    assert reply["frame_id"] == CUT
    for t in range(CUT, N_FRAMES):
        replies_a.append(client_a2.frame(next(frames_iter)))
    client_a2.stop()

    assert [_reply_key(r) for r in replies_a] == \
        [_reply_key(r) for r in replies_b], \
        "restored soak stream diverged from the unbroken capped run"

    # ---- arm C: unbounded reference semantics ------------------------
    Track.reset_id_counter()
    made_c = []
    client_c = _serve(_ScriptedDetector(dets), _factory(StubEngine(), None),
                      made_c)
    assert client_c.start("soak")["ok"]
    replies_c = [client_c.frame(f) for f in _frames()]
    client_c.stop()

    trk_c = made_c[-1]
    pool_c = trk_c.tracked + trk_c.lost
    assert max(len(tr.images_mem) for tr in pool_c) > 4 * MEM_CAP, (
        "unbounded arm never outgrew the cap — the contrast is vacuous"
    )

    m_cap = evaluate_clear(gt, _pred_of(replies_b))
    m_unb = evaluate_clear(gt, _pred_of(replies_c))
    # within the measured mem-cap bound (PARITY.md: zero delta at
    # cap >= ~5x seq_len on the measured regimes; soak allows a small
    # long-stream slack)
    assert abs(m_cap.mota - m_unb.mota) <= 0.01, (m_cap.mota, m_unb.mota)
    assert abs(m_cap.idf1 - m_unb.idf1) <= 0.02, (m_cap.idf1, m_unb.idf1)
    assert m_cap.num_gt == N_FRAMES * 3
