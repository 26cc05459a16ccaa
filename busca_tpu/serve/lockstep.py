"""Lockstep tracking server: many client streams, one batched device step.

Scale-out serving on one chip.  Online tracking is causally batch-1 per
sequence, but *across* sequences the detector and the BUSCA third round batch
freely (the same insight as the eval-side ``--lockstep``,
eval/detector.py::track_sequences_lockstep; SURVEY §2.5) — and batch-1 device
steps leave the MXU mostly idle (README perf table: YOLOX-X is MXU-bound from
B=8, so 8 streams cost ~1 stream's latency).  This server accepts N
concurrent connections (one tracked sequence each, same wire protocol as
:mod:`busca_tpu.serve.server`) and a scheduler thread coalesces their
in-flight frames into one ``detect_batch`` call plus ONE batched third-round
association per tick (``service_deferred_updates``, per-request BN groups
keep every stream's numerics identical to a standalone call).

Batching policy: a tick fires when every *active* stream has a frame queued,
or after ``tick_timeout`` (default 10 ms) for stragglers — a slow client adds
at most the timeout to its peers' latency and never stalls them.  Batch
shapes are padded to power-of-two buckets (pad lanes repeat the last frame;
outputs discarded) so the compiled-step count stays bounded.  Streams with
different frame resolutions are grouped per resolution within a tick.
"""

from __future__ import annotations

import itertools
import socket
import threading
from typing import Callable, Dict, List, Optional

import numpy as np

from busca_tpu.serve.server import recv_msg, send_msg
from busca_tpu.utils.padding import next_pow2


class _Session:
    def __init__(self, sid: int):
        self.sid = sid
        self.tracker = None
        self.frame_id = 0
        self.name = None
        # one in-flight frame max (the protocol is request/response)
        self.pending_frame = None
        self.reply = None
        self.done = threading.Event()


class LockstepTrackingServer:
    """See module docstring.

    Args:
      detector: a batch-capable detector (``detect_batch(frames) -> list``).
      tracker_factory: fresh tracker per started sequence.
      tick_timeout: seconds a tick waits for stragglers before running a
        partial batch.
      min_box_area / vertical_thresh: output filters (eval-loop semantics).
    """

    def __init__(
        self,
        detector,
        tracker_factory: Callable[[], object],
        tick_timeout: float = 0.010,
        min_box_area: float = 100.0,
        vertical_thresh: Optional[float] = 1.6,
        snapshot_key: Optional[bytes] = None,
    ):
        self.detector = detector
        self.tracker_factory = tracker_factory
        self.tick_timeout = tick_timeout
        self.min_box_area = min_box_area
        self.vertical_thresh = vertical_thresh
        self.snapshot_key = snapshot_key
        self._lock = threading.Condition()
        self._sessions: Dict[int, _Session] = {}
        self._sid = itertools.count(1)
        self._stop = False
        self._scheduler = None

    # -------------------------------------------------------------- lifecycle --
    def start_scheduler(self):
        if self._scheduler is None:
            self._scheduler = threading.Thread(
                target=self._scheduler_loop, daemon=True
            )
            self._scheduler.start()

    def close(self):
        with self._lock:
            self._stop = True
            self._lock.notify_all()
        if self._scheduler is not None:
            self._scheduler.join(timeout=10)
            if self._scheduler.is_alive():
                # stuck past the timeout (e.g. a long device compile): leave
                # _stop set so it exits at its next wake instead of resuming
                # as a zombie racing a future scheduler
                return
            self._scheduler = None
        self._stop = False

    # -------------------------------------------------------------- scheduler --
    def _ready(self) -> List[_Session]:
        return [s for s in self._sessions.values()
                if s.pending_frame is not None]

    def _active_count(self) -> int:
        return sum(1 for s in self._sessions.values() if s.tracker is not None)

    def _scheduler_loop(self):
        import time

        while True:
            with self._lock:
                while not self._stop and not self._ready():
                    self._lock.wait(0.1)
                if self._stop:
                    return
                # wait (bounded) for the other active streams' frames so the
                # batch fills; stragglers forfeit their slot this tick
                deadline = time.monotonic() + self.tick_timeout
                while (
                    not self._stop
                    and len(self._ready()) < self._active_count()
                ):
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._lock.wait(left)
                if self._stop:
                    return
                batch = self._ready()
                items = [(s, s.pending_frame) for s in batch]
                for s in batch:
                    s.pending_frame = None
            # device + tracker work happens OUTSIDE the lock: new frames may
            # queue meanwhile (they wait for the next tick).  _run_tick
            # handles its own failures (it must know which streams it already
            # serviced — a serviced client may have SUBMITTED its next frame
            # by the time a later lane fails, so done.is_set() is not a
            # reliable marker here).
            self._run_tick(items)

    def _run_tick(self, items):
        """Service one tick; never raises.  Failures error only the streams
        NOT yet serviced this tick — a serviced stream's client may already
        be waiting on its next frame (done cleared, new frame queued), so
        overwriting its reply would desynchronize that stream by a frame."""
        serviced = set()
        try:
            self._run_tick_inner(items, serviced)
        except Exception as e:
            for s, _ in items:
                if s.sid in serviced:
                    continue
                s.reply = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                s.done.set()

    def _run_tick_inner(self, items, serviced):
        from busca_tpu.eval.runner import filter_output_tracks
        from busca_tpu.trackers.base import service_deferred_updates

        # group by resolution: one batched detector call per distinct shape
        by_hw: Dict[tuple, list] = {}
        for s, frame in items:
            by_hw.setdefault(frame.shape, []).append((s, frame))
        import time

        onlines = {}
        pending = []
        groups = []
        tick_t0 = time.perf_counter()
        for group in by_hw.values():
            frames = np.stack([f for _, f in group])
            n = len(group)
            n_pad = next_pow2(n)
            if n_pad > n:  # repeat the last frame; outputs discarded
                frames = np.concatenate(
                    [frames, frames[-1:].repeat(n_pad - n, 0)]
                )
            dets = self.detector.detect_batch(frames)[:n]
            for (s, _), d in zip(group, dets):
                s.frame_id += 1
                args = (d.boxes_tlbr / d.scale, d.scores, d.scale, d.image)
                if hasattr(s.tracker, "update_deferred"):
                    gen = s.tracker.update_deferred(*args)
                    try:
                        req = next(gen)
                        pending.append((s.sid, gen, req))
                    except StopIteration as e:
                        onlines[s.sid] = e.value
                else:
                    onlines[s.sid] = s.tracker.update(*args)
            groups.append((group, n))
        if pending:
            # ONE batched association serves every stream's third round —
            # across ALL resolution groups (crops are fixed-size, so the
            # association is resolution-independent)
            onlines.update(service_deferred_updates(pending))
        tick_ms = (time.perf_counter() - tick_t0) * 1e3
        for group, n in groups:
            for s, _ in group:
                tlwhs, ids, confs = filter_output_tracks(
                    onlines[s.sid], self.min_box_area, self.vertical_thresh
                )
                s.reply = {
                    "ok": True,
                    "frame_id": s.frame_id,
                    "batch": n,
                    "tick_ms": round(tick_ms, 3),
                    "tracks": [
                        {
                            "id": int(i),
                            "tlwh": [float(v) for v in t],
                            "score": float(c),
                        }
                        for t, i, c in zip(tlwhs, ids, confs)
                    ],
                }
                s.done.set()
                serviced.add(s.sid)

    # ------------------------------------------------------------ connections --
    def serve_connection(self, conn: socket.socket):
        """Request loop for one client (runs on the connection's thread)."""
        with self._lock:
            sess = _Session(next(self._sid))
            self._sessions[sess.sid] = sess
        try:
            while True:
                msg = recv_msg(conn)
                if msg is None:
                    return
                header, payload = msg
                cmd = header.get("cmd") if isinstance(header, dict) else None
                try:
                    if cmd == "start":
                        # construct OUTSIDE the scheduler lock: a factory
                        # doing real work (config parse, warm paths) must
                        # not stall every peer's frame submission
                        trk = self.tracker_factory()
                        with self._lock:
                            sess.tracker = trk
                            sess.frame_id = 0
                            sess.name = header.get("name")
                        reply = {"ok": True, "name": sess.name}
                    elif cmd == "frame":
                        reply = self._submit_frame(sess, header, payload)
                    elif cmd == "snapshot":
                        # same protocol as TrackingServer: the session's
                        # tracker is quiescent here (request/response means
                        # this client has no frame in flight; other
                        # sessions' ticks touch only their own trackers,
                        # and the id counters are IdCounter-atomic)
                        if sess.tracker is None:
                            reply = {"ok": False,
                                     "error": "no sequence started"}
                        else:
                            from busca_tpu.serve.snapshot import (
                                snapshot_bytes,
                            )

                            blob = snapshot_bytes(
                                sess.tracker,
                                meta={"frame_id": sess.frame_id,
                                      "name": sess.name},
                                key=self.snapshot_key,
                            )
                            send_msg(
                                conn,
                                {"ok": True, "frame_id": sess.frame_id,
                                 "name": sess.name},
                                blob,
                            )
                            continue
                    elif cmd == "restore":
                        from busca_tpu.serve.snapshot import (
                            restore_with_meta,
                        )

                        # factory + unpickle OUTSIDE the scheduler lock
                        # (same rationale as "start")
                        trk, meta = restore_with_meta(
                            payload, donor=self.tracker_factory(),
                            key=self.snapshot_key,
                        )
                        fid = header.get("frame_id")
                        if fid is None:
                            fid = meta.get("frame_id", 0)
                        with self._lock:
                            sess.tracker = trk
                            sess.frame_id = int(fid)
                            sess.name = (header.get("name")
                                         or meta.get("name"))
                        reply = {"ok": True, "name": sess.name,
                                 "frame_id": sess.frame_id}
                    elif cmd == "stop":
                        send_msg(conn, {"ok": True, "bye": True})
                        return
                    else:
                        reply = {
                            "ok": False, "error": f"unknown cmd {cmd!r}"
                        }
                except Exception as e:  # report, keep serving (protocol
                    # contract shared with TrackingServer.serve_connection)
                    reply = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                send_msg(conn, reply)
        finally:
            with self._lock:
                del self._sessions[sess.sid]
                self._lock.notify_all()

    def _submit_frame(self, sess: _Session, header: dict,
                      payload: bytes) -> dict:
        if sess.tracker is None:
            return {"ok": False, "error": "no sequence started (send 'start')"}
        shape = tuple(header.get("shape", ()))
        if len(shape) != 3 or shape[2] != 3:
            return {"ok": False, "error": f"bad frame shape {shape}"}
        want = int(np.prod(shape))
        if len(payload) != want:
            return {
                "ok": False,
                "error": f"payload is {len(payload)} bytes, shape needs {want}",
            }
        frame = np.frombuffer(payload, np.uint8).reshape(shape)
        sess.done.clear()
        sess.reply = None
        with self._lock:
            sess.pending_frame = frame
            self._lock.notify_all()
        sess.done.wait()
        return sess.reply

    def serve_unix(self, path: str, max_connections: Optional[int] = None):
        """Accept loop: a thread per connection, the shared scheduler batches
        across them (contrast TrackingServer.serve_unix, which is serial)."""
        from busca_tpu.serve.server import _bind_unix, _unlink_quiet

        self.start_scheduler()
        srv = _bind_unix(path)
        threads = []
        accepted = 0
        try:
            while max_connections is None or accepted < max_connections:
                conn, _ = srv.accept()
                accepted += 1
                t = threading.Thread(
                    target=self._serve_and_close, args=(conn,), daemon=True
                )
                t.start()
                threads.append(t)
        finally:
            srv.close()
            _unlink_quiet(path)
            for t in threads:
                t.join(timeout=30)
            self.close()

    def _serve_and_close(self, conn: socket.socket):
        try:
            self.serve_connection(conn)
        finally:
            conn.close()
