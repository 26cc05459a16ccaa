"""Online tracking server: frames in over a socket, tracks out.

The deployment half of the framework: a long-lived process owns the
compiled detector (live :class:`~busca_tpu.eval.detector.YoloxDetector` or
an AOT :class:`~busca_tpu.serve.detector.ArtifactDetector`) plus a tracker
(+ optional BUSCA engine), and clients stream frames to it — the serving
shape of the reference's offline eval loop (mot_evaluator.py:131-235),
with the same per-sequence tracker-reset semantics (mot_evaluator.py:166-173).

Wire protocol (symmetric both directions)::

    [4-byte big-endian header length][JSON header][payload bytes]

where ``header["payload_bytes"]`` (default 0) sizes the raw payload.
Client→server commands:

- ``{"cmd": "start", "name": ...}`` — begin a sequence (fresh tracker).
- ``{"cmd": "frame", "shape": [H, W, 3], "payload_bytes": N}`` + raw uint8
  BGR pixels — track one frame; reply carries the online tracks.
- ``{"cmd": "stop"}`` — close the connection.
- ``{"cmd": "snapshot"}`` — reply carries the serialized tracker state as
  the payload (elastic recovery, serve/snapshot.py; the reference loses all
  tracks on process death — SURVEY §5.3).  The blob embeds the stream
  position (frame_id/name) and, for stateful feedback detectors
  (TransCenter/CenterTrack), the detector's cross-frame canvas — so a
  restored stream is bit-equal to the unbroken one.
- ``{"cmd": "restore", "name": ...}`` + snapshot payload — resume a
  sequence from a snapshot instead of ``start`` (live handles come from
  this server's own factory; frame_id/name/detector state come from the
  blob; a ``"frame_id"`` in the header, if present, overrides the blob's).
  With ``--snapshot-key-file`` configured, only HMAC-signed blobs are
  accepted (see serve/snapshot.py's security model).

Replies: ``{"ok": true, ...}`` or ``{"ok": false, "error": msg}`` (protocol
errors are reported, not fatal: the sequence state survives a bad request).

The device work per frame is identical to the eval loop, so every latency
number in README's performance table applies per connection; the socket adds
one frame copy.  Concurrency model: one sequence per connection, connections
served one at a time per :meth:`TrackingServer.serve_unix` loop — scale-out
is processes × chips (sequences are embarrassingly parallel; SURVEY §2.5),
not threads sharing one chip.
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Callable, Optional

import numpy as np

_LEN = struct.Struct(">I")
_MAX_HEADER = 1 << 20
_MAX_PAYLOAD = 1 << 28


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


def send_msg(conn: socket.socket, header: dict, payload: bytes = b""):
    if payload:
        header = dict(header, payload_bytes=len(payload))
    raw = json.dumps(header).encode()
    conn.sendall(_LEN.pack(len(raw)) + raw + payload)


def recv_msg(conn: socket.socket):
    """Returns ``(header, payload)`` or ``None`` on a closed connection."""
    raw = _recv_exact(conn, _LEN.size)
    if raw is None:
        return None
    (hlen,) = _LEN.unpack(raw)
    if hlen > _MAX_HEADER:
        raise ValueError(f"header too large: {hlen}")
    hraw = _recv_exact(conn, hlen)
    if hraw is None:
        return None
    header = json.loads(hraw)
    n = int(header.get("payload_bytes", 0))
    if not 0 <= n <= _MAX_PAYLOAD:
        raise ValueError(f"bad payload size: {n}")
    payload = _recv_exact(conn, n) if n else b""
    if n and payload is None:
        return None
    return header, payload


def _unlink_quiet(path: str):
    import os

    try:
        os.unlink(path)
    except OSError:
        pass


def _bind_unix(path: str, backlog: int = 16) -> socket.socket:
    """Bind a unix listener, replacing a STALE socket file from a previous
    run (a dead server otherwise leaves 'Address already in use' behind).
    A live server's socket (connect succeeds) is never stolen."""
    import errno
    import os
    import stat

    try:
        if stat.S_ISSOCK(os.stat(path).st_mode):
            probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            try:
                probe.settimeout(1.0)
                probe.connect(path)
            except OSError as e:
                if e.errno == errno.ECONNREFUSED:
                    os.unlink(path)  # confirmed stale
                # timeout/other: leave it; bind below will report in-use
            else:
                probe.close()
                raise OSError(
                    errno.EADDRINUSE,
                    f"a live server is already bound to {path}",
                )
            finally:
                probe.close()
    except FileNotFoundError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(backlog)
    return srv


class TrackingServer:
    """Serve one tracker pipeline over stream sockets.

    Args:
      detector: any frame-loop detector (``detect(frame) -> DetectorOutput``).
      tracker_factory: zero-arg callable returning a fresh tracker per
        sequence (the per-video reset, mot_evaluator.py:166-173) — e.g.
        ``lambda: make_tracker("byte", kwargs, engine)``.
      min_box_area / vertical_thresh: output filters, identical to the eval
        loop (mot_evaluator.py:211-220 semantics).
    """

    def __init__(
        self,
        detector,
        tracker_factory: Callable[[], object],
        min_box_area: float = 100.0,
        vertical_thresh: Optional[float] = 1.6,
        snapshot_key: Optional[bytes] = None,
    ):
        self.detector = detector
        self.tracker_factory = tracker_factory
        self.min_box_area = min_box_area
        self.vertical_thresh = vertical_thresh
        self.snapshot_key = snapshot_key

    # ------------------------------------------------------------- handlers --
    def _handle_frame(self, state: dict, header: dict, payload: bytes) -> dict:
        from busca_tpu.eval.runner import filter_output_tracks

        tracker = state.get("tracker")
        if tracker is None:
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
        if hasattr(self.detector, "reset") and state["frame_id"] == 0:
            self.detector.reset()
        import time

        t0 = time.perf_counter()
        if getattr(self.detector, "uses_feedback", False) and hasattr(
            tracker, "get_detector_positions"
        ):
            # the stateful detector<->tracker loop (TransCenter
            # mot_evaluator.py:158): current track boxes become query priors
            det = self.detector.detect(
                frame, current_pos=tracker.get_detector_positions()
            )
        else:
            det = self.detector.detect(frame)
        online = tracker.update(
            det.boxes_tlbr / det.scale, det.scores, det.scale, det.image
        )
        ms = (time.perf_counter() - t0) * 1e3
        tlwhs, ids, confs = filter_output_tracks(
            online, self.min_box_area, self.vertical_thresh
        )
        state["frame_id"] += 1
        return {
            "ok": True,
            "frame_id": state["frame_id"],
            "ms": round(ms, 3),
            "tracks": [
                {
                    "id": int(i),
                    "tlwh": [float(v) for v in t],
                    "score": float(c),
                }
                for t, i, c in zip(tlwhs, ids, confs)
            ],
        }

    # ---------------------------------------------------------------- serve --
    def serve_connection(self, conn: socket.socket):
        """Blocking request loop for one connection (one sequence at a time).

        Handler errors are reported in-band; transport/protocol errors
        (broken pipe, oversized/garbage framing) end only THIS connection —
        the caller's accept loop must survive them."""
        state = {"tracker": None, "frame_id": 0, "name": None}
        while True:
            msg = recv_msg(conn)
            if msg is None:
                return
            header, payload = msg
            cmd = header.get("cmd") if isinstance(header, dict) else None
            try:
                if cmd == "start":
                    state["tracker"] = self.tracker_factory()
                    state["frame_id"] = 0
                    state["name"] = header.get("name")
                    reply = {"ok": True, "name": state["name"]}
                elif cmd == "frame":
                    reply = self._handle_frame(state, header, payload)
                elif cmd == "snapshot":
                    # elastic recovery: serialize the live tracker state
                    # (serve/snapshot.py) so the stream can resume on a
                    # fresh server after a crash/restart
                    if state["tracker"] is None:
                        reply = {"ok": False,
                                 "error": "no sequence started"}
                    else:
                        from busca_tpu.serve.snapshot import snapshot_bytes

                        meta = {"frame_id": state["frame_id"],
                                "name": state["name"]}
                        if hasattr(self.detector, "state_dict"):
                            # stateful feedback detectors (TransCenter
                            # pre_sample, CenterTrack pre_images) carry
                            # cross-frame arrays: capture them so the
                            # resumed stream is bit-equal, not a one-frame
                            # transient (transcenter.py:89-92,194)
                            meta["detector"] = self.detector.state_dict()
                        blob = snapshot_bytes(state["tracker"], meta=meta,
                                              key=self.snapshot_key)
                        send_msg(
                            conn,
                            {"ok": True, "frame_id": state["frame_id"],
                             "name": state["name"]},
                            blob,
                        )
                        continue
                elif cmd == "restore":
                    from busca_tpu.serve.snapshot import restore_with_meta

                    tracker, meta = restore_with_meta(
                        payload, donor=self.tracker_factory(),
                        key=self.snapshot_key,
                    )
                    state["tracker"] = tracker
                    # the blob is authoritative for the stream position; a
                    # header frame_id, when present, is an explicit override
                    if "frame_id" in header and header["frame_id"] is not None:
                        state["frame_id"] = int(header["frame_id"])
                    else:
                        state["frame_id"] = int(meta.get("frame_id", 0))
                    state["name"] = header.get("name") or meta.get("name")
                    det_state = meta.get("detector")
                    if det_state is not None and hasattr(
                            self.detector, "load_state_dict"):
                        self.detector.load_state_dict(det_state)
                    elif hasattr(self.detector, "reset"):
                        # no captured state: feedback detectors re-prime
                        # from the restored tracker (TransCenter query
                        # priors) or take a one-frame no-prior transient
                        # (CenterTrack pre_img)
                        self.detector.reset()
                    reply = {"ok": True, "name": state["name"],
                             "frame_id": state["frame_id"]}
                elif cmd == "stop":
                    send_msg(conn, {"ok": True, "bye": True})
                    return
                else:
                    reply = {"ok": False, "error": f"unknown cmd {cmd!r}"}
            except Exception as e:  # report, keep serving
                reply = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            send_msg(conn, reply)

    def serve_unix(self, path: str, max_connections: Optional[int] = None):
        """Accept loop on a unix socket (connections served sequentially —
        one chip, one pipeline; run multiple server processes to scale)."""
        import sys

        srv = _bind_unix(path)
        served = 0
        try:
            while max_connections is None or served < max_connections:
                conn, _ = srv.accept()
                try:
                    self.serve_connection(conn)
                except (OSError, ValueError, json.JSONDecodeError) as e:
                    # one misbehaving client (disconnect mid-reply, garbage
                    # framing) must not take the server down
                    print(f"connection error: {type(e).__name__}: {e}",
                          file=sys.stderr, flush=True)
                finally:
                    conn.close()
                served += 1
        finally:
            srv.close()
            _unlink_quiet(path)


class TrackingClient:
    """Convenience client for :class:`TrackingServer`."""

    def __init__(self, conn: socket.socket):
        self.conn = conn

    @classmethod
    def connect_unix(cls, path: str) -> "TrackingClient":
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.connect(path)
        return cls(conn)

    def _roundtrip(self, header: dict, payload: bytes = b"") -> dict:
        send_msg(self.conn, header, payload)
        msg = recv_msg(self.conn)
        if msg is None:
            raise ConnectionError("server closed the connection")
        return msg[0]

    def start(self, name: str = "seq") -> dict:
        return self._roundtrip({"cmd": "start", "name": name})

    def frame(self, frame_bgr: np.ndarray) -> dict:
        frame_bgr = np.ascontiguousarray(frame_bgr, np.uint8)
        return self._roundtrip(
            {"cmd": "frame", "shape": list(frame_bgr.shape)},
            frame_bgr.tobytes(),
        )

    def snapshot(self) -> tuple:
        """Fetch the live tracker state: ``(header, blob)`` — resume later
        with :meth:`restore` on any server built from the same factory."""
        send_msg(self.conn, {"cmd": "snapshot"})
        msg = recv_msg(self.conn)
        if msg is None:
            raise ConnectionError("server closed the connection")
        header, blob = msg
        if not header.get("ok", False):
            raise RuntimeError(header.get("error", "snapshot failed"))
        return header, blob

    def restore(self, blob: bytes, frame_id: Optional[int] = None,
                name: Optional[str] = None) -> dict:
        """Resume from a snapshot blob.  frame_id/name default to the values
        recorded inside the blob; pass them only to override."""
        header = {"cmd": "restore", "name": name}
        if frame_id is not None:
            header["frame_id"] = int(frame_id)
        return self._roundtrip(header, blob)

    def stop(self) -> dict:
        reply = self._roundtrip({"cmd": "stop"})
        self.conn.close()
        return reply


def build_tracker_runtime(args):
    """Engine + per-stream tracker factory from parsed CLI args.

    Shared by :func:`main` and unit-tested directly
    (tests/test_server.py): the ``--use-busca`` wiring once kept
    ``build_engine``'s ``(engine, tracker_kwargs)`` tuple as the engine
    and dropped the YAML's tracker kwargs.  Mirrors the eval CLI's
    composition (eval/run.py): the YAML bundle's tracker kwargs apply
    first, explicit CLI flags win.
    """
    engine, busca_kwargs = None, {}
    if args.use_busca:
        from busca_tpu.eval.run import build_engine

        engine, busca_kwargs = build_engine(
            args.busca_config, args.busca_ckpt,
            dtype=getattr(args, "busca_dtype", None),
            reid_stats=getattr(args, "reid_stats", "batch"),
        )
        busca_kwargs["use_busca"] = True

    from busca_tpu.eval.run import make_tracker, shim_for_runner

    feature_extractor = None
    if args.reid_ckpt:
        from busca_tpu.eval.features import ReidFeatureExtractor

        feature_extractor = ReidFeatureExtractor.from_checkpoint(
            args.reid_ckpt
        )

    # Explicit CLI flags win; an unset --track-thresh falls back to the
    # YAML bundle's value (parity with the eval CLI, which has no such
    # flag) and finally to ByteTrack's 0.6 default.
    tracker_kwargs = dict(busca_kwargs)
    if getattr(args, "track_thresh", None) is not None:
        tracker_kwargs["track_thresh"] = args.track_thresh
    elif "track_thresh" not in tracker_kwargs:
        tracker_kwargs["track_thresh"] = 0.6
    if getattr(args, "cmc_scale", 1.0) != 1.0:
        tracker_kwargs["cmc_scale"] = args.cmc_scale
    if getattr(args, "mem_cap", None) is not None:
        # fail at STARTUP, not on the first client connection: an invalid
        # cap or an unsupported tracker would otherwise bind the socket and
        # then error every stream from inside factory()
        from busca_tpu.eval.run import MEM_CAP_TRACKERS

        if args.mem_cap < 4:
            raise ValueError(
                f"--mem-cap must be >= 4 (recommended >= ~5*seq_len), "
                f"got {args.mem_cap}"
            )
        if args.tracker not in MEM_CAP_TRACKERS:
            raise ValueError(
                f"--mem-cap only applies to the byte-family trackers "
                f"{MEM_CAP_TRACKERS}, not --tracker {args.tracker}"
            )
        tracker_kwargs["mem_cap"] = args.mem_cap

    def factory():
        trk = make_tracker(args.tracker, dict(tracker_kwargs), engine)
        return shim_for_runner(args.tracker, trk, feature_extractor)

    return engine, factory


def main(argv=None):
    """``python -m busca_tpu.serve.server`` — serve a detector+tracker on a
    unix socket.  ``--detector-artifact`` loads an AOT artifact; otherwise a
    live detector is built like the eval CLI."""
    import argparse

    from busca_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--socket", required=True, help="unix socket path")
    p.add_argument("--detector", default=None, help="yolox size name, e.g. "
                   "yolox-x (live detector)")
    p.add_argument("--detector-ckpt", default=None)
    p.add_argument("--centertrack-arch", default="dla34",
                   choices=("dla34", "tiny", "mobilenet"))
    p.add_argument("--centertrack-sampling", default="deformable",
                   choices=("deformable", "windowed", "local"))
    p.add_argument("--detector-artifact", default=None,
                   help="serve.export artifact directory (AOT)")
    p.add_argument("--test-h", type=int, default=800)
    p.add_argument("--test-w", type=int, default=1440)
    p.add_argument("--det-conf", type=float, default=0.1)
    p.add_argument("--tracker", default="byte")
    from busca_tpu.trackers.cmc import parse_scale as _cmc_scale_type
    p.add_argument("--cmc-scale", type=_cmc_scale_type, default=1.0,
                   help="ECC camera-motion solve resolution in (0, 1]; "
                        "1.0 = the reference's full-res recipe; 0.5 is "
                        "5.9x faster at 0.015 px worst corner error "
                        "(measured, PARITY.md 'ECC')")
    p.add_argument("--track-thresh", type=float, default=None,
                   help="first-round score threshold; default = the YAML "
                        "bundle's value when --use-busca, else 0.6")
    p.add_argument("--mem-cap", type=int, default=None,
                   help="bound each track's appearance memory to this many "
                        "entries (dense recent tail + even-stride archive; "
                        "long-stream serving; default None = reference "
                        "semantics, unbounded growth; use >= ~5*seq_len — "
                        "measured zero-delta, PARITY.md; byte-family, "
                        "strongsort/deepsort and ghost trackers)")
    p.add_argument("--reid-ckpt", default=None,
                   help="ReID checkpoint for feature trackers "
                        "(strongsort/ghost/motdt)")
    p.add_argument("--use-busca", action="store_true")
    p.add_argument("--busca-config", default=None)
    p.add_argument("--busca-ckpt", default=None)
    p.add_argument("--busca-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="BUSCA compute dtype: bfloat16 (MXU-native "
                        "production default, matches the eval CLI) or "
                        "float32 for bit-faithful parity")
    p.add_argument("--reid-stats", choices=("batch", "frozen", "auto"),
                   default="batch",
                   help="'batch' = reference batch-stat BN domain "
                        "adaptation; 'frozen' = stored running stats + "
                        "cross-frame feature caching (opt-in throughput "
                        "mode, PARITY.md 'Frozen-stats ReID'); 'auto' = "
                        "frozen numerics, fused path below the measured "
                        "per-call T-crossover (engine.AUTO_FUSED_MAX_T)")
    p.add_argument("--snapshot-key-file", default=None,
                   help="file holding an HMAC key: snapshot blobs are "
                        "signed and restore refuses unsigned/forged blobs "
                        "(serve/snapshot.py security model). Without it, "
                        "restore still runs the exact-allowlist restricted "
                        "unpickler but blobs are operator-trusted state")
    p.add_argument("--max-connections", type=int, default=None)
    p.add_argument("--min-box-area", type=float, default=None,
                   help="output filter (mot_evaluator.py:216-221); default "
                        "100 px, but 0 for --tracker centertrack whose "
                        "eval loop emits unfiltered dicts")
    p.add_argument("--vertical-thresh", type=float, default=None,
                   help="w/h output filter; default 1.6, disabled for "
                        "--tracker centertrack (eval-loop parity); pass "
                        "0 to disable")
    p.add_argument("--lockstep", action="store_true",
                   help="serve concurrent connections with one batched "
                        "device step per tick (serve/lockstep.py) instead "
                        "of sequentially")
    p.add_argument("--tick-timeout", type=float, default=0.010,
                   help="lockstep straggler wait per tick, seconds")
    p.add_argument("--lockstep-dp", type=int, default=None,
                   help="shard the lockstep batch over a dp-way device mesh "
                        "(multi-chip serving; needs a live --detector)")
    args = p.parse_args(argv)

    if args.use_busca and not args.busca_config:
        p.error("--use-busca requires --busca-config")

    if args.detector_artifact:
        import json as _json
        import os as _os

        from busca_tpu.serve.detector import (
            ArtifactBatchDetector,
            ArtifactDetector,
        )

        with open(_os.path.join(args.detector_artifact,
                                "manifest.json")) as f:
            kind = _json.load(f).get("kind")
        if kind == "yolox_detector_batch_steps":
            detector = ArtifactBatchDetector(args.detector_artifact)
        else:
            if args.lockstep:
                p.error("--lockstep needs a batch-capable detector: a live "
                        "--detector or a --batches artifact family "
                        "(busca-export --batches 1 2 4 8)")
            detector = ArtifactDetector(args.detector_artifact)
    elif args.detector == "transcenter":
        if args.lockstep:
            p.error("transcenter cannot lockstep: its detector is stateful "
                    "per sequence and takes per-frame tracker feedback")
        from busca_tpu.eval.detector import build_transcenter_detector

        try:
            detector = build_transcenter_detector(
                ckpt=args.detector_ckpt,
                test_size=(args.test_h, args.test_w),
                out_thresh=args.det_conf,
            )
        except ValueError as e:
            p.error(str(e))
    elif args.detector == "centertrack":
        if args.lockstep:
            p.error("centertrack cannot lockstep: its detector is stateful "
                    "per sequence and consumes tracker feedback")
        if args.tracker != "centertrack":
            p.error("--detector centertrack needs --tracker centertrack")
        from busca_tpu.eval.detector import (
            CenterTrackRunnerDetector,
            build_centertrack_detector,
        )

        try:
            detector = CenterTrackRunnerDetector(build_centertrack_detector(
                arch=args.centertrack_arch,
                sampling=args.centertrack_sampling,
                ckpt=args.detector_ckpt,
                test_size=(args.test_h, args.test_w),
                out_thresh=args.det_conf,
            ))
        except ValueError as e:
            p.error(str(e))
    elif args.detector:
        from busca_tpu.eval.detector import YoloxDetector

        detector = YoloxDetector.build(
            size=args.detector.split("-")[-1],
            ckpt_path=args.detector_ckpt,
            test_size=(args.test_h, args.test_w),
            conf_thresh=args.det_conf,
        )
        if args.lockstep_dp:
            if not args.lockstep:
                p.error("--lockstep-dp requires --lockstep")
            from busca_tpu.parallel.mesh import make_mesh

            detector.shard_lockstep(make_mesh(args.lockstep_dp, tp_size=1))
    else:
        p.error("pick --detector or --detector-artifact")
    if args.lockstep_dp and args.detector_artifact:
        p.error("--lockstep-dp needs a live --detector (artifacts are "
                "compiled without mesh shardings)")

    engine, factory = build_tracker_runtime(args)

    snapshot_key = None
    if args.snapshot_key_file:
        with open(args.snapshot_key_file, "rb") as f:
            snapshot_key = f.read().strip()
        if not snapshot_key:
            p.error(f"--snapshot-key-file {args.snapshot_key_file} is empty")

    # output-filter defaults follow the matching eval loop: the BYTE-family
    # runner applies the mot_evaluator filter; track_frames_centertrack
    # emits every dict track unfiltered
    min_area = args.min_box_area
    if min_area is None:
        min_area = 0.0 if args.tracker == "centertrack" else 100.0
    vthresh = args.vertical_thresh
    if vthresh is None:
        vthresh = None if args.tracker == "centertrack" else 1.6
    elif vthresh <= 0:
        vthresh = None

    if args.lockstep:
        from busca_tpu.serve.lockstep import LockstepTrackingServer

        server = LockstepTrackingServer(
            detector, factory, tick_timeout=args.tick_timeout,
            min_box_area=min_area, vertical_thresh=vthresh,
            snapshot_key=snapshot_key,
        )
    else:
        server = TrackingServer(detector, factory,
                                min_box_area=min_area,
                                vertical_thresh=vthresh,
                                snapshot_key=snapshot_key)
    print(f"serving on {args.socket}", flush=True)
    server.serve_unix(args.socket, max_connections=args.max_connections)


if __name__ == "__main__":
    main()
