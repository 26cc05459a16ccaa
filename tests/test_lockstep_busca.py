"""Lockstep third-round batching: B sequences' BUSCA rounds serviced by ONE
batched association must reproduce the per-sequence loop exactly."""

import numpy as np
import pytest

from busca_tpu.eval.detector import track_sequences_lockstep
from busca_tpu.eval.synthetic import default_dropout_sequence
from busca_tpu.trackers.base import Track
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

from test_byte_tracker import StubEngine


class _StubBatchDetector:
    """detect_batch stand-in: frames are ignored, detections come from
    precomputed per-sequence lists (incl. their dropout windows)."""

    def __init__(self, dets_per_seq):
        self.dets = dets_per_seq
        self.t = -1

    def detect_batch(self, frames):
        self.t += 1

        class Out:
            pass

        outs = []
        for i, d in enumerate(self.dets):
            boxes, scores = d[min(self.t, len(d) - 1)]
            o = Out()
            o.boxes_tlbr = boxes
            o.scores = scores
            o.scale = 1.0
            o.image = np.asarray(frames[i])
            outs.append(o)
        return outs


def _mk_tracker(**cfg_kw):
    return ByteTracker(
        ByteTrackerConfig(use_busca=True, **cfg_kw),
        assoc_engine=StubEngine(kalman_prob=1.0),
    )


def _frames(frames_list):
    return iter(frames_list)


def _canon(results):
    """Canonical per-frame view: rows sorted as whole boxes, ids relabeled
    by first appearance (global id counters differ between lockstep and
    standalone runs; the *structure* of identities must match exactly)."""
    relabel = {}
    out = []
    for frame_id, tlwhs, ids, confs in results:
        rows = []
        for tlwh, tid in zip(tlwhs, ids):
            if tid not in relabel:
                relabel[tid] = len(relabel)
            rows.append((round(float(tlwh[0]), 6), round(float(tlwh[1]), 6),
                         round(float(tlwh[2]), 6), round(float(tlwh[3]), 6),
                         relabel[tid]))
        out.append((frame_id, sorted(rows)))
    return out


def test_lockstep_batched_third_round_matches_sequential():
    n = 24
    seqs = [default_dropout_sequence(n, seed=s) for s in (0, 3)]
    dets = [[s.detections(t) for t in range(n)] for s in seqs]
    frames = [[s.frame(t) for t in range(n)] for s in seqs]

    # lockstep (deferred, batched third rounds)
    Track.reset_id_counter()
    det = _StubBatchDetector(dets)
    lock = track_sequences_lockstep(
        det, [_mk_tracker() for _ in seqs],
        [_frames(f) for f in frames], names=["a", "b"],
    )

    # sequential reference: same trackers driven frame by frame
    Track.reset_id_counter()
    seq_results = []
    for si, s in enumerate(seqs):
        trk = _mk_tracker()
        rows = []
        for t in range(n):
            boxes, scores = dets[si][t]
            online = trk.update(boxes, scores, 1.0, frames[si][t])
            rows.append(
                sorted(
                    (round(float(o.tlwh[0]), 6), round(float(o.tlwh[1]), 6))
                    for o in online
                    if o.tlwh[2] * o.tlwh[3] > 100
                )
            )
        seq_results.append(rows)

    # sequential runs allocate ids per sequence in isolation; compare
    # per-frame box sets + track counts, which pin the association outcome
    for i, res in enumerate(lock):
        assert res.num_frames == n
        for (fid, tlwhs, ids, confs), want in zip(res.results,
                                                  seq_results[i]):
            got = sorted(
                (round(float(t[0]), 6), round(float(t[1]), 6))
                for t in tlwhs
            )
            assert got == want, f"seq {i} frame {fid}"


def test_lockstep_rescues_through_dropout():
    """The batched third round actually fires: the dropout object survives."""
    n = 24
    seqs = [default_dropout_sequence(n, seed=s) for s in (0, 1)]
    dets = [[s.detections(t) for t in range(n)] for s in seqs]
    frames = [[s.frame(t) for t in range(n)] for s in seqs]
    Track.reset_id_counter()
    det = _StubBatchDetector(dets)
    trackers = [_mk_tracker() for _ in seqs]
    lock = track_sequences_lockstep(
        det, trackers, [_frames(f) for f in frames]
    )
    for trk in trackers:
        assert trk.engine.calls > 0  # third round fired
    for res in lock:
        counts = [len(ids) for _, _, ids, _ in res.results]
        # through the dropout window every object stays tracked
        assert min(counts[3:]) >= 2


def test_lockstep_cmc_warp_prefetch_matches_inline():
    """With camera-motion compensation on, the lockstep driver prefetches
    each sequence's ECC warp on the CMC thread pool (eval/detector.py phase
    0) — outputs must equal the sequential trackers' inline cv2 path
    exactly (same frame pairs, same solver)."""
    n = 20
    seqs = [default_dropout_sequence(n, seed=s) for s in (0, 3)]
    dets = [[s.detections(t) for t in range(n)] for s in seqs]
    frames = [[s.frame(t) for t in range(n)] for s in seqs]
    mk = lambda: _mk_tracker(use_camera_motion_compensation=True)  # noqa

    from busca_tpu.trackers import cmc

    submits = []
    orig_submit = cmc.submit_warp
    cmc.submit_warp = (
        lambda p, c, scale=1.0:
        submits.append(1) or orig_submit(p, c, scale=scale)
    )
    try:
        Track.reset_id_counter()
        det = _StubBatchDetector(dets)
        trackers = [mk() for _ in seqs]
        lock = track_sequences_lockstep(
            det, trackers, [_frames(f) for f in frames], names=["a", "b"],
        )
    finally:
        cmc.submit_warp = orig_submit
    # the prefetch actually ran: one alignment per sequence per frame pair
    assert len(submits) == 2 * (n - 1)
    assert all(t._warp_hint is None for t in trackers)

    Track.reset_id_counter()
    seq_results = []
    for si in range(len(seqs)):
        trk = mk()
        rows = []
        for t in range(n):
            boxes, scores = dets[si][t]
            online = trk.update(boxes, scores, 1.0, frames[si][t])
            rows.append(
                sorted(
                    (round(float(o.tlwh[0]), 6), round(float(o.tlwh[1]), 6))
                    for o in online
                    if o.tlwh[2] * o.tlwh[3] > 100
                )
            )
        seq_results.append(rows)
    for i, res in enumerate(lock):
        for (fid, tlwhs, ids, confs), want in zip(res.results,
                                                  seq_results[i]):
            got = sorted(
                (round(float(t[0]), 6), round(float(t[1]), 6))
                for t in tlwhs
            )
            assert got == want, f"seq {i} frame {fid}"


def test_cached_det_lockstep_matches_run_mot_sequence(tmp_path):
    """run_mot_sequences_lockstep on det.txt sequences must reproduce
    run_mot_sequence's standalone outputs."""
    import cv2

    from busca_tpu.eval.runner import (
        run_mot_sequence,
        run_mot_sequences_lockstep,
    )
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence

    dirs = []
    for si in range(2):
        d = tmp_path / f"CD-{si}"
        (d / "img1").mkdir(parents=True)
        (d / "det").mkdir()
        objs = [
            SyntheticObject(
                color=np.array([60 + 90 * si, 180, 90], np.float64),
                x0=30 + 40 * si, y0=40, vx=2.0, vy=0.5, w=26, h=56,
            ),
        ]
        n = 8
        seq = SyntheticSequence(objs, num_frames=n, height=160, width=280,
                                seed=si)
        rows = []
        for t in range(n):
            cv2.imwrite(str(d / "img1" / f"{t + 1:06d}.jpg"), seq.frame(t))
            boxes, scores = seq.detections(t)
            for b, s in zip(boxes, scores):
                rows.append(f"{t + 1},-1,{b[0]:.2f},{b[1]:.2f},"
                            f"{b[2] - b[0]:.2f},{b[3] - b[1]:.2f},{s:.3f},"
                            "-1,-1,-1")
        (d / "det" / "det.txt").write_text("\n".join(rows) + "\n")
        (d / "seqinfo.ini").write_text(
            f"[Sequence]\nname=CD-{si}\nimDir=img1\nframeRate=30\n"
            f"seqLength={n}\nimWidth=280\nimHeight=160\nimExt=.jpg\n"
        )
        dirs.append(str(d))

    Track.reset_id_counter()
    lock = run_mot_sequences_lockstep(dirs, [_mk_tracker(), _mk_tracker()])

    solos = []
    for d in dirs:
        Track.reset_id_counter()
        solos.append(run_mot_sequence(d, _mk_tracker()))

    for got, want in zip(lock, solos):
        assert got.num_frames == want.num_frames
        assert _canon(got.results) == _canon(want.results)


def test_ghost_lockstep_via_shim_matches_standalone(tmp_path):
    """Feature trackers batch through the FeatureShim's deferred pass-through
    — GHOST lockstep must match its standalone per-sequence runs."""
    import cv2

    from busca_tpu.eval.run import FeatureShim
    from busca_tpu.eval.runner import (
        run_mot_sequence,
        run_mot_sequences_lockstep,
    )
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence
    from busca_tpu.trackers import GhostConfig, GhostTracker

    dirs = []
    for si in range(2):
        d = tmp_path / f"GL-{si}"
        (d / "img1").mkdir(parents=True)
        (d / "det").mkdir()
        objs = [
            SyntheticObject(
                color=np.array([70 + 60 * si, 170, 100], np.float64),
                x0=30 + 50 * si, y0=40, vx=2.0, vy=0.3, w=26, h=56,
            ),
        ]
        n = 8
        seq = SyntheticSequence(objs, num_frames=n, height=160, width=280,
                                seed=si + 5)
        rows = []
        for t in range(n):
            cv2.imwrite(str(d / "img1" / f"{t + 1:06d}.jpg"), seq.frame(t))
            boxes, scores = seq.detections(t)
            for b, s in zip(boxes, scores):
                rows.append(f"{t + 1},-1,{b[0]:.2f},{b[1]:.2f},"
                            f"{b[2] - b[0]:.2f},{b[3] - b[1]:.2f},{s:.3f},"
                            "-1,-1,-1")
        (d / "det" / "det.txt").write_text("\n".join(rows) + "\n")
        (d / "seqinfo.ini").write_text(
            f"[Sequence]\nname=GL-{si}\nimDir=img1\nframeRate=30\n"
            f"seqLength={n}\nimWidth=280\nimHeight=160\nimExt=.jpg\n"
        )
        dirs.append(str(d))

    def mk():
        trk = GhostTracker(GhostConfig(use_busca=True),
                           StubEngine(kalman_prob=1.0))
        return FeatureShim(trk)

    lock = run_mot_sequences_lockstep(dirs, [mk(), mk()])
    solos = [run_mot_sequence(d, mk()) for d in dirs]

    for got, want in zip(lock, solos):
        assert got.num_frames == want.num_frames
        assert _canon(got.results) == _canon(want.results)
