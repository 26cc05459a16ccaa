"""Sequence runner + A/B evaluation harness.

The evaluation layer of the framework (reference L5: per-sequence loops ->
MOTChallenge writers -> metrics, e.g. adapters/ByteTrack/yolox/evaluators/
mot_evaluator.py:80-235, with per-video tracker reset at :166-173).

Distribution model (SURVEY.md §2.5): tracking is per-sequence embarrassingly
parallel; sequences are sharded across *hosts* (process-level DP — each host
runs its share and metrics are aggregated afterwards), while each host's TPU
runs the batched per-frame association.  ``shard_sequences`` implements the
static host-sharding; in a multi-host job pass ``jax.process_index()`` /
``jax.process_count()``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from busca_tpu.eval import metrics as metrics_lib
from busca_tpu.eval import mot


@dataclasses.dataclass
class SequenceResult:
    name: str
    num_frames: int
    results: List[Tuple[int, list, list, list]]
    track_time_s: float
    # optional per-stage wall times (the reference's inference/track split,
    # mot_evaluator.py:671-682), e.g. {"detector_s": ..., "tracker_s": ...}
    stage_times: Optional[Dict[str, float]] = None

    @property
    def fps(self) -> float:
        return self.num_frames / self.track_time_s if self.track_time_s else 0.0


def filter_output_tracks(online, min_box_area=100.0, vertical_thresh=1.6):
    """The reference MOT evaluator's output filter (mot_evaluator.py:216-221):
    drop tiny boxes and "vertical" boxes (w/h > thresh; pass None to skip).
    Returns (tlwhs, ids, confs)."""
    tlwhs, ids, confs = [], [], []
    for t in online:
        tlwh = t.tlwh
        vertical = (
            vertical_thresh is not None
            and tlwh[3] > 0
            and tlwh[2] / tlwh[3] > vertical_thresh
        )
        if tlwh[2] * tlwh[3] > min_box_area and not vertical:
            tlwhs.append(tlwh)
            ids.append(t.track_id)
            confs.append(t.score)
    return tlwhs, ids, confs


def write_viz_frame(viz_dir, frame_idx, frame, tlwhs, ids, scale=1.0):
    """Online-visualization frame writer (the headless equivalent of the
    reference live display, byte_tracker.py:535-572): tracked boxes + ids
    drawn on the frame, saved as ``<viz_dir>/<frame:06d>.jpg``.  ``scale``
    maps tlwh (original coords) onto the given frame's resolution."""
    import os

    import cv2

    from busca_tpu.viz import plot_box

    canvas = np.ascontiguousarray(frame).copy()
    for tlwh, tid in zip(tlwhs, ids):
        x, y, w, h = [v * scale for v in tlwh]
        plot_box(canvas, tid, [x, y, x + w, y + h], display_id=True)
    os.makedirs(viz_dir, exist_ok=True)
    cv2.imwrite(os.path.join(viz_dir, f"{frame_idx:06d}.jpg"), canvas)


def run_sequence(
    tracker,
    frames: Iterable[Optional[np.ndarray]],
    detections: Sequence[Tuple[np.ndarray, np.ndarray]],
    name: str = "seq",
    scale: float = 1.0,
    min_box_area: float = 100.0,
    vertical_thresh: Optional[float] = 1.6,
    viz_dir: Optional[str] = None,
) -> SequenceResult:
    """Drive one tracker instance over a sequence.

    Output filtering mirrors the reference MOT evaluator
    (mot_evaluator.py:216-221): boxes with area <= ``min_box_area`` (default
    100, the reference ``--min_box_area``) or aspect w/h > ``vertical_thresh``
    ("vertical" boxes, skipped when the reference's ``ignore_vertical_thresh``
    is set — pass ``vertical_thresh=None`` for that) are dropped from output.

    Args:
      tracker: object with ``update(bboxes_tlbr, scores, scale, frame)``.
      frames: per-frame images (uint8 BGR) or None (cached-detection mode).
      detections: per-frame (tlbr [N, 4], scores [N]).
      viz_dir: online visualization (reference byte_tracker.py:535-572 draws
        tracked boxes live; headless equivalent: annotated frames written as
        ``<viz_dir>/<frame:06d>.jpg``).
    """
    results = []
    t0 = time.perf_counter()
    for idx, (frame, (boxes, scores)) in enumerate(zip(frames, detections)):
        online = tracker.update(boxes, scores, scale, frame)
        tlwhs, ids, confs = filter_output_tracks(
            online, min_box_area, vertical_thresh
        )
        results.append((idx + 1, tlwhs, ids, confs))
        if viz_dir is not None and frame is not None:
            write_viz_frame(viz_dir, idx + 1, frame, tlwhs, ids)
    dt = time.perf_counter() - t0
    return SequenceResult(name, len(results), results, dt)


def run_mot_sequences_lockstep(
    seq_dirs,
    trackers,
    det_paths=None,
    min_box_area: float = 100.0,
    vertical_thresh: Optional[float] = 1.6,
    max_frames: Optional[int] = None,
    viz_dir_fn=None,
) -> List[SequenceResult]:
    """Drive several cached-detection MOT sequences frame-synchronized,
    batching every sequence's BUSCA third round into one association call
    (trackers exposing ``update_deferred``; per-request BN groups keep each
    sequence's numerics identical to its standalone run).

    The cached-detection path is the framework's canonical slice
    (BASELINE.json config #1); this is its multi-sequence throughput mode.
    """
    import cv2

    from busca_tpu.eval import mot
    from busca_tpu.trackers.base import service_deferred_updates

    infos = [mot.load_seqinfo(d) for d in seq_dirs]
    det_paths = det_paths or [None] * len(seq_dirs)
    dets_all = [
        mot.read_detections(p or os.path.join(d, "det", "det.txt"))
        for d, p in zip(seq_dirs, det_paths)
    ]
    lengths = [
        min(i.seq_length, max_frames) if max_frames else i.seq_length
        for i in infos
    ]
    results = [[] for _ in seq_dirs]
    # pixels are only consumed by BUSCA crops / features / visualization —
    # skip the JPEG decode PER SEQUENCE for pixel-free trackers (a mixed
    # A/B run must not make the base tracker's sequences pay the decode)
    needs_pixels = [
        getattr(t, "use_busca", False)
        or getattr(getattr(t, "trk", None), "use_busca", False)
        or getattr(t, "feat_fn", None) is not None
        or (viz_dir_fn is not None
            and viz_dir_fn(infos[i].name) is not None)
        for i, t in enumerate(trackers)
    ]
    t0 = time.perf_counter()
    step = 0
    while True:
        live = [i for i in range(len(seq_dirs)) if step < lengths[i]]
        if not live:
            break
        frame_id = step + 1
        onlines = {}
        pending = []
        frames_now = {}
        for i in live:
            frames_now[i] = (
                cv2.imread(infos[i].frame_path(frame_id))
                if needs_pixels[i] else None
            )
        # ECC prefetch: CMC-enabled trackers get their frame-pair alignment
        # scheduled on the shared thread pool before any update runs, so
        # the cv2 solves overlap each other and the remaining decodes.
        # Each tracker submits with its OWN recipe (byte: prev->cur; ghost:
        # template=current + gauss smoothing) so warps are identical to the
        # inline path.
        for i in live:
            trk = trackers[i]
            if hasattr(trk, "cmc_prefetch"):
                trk.cmc_prefetch(frames_now[i])
        for i in live:
            frame = frames_now[i]
            boxes, scores = dets_all[i].get(
                frame_id, (np.zeros((0, 4)), np.zeros(0))
            )
            trk = trackers[i]
            if hasattr(trk, "update_deferred"):
                gen = trk.update_deferred(boxes, scores, 1.0, frame)
                try:
                    req = next(gen)
                    pending.append((i, gen, req))
                except StopIteration as e:
                    onlines[i] = e.value
            else:
                onlines[i] = trk.update(boxes, scores, 1.0, frame)
        if pending:
            onlines.update(service_deferred_updates(pending))
        for i in live:
            tlwhs, ids, confs = filter_output_tracks(
                onlines[i], min_box_area, vertical_thresh
            )
            results[i].append((frame_id, tlwhs, ids, confs))
            if viz_dir_fn is not None and frames_now[i] is not None:
                vd = viz_dir_fn(infos[i].name)
                if vd:
                    write_viz_frame(vd, frame_id, frames_now[i], tlwhs, ids)
        step += 1
    dt = time.perf_counter() - t0
    total = max(sum(len(r) for r in results), 1)
    return [
        SequenceResult(infos[i].name, len(results[i]), results[i],
                       dt * len(results[i]) / total)
        for i in range(len(seq_dirs))
    ]


def results_to_pred(
    seq_result: SequenceResult,
) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """SequenceResult -> the {frame: (tlwh, ids, scores)} metric input."""
    out = {}
    for frame_id, tlwhs, ids, confs in seq_result.results:
        if ids:
            out[frame_id] = (
                np.stack(tlwhs),
                np.asarray(ids, int),
                np.asarray(confs),
            )
    return out


def evaluate_sequence(
    seq_result: SequenceResult,
    gt: Dict[int, Tuple[np.ndarray, np.ndarray]],
) -> metrics_lib.MotMetrics:
    return metrics_lib.evaluate_clear(gt, results_to_pred(seq_result))


def shard_sequences(
    names: Sequence[str], process_index: int, process_count: int
) -> List[str]:
    """Static host-sharding of sequences (the DP dimension of evaluation)."""
    return [n for i, n in enumerate(names) if i % process_count == process_index]


def _eval_one(args):
    name, gt, pred, iou_threshold = args
    from busca_tpu.eval import metrics as m

    return name, m.evaluate_clear(gt, pred, iou_threshold)


def evaluate_sequences_parallel(
    per_seq: Dict[str, Tuple[dict, dict]],
    num_workers: int = 8,
    iou_threshold: float = 0.5,
) -> Dict[str, metrics_lib.MotMetrics]:
    """Metric evaluation across sequences with a process pool.

    The TrackEval role of the reference's parallel evaluation
    (adapters/GHOST/src/eval_track_eval.py:97-98, USE_PARALLEL / 8 cores).

    Args:
      per_seq: {name: (gt, pred)} with the evaluate_clear input formats.
    """
    items = [
        (name, gt, pred, iou_threshold) for name, (gt, pred) in per_seq.items()
    ]
    if num_workers <= 1 or len(items) <= 1:
        return dict(_eval_one(i) for i in items)
    import multiprocessing as mp

    with mp.get_context("spawn").Pool(min(num_workers, len(items))) as pool:
        return dict(pool.map(_eval_one, items))


# ---------------------------------------------------------------------------
# Multi-host metric aggregation (the reference's dist.gather of results and
# dist.reduce of statistics at epoch end, mot_evaluator.py:244-248)
# ---------------------------------------------------------------------------

# tally layout: count-like sufficient statistics of MotMetrics so that
# cross-host aggregation is a plain vector sum (matches metrics.accumulate)
_TALLY_DIM = 10


def metrics_to_tally(m: metrics_lib.MotMetrics) -> np.ndarray:
    """MotMetrics -> additive sufficient-statistics vector [10] (f64)."""
    idtp = m.idr * m.num_gt
    # num_pred is carried explicitly; the idp reconstruction (legacy
    # fallback) collapses to 0 when idp == 0, dropping that shard's ID
    # false positives from the global IDF1/IDP denominator
    total_p = m.num_pred if m.num_pred else (
        (idtp / m.idp) if m.idp > 0 else 0.0
    )
    return np.asarray(
        [
            m.num_gt,
            m.num_false_positives,
            m.num_misses,
            m.num_switches,
            m.num_matches,
            m.motp * m.num_matches,
            idtp,
            total_p,
            m.mostly_tracked,
            m.mostly_lost,
        ],
        dtype=np.float64,
    )


def tally_to_metrics(t: np.ndarray) -> metrics_lib.MotMetrics:
    """Inverse of :func:`metrics_to_tally` after summation."""
    num_gt, fp, fn, idsw, matches, motp_w, idtp, total_p, mt, ml = t
    return metrics_lib.MotMetrics(
        mota=1.0 - (fp + fn + idsw) / num_gt if num_gt else 0.0,
        motp=motp_w / matches if matches else 0.0,
        idf1=2 * idtp / (num_gt + total_p) if (num_gt + total_p) else 0.0,
        idp=idtp / total_p if total_p else 0.0,
        idr=idtp / num_gt if num_gt else 0.0,
        num_switches=int(idsw),
        num_false_positives=int(fp),
        num_misses=int(fn),
        num_matches=int(matches),
        num_gt=int(num_gt),
        mostly_tracked=int(mt),
        mostly_lost=int(ml),
        num_pred=int(total_p),
    )


def psum_tallies(tallies: np.ndarray, mesh, axis: str = "dp") -> np.ndarray:
    """Device-collective reduction of per-shard tally rows.

    ``tallies [n, TALLY_DIM]`` is sharded over ``axis``; each shard psums its
    rows — the XLA collective rides ICI on real hardware.  Exercised on the
    virtual CPU mesh in tests.  The collective runs in f32: count-like
    values stay exact below 2^24 (~16.7M boxes); beyond that scale use
    :func:`global_metrics`, whose hi/lo-pair allgather keeps f64 exactness.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    f = jax.jit(
        shard_map(
            lambda t: jax.lax.psum(t.sum(0), axis),
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(),
        )
    )
    arr = jax.device_put(
        np.asarray(tallies, np.float32), NamedSharding(mesh, P(axis))
    )
    return np.asarray(f(arr))


def global_metrics(
    per_seq: Dict[str, metrics_lib.MotMetrics],
) -> metrics_lib.MotMetrics:
    """Aggregate metrics across every host of a multi-process job.

    Each host evaluates its sequence shard (``shard_sequences``) locally and
    contributes one summed tally; tallies are allgathered over
    ``jax.process_count()`` processes and summed — the jax.distributed
    equivalent of the reference's rank-0 gather + reduce
    (mot_evaluator.py:244-248).  Single-process runs reduce locally.
    """
    import jax

    local = np.zeros(_TALLY_DIM, np.float64)
    for m in per_seq.values():
        local += metrics_to_tally(m)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # allgather ships device arrays, which are f32 under default
        # x64-off JAX — ship an exact (hi, lo) f32 pair per value and
        # recombine + sum in f64 on host so huge tallies stay exact
        hi = local.astype(np.float32)
        lo = (local - hi.astype(np.float64)).astype(np.float32)
        gathered = np.asarray(
            multihost_utils.process_allgather(np.stack([hi, lo])),
            np.float64,
        ).reshape(-1, 2, _TALLY_DIM)
        local = (gathered[:, 0] + gathered[:, 1]).sum(axis=0)
    return tally_to_metrics(local)


def run_ab(
    make_base_tracker: Callable[[], object],
    make_busca_tracker: Callable[[], object],
    frames_factory: Callable[[], Iterable],
    detections: Sequence[Tuple[np.ndarray, np.ndarray]],
    gt: Dict[int, Tuple[np.ndarray, np.ndarray]],
    name: str = "seq",
) -> Dict[str, metrics_lib.MotMetrics]:
    """The reference's A/B acceptance pattern: same sequence, base tracker vs
    tracker+BUSCA, metric deltas out (SURVEY.md §4.3)."""
    out = {}
    for tag, factory in (("base", make_base_tracker), ("busca", make_busca_tracker)):
        seq = run_sequence(factory(), frames_factory(), detections, name=name)
        out[tag] = evaluate_sequence(seq, gt)
    return out


def run_mot_sequence(
    seq_dir: str,
    tracker,
    det_path: Optional[str] = None,
    output_path: Optional[str] = None,
    max_frames: Optional[int] = None,
    viz_dir: Optional[str] = None,
) -> SequenceResult:
    """Run a tracker over an on-disk MOTChallenge sequence.

    Uses the sequence's public detections (``det/det.txt``) unless a custom
    detection file is given — the cached-detection evaluation mode
    (BASELINE.json config #1).
    """
    import cv2

    info = mot.load_seqinfo(seq_dir)
    det_path = det_path or os.path.join(seq_dir, "det", "det.txt")
    dets_by_frame = mot.read_detections(det_path)
    n = info.seq_length
    if max_frames:
        n = min(n, max_frames)

    def frames():
        for f in range(1, n + 1):
            img = cv2.imread(info.frame_path(f))
            yield img

    detections = [
        dets_by_frame.get(f, (np.zeros((0, 4)), np.zeros(0)))
        for f in range(1, n + 1)
    ]
    result = run_sequence(tracker, frames(), detections, name=info.name,
                          viz_dir=viz_dir)
    if output_path:
        mot.write_results(output_path, result.results)
    return result
