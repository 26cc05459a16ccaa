"""CLI: run a tracker (optionally +BUSCA) over sequences and report metrics.

Reference-compatible surface (scripts/run_*.sh + tools/track.py:119-124):
``--use-busca``, ``--busca-config`` (the shipped YAMLs load unchanged),
``--busca-ckpt`` (a converted .npz or a reference .pth).  Tracker selection
via ``--tracker {byte,strongsort,ghost,centertrack,transcenter,sort,motdt,
deepsort}`` (the last three are the reference MOT evaluator's alternate
paths, mot_evaluator.py:258-625).

Modes:
- ``--synthetic``: the built-in dropout benchmark sequence (no data needed) —
  runs base vs BUSCA A/B and prints the metric table.
- ``--mot-dir``: MOTChallenge sequence directories with ``det/det.txt``
  detections (the cached-detection path, BASELINE.json config #1); writes
  MOTChallenge result txts and evaluates vs gt when present.
- ``--mot-dir ... --detector yolox-x --detector-ckpt bytetrack_x.pth``: the
  live detector-in-the-loop path (reference mot_evaluator.py:131-235) — runs
  YOLOX per frame, NMS on device, feeds the tracker; per-video BYTE threshold
  table applied (disable with ``--ignore-custom-byte-thresholds``).

Example::

    python -m busca_tpu.eval.run --synthetic --use-busca \
        --busca-config /root/reference/config/ByteTrack/MOT17/config_bytetrack_mot17.yml \
        --busca-ckpt model_busca.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np


def build_engine(busca_config_path: str, ckpt_path: Optional[str],
                 crop_hw=(384, 128), dtype: Optional[str] = None,
                 bank_slots: Optional[int] = None,
                 reid_stats: str = "batch"):
    """Materialize an AssociationEngine from YAML + checkpoint.

    ``dtype`` overrides the YAML's compute dtype; the production default is
    bfloat16 (MXU-native, agreement-tested vs float32 in tests/test_bf16.py).
    Pass ``float32`` for bit-faithful reference-parity runs.

    ``bank_slots``: capacity of the device-resident crop bank (assoc/bank.py)
    — None picks 4096 on TPU (~600 MB HBM at 384x128) and a small 256 on the
    CPU backend; 0 disables banking (crops re-uploaded per call, the
    reference's traffic pattern).

    ``reid_stats``: 'batch' (default — GHOST batch-stat domain adaptation,
    the reference semantics) or 'frozen' (stored running BN statistics +
    cross-frame feature caching; an opt-in throughput deviation — see
    PARITY.md "Frozen-stats ReID").  Frozen mode needs the checkpoint's
    running statistics (any converted ``.pth`` carries them).
    """
    import jax

    from busca_tpu.assoc.bank import DeviceCropBank
    from busca_tpu.assoc.engine import AssociationEngine
    from busca_tpu.config import load_tracker_bundle
    from busca_tpu.models.busca import BuscaModel
    from busca_tpu.models.checkpoint import load_params_npz
    from busca_tpu.models.convert import (
        convert_busca_state_dict,
        load_torch_checkpoint,
        merge_params,
    )

    import dataclasses

    args, busca_cfg, tracker_kwargs = load_tracker_bundle(busca_config_path)
    if dtype is not None:
        busca_cfg = dataclasses.replace(busca_cfg, dtype=dtype)
    if reid_stats in ("frozen", "auto"):
        # the frozen-config init declares the running-stat variables the
        # checkpoint's batch_stats overlay fills in
        busca_cfg = dataclasses.replace(busca_cfg, reid_use_batch_stats=False)
    model = BuscaModel(busca_cfg)
    seq_len = tracker_kwargs.get("seq_len", 11)
    num_candidates = tracker_kwargs.get("num_candidates", 5)

    # init (shapes only) then overlay the checkpoint
    h, w = crop_hw
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, seq_len, h, w, 3), np.float32),
        np.zeros((1, num_candidates, h, w, 3), np.float32),
        np.zeros((1, seq_len, 4), np.float32),
        np.zeros((1, num_candidates, 4), np.float32),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    if ckpt_path:
        if ckpt_path.endswith(".npz"):
            loaded = load_params_npz(ckpt_path)
        else:
            loaded = convert_busca_state_dict(
                load_torch_checkpoint(ckpt_path), ignore_reid_fc=True
            )
        params = merge_params(params, loaded.get("params", loaded))
        if batch_stats is not None and loaded.get("batch_stats"):
            batch_stats = merge_params(batch_stats, loaded["batch_stats"])
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if reid_stats in ("frozen", "auto"):
        bank = None  # frozen/auto modes have their own HBM FEATURE bank
        # (slot indices, not pixels) — the crop bank is the batch-mode path
    else:
        if bank_slots is None:
            bank_slots = 4096 if jax.default_backend() == "tpu" else 256
        bank = DeviceCropBank(crop_hw, bank_slots) if bank_slots else None
    engine = AssociationEngine(
        busca_cfg,
        variables,
        seq_len=seq_len,
        num_candidates=num_candidates,
        crop_hw=crop_hw,
        bank=bank,
        reid_stats=reid_stats,
    )
    return engine, tracker_kwargs


# trackers that store per-track appearance-crop memory and support the
# --mem-cap bound (trackers/base.py compact_mem_lists); sort/motdt keep no
# crop memory at all, so a cap there would be a silently-dropped no-op
MEM_CAP_TRACKERS = (
    "byte", "bytetrack", "centertrack", "transcenter",
    "strongsort", "deepsort", "ghost",
)


def make_tracker(name: str, tracker_kwargs: dict, engine, crop_hw=(384, 128)):
    if (tracker_kwargs.get("mem_cap") is not None
            and name not in MEM_CAP_TRACKERS):
        raise ValueError(
            f"--mem-cap only applies to trackers that store appearance "
            f"memory {MEM_CAP_TRACKERS}; --tracker {name} keeps no crop "
            f"memory, so a cap would be a silently-dropped no-op"
        )
    from busca_tpu.trackers import (
        ByteTracker,
        ByteTrackerConfig,
        CenterTrackAdapter,
        GhostConfig,
        GhostTracker,
        MotdtConfig,
        MotdtTracker,
        SortConfig,
        SortTracker,
        StrongSortConfig,
        StrongSortTracker,
        TransCenterByteTracker,
    )

    if name == "motdt":
        # the reference's evaluate_motdt alternate:
        # OnlineTracker(min_cls_score=track_thresh) (mot_evaluator.py:553)
        known = {f.name for f in MotdtConfig.__dataclass_fields__.values()}
        cfg = MotdtConfig(
            **{k: v for k, v in tracker_kwargs.items() if k in known}
        )
        if "track_thresh" in tracker_kwargs:
            cfg.min_cls_score = tracker_kwargs["track_thresh"]
        return MotdtTracker(cfg)

    if name == "sort":
        # the reference's evaluate_sort alternate: Sort(track_thresh)
        # (mot_evaluator.py:307-308,322-323); SORT has no BUSCA hook
        known = {f.name for f in SortConfig.__dataclass_fields__.values()}
        cfg = SortConfig(
            **{k: v for k, v in tracker_kwargs.items() if k in known}
        )
        if "track_thresh" in tracker_kwargs:
            cfg.det_thresh = tracker_kwargs["track_thresh"]
        return SortTracker(cfg)

    if name in ("byte", "bytetrack", "centertrack", "transcenter"):
        known = {f.name for f in ByteTrackerConfig.__dataclass_fields__.values()}
        cfg = ByteTrackerConfig(
            **{k: v for k, v in tracker_kwargs.items() if k in known}
        )
        cfg.crop_hw = crop_hw
        cfg.use_busca = engine is not None and tracker_kwargs.get("use_busca", True)
        if name == "centertrack":
            return CenterTrackAdapter(cfg, engine)
        if name == "transcenter":
            return TransCenterByteTracker(cfg, engine)
        return ByteTracker(cfg, engine)
    if name in ("strongsort", "deepsort"):
        known = {f.name for f in StrongSortConfig.__dataclass_fields__.values()}
        kw = {k: v for k, v in tracker_kwargs.items() if k in known}
        if name == "deepsort":
            # the reference's evaluate_deepsort alternate = vanilla DeepSORT:
            # cascade matching, feature gallery, plain Kalman — the
            # StrongSORT upgrades (NSA/EMA/MC/woC) toggled off
            kw.setdefault("nsa", False)
            kw.setdefault("ema", False)
            kw.setdefault("mc", False)
            kw.setdefault("woc", False)
            kw.setdefault("max_cosine_distance", 0.2)
            kw.setdefault("nn_budget", 100)
        cfg = StrongSortConfig(**kw)
        cfg.crop_hw = crop_hw
        cfg.use_busca = engine is not None
        return StrongSortTracker(cfg, engine)
    if name == "ghost":
        known = {f.name for f in GhostConfig.__dataclass_fields__.values()}
        cfg = GhostConfig(
            **{k: v for k, v in tracker_kwargs.items() if k in known}
        )
        cfg.crop_hw = crop_hw
        cfg.use_busca = engine is not None
        return GhostTracker(cfg, engine)
    raise ValueError(f"unknown tracker: {name}")


class FeatureShim:
    """Adapt feature-consuming trackers (StrongSORT, GHOST) to the runner's
    ``update(boxes, scores, scale, frame)`` protocol.

    Features come from a :class:`busca_tpu.eval.features.ReidFeatureExtractor`
    when given (the reference GHOST path, base_tracker.py:116); otherwise a
    distinct-identity placeholder (synthetic/smoke runs).
    """

    def __init__(self, trk, feature_extractor=None, crop_hw=(384, 128),
                 call_predict=False):
        self.trk = trk
        self.feat_fn = feature_extractor
        self.crop_hw = crop_hw
        self.call_predict = call_predict

    def _features(self, boxes, scale, frame):
        n = len(boxes)
        if self.feat_fn is not None and frame is not None and n:
            from busca_tpu.trackers.base import extract_uint8_crops

            crops = extract_uint8_crops(
                frame, np.asarray(boxes) * scale, self.crop_hw
            )
            return self.feat_fn(np.stack(crops))
        return np.eye(max(n, 1), 16)[:n]

    def update(self, boxes, scores, scale, frame):
        if self.call_predict:
            self.trk.predict()
        feats = self._features(boxes, scale, frame)
        return self.trk.update(boxes, scores, feats, frame)

    def cmc_prefetch(self, cur_frame):
        """Forward the lockstep driver's ECC prefetch to the wrapped
        tracker (which owns the recipe and the warp hint)."""
        inner = getattr(self.trk, "cmc_prefetch", None)
        return inner(cur_frame) if inner is not None else None

    def update_deferred(self, boxes, scores, scale, frame):
        """Pass-through to the wrapped tracker's deferred mode (lockstep
        third-round batching) when it has one."""
        if not hasattr(self.trk, "update_deferred"):
            def _gen():
                out = self.update(boxes, scores, scale, frame)
                return out
                yield  # pragma: no cover — makes this a generator

            return _gen()
        if self.call_predict:
            self.trk.predict()
        feats = self._features(boxes, scale, frame)
        return self.trk.update_deferred(boxes, scores, feats, frame)


class CenterTrackShim:
    """Adapt the dict-IO CenterTrack adapter to the runner protocol."""

    def __init__(self, trk):
        self.trk = trk

    def get_detector_positions(self):
        """Current dict tracks for the stateful detector's prior heatmap
        (the serving loop's feedback hook; detector.py:143-156 passes the
        tracker into the detector the same way)."""
        return self.trk.tracks

    def cmc_prefetch(self, cur_frame):
        inner = getattr(self.trk, "cmc_prefetch", None)
        return inner(cur_frame) if inner is not None else None

    def update(self, boxes, scores, scale, frame):
        dicts = [
            {"bbox": b, "score": s, "class": 1}
            for b, s in zip(boxes, scores)
        ]
        outs = self.trk.step(dicts, frame, scale)

        class _T:  # minimal view for the runner
            def __init__(self, d):
                bb = d["bbox"]
                self.tlwh = np.array(
                    [bb[0], bb[1], bb[2] - bb[0], bb[3] - bb[1]]
                )
                self.track_id = d["tracking_id"]
                self.score = d["score"]

        return [_T(d) for d in outs]


def shim_for_runner(name: str, tracker, feature_extractor=None,
                    crop_hw=(384, 128)):
    """Wrap a tracker for the runner protocol where its native IO differs."""
    if name in ("strongsort", "deepsort"):
        return FeatureShim(tracker, feature_extractor, crop_hw,
                           call_predict=True)
    if name in ("ghost", "motdt"):
        return FeatureShim(tracker, feature_extractor, crop_hw)
    if name == "centertrack":
        return CenterTrackShim(tracker)
    return tracker


def run_synthetic(args, engine, tracker_kwargs) -> dict:
    from busca_tpu.eval.metrics import evaluate_hota
    from busca_tpu.eval.runner import (
        evaluate_sequence,
        results_to_pred,
        run_sequence,
    )
    from busca_tpu.eval.synthetic import default_dropout_sequence

    seq = default_dropout_sequence(args.num_frames)
    dets = [seq.detections(t) for t in range(args.num_frames)]
    gt = seq.ground_truth()
    out = {}
    variants = [("base", None)]
    if engine is not None:
        variants.append(("busca", engine))
    for tag, eng in variants:
        tracker = make_tracker(args.tracker, tracker_kwargs, eng, args.crop_hw)
        frames = (seq.frame(t) for t in range(args.num_frames))
        tracker = shim_for_runner(args.tracker, tracker,
                                  crop_hw=args.crop_hw)
        res = run_sequence(tracker, frames, dets, name="synthetic")
        m = evaluate_sequence(res, gt)
        h = evaluate_hota(gt, results_to_pred(res))
        out[tag] = {
            "mota": m.mota,
            "idf1": m.idf1,
            "hota": h["hota"],
            "ids": m.num_switches,
            "fp": m.num_false_positives,
            "fn": m.num_misses,
            "fps": res.fps,
        }
    return out


_AFLINK_CACHE = {}


def _postprocess_result(args, res, out_path):
    """AFLink + GSI over the written result rows, exactly the reference's
    post-tracking order (strong_sort.py:29-46: link first, then smooth);
    rewrites the txt and returns an updated SequenceResult."""
    from busca_tpu.eval import mot
    from busca_tpu.eval.runner import SequenceResult
    from busca_tpu.trackers.postprocess import (
        aflink,
        gaussian_smoothed_interpolation,
    )

    rows = mot.read_mot_file(out_path)
    if rows.size == 0:
        return res
    if args.aflink:
        if "model" not in _AFLINK_CACHE:
            from busca_tpu.models.aflink import (
                AFLinkModel,
                train_aflink_synthetic,
            )

            if args.aflink == "synthetic":
                model, params, acc = train_aflink_synthetic(steps=200)
                print(f"aflink: synthetic-trained link model (acc {acc:.2f})")
            else:
                import jax

                from busca_tpu.models.checkpoint import load_params_npz

                model = AFLinkModel()
                params = load_params_npz(args.aflink)
                params = params.get("params", params)
            _AFLINK_CACHE["model"] = (model, params)
        model, params = _AFLINK_CACHE["model"]
        rows = aflink(rows, model=model, params=params)
    if args.gsi:
        rows = gaussian_smoothed_interpolation(rows)
    # rewrite txt from the processed rows
    by_frame = {}
    for r in rows:
        by_frame.setdefault(int(r[0]), []).append(r)
    results = []
    for f in sorted(by_frame):
        rs = np.asarray(by_frame[f])
        results.append(
            (f, list(rs[:, 2:6]), rs[:, 1].astype(int).tolist(),
             rs[:, 6].tolist() if rs.shape[1] > 6 else [1.0] * len(rs))
        )
    mot.write_results(out_path, results)
    return SequenceResult(res.name, res.num_frames, results,
                          res.track_time_s)


def _viz_dir_for(args, name):
    """Per-sequence online-visualization directory (or None)."""
    if not getattr(args, "online_visualization", False):
        return None
    return os.path.join(args.output_dir, f"{name}_viz")


def _run_lockstep_cached_det(args, engine, seq_tracker_kwargs,
                             feature_extractor=None):
    """Frame-synchronized multi-sequence run over cached det.txt detections
    with batched BUSCA third rounds (eval/runner.run_mot_sequences_lockstep)."""
    import json as _json

    from busca_tpu.eval import mot
    from busca_tpu.eval.metrics import evaluate_clear
    from busca_tpu.eval.runner import (
        global_metrics,
        results_to_pred,
        run_mot_sequences_lockstep,
    )

    names = [os.path.basename(d.rstrip("/")) for d in args.mot_dir]
    trackers = [
        shim_for_runner(
            args.tracker,
            make_tracker(args.tracker, seq_tracker_kwargs(n), engine,
                         args.crop_hw),
            feature_extractor, args.crop_hw,
        )
        for n in names
    ]
    # viz_dir_fn must be None when visualization is off: a non-None callable
    # forces need_pixels=True in the runner, defeating the skip-frame-decode
    # fast path for pixel-free configs (e.g. --lockstep --tracker sort).
    viz_dir_fn = (
        (lambda n: _viz_dir_for(args, n))
        if getattr(args, "online_visualization", False) else None
    )
    results = run_mot_sequences_lockstep(
        args.mot_dir, trackers, max_frames=args.max_frames,
        viz_dir_fn=viz_dir_fn,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    per_seq = {}
    for name, seq_dir, res in zip(names, args.mot_dir, results):
        out_path = os.path.join(args.output_dir, f"{name}.txt")
        mot.write_results(out_path, res.results)
        if args.gsi or args.aflink:
            res = _postprocess_result(args, res, out_path)
        print(f"{name}: {res.num_frames} frames @ {res.fps:.1f} fps")
        gt_path = os.path.join(seq_dir, "gt", "gt.txt")
        if os.path.exists(gt_path):
            gt = mot.read_gt(gt_path)
            pred = results_to_pred(res)
            per_seq[name] = evaluate_clear(gt, pred)
            if args.hota:
                from busca_tpu.eval.metrics import evaluate_hota

                h = evaluate_hota(gt, pred)
                print(f"  HOTA {h['hota'] * 100:.3f}  "
                      f"DetA {h['deta'] * 100:.3f}  "
                      f"AssA {h['assa'] * 100:.3f}  "
                      f"DetRe {h['detre'] * 100:.3f}  "
                      f"DetPr {h['detpr'] * 100:.3f}  "
                      f"AssRe {h['assre'] * 100:.3f}  "
                      f"AssPr {h['asspr'] * 100:.3f}  "
                      f"LocA {h['loca'] * 100:.3f}")
    if per_seq:
        agg = global_metrics(per_seq)
        print(_json.dumps(agg.as_dict(), indent=2))
    return per_seq


def _run_lockstep_cached(args, engine, tracker_kwargs):
    """Frame-synchronized multi-sequence StrongSORT over cached artifacts
    with batched BUSCA third rounds (eval/strongsort_io)."""
    import json as _json

    from busca_tpu.eval import mot
    from busca_tpu.eval.metrics import evaluate_clear
    from busca_tpu.eval.runner import global_metrics, results_to_pred
    from busca_tpu.eval.strongsort_io import (
        load_ecc_warps,
        run_cached_sequences_lockstep,
    )

    ecc_all = load_ecc_warps(args.ecc_json) if args.ecc_json else None
    specs, names = [], []
    for seq_dir in args.mot_dir:
        name = os.path.basename(seq_dir.rstrip("/"))
        det_file = args.npy_det
        if os.path.isdir(det_file):
            det_file = os.path.join(det_file, f"{name}.npy")
        specs.append(
            (seq_dir, det_file, ecc_all.get(name) if ecc_all else None)
        )
        names.append(name)
    trackers = [
        make_tracker("strongsort", tracker_kwargs, engine, args.crop_hw)
        for _ in specs
    ]
    results = run_cached_sequences_lockstep(
        specs, trackers, min_confidence=args.min_confidence,
        max_frames=args.max_frames,
    )
    os.makedirs(args.output_dir, exist_ok=True)
    per_seq = {}
    for name, seq_dir, res in zip(names, args.mot_dir, results):
        out_path = os.path.join(args.output_dir, f"{name}.txt")
        mot.write_results(out_path, res.results)
        if args.gsi or args.aflink:
            res = _postprocess_result(args, res, out_path)
        print(f"{name}: {res.num_frames} frames @ {res.fps:.1f} fps")
        gt_path = os.path.join(seq_dir, "gt", "gt.txt")
        if os.path.exists(gt_path):
            per_seq[name] = evaluate_clear(
                mot.read_gt(gt_path), results_to_pred(res)
            )
    if per_seq:
        agg = global_metrics(per_seq)
        print(_json.dumps(agg.as_dict(), indent=2))
    return per_seq


def _run_lockstep(args, detector, engine, seq_tracker_kwargs,
                  feature_extractor):
    """Batched-across-sequences evaluation: sequences grouped by resolution,
    one detector call per lockstep frame (eval/detector.py
    track_sequences_lockstep)."""
    import collections

    from busca_tpu.eval import mot
    from busca_tpu.eval.detector import track_sequences_lockstep
    from busca_tpu.eval.metrics import evaluate_clear
    from busca_tpu.eval.runner import global_metrics, results_to_pred

    infos = {d: mot.load_seqinfo(d) for d in args.mot_dir}
    groups = collections.defaultdict(list)
    for d, info in infos.items():
        groups[(info.im_height, info.im_width)].append(d)

    per_seq = {}
    for (h, w), dirs in groups.items():
        trackers, frame_iters, names = [], [], []
        for d in dirs:
            info = infos[d]
            names.append(info.name)
            tracker = make_tracker(
                args.tracker, seq_tracker_kwargs(info.name), engine,
                args.crop_hw,
            )
            trackers.append(
                shim_for_runner(args.tracker, tracker, feature_extractor,
                                args.crop_hw)
            )

            from busca_tpu.eval.loader import sequence_frames

            frame_iters.append(iter(sequence_frames(info)))
        results = track_sequences_lockstep(
            detector, trackers, frame_iters, names=names
        )
        os.makedirs(args.output_dir, exist_ok=True)
        for d, res in zip(dirs, results):
            mot.write_results(
                os.path.join(args.output_dir, f"{res.name}.txt"), res.results
            )
            print(f"{res.name}: {res.num_frames} frames (lockstep group "
                  f"{len(dirs)} @ {h}x{w})")
            gt_path = os.path.join(d, "gt", "gt.txt")
            if os.path.exists(gt_path):
                per_seq[res.name] = evaluate_clear(
                    mot.read_gt(gt_path), results_to_pred(res)
                )
    if per_seq:
        agg = global_metrics(per_seq)
        print(json.dumps(agg.as_dict(), indent=2))
    return per_seq


def main(argv=None):
    from busca_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tracker", default="byte",
                        choices=["byte", "strongsort", "ghost", "centertrack",
                                 "transcenter", "sort", "motdt",
                                 "deepsort"])
    parser.add_argument("--use-busca", action="store_true")
    parser.add_argument("--busca-config", default=None,
                        help="BUSCA YAML (reference configs load unchanged)")
    parser.add_argument("--busca-ckpt", default=None,
                        help="converted .npz or reference .pth weights")
    parser.add_argument("--busca-dtype", default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="BUSCA compute dtype: bfloat16 (MXU-native "
                             "production default, ~1.8x faster, agreement-"
                             "tested) or float32 for bit-faithful parity")
    parser.add_argument("--crop-bank-slots", type=int, default=None,
                        help="device crop-bank capacity (assoc/bank.py); "
                             "default: 4096 on TPU / 256 on CPU, 0 disables "
                             "banking")
    parser.add_argument("--reid-stats",
                        choices=("batch", "frozen", "auto"),
                        default="batch",
                        help="BUSCA ReID BN mode: 'batch' = the reference's "
                             "GHOST batch-stat domain adaptation (default); "
                             "'frozen' = stored running statistics + cross-"
                             "frame feature caching (opt-in throughput "
                             "deviation, PARITY.md 'Frozen-stats ReID'); "
                             "'auto' = frozen numerics with a measured "
                             "per-call T-crossover between the fused and "
                             "cached execution paths")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num-frames", type=int, default=40)
    parser.add_argument("--mot-dir", nargs="*", default=[],
                        help="MOTChallenge sequence directories")
    parser.add_argument("--output-dir", default="results")
    parser.add_argument("--crop-h", type=int, default=384)
    parser.add_argument("--crop-w", type=int, default=128)
    # live detector-in-the-loop (reference mot_evaluator.py:131-235)
    parser.add_argument("--detector", default=None,
                        choices=["yolox-tiny", "yolox-s", "yolox-m",
                                 "yolox-l", "yolox-x",
                                 "transcenter", "centertrack"],
                        help="run the detector per frame instead of reading "
                             "cached det/det.txt")
    parser.add_argument("--detector-dataset", default="mot17",
                        choices=["mot17", "mot20"],
                        help="TransCenter per-dataset preset (K/clip, "
                             "models/transcenter.py:31-48)")
    parser.add_argument("--detector-artifact", default=None,
                        help="directory of a serve.export detector artifact "
                             "(AOT StableHLO) to run instead of building the "
                             "model — the reference's --trt engine-file flow "
                             "(tools/track.py:83,215-224)")
    parser.add_argument("--detector-ckpt", default=None,
                        help="official YOLOX .pth (or converted .npz); "
                             "random weights if omitted")
    parser.add_argument("--test-h", type=int, default=800)
    parser.add_argument("--test-w", type=int, default=1440)
    parser.add_argument("--det-conf", type=float, default=0.01,
                        help="exp.test_conf (BYTE consumes low-conf dets)")
    parser.add_argument("--det-ap", action="store_true",
                        help="print the 12-number COCO detection-AP table of "
                             "the raw detector output vs MOT gt "
                             "(mot_evaluator.py:659-711)")
    parser.add_argument("--centertrack-sampling", default="deformable",
                        choices=("deformable", "windowed", "local"),
                        help="CenterTrack DLAUp conv mode: exact DCNv2 "
                             "(converted checkpoints), windowed dense "
                             "shifts (gather-free; == exact wherever "
                             "|offset| <= 3), or fixed-support modulated "
                             "conv (4.3x on v5e, from-scratch training)")
    parser.add_argument("--centertrack-arch", default="dla34",
                        choices=("dla34", "tiny", "mobilenet"),
                        help="CenterTrack backbone: dla34 (published "
                             "checkpoints), mobilenet (the adapter's "
                             "alternate backbone), tiny (smoke-size DLA, "
                             "the yolox-tiny analogue)")
    parser.add_argument("--det-nms", type=float, default=0.7,
                        help="exp.nmsthre")
    parser.add_argument("--online-visualization", action="store_true",
                        help="write per-frame annotated images (the headless "
                             "equivalent of the reference's live display, "
                             "byte_tracker.py:535-572) to "
                             "<output-dir>/<seq>_viz/")
    parser.add_argument("--ignore-custom-byte-thresholds", action="store_true",
                        help="disable the per-video BYTE threshold table "
                             "(mot_evaluator.py:141-164)")
    parser.add_argument("--ghost-motion-compensation", action="store_true",
                        help="GHOST ECC ego-motion compensation of stored "
                             "track positions on moving-camera sequences "
                             "(base_tracker.py:599-633; is_moving gate per "
                             "tracking_utils.py:209)")
    from busca_tpu.trackers.cmc import parse_scale as _cmc_scale_type
    parser.add_argument("--cmc-scale", type=_cmc_scale_type, default=1.0,
                        help="ECC camera-motion solve resolution in (0, 1]; "
                             "1.0 = the reference's full-res recipe "
                             "(byte_tracker.py:626-650); 0.5 is 5.9x faster "
                             "at 0.015 px worst corner error (measured, "
                             "PARITY.md 'ECC')")
    parser.add_argument("--mem-cap", type=int, default=None,
                        help="bound each track's appearance memory to this "
                             "many entries (dense recent tail + even-stride "
                             "archive of the older history; long-stream "
                             "serving; default None = reference semantics, "
                             "memories grow for the track's life, "
                             "byte_tracker.py:150-156; use >= ~5*seq_len — "
                             "measured zero-delta, PARITY.md; byte-family, "
                             "strongsort/deepsort and ghost trackers)")
    # StrongSORT cached artifacts (deep_sort_app.py:50-52, opts.py:142-143)
    parser.add_argument("--npy-det", default=None,
                        help="precomputed detections+features: a .npy file, "
                             "or a directory containing <seq>.npy per "
                             "sequence (StrongSORT cached-artifact mode)")
    parser.add_argument("--eval-workers", type=int, default=1,
                        help="process-pool workers for per-sequence metric "
                             "evaluation (TrackEval USE_PARALLEL role)")
    parser.add_argument("--max-frames", type=int, default=None,
                        help="cap frames per sequence (bounded smoke runs)")
    parser.add_argument("--ecc-json", default=None,
                        help="per-video per-frame ECC warp matrices (JSON)")
    parser.add_argument("--min-confidence", type=float, default=0.6)
    parser.add_argument("--reid-ckpt", default=None,
                        help="GHOST ReID checkpoint (converted .npz or "
                             "model_feats.pth) for live per-detection "
                             "features (ghost/strongsort trackers)")
    parser.add_argument("--lockstep", action="store_true",
                        help="batch the detector across sequences of the "
                             "same resolution (TPU throughput mode; "
                             "yolox detectors only)")
    parser.add_argument("--lockstep-dp", type=int, default=0,
                        help="shard the lockstep detector batch over this "
                             "many devices (dp axis of a jax.sharding.Mesh;"
                             " the DDP-eval role scaled the TPU way — one "
                             "sequence group per chip, no steady-state "
                             "collectives)")
    # offline post-processing (strong_sort.py:29-46)
    parser.add_argument("--hota", action="store_true",
                        help="also print per-sequence HOTA/DetA/AssA (the "
                             "GHOST path's TrackEval role)")
    parser.add_argument("--gsi", action="store_true",
                        help="Gaussian-smoothed interpolation of the output "
                             "trajectories")
    parser.add_argument("--aflink", default=None, metavar="CKPT|synthetic",
                        help="appearance-free tracklet linking: a params "
                             ".npz, or 'synthetic' to train the link model "
                             "on synthetic continuity data first")
    args = parser.parse_args(argv)
    args.crop_hw = (args.crop_h, args.crop_w)

    engine, tracker_kwargs = None, {}
    if args.use_busca:
        if not args.busca_config:
            parser.error("--use-busca requires --busca-config")
        engine, tracker_kwargs = build_engine(
            args.busca_config, args.busca_ckpt, args.crop_hw,
            dtype=args.busca_dtype, bank_slots=args.crop_bank_slots,
            reid_stats=args.reid_stats,
        )
        tracker_kwargs["use_busca"] = True
    if args.cmc_scale != 1.0:
        tracker_kwargs["cmc_scale"] = args.cmc_scale
    if args.ghost_motion_compensation:
        tracker_kwargs["motion_compensation"] = True
    if args.mem_cap is not None:
        tracker_kwargs["mem_cap"] = args.mem_cap

    if args.synthetic:
        out = run_synthetic(args, engine, tracker_kwargs)
        print(json.dumps(out, indent=2))
        return out

    if args.mot_dir:
        from busca_tpu.eval import mot
        from busca_tpu.eval.metrics import evaluate_clear
        from busca_tpu.eval.presets import custom_byte_thresholds
        from busca_tpu.eval.runner import results_to_pred, run_mot_sequence

        detector = None
        if args.detector_artifact:
            if args.detector:
                parser.error("--detector-artifact replaces --detector")
            from busca_tpu.serve.detector import (
                ArtifactBatchDetector,
                ArtifactDetector,
            )

            with open(os.path.join(args.detector_artifact,
                                   "manifest.json")) as f:
                kind = json.load(f).get("kind")
            if kind == "yolox_detector_batch_steps":
                detector = ArtifactBatchDetector(args.detector_artifact)
            else:
                detector = ArtifactDetector(args.detector_artifact)
            if args.lockstep and kind != "yolox_detector_batch_steps":
                parser.error("--lockstep with --detector-artifact needs a "
                             "--batches artifact family "
                             "(busca-export --batches 1 2 4 8)")
            if args.lockstep_dp:
                parser.error("--lockstep-dp needs a live --detector "
                             "(artifacts are compiled without mesh "
                             "shardings)")
        elif args.detector == "centertrack":
            from busca_tpu.eval.detector import build_centertrack_detector

            if args.tracker != "centertrack":
                parser.error("--detector centertrack needs "
                             "--tracker centertrack (dict IO)")
            try:
                detector = build_centertrack_detector(
                    arch=args.centertrack_arch,
                    sampling=args.centertrack_sampling,
                    ckpt=args.detector_ckpt,
                    test_size=(args.test_h, args.test_w),
                    out_thresh=args.det_conf,
                )
            except ValueError as e:
                parser.error(str(e))
        elif args.detector == "transcenter":
            from busca_tpu.eval.detector import build_transcenter_detector

            try:
                detector = build_transcenter_detector(
                    dataset=args.detector_dataset,
                    ckpt=args.detector_ckpt,
                    test_size=(args.test_h, args.test_w),
                    out_thresh=args.det_conf,
                    nms_thresh=args.det_nms,
                )
            except ValueError as e:
                parser.error(str(e))
        elif args.detector:
            from busca_tpu.eval.detector import YoloxDetector

            detector = YoloxDetector.build(
                size=args.detector.split("-")[-1],
                ckpt_path=args.detector_ckpt,
                num_classes=1,
                test_size=(args.test_h, args.test_w),
                conf_thresh=args.det_conf,
                nms_thresh=args.det_nms,
            )
            if args.lockstep_dp:
                if not args.lockstep:
                    parser.error("--lockstep-dp requires --lockstep")
                from busca_tpu.parallel.mesh import make_mesh

                detector.shard_lockstep(
                    make_mesh(args.lockstep_dp, tp_size=1)
                )

        feature_extractor = None
        if args.reid_ckpt:
            from busca_tpu.eval.features import ReidFeatureExtractor

            feature_extractor = ReidFeatureExtractor.from_checkpoint(
                args.reid_ckpt, crop_hw=args.crop_hw
            )

        def seq_tracker_kwargs(name):
            seq_kwargs = dict(tracker_kwargs)
            if args.tracker in ("byte", "centertrack", "transcenter"):
                seq_kwargs.update(
                    custom_byte_thresholds(
                        name,
                        seq_kwargs.get("track_thresh", 0.6),
                        seq_kwargs.get("track_buffer", 30),
                        ignore=args.ignore_custom_byte_thresholds,
                    )
                )
            elif args.tracker == "ghost" and seq_kwargs.get(
                "motion_compensation"
            ):
                # per-sequence camera-motion gate (tracking_utils.py:209)
                from busca_tpu.eval.presets import ghost_is_moving

                seq_kwargs["is_moving"] = ghost_is_moving(name)
            return seq_kwargs

        if args.det_ap and (args.lockstep or args.npy_det
                            or (args.detector in (None, "centertrack")
                                and not args.detector_artifact)):
            print("WARNING: --det-ap only applies to the per-sequence "
                  "yolox/transcenter live-detector path; no detection-AP "
                  "table will be produced for this mode", file=sys.stderr)
        if args.lockstep:
            if args.tracker == "strongsort" and args.npy_det:
                return _run_lockstep_cached(args, engine, tracker_kwargs)
            if detector is None and args.tracker in ("byte", "sort",
                                                     "ghost", "strongsort",
                                                     "deepsort", "motdt"):
                # cached-detection lockstep (det/det.txt per sequence) —
                # the canonical slice's multi-sequence throughput mode;
                # feature trackers run through the FeatureShim
                return _run_lockstep_cached_det(args, engine,
                                                seq_tracker_kwargs,
                                                feature_extractor)
            if detector is None or args.detector in ("transcenter",
                                                     "centertrack"):
                parser.error("--lockstep needs a yolox --detector, "
                             "--tracker strongsort --npy-det, or a cached-"
                             "detection byte/sort run")
            return _run_lockstep(args, detector, engine, seq_tracker_kwargs,
                                 feature_extractor)

        per_seq = {}
        eval_inputs = {}
        det_ap_dets, det_ap_gts = {}, {}
        for seq_dir in args.mot_dir:
            name = os.path.basename(seq_dir.rstrip("/"))
            # per-video BYTE threshold table (mot_evaluator.py:141-164)
            # + GHOST is_moving gate
            seq_kwargs = seq_tracker_kwargs(name)
            tracker = make_tracker(
                args.tracker, seq_kwargs, engine, args.crop_hw
            )
            out_path = os.path.join(args.output_dir, f"{name}.txt")
            if args.tracker == "strongsort" and args.npy_det:
                from busca_tpu.eval.strongsort_io import (
                    load_ecc_warps,
                    run_cached_sequence,
                )

                det_file = args.npy_det
                if os.path.isdir(det_file):
                    det_file = os.path.join(det_file, f"{name}.npy")
                ecc = None
                if args.ecc_json:
                    ecc = load_ecc_warps(args.ecc_json).get(name)
                os.makedirs(args.output_dir, exist_ok=True)
                res = run_cached_sequence(
                    seq_dir, det_file, tracker,
                    min_confidence=args.min_confidence,
                    ecc_warps=ecc, output_file=out_path,
                    max_frames=args.max_frames,
                    viz_dir=_viz_dir_for(args, name),
                )
            elif detector is not None:
                from busca_tpu.eval.detector import track_frames_with_detector

                if hasattr(detector, "reset"):
                    detector.reset()  # per-video (mot_evaluator.py:148-150)
                info = mot.load_seqinfo(seq_dir)

                def frames():
                    import itertools

                    from busca_tpu.eval.loader import sequence_frames

                    it = sequence_frames(info)
                    if args.max_frames:
                        it = itertools.islice(it, args.max_frames)
                    yield from it

                if args.detector == "centertrack":
                    from busca_tpu.eval.detector import (
                        track_frames_centertrack,
                    )

                    res = track_frames_centertrack(
                        detector, tracker, frames(), name=info.name,
                        viz_dir=_viz_dir_for(args, name),
                    )
                else:
                    shimmed = shim_for_runner(
                        args.tracker, tracker, feature_extractor,
                        args.crop_hw,
                    )
                    seq_det_log = [] if args.det_ap else None
                    res = track_frames_with_detector(
                        detector, shimmed, frames(), name=info.name,
                        viz_dir=_viz_dir_for(args, name),
                        det_log=seq_det_log,
                    )
                    if seq_det_log:
                        for fid, boxes, scores in seq_det_log:
                            det_ap_dets[(name, fid)] = (boxes, scores)
                os.makedirs(args.output_dir, exist_ok=True)
                mot.write_results(out_path, res.results)
            else:
                shimmed = shim_for_runner(
                    args.tracker, tracker, feature_extractor, args.crop_hw
                )
                res = run_mot_sequence(seq_dir, shimmed, output_path=out_path,
                                       viz_dir=_viz_dir_for(args, name),
                                       max_frames=args.max_frames)
            if args.gsi or args.aflink:
                res = _postprocess_result(args, res, out_path)
            stage = ""
            if res.stage_times:
                stage = "  (" + ", ".join(
                    f"{k.rstrip('_s')} {v / max(res.num_frames, 1) * 1e3:.1f}"
                    " ms/frame"
                    for k, v in res.stage_times.items()
                ) + ")"
            print(f"{name}: {res.num_frames} frames @ {res.fps:.1f} fps{stage}")
            gt_path = os.path.join(seq_dir, "gt", "gt.txt")
            if os.path.exists(gt_path):
                gt = mot.read_gt(gt_path)
                pred = results_to_pred(res)
                eval_inputs[name] = (gt, pred)
                if args.det_ap:
                    for fid, (tlwh, _ids) in gt.items():
                        tlbr = tlwh.copy()
                        tlbr[:, 2:] += tlbr[:, :2]
                        det_ap_gts[(name, fid)] = tlbr
                if args.hota:
                    from busca_tpu.eval.metrics import evaluate_hota

                    h = evaluate_hota(gt, pred)
                    print(f"  HOTA {h['hota'] * 100:.3f}  "
                          f"DetA {h['deta'] * 100:.3f}  "
                          f"AssA {h['assa'] * 100:.3f}  "
                          f"DetRe {h['detre'] * 100:.3f}  "
                          f"DetPr {h['detpr'] * 100:.3f}  "
                          f"AssRe {h['assre'] * 100:.3f}  "
                          f"AssPr {h['asspr'] * 100:.3f}  "
                          f"LocA {h['loca'] * 100:.3f}")
        if eval_inputs:
            # per-sequence CLEAR metrics over a process pool when asked
            # (the GHOST TrackEval USE_PARALLEL / 8-cores role,
            # eval_track_eval.py:97-98), then multi-host-safe aggregation
            # (rank-local tallies allgathered over jax.process_count();
            # == accumulate() single-process)
            from busca_tpu.eval.runner import (
                evaluate_sequences_parallel,
                global_metrics,
            )

            per_seq = evaluate_sequences_parallel(
                eval_inputs, num_workers=args.eval_workers
            )
            agg = global_metrics(per_seq)
            print(json.dumps(agg.as_dict(), indent=2))
        if args.det_ap and det_ap_dets:
            # the COCO detection table over the raw detector outputs, pooled
            # across sequences (mot_evaluator.py:659-711)
            from busca_tpu.eval.detection import (
                coco_eval_full,
                format_coco_table,
            )

            print(format_coco_table(coco_eval_full(det_ap_dets, det_ap_gts)))
        return per_seq

    parser.error("pick a mode: --synthetic or --mot-dir")


if __name__ == "__main__":
    main()
