"""Differential fuzz of the from-scratch metric stack against brute-force
oracles (tests/oracle_metrics.py).

Every parity and A/B claim in the repo is judged through eval/metrics.py
(CLEAR/IDF1/HOTA) and eval/detection.py (COCO AP); the canonical packages
(motmetrics / TrackEval / pycocotools — the roles at
adapters/GHOST/src/eval_track_eval.py:36-119 and
adapters/ByteTrack/tools/track.py:236-288) are not installed here, so this
module cross-validates against independent exhaustive-enumeration oracles on
hundreds of randomized tiny scenes: partial IoUs, crossings, births/deaths,
id swaps, duplicates, empty frames, degenerate boxes.

Scenes are kept small enough (<= 3 gt x <= 4 pred ids, <= 8 frames) that the
oracles can ENUMERATE every matching instead of trusting a solver, and the
geometry is continuous-random so equal-cost matching ties (unspecified by
the specs) are measure-zero."""

import numpy as np
import pytest

from busca_tpu.eval.detection import (
    average_precision,
    coco_eval_full,
    coco_map,
)
from busca_tpu.eval.metrics import evaluate_clear, evaluate_hota

from oracle_metrics import (
    oracle_average_precision,
    oracle_clear,
    oracle_coco_full,
    oracle_hota,
)

COUNT_FIELDS = ("num_switches", "num_false_positives", "num_misses",
                "num_matches", "num_gt", "mostly_tracked", "mostly_lost",
                "num_pred")
FLOAT_FIELDS = ("mota", "motp", "idf1", "idp", "idr")
HOTA_FIELDS = ("hota", "deta", "assa", "detre", "detpr", "assre", "asspr",
               "loca")


# ------------------------------------------------------------- generators --
def _random_scene(rng, n_frames=None, max_gt=3, max_pred_extra=2):
    """A random tiny tracking scene: gt tracks with birth/death spans and
    motion; predictions as jittered gt with id-corruption events plus
    spurious tracks; some frames empty on either side."""
    n_frames = n_frames or rng.randint(2, 9)
    W = H = 100.0
    gt = {}
    pred = {}
    n_obj = rng.randint(0, max_gt + 1)

    tracks = []
    for gid in range(1, n_obj + 1):
        birth = rng.randint(0, n_frames)
        death = rng.randint(birth, n_frames) + 1
        x, y = rng.uniform(0, W - 30, 2)
        vx, vy = rng.uniform(-6, 6, 2)
        w, h = rng.uniform(6, 30, 2)
        tracks.append((gid, birth, death, x, y, vx, vy, w, h))

    # id corruption schedule: each gt's predicted id may swap mid-sequence
    swap_frame = {gid: (rng.randint(1, n_frames) if rng.rand() < 0.4 else None)
                  for gid, *_ in tracks}

    for f in range(n_frames):
        g_boxes, g_ids = [], []
        p_boxes, p_ids = [], []
        for gid, birth, death, x, y, vx, vy, w, h in tracks:
            if not (birth <= f < death):
                continue
            box = np.array([x + vx * f, y + vy * f, w, h])
            g_boxes.append(box)
            g_ids.append(gid)
            # predicted twin: dropped / jittered / id-swapped
            if rng.rand() < 0.75:
                noise = rng.uniform(0, [8.0, 8.0, 6.0, 6.0]) * rng.rand()
                pb = box + noise * rng.choice([-1, 1], 4)
                pb[2:] = np.maximum(pb[2:], 1.0)
                pid = gid + 100
                sf = swap_frame[gid]
                if sf is not None and f >= sf:
                    pid = gid + 200  # identity fragmentation
                if rng.rand() < 0.1 and 999 not in p_ids:
                    pid = 999  # id collision ACROSS frames/objects (an id
                    # repeated WITHIN a frame is ill-formed MOT data and
                    # both evaluator and oracles reject it)
                p_boxes.append(pb)
                p_ids.append(pid)
        # spurious predictions
        for _ in range(rng.randint(0, max_pred_extra + 1)):
            if rng.rand() < 0.5:
                x, y = rng.uniform(0, W - 20, 2)
                pid = int(rng.randint(300, 305))
                if pid in p_ids:
                    continue
                p_boxes.append(np.array([x, y, *rng.uniform(4, 20, 2)]))
                p_ids.append(pid)
        if g_ids and rng.rand() > 0.05:
            gt[f] = (np.array(g_boxes), np.array(g_ids, int))
        if p_ids and rng.rand() > 0.05:
            n = len(p_ids)
            pred[f] = (np.array(p_boxes), np.array(p_ids, int), np.ones(n))
    return gt, pred


def _random_detections(rng, n_imgs=None, max_gt=4, max_dt=6):
    n_imgs = n_imgs or rng.randint(1, 4)
    dets, gts = {}, {}
    for img in range(n_imgs):
        n_g = rng.randint(0, max_gt + 1)
        boxes = []
        for _ in range(n_g):
            x, y = rng.uniform(0, 150, 2)
            w, h = rng.uniform(3, 120, 2)  # spans small/medium/large areas
            boxes.append([x, y, x + w, y + h])
        gtb = np.array(boxes).reshape(-1, 4)
        if len(gtb):
            gts[img] = gtb
        n_d = rng.randint(0, max_dt + 1)
        db, ds = [], []
        for _ in range(n_d):
            if len(gtb) and rng.rand() < 0.7:
                base = gtb[rng.randint(len(gtb))]
                jit = rng.uniform(-10, 10, 4) * rng.rand()
                b = base + jit
                b[2] = max(b[2], b[0] + 1)
                b[3] = max(b[3], b[1] + 1)
            else:
                x, y = rng.uniform(0, 150, 2)
                b = np.array([x, y, x + rng.uniform(2, 60),
                              y + rng.uniform(2, 60)])
            db.append(b)
            ds.append(rng.rand())
        if db:
            dets[img] = (np.array(db), np.array(ds))
    return dets, gts


# ------------------------------------------------------------------- fuzz --
def _assert_clear_equal(gt, pred, seed):
    got = evaluate_clear(gt, pred).as_dict()
    want = oracle_clear(gt, pred)
    for k in COUNT_FIELDS:
        assert got[k] == want[k], (seed, k, got[k], want[k])
    for k in FLOAT_FIELDS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (
            seed, k, got[k], want[k])


@pytest.mark.parametrize("seed", range(120))
def test_clear_idf1_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    gt, pred = _random_scene(rng)
    _assert_clear_equal(gt, pred, seed)


@pytest.mark.parametrize("seed", range(60))
def test_hota_matches_bruteforce(seed):
    rng = np.random.RandomState(10_000 + seed)
    gt, pred = _random_scene(rng, max_gt=3, max_pred_extra=1)
    got = evaluate_hota(gt, pred)
    want = oracle_hota(gt, pred)
    for k in HOTA_FIELDS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (
            seed, k, got[k], want[k])


@pytest.mark.parametrize("seed", range(60))
def test_coco_ap_matches_bruteforce(seed):
    rng = np.random.RandomState(20_000 + seed)
    dets, gts = _random_detections(rng)
    for thr in (0.5, 0.75):
        got = average_precision(dets, gts, thr)
        want = oracle_average_precision(dets, gts, thr)
        assert got == pytest.approx(want, abs=1e-9), (seed, thr, got, want)
    got = coco_map(dets, gts)
    thr_of = {"ap50": 0.5, "ap75": 0.75}
    for k, thr in thr_of.items():
        want = oracle_average_precision(dets, gts, thr)
        assert got[k] == pytest.approx(want, abs=1e-9), (seed, k)
    assert np.isfinite(got["ap"])


@pytest.mark.parametrize("seed", range(40))
def test_coco_full_table_matches_bruteforce(seed):
    rng = np.random.RandomState(30_000 + seed)
    dets, gts = _random_detections(rng, n_imgs=rng.randint(1, 3))
    got = coco_eval_full(dets, gts)
    want = oracle_coco_full(dets, gts)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (
            seed, k, got[k], want[k])


def test_structured_edge_cases():
    """Deterministic structural edges on every evaluator: empty gt, empty
    pred, both empty, single-frame, duplicate predictions on one gt."""
    empty = {}
    one = {0: (np.array([[10.0, 10, 20, 20]]), np.array([1]))}
    one_pred = {0: (np.array([[10.0, 10, 20, 20]]), np.array([7]),
                    np.ones(1))}
    dup_pred = {0: (np.array([[10.0, 10, 20, 20], [11.0, 11, 20, 20]]),
                    np.array([7, 8]), np.ones(2))}

    for gt, pred in [(empty, empty), (one, empty), (empty, one_pred),
                     (one, one_pred), (one, dup_pred)]:
        _assert_clear_equal(gt, pred, "edge")
        got = evaluate_hota(gt, pred)
        want = oracle_hota(gt, pred)
        for k in HOTA_FIELDS:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got, want)

    # AP edges: no gt / no dets / degenerate zero-area boxes
    d = {0: (np.array([[0.0, 0, 10, 10]]), np.array([0.9]))}
    g = {0: np.array([[0.0, 0, 10, 10]])}
    z = {0: (np.array([[5.0, 5, 5, 5]]), np.array([0.9]))}  # zero area
    for dets, gts in [({}, {}), (d, {}), ({}, g), (d, g), (z, g)]:
        for thr in (0.5, 0.75):
            got = average_precision(dets, gts, thr)
            want = oracle_average_precision(dets, gts, thr)
            assert got == pytest.approx(want, abs=1e-9)
        got = coco_eval_full(dets, gts)
        want = oracle_coco_full(dets, gts)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got, want)


@pytest.mark.slow
@pytest.mark.parametrize("block", range(4))
def test_clear_hota_extended_fuzz(block):
    """Slow tier: 4 x 100 more scenes, larger casts (4 gt ids) and longer
    sequences (up to 12 frames)."""
    for i in range(100):
        seed = 100_000 + block * 100 + i
        rng = np.random.RandomState(seed)
        gt, pred = _random_scene(rng, n_frames=rng.randint(2, 13), max_gt=4)
        _assert_clear_equal(gt, pred, seed)
        got = evaluate_hota(gt, pred)
        want = oracle_hota(gt, pred)
        for k in HOTA_FIELDS:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (
                seed, k, got[k], want[k])


def test_clear_matching_maximizes_matches_not_total_cost():
    """motmetrics' per-frame correspondence maximizes the NUMBER of valid
    (IoU >= 0.5) matches before minimizing distance (lap.add_expensive_edges
    makes every forbidden edge dearer than any all-valid assignment).  A
    frame with one strong pair and two moderate cross pairs must therefore
    produce TWO matches — a cost-limit assignment (ByteTrack lapjv
    semantics, where an unmatched lane costs limit/2) keeps only the strong
    one.  Found by the r5 extended differential fuzz (seed 1001855)."""
    # gt1 overlaps pred A at ~0.87 and pred B at ~0.52;
    # gt2 overlaps pred A at ~0.55 and pred B at ~0.34 (invalid)
    gt = {0: (np.array([[33.3, 40.9, 22.1, 20.3],
                        [29.8, 41.4, 27.9, 14.3]]),
              np.array([1, 2]))}
    pred = {0: (np.array([[33.1, 42.1, 21.6, 20.0],
                          [33.9, 46.0, 29.6, 17.2]]),
                np.array([11, 12]), np.ones(2))}
    got = evaluate_clear(gt, pred).as_dict()
    want = oracle_clear(gt, pred)
    assert got["num_matches"] == 2
    assert got["num_false_positives"] == 0
    assert got["num_misses"] == 0
    for k in COUNT_FIELDS:
        assert got[k] == want[k], (k, got[k], want[k])
    for k in FLOAT_FIELDS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


@pytest.mark.parametrize(
    "seed", [1001855, 1005905, 1015153, 1021523, 1032252, 1046651])
def test_clear_fuzz_regression_seeds(seed):
    """r5 extended-fuzz scenes that exposed two real matching defects,
    pinned end-to-end: 1001855 — the cost-limit assignment kept ONE match
    where motmetrics keeps two (match count traded against distance);
    the rest — solve_dense's fixed 1e15 expensive edges fell below float64
    granularity, returning max-cardinality but cost-suboptimal matchings
    (~1e-3 MOTP drift, MT/ML off-by-one).  Both fixed in
    eval/metrics.evaluate_clear + ops/lap.solve_dense."""
    rng = np.random.RandomState(seed)
    gt, pred = _random_scene(rng, n_frames=rng.randint(2, 13), max_gt=4)
    _assert_clear_equal(gt, pred, seed)


def test_recall_threshold_linspace_quirk_matches_pycocotools():
    """np.linspace(0,1,101)[70] is 0.7000000000000001, so a detection set
    whose final recall is EXACTLY 7/10 contributes zero precision at the
    0.70 recall point under pycocotools' accumulate (searchsorted with no
    epsilon) — AP is 70/101, not 71/101.  The production evaluator matches
    the canonical protocol; this pins the quirk on both sides (found by the
    r5 extended fuzz: an epsilon slack in the oracle deviated here)."""
    gt = {0: np.array([[10.0 * i, 0.0, 10.0 * i + 8.0, 8.0]
                       for i in range(10)])}
    boxes = np.array([[10.0 * i, 0.0, 10.0 * i + 8.0, 8.0]
                      for i in range(7)])
    scores = np.linspace(0.9, 0.3, 7)
    dets = {0: (boxes, scores)}
    for thr in (0.5, 0.75):
        got = average_precision(dets, gt, thr)
        want = oracle_average_precision(dets, gt, thr)
        assert got == pytest.approx(70.0 / 101.0, abs=1e-12)
        assert got == pytest.approx(want, abs=1e-12)


def test_coco_fuzz_regression_seed_3001468():
    """The r5 extended-fuzz scene that exposed the linspace quirk above:
    3 images, 10 considered gts, final recall exactly 0.7 at both 0.5 and
    0.75 IoU — pinned so the evaluator/oracle pair never drifts apart on
    it again."""
    rng = np.random.RandomState(3001468)
    dets, gts = _random_detections(rng, n_imgs=rng.randint(1, 4))
    for thr in (0.5, 0.75):
        got = average_precision(dets, gts, thr)
        want = oracle_average_precision(dets, gts, thr)
        assert got == pytest.approx(want, abs=1e-9), thr
    got = coco_eval_full(dets, gts)
    want = oracle_coco_full(dets, gts)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_duplicate_id_in_frame_is_rejected():
    """An id repeated within one frame is ill-formed MOT data: TrackEval
    raises ('predicts the same ID more than once in a single timestep');
    silently accepting it skews the trajectory counts (found by this fuzz),
    so both evaluators fail loudly instead."""
    gt = {0: (np.array([[10.0, 10, 20, 20]]), np.array([1]))}
    bad = {0: (np.array([[10.0, 10, 20, 20], [40.0, 40, 10, 10]]),
               np.array([7, 7]), np.ones(2))}
    with pytest.raises(ValueError, match="repeats"):
        evaluate_clear(gt, bad)
    with pytest.raises(ValueError, match="repeats"):
        evaluate_hota(gt, bad)
