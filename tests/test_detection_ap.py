"""Detection AP on hand-computed cases."""

import numpy as np

from busca_tpu.eval.detection import average_precision, coco_map


def _b(x, y=0, s=10):
    return np.array([x, y, x + s, y + s], float)


def test_perfect_detection():
    gt = {0: np.stack([_b(0), _b(50)]), 1: np.stack([_b(100)])}
    det = {
        0: (np.stack([_b(0), _b(50)]), np.array([0.9, 0.8])),
        1: (np.stack([_b(100)]), np.array([0.95])),
    }
    assert average_precision(det, gt, 0.5) == 1.0
    m = coco_map(det, gt)
    assert m["ap"] == 1.0 and m["ap50"] == 1.0


def test_false_positive_after_all_tps():
    gt = {0: np.stack([_b(0)])}
    det = {0: (np.stack([_b(0), _b(500)]), np.array([0.9, 0.3]))}
    # P-R: tp first (P=1 at R=1), then fp (doesn't reduce envelope at R<=1)
    assert average_precision(det, gt, 0.5) == 1.0


def test_high_scoring_fp_hurts():
    gt = {0: np.stack([_b(0)])}
    det = {0: (np.stack([_b(500), _b(0)]), np.array([0.9, 0.3]))}
    # fp ranked first: precision at recall 1 is 1/2
    ap = average_precision(det, gt, 0.5)
    np.testing.assert_allclose(ap, 0.5, atol=0.01)


def test_duplicate_detection_is_fp():
    gt = {0: np.stack([_b(0)])}
    det = {0: (np.stack([_b(0), _b(1)]), np.array([0.9, 0.8]))}
    # second det overlaps the already-matched gt -> FP (COCO protocol)
    ap = average_precision(det, gt, 0.5)
    assert ap == 1.0  # envelope still 1 up to recall 1
    # but with the duplicate scored higher than the true match:
    det2 = {0: (np.stack([_b(6), _b(0)]), np.array([0.9, 0.8]))}
    ap2_strict = average_precision(det2, gt, 0.75)
    assert ap2_strict < 1.0  # at IoU .75 the offset box misses


def test_misses_lower_ap():
    gt = {0: np.stack([_b(0), _b(50), _b(100), _b(150)])}
    det = {0: (np.stack([_b(0), _b(50)]), np.array([0.9, 0.8]))}
    ap = average_precision(det, gt, 0.5)
    np.testing.assert_allclose(ap, 0.5, atol=0.02)  # recall caps at 0.5


def test_localization_quality_spreads_thresholds():
    gt = {0: np.stack([_b(0, s=20)])}
    det = {0: (np.stack([np.array([2, 2, 22, 22], float)]), np.array([0.9]))}
    m = coco_map(det, gt)
    assert m["ap50"] == 1.0
    assert m["ap75"] < 1.0  # IoU(offset box) ~ 0.68 < 0.75
    assert 0 < m["ap"] < 1


# ---------------------------------------------------------------------------
# Full COCO summarize() table (area ranges + maxDets)
# ---------------------------------------------------------------------------

from busca_tpu.eval.detection import coco_eval_full, format_coco_table


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_full_table_perfect_all_sizes():
    """One small (16x16), one medium (50x50), one large (200x200) gt, each
    detected exactly -> every AP/AR = 1."""
    gt = {1: np.array([_box(0, 0, 16, 16), _box(100, 100, 50, 50),
                       _box(300, 300, 200, 200)])}
    det = {1: (gt[1].copy(), np.array([0.9, 0.8, 0.7]))}
    s = coco_eval_full(det, gt)
    for k in ("ap", "ap50", "ap75", "ap_small", "ap_medium", "ap_large",
              "ar10", "ar100", "ar_small", "ar_medium", "ar_large"):
        assert s[k] == 1.0, (k, s[k])
    # AR@1: only the highest-scoring det is kept; it matches the small gt,
    # so recall = 1/3 in 'all'
    np.testing.assert_allclose(s["ar1"], 1.0 / 3.0)


def test_area_range_isolation():
    """A small-only gt set: medium/large stats are -1 (no gt considered),
    small == all."""
    gt = {1: np.array([_box(0, 0, 10, 10)])}
    det = {1: (np.array([_box(0, 0, 10, 10)]), np.array([0.9]))}
    s = coco_eval_full(det, gt)
    assert s["ap_small"] == 1.0 and s["ar_small"] == 1.0
    assert s["ap_medium"] == -1.0 and s["ar_medium"] == -1.0
    assert s["ap_large"] == -1.0 and s["ar_large"] == -1.0
    assert s["ap"] == 1.0


def test_det_outside_area_range_is_ignored_not_fp():
    """An unmatched large detection must not count as FP in the small
    range (COCO dtIg rule), but does count in 'all'."""
    gt = {1: np.array([_box(0, 0, 10, 10)])}
    det = {1: (
        np.array([_box(0, 0, 10, 10), _box(200, 200, 150, 150)]),
        np.array([0.5, 0.9]),  # the large FP outranks the TP
    )}
    s = coco_eval_full(det, gt)
    # small range: the large det is ignored entirely -> perfect
    assert s["ap_small"] == 1.0
    # 'all': the higher-scoring FP caps precision at recall>0 to 1/2
    assert s["ap"] < 1.0


def test_maxdets_truncation():
    """With 3 gts and 3 correct dets, AR@1 keeps only the top-scoring det."""
    gt = {1: np.array([_box(0, 0, 50, 50), _box(100, 0, 50, 50),
                       _box(200, 0, 50, 50)])}
    det = {1: (gt[1].copy(), np.array([0.9, 0.8, 0.7]))}
    s = coco_eval_full(det, gt)
    np.testing.assert_allclose(s["ar1"], 1.0 / 3.0)
    np.testing.assert_allclose(s["ar10"], 1.0)
    np.testing.assert_allclose(s["ar100"], 1.0)


def test_matched_to_ignored_gt_is_ignored():
    """A det matching an out-of-range gt inherits its ignore flag: in the
    small range a large matched pair contributes nothing."""
    gt = {1: np.array([_box(0, 0, 10, 10), _box(100, 100, 200, 200)])}
    det = {1: (gt[1].copy(), np.array([0.8, 0.9]))}
    s = coco_eval_full(det, gt)
    assert s["ap_small"] == 1.0  # the large pair vanishes from the range
    assert s["ap_large"] == 1.0
    assert s["ap"] == 1.0


def test_half_recall_table():
    """2 gts, 1 detected -> AP = AR = 0.5 at every threshold (all range)."""
    gt = {1: np.array([_box(0, 0, 50, 50), _box(200, 0, 50, 50)])}
    det = {1: (np.array([_box(0, 0, 50, 50)]), np.array([0.9]))}
    s = coco_eval_full(det, gt)
    # 101-pt interpolation: precision 1 up to recall 0.5 -> AP = 51/101
    np.testing.assert_allclose(s["ap"], 51.0 / 101.0)
    np.testing.assert_allclose(s["ar100"], 0.5)


def test_full_table_matches_coco_map_on_all_range():
    """coco_eval_full's ap/ap50/ap75 agree with the simple coco_map path
    for <=100 dets of one size class."""
    r = np.random.RandomState(0)
    gt, det = {}, {}
    for img in range(4):
        boxes = []
        for _ in range(6):
            x, y = r.uniform(0, 500, 2)
            w, h = r.uniform(40, 90, 2)
            boxes.append(_box(x, y, w, h))
        gt[img] = np.array(boxes)
        jitter = r.uniform(-3, 3, (6, 4))
        det[img] = (gt[img] + jitter, r.uniform(0.3, 1.0, 6))
    full = coco_eval_full(det, gt)
    simple = coco_map(det, gt)
    for k in ("ap", "ap50", "ap75"):
        np.testing.assert_allclose(full[k], simple[k], atol=1e-9), k


def test_format_coco_table_shape():
    gt = {1: np.array([_box(0, 0, 50, 50)])}
    det = {1: (gt[1].copy(), np.array([0.9]))}
    txt = format_coco_table(coco_eval_full(det, gt))
    lines = txt.splitlines()
    assert len(lines) == 12
    assert "IoU=0.50:0.95" in lines[0] and "area=   all" in lines[0]
    assert lines[0].endswith("1.000")
