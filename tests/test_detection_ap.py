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
