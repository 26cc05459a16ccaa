"""CLEAR/IDF1 metrics against hand-computed scenarios."""

import numpy as np

from busca_tpu.eval.metrics import MotMetrics, accumulate, evaluate_clear
from busca_tpu.eval import mot


def _box(x, y=50, w=20, h=40):
    return np.array([x, y, w, h], dtype=float)


def _seq(frames):
    """frames: list of list of (id, box) -> {frame: (boxes, ids)}"""
    out = {}
    for f, items in enumerate(frames, start=1):
        if items:
            boxes = np.stack([b for _, b in items])
            ids = np.array([i for i, _ in items], int)
        else:
            boxes, ids = np.zeros((0, 4)), np.zeros(0, int)
        out[f] = (boxes, ids)
    return out


def _pred(frames):
    gt_like = _seq(frames)
    return {
        f: (b, i, np.ones(len(i))) for f, (b, i) in gt_like.items()
    }


def test_perfect_tracking():
    frames = [[(1, _box(10)), (2, _box(100))] for _ in range(10)]
    m = evaluate_clear(_seq(frames), _pred(frames))
    assert m.mota == 1.0
    assert m.idf1 == 1.0
    assert m.num_switches == 0
    assert m.num_gt == 20
    assert m.mostly_tracked == 2 and m.mostly_lost == 0


def test_all_missed():
    gt_frames = [[(1, _box(10))] for _ in range(5)]
    m = evaluate_clear(_seq(gt_frames), _pred([[] for _ in range(5)]))
    assert m.mota == 0.0  # 1 - 5/5
    assert m.num_misses == 5
    assert m.idf1 == 0.0
    assert m.mostly_lost == 1


def test_false_positives_push_mota_negative():
    gt_frames = [[(1, _box(10))] for _ in range(4)]
    pred_frames = [[(7, _box(10)), (8, _box(300))] for _ in range(4)]
    m = evaluate_clear(_seq(gt_frames), _pred(pred_frames))
    # 4 FP, 0 FN, 0 IDSW over 4 gt: MOTA = 1 - 4/4 = 0
    assert m.num_false_positives == 4
    assert m.num_misses == 0
    np.testing.assert_allclose(m.mota, 0.0)


def test_id_switch_counted_once():
    # one gt object; prediction switches id at frame 4
    gt_frames = [[(1, _box(10 + 2 * t))] for t in range(8)]
    pred_frames = [
        [((100 if t < 3 else 200), _box(10 + 2 * t))] for t in range(8)
    ]
    m = evaluate_clear(_seq(gt_frames), _pred(pred_frames))
    assert m.num_switches == 1
    np.testing.assert_allclose(m.mota, 1 - 1 / 8)
    # IDF1: best identity match covers 5 of 8 frames on each side
    np.testing.assert_allclose(m.idf1, 2 * 5 / (8 + 8))


def test_fragmented_vs_consistent_identity():
    """MOTA ~ equal, IDF1 must favor the consistent tracker."""
    gt_frames = [[(1, _box(10 + t))] for t in range(10)]
    consistent = _pred([[(5, _box(10 + t))] for t in range(10)])
    fragmented = _pred(
        [[(5 if t < 5 else 6, _box(10 + t))] for t in range(10)]
    )
    mc = evaluate_clear(_seq(gt_frames), consistent)
    mf = evaluate_clear(_seq(gt_frames), fragmented)
    assert mc.idf1 > mf.idf1
    assert mc.mota > mf.mota  # the switch also costs MOTA once
    np.testing.assert_allclose(mf.idf1, 2 * 5 / 20)


def test_carryover_prevents_spurious_switch():
    """Two crossing boxes: carry-over keeps original correspondence while
    IoU stays above threshold, so no switch is counted for a consistent
    tracker."""
    gt_frames, pred_frames = [], []
    for t in range(6):
        gt_frames.append([(1, _box(10 + 6 * t)), (2, _box(40 - 6 * t))])
        pred_frames.append([(11, _box(10 + 6 * t)), (12, _box(40 - 6 * t))])
    m = evaluate_clear(_seq(gt_frames), _pred(pred_frames))
    assert m.num_switches == 0
    assert m.mota == 1.0


def test_accumulate_matches_single_pool():
    gt1 = [[(1, _box(10))] for _ in range(5)]
    pr1 = [[(9, _box(10))] for _ in range(5)]
    gt2 = [[(1, _box(10))] for _ in range(5)]
    pr2 = [[] for _ in range(5)]
    m1 = evaluate_clear(_seq(gt1), _pred(pr1))
    m2 = evaluate_clear(_seq(gt2), _pred(pr2))
    agg = accumulate({"a": m1, "b": m2})
    np.testing.assert_allclose(agg.mota, 1 - 5 / 10)
    np.testing.assert_allclose(agg.idf1, 2 * 5 / (10 + 5))
    assert agg.num_gt == 10


def test_mot_io_roundtrip(tmp_path):
    results = [
        (1, [np.array([10.0, 20, 30, 40])], [7], [0.9]),
        (2, [np.array([12.0, 21, 30, 40]), np.array([100.0, 50, 20, 30])],
         [7, 8], [0.8, 0.7]),
    ]
    path = str(tmp_path / "seq.txt")
    mot.write_results(path, results)
    back = mot.read_results(path)
    assert set(back.keys()) == {1, 2}
    np.testing.assert_allclose(back[2][0][0], [12, 21, 30, 40], atol=0.01)
    assert back[2][1].tolist() == [7, 8]

    # gt reader filters class and zero-conf rows
    gt_path = str(tmp_path / "gt.txt")
    with open(gt_path, "w") as f:
        f.write("1,1,10,20,30,40,1,1,1.0\n")   # keep
        f.write("1,2,10,20,30,40,0,1,1.0\n")   # conf 0 -> drop
        f.write("1,3,10,20,30,40,1,7,1.0\n")   # class 7 -> drop
    gt = mot.read_gt(gt_path)
    assert len(gt[1][1]) == 1 and gt[1][1][0] == 1
