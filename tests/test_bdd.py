"""BDD output conversion (GHOST manager.py:217-305 MOT2BDD semantics)."""

import json
import os

import numpy as np
import pytest

from busca_tpu.eval.bdd import (
    BDD_NAME_MAPPING,
    convert_results_dir,
    mot_rows_to_bdd,
)


def test_rows_grouped_by_frame_with_box2d_corners():
    rows = np.array([
        [1, 5, 10, 20, 30, 40, 0.9, -1, 3, -1],   # car
        [1, 6, 50, 60, 10, 10, 0.8, -1, 1, -1],   # pedestrian
        [2, 5, 12, 22, 30, 40, 0.9, -1, 3, -1],
    ])
    out = mot_rows_to_bdd("seq01", rows)
    assert [d["name"] for d in out] == [
        "seq01-0000001.jpg", "seq01-0000002.jpg"
    ]
    f1 = out[0]["labels"]
    assert {l["category"] for l in f1} == {"car", "pedestrian"}
    car = next(l for l in f1 if l["category"] == "car")
    assert car["id"] == 5
    assert car["box2d"] == {"x1": 10.0, "y1": 20.0, "x2": 40.0, "y2": 60.0}


def test_eval_class_filter_and_unknown_labels():
    rows = np.array([
        [1, 1, 0, 0, 5, 5, 1.0, -1, 6, -1],   # train
        [1, 2, 0, 0, 5, 5, 1.0, -1, 99, -1],  # unknown -> dropped
        [1, 3, 0, 0, 5, 5, 1.0, -1, -1, -1],  # missing -> pedestrian
    ])
    out = mot_rows_to_bdd("s", rows, classes_for_eval=["pedestrian"])
    assert len(out) == 1
    assert [l["category"] for l in out[0]["labels"]] == ["pedestrian"]


def test_convert_results_dir(tmp_path):
    d = tmp_path / "out"
    d.mkdir()
    (d / "MOT-01.txt").write_text("1,7,10,20,30,40,0.9,-1,-1,-1\n")
    (d / "empty.txt").write_text("")
    written = convert_results_dir(str(d))
    assert sorted(os.path.basename(p) for p in written) == [
        "MOT-01.json", "empty.json"
    ]
    data = json.loads((d / "MOT-01.json").read_text())
    assert data[0]["name"] == "MOT-01-0000001.jpg"
    assert data[0]["labels"][0]["id"] == 7
    assert json.loads((d / "empty.json").read_text()) == []
    assert set(BDD_NAME_MAPPING.values()) >= {"car", "bus", "rider"}


def test_read_bdd_json_roundtrip(tmp_path):
    rows = np.array([
        [1, 5, 10, 20, 30, 40, 0.9, -1, 1, -1],
        [2, 5, 12, 22, 30, 40, 0.9, -1, 1, -1],
        [2, 9, 50, 60, 20, 20, 0.8, -1, 3, -1],
    ])
    from busca_tpu.eval.bdd import read_bdd_json

    bdd = mot_rows_to_bdd("seq", rows)
    back = read_bdd_json(bdd)
    assert sorted(back) == [1, 2]
    tlwh, ids = back[2]
    assert set(ids) == {5, 9}
    np.testing.assert_allclose(sorted(tlwh[:, 0]), [12, 50])
    # category filter
    only_car = read_bdd_json(bdd, classes_for_eval=["car"])
    assert list(only_car) == [2] and list(only_car[2][1]) == [9]


def test_evaluate_bdd_perfect_prediction(tmp_path):
    from busca_tpu.eval.bdd import evaluate_bdd

    rows = np.array([
        [f, 5, 10 + 2 * f, 20, 30, 40, 1.0, -1, 1, -1] for f in range(1, 9)
    ])
    bdd = mot_rows_to_bdd("s", rows)
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(bdd))
    m = evaluate_bdd(str(gt_path), bdd)
    assert m["pedestrian"].mota == 1.0
    assert m["pedestrian"].num_switches == 0
    assert m["mMOTA"] == 1.0


def test_evaluate_bdd_is_per_category():
    """A cross-category overlap must NOT count as a match (BDD evaluates
    each category independently; mMOTA averages them)."""
    from busca_tpu.eval.bdd import evaluate_bdd

    gt_rows = np.array([
        [f, 1, 10, 20, 30, 40, 1.0, -1, 1, -1] for f in range(1, 5)
    ])  # pedestrian
    pred_rows = np.array([
        [f, 1, 10, 20, 30, 40, 1.0, -1, 3, -1] for f in range(1, 5)
    ])  # same boxes labeled car
    gt = mot_rows_to_bdd("s", gt_rows)
    pred = mot_rows_to_bdd("s", pred_rows)
    m = evaluate_bdd(gt, pred)
    # no cross-category credit: every pedestrian gt is a miss (MOTA 0.0,
    # not the 1.0 a pooled class-agnostic match would give)
    assert m["pedestrian"].mota == 0.0
    assert m["pedestrian"].num_misses == 4


def test_read_bdd_json_crowd_and_multi_video():
    from busca_tpu.eval.bdd import read_bdd_json

    frames = [
        {
            "videoName": "a",
            "frameIndex": 0,
            "labels": [
                {"id": 1, "category": "pedestrian",
                 "box2d": {"x1": 0, "y1": 0, "x2": 10, "y2": 10}},
                {"id": 2, "category": "pedestrian",
                 "attributes": {"crowd": True},
                 "box2d": {"x1": 50, "y1": 50, "x2": 90, "y2": 90}},
            ],
        },
        {
            "videoName": "b",
            "frameIndex": 0,
            "labels": [
                {"id": 3, "category": "pedestrian",
                 "box2d": {"x1": 5, "y1": 5, "x2": 15, "y2": 15}},
            ],
        },
    ]
    with pytest.raises(ValueError):
        read_bdd_json(frames)
    a = read_bdd_json(frames, video="a")
    assert list(a) == [1] and list(a[1][1]) == [1]  # crowd box skipped
    b = read_bdd_json(frames, video="b")
    assert list(b[1][1]) == [3]
