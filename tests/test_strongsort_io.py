"""StrongSORT cached-artifact path: .npy detections+features, deep_sort NMS,
ECC-JSON camera warps, full frame loop (reference deep_sort_app.py)."""

import json
import os

import numpy as np
import pytest

from busca_tpu.eval.strongsort_io import (
    create_detections,
    ecc_matrix_for_frame,
    gather_sequence_info,
    load_ecc_warps,
    non_max_suppression,
    run_cached_sequence,
)
from busca_tpu.trackers import StrongSortConfig, StrongSortTracker


FEAT_DIM = 8


def _make_fixture(tmp_path, n_frames=12, with_images=False):
    """MOTChallenge-style dir + deep_sort .npy (10 cols + features)."""
    seq = tmp_path / "SSTEST-01"
    (seq / "img1").mkdir(parents=True)
    rows = []
    rng = np.random.RandomState(3)
    for f in range(1, n_frames + 1):
        # two constant-velocity objects with stable features
        for oid, (x0, y0, v) in enumerate([(10, 20, 3.0), (120, 40, -2.0)]):
            x = x0 + v * f
            feat = np.zeros(FEAT_DIM)
            feat[oid] = 1.0
            feat += rng.randn(FEAT_DIM) * 0.01
            feat /= np.linalg.norm(feat)
            rows.append(
                [f, -1, x, y0, 14, 28, 0.9, -1, -1, -1, *feat.tolist()]
            )
        # a low-confidence distractor that the conf filter must drop
        rows.append([f, -1, 200, 10, 10, 20, 0.2, -1, -1, -1,
                     *np.ones(FEAT_DIM).tolist()])
    mat = np.asarray(rows, dtype=np.float64)
    det_file = seq / "det.npy"
    np.save(det_file, mat)
    with open(seq / "seqinfo.ini", "w") as fh:
        fh.write(
            "[Sequence]\nname=SSTEST-01\nimDir=img1\nframeRate=30\n"
            f"seqLength={n_frames}\nimWidth=256\nimHeight=128\nimExt=.jpg\n"
        )
    if with_images:
        import cv2

        for f in range(1, n_frames + 1):
            img = np.full((128, 256, 3), 30, np.uint8)
            cv2.imwrite(str(seq / "img1" / f"{f:06d}.jpg"), img)
    return str(seq), str(det_file), mat


def test_gather_and_create_detections(tmp_path):
    seq, det_file, mat = _make_fixture(tmp_path)
    info = gather_sequence_info(seq, det_file)
    assert info["sequence_name"] == "SSTEST-01"
    assert info["feature_dim"] == FEAT_DIM
    assert info["min_frame_idx"] == 1 and info["max_frame_idx"] == 12
    tlwh, conf, feats = create_detections(mat, 1)
    assert tlwh.shape == (3, 4) and feats.shape == (3, FEAT_DIM)
    # min_height drops the 20-px distractor
    tlwh2, conf2, _ = create_detections(mat, 1, min_height=25)
    assert len(tlwh2) == 2


def test_deep_sort_nms_overlap_semantics():
    """deep_sort NMS: overlap = intersection / candidate area (not IoU)."""
    boxes = np.array([[0, 0, 10, 10], [0, 0, 5, 5], [50, 50, 10, 10]], float)
    scores = np.array([0.9, 0.5, 0.8])
    # the 5x5 box lies inside the 10x10 -> overlap vs its own area ~ 1.0
    pick = non_max_suppression(boxes, 0.9, scores)
    assert sorted(pick) == [0, 2]
    # max_overlap = 1.0 (shipped config) disables suppression
    pick_all = non_max_suppression(boxes, 1.0, scores)
    assert sorted(pick_all) == [0, 1, 2]


def test_ecc_matrix_guard(tmp_path):
    warps = {
        "1": np.eye(3).tolist(),
        "2": (np.eye(3) + 0.01).tolist(),
        "3": (np.eye(3) * 500.0).tolist(),  # degenerate -> identity
        "4": [[1, 0, 5], [0, 1, -3]],  # 2x3 accepted
    }
    path = tmp_path / "ecc.json"
    path.write_text(json.dumps(warps))
    d = load_ecc_warps(str(path))
    assert ecc_matrix_for_frame(d, 5) is None
    np.testing.assert_allclose(ecc_matrix_for_frame(d, 2)[0][0], 1.01)
    np.testing.assert_allclose(ecc_matrix_for_frame(d, 3), np.eye(3))
    m4 = ecc_matrix_for_frame(d, 4)
    assert m4.shape == (3, 3) and m4[0, 2] == 5


def test_full_cached_strongsort_run(tmp_path):
    """Full deep_sort_app loop from files: both objects tracked with stable
    ids, the low-conf distractor filtered, txt written."""
    seq, det_file, _ = _make_fixture(tmp_path)
    tracker = StrongSortTracker(StrongSortConfig(n_init=2))
    out_file = str(tmp_path / "out.txt")
    res = run_cached_sequence(
        seq, det_file, tracker, min_confidence=0.6, load_images=False,
        output_file=out_file,
    )
    assert res.num_frames == 12
    # after confirmation, exactly the two real objects are online
    late = [r for r in res.results if r[0] >= 4]
    for frame_idx, tlwhs, ids, confs in late:
        assert len(ids) == 2
    # id stability across the sequence
    ids_per_frame = [set(r[2]) for r in late]
    assert all(s == ids_per_frame[0] for s in ids_per_frame)
    assert os.path.exists(out_file)
    lines = open(out_file).read().strip().splitlines()
    assert len(lines) > 0


def test_cached_run_with_ecc_warp(tmp_path):
    """A translation warp shifts the track state like track.py:220-230."""
    seq, det_file, _ = _make_fixture(tmp_path, n_frames=4)
    warps = {str(f): [[1, 0, 7.0], [0, 1, 0.0], [0, 0, 1]] for f in (3,)}
    tracker = StrongSortTracker(StrongSortConfig(n_init=1))
    res = run_cached_sequence(
        seq, det_file, tracker, min_confidence=0.6, load_images=False,
        ecc_warps=warps,
    )
    assert res.num_frames == 4  # loop survives the camera update path


def test_lockstep_cached_sequences_match_standalone(tmp_path):
    """Frame-synchronized multi-sequence runner (batched third rounds) must
    reproduce each sequence's standalone run_cached_sequence exactly."""
    from busca_tpu.eval.strongsort_io import run_cached_sequences_lockstep
    from busca_tpu.trackers.base import Track

    seq_a, det_a, _ = _make_fixture(tmp_path / "a", n_frames=10)
    seq_b, det_b, _ = _make_fixture(tmp_path / "b", n_frames=7)

    def mk():
        return StrongSortTracker(StrongSortConfig(n_init=2))

    Track.reset_id_counter()
    lock = run_cached_sequences_lockstep(
        [(seq_a, det_a, None), (seq_b, det_b, None)],
        [mk(), mk()], min_confidence=0.6, load_images=False,
    )

    solos = []
    for seq, det in ((seq_a, det_a), (seq_b, det_b)):
        Track.reset_id_counter()
        solos.append(
            run_cached_sequence(seq, det, mk(), min_confidence=0.6,
                                load_images=False)
        )

    from test_lockstep_busca import _canon

    for got, want in zip(lock, solos):
        assert got.num_frames == want.num_frames
        assert _canon(got.results) == _canon(want.results)
