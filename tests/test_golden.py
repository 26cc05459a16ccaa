"""Golden-number harness: clean skip without artifacts, full run + diff
report on a synthetic fixture (reference README.md:126-131 table)."""

import json
import os

import numpy as np
import pytest

from busca_tpu.eval.golden import MOT17_VAL_SEQUENCES, check_artifacts, main


def test_val_split_matches_reference():
    # adapters/StrongSORT/opts.py:11-20
    assert MOT17_VAL_SEQUENCES == [
        "MOT17-02-FRCNN", "MOT17-04-FRCNN", "MOT17-05-FRCNN",
        "MOT17-09-FRCNN", "MOT17-10-FRCNN", "MOT17-11-FRCNN",
        "MOT17-13-FRCNN",
    ]


def test_clean_skip_without_artifacts(tmp_path, capsys):
    out = main(["--mot-root", str(tmp_path), "--npy-dir", str(tmp_path)])
    assert out is None
    cap = capsys.readouterr().out
    assert "SKIP" in cap and "MOT17-02-FRCNN" in cap


def _fixture(tmp_path, n_frames=10):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_strongsort_io import _make_fixture

    seq, det_file, mat = _make_fixture(tmp_path, n_frames=n_frames)
    # gt: the two real objects
    os.makedirs(os.path.join(seq, "gt"), exist_ok=True)
    with open(os.path.join(seq, "gt", "gt.txt"), "w") as fh:
        for f in range(1, n_frames + 1):
            for oid, (x0, y0, v) in enumerate([(10, 20, 3.0),
                                               (120, 40, -2.0)], start=1):
                x = x0 + v * f
                fh.write(f"{f},{oid},{x:.2f},{y0},14,28,1,1,1\n")
    # img1 frames (gather_sequence_info wants them for frame indexing)
    import cv2

    for f in range(1, n_frames + 1):
        cv2.imwrite(
            os.path.join(seq, "img1", f"{f:06d}.jpg"),
            np.full((128, 256, 3), 30, np.uint8),
        )
    npy_dir = str(tmp_path / "npys")
    os.makedirs(npy_dir, exist_ok=True)
    os.replace(det_file, os.path.join(npy_dir, "SSTEST-01.npy"))
    return os.path.dirname(seq), npy_dir


def test_golden_run_and_diff_report(tmp_path, capsys):
    mot_root, npy_dir = _fixture(tmp_path)
    report = main([
        "--mot-root", mot_root, "--npy-dir", npy_dir,
        "--sequences", "SSTEST-01",
        "--output-dir", str(tmp_path / "out"),
    ])
    assert report is not None
    assert set(report) == {"mota", "hota", "idf1", "ids"}
    for v in report.values():
        assert v["diff"] is not None  # measured numbers present
    assert os.path.exists(tmp_path / "out" / "SSTEST-01.txt")
    cap = capsys.readouterr().out
    assert '"variant": "strongsort"' in cap
