"""Launcher scripts (scripts/run_*.sh): flag surface, sequence selection,
experiment-dir layout — driven end-to-end on a tiny synthetic MOT dir."""

import os
import subprocess

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mot_data(tmp_path_factory):
    """MOT_DATA_DIR with MOT17/train/<seq>/ incl. det.txt + gt.txt."""
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence

    root = tmp_path_factory.mktemp("launcher_data")
    seq_dir = root / "MOT17" / "train" / "SYN-L-01"
    (seq_dir / "img1").mkdir(parents=True)
    (seq_dir / "det").mkdir()
    objs = [
        SyntheticObject(
            color=np.array([60, 180, 90], np.float64),
            x0=30, y0=40, vx=2.0, vy=0.5, w=26, h=56,
        ),
        SyntheticObject(
            color=np.array([200, 80, 160], np.float64),
            x0=180, y0=90, vx=-1.5, vy=0.0, w=30, h=60,
        ),
    ]
    n = 8
    seq = SyntheticSequence(objs, num_frames=n, height=160, width=280, seed=2)
    det_rows = []
    for t in range(n):
        cv2.imwrite(str(seq_dir / "img1" / f"{t + 1:06d}.jpg"), seq.frame(t))
        boxes, scores = seq.detections(t)
        for b, s in zip(boxes, scores):
            det_rows.append(
                f"{t + 1},-1,{b[0]:.2f},{b[1]:.2f},{b[2] - b[0]:.2f},"
                f"{b[3] - b[1]:.2f},{s:.3f},-1,-1,-1"
            )
    (seq_dir / "det" / "det.txt").write_text("\n".join(det_rows) + "\n")
    (seq_dir / "seqinfo.ini").write_text(
        "[Sequence]\nname=SYN-L-01\nimDir=img1\nframeRate=30\n"
        f"seqLength={n}\nimWidth=280\nimHeight=160\nimExt=.jpg\n"
    )
    return str(root)


@pytest.mark.slow
def test_run_strongsort_launcher(mot_data, tmp_path):
    env = dict(os.environ)
    env.update(MOT_DATA_DIR=mot_data, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_strongsort.sh"),
         "--output-base-folder", str(tmp_path / "exp")],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "StrongSORT_BASE" in out.stdout
    # exp-dir layout + results txt
    base = tmp_path / "exp" / "StrongSORT" / "MOT17" / "val"
    runs = list(base.iterdir())
    assert len(runs) == 1
    results = runs[0] / "track_results"
    assert (results / "SYN-L-01.txt").exists()
    assert (runs[0] / "out.txt").read_text()


def test_launcher_scripts_parse(tmp_path):
    """Every launcher is syntactically valid bash."""
    for name in ("run_bytetrack", "run_strongsort", "run_ghost",
                 "run_centertrack", "run_transcenter", "_run_common"):
        path = os.path.join(REPO, "scripts", f"{name}.sh")
        out = subprocess.run(["bash", "-n", path], capture_output=True)
        assert out.returncode == 0, f"{name}: {out.stderr}"


def test_sample_files_tool(tmp_path, capsys):
    """Even-stride file sampling (reference tools/sample_files.py:1-30)."""
    from busca_tpu.utils.sample_files import main, sample_files

    for i in range(10):
        (tmp_path / f"{i:03d}.jpg").write_text("x")
    (tmp_path / "subdir").mkdir()

    allf = sample_files(str(tmp_path))
    assert len(allf) == 10 and allf == sorted(allf)

    picked = sample_files(str(tmp_path), 4)
    # i * (N-1)/(k-1) stride: indices 0, 3, 6, 9
    assert [p.split("/")[-1] for p in picked] == [
        "000.jpg", "003.jpg", "006.jpg", "009.jpg"
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sample_files(str(tmp_path), 0)
    with _pytest.raises(ValueError):
        sample_files(str(tmp_path / "missing"))

    main([str(tmp_path), "--num-files", "2"])
    out = capsys.readouterr().out.strip().split(",")
    assert [p.split("/")[-1] for p in out] == ["000.jpg", "009.jpg"]
