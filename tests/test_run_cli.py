"""CLI surface regression tests: cached-det MOT mode, per-video thresholds,
post-processing flags, tracker shims (busca_tpu.eval.run.main)."""

import os

import numpy as np
import pytest

from busca_tpu.eval.run import main


@pytest.fixture(scope="module")
def mot_fixture(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("mot") / "MOT17-05-FRCNN"
    (root / "img1").mkdir(parents=True)
    (root / "det").mkdir()
    (root / "gt").mkdir()
    rng = np.random.RandomState(0)
    H, W, N = 64, 80, 6
    with open(root / "det/det.txt", "w") as det, \
            open(root / "gt/gt.txt", "w") as gt:
        for f in range(1, N + 1):
            img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            x = 10 + 3 * f
            cv2.rectangle(img, (x, 20), (x + 12, 44), (0, 255, 0), -1)
            cv2.imwrite(str(root / "img1" / f"{f:06d}.jpg"), img)
            det.write(f"{f},-1,{x},20,12,24,0.9,-1,-1,-1\n")
            gt.write(f"{f},1,{x},20,12,24,1,1,1\n")
    with open(root / "seqinfo.ini", "w") as fh:
        fh.write(
            "[Sequence]\nname=MOT17-05-FRCNN\nimDir=img1\nframeRate=30\n"
            f"seqLength={N}\nimWidth={W}\nimHeight={H}\nimExt=.jpg\n"
        )
    return str(root)


def test_cached_det_mode_and_metrics(mot_fixture, tmp_path):
    out = main(["--mot-dir", mot_fixture,
                "--output-dir", str(tmp_path / "o1")])
    m = out["MOT17-05-FRCNN"]
    assert m.mota == pytest.approx(1.0)
    assert os.path.exists(tmp_path / "o1" / "MOT17-05-FRCNN.txt")


def test_custom_thresholds_applied_per_video(mot_fixture, tmp_path,
                                             monkeypatch):
    """MOT17-05 gets track_buffer=14 from the per-video table, restored to
    30 under --ignore-custom-byte-thresholds."""
    import busca_tpu.eval.run as run_mod

    captured = {}
    orig = run_mod.make_tracker

    def spy(name, kwargs, engine, crop_hw=(384, 128)):
        captured.update(kwargs)
        return orig(name, kwargs, engine, crop_hw)

    monkeypatch.setattr(run_mod, "make_tracker", spy)
    main(["--mot-dir", mot_fixture, "--output-dir", str(tmp_path / "o2")])
    assert captured["track_buffer"] == 14
    captured.clear()
    main(["--mot-dir", mot_fixture, "--output-dir", str(tmp_path / "o3"),
          "--ignore-custom-byte-thresholds"])
    assert captured["track_buffer"] == 30


def test_gsi_postprocess_flag(mot_fixture, tmp_path):
    out = main(["--mot-dir", mot_fixture, "--gsi",
                "--output-dir", str(tmp_path / "o4")])
    m = out["MOT17-05-FRCNN"]
    assert m.mota == pytest.approx(1.0)  # smoothing must not break a clean run
    txt = open(tmp_path / "o4" / "MOT17-05-FRCNN.txt").read()
    assert len(txt.strip().splitlines()) >= 6


def test_ghost_tracker_mot_mode(mot_fixture, tmp_path):
    """The ghost strategy drives through the runner protocol via the shim
    (was a scale-as-features crash before round 2)."""
    out = main(["--mot-dir", mot_fixture, "--tracker", "ghost",
                "--output-dir", str(tmp_path / "o5")])
    assert out["MOT17-05-FRCNN"].mota == pytest.approx(1.0)


def test_strongsort_tracker_mot_mode(mot_fixture, tmp_path):
    out = main(["--mot-dir", mot_fixture, "--tracker", "strongsort",
                "--output-dir", str(tmp_path / "o6")])
    assert out["MOT17-05-FRCNN"].num_gt == 6


@pytest.mark.slow
def test_live_detector_lockstep_dp(mot_fixture, tmp_path):
    """The live-detector lockstep path through the CLI with the batch
    dp-sharded over the virtual 8-device mesh (--lockstep-dp): one
    sequence pads B=1 -> dp=8, exercising the pad-and-drop lanes through
    the whole runner (random yolox-tiny weights; structure, not metrics)."""
    out = main(["--mot-dir", mot_fixture, "--detector", "yolox-tiny",
                "--test-h", "64", "--test-w", "96",
                "--det-conf", "0.05",
                "--lockstep", "--lockstep-dp", "8",
                "--output-dir", str(tmp_path / "dp")])
    assert "MOT17-05-FRCNN" in out
    assert os.path.exists(tmp_path / "dp" / "MOT17-05-FRCNN.txt")


def test_transcenter_pth_ckpt_rejected(mot_fixture, tmp_path):
    """Upstream TransCenter .pth cannot be converted (empty submodule) —
    the CLI says so instead of silently ignoring the flag."""
    with pytest.raises(SystemExit):
        main(["--mot-dir", mot_fixture, "--tracker", "transcenter",
              "--detector", "transcenter", "--detector-ckpt", "up.pth",
              "--output-dir", str(tmp_path / "o")])


def test_centertrack_pth_ckpt_demands_exact_sampling(mot_fixture, tmp_path):
    """Converted .pth DCN checkpoints carry free-form offsets; the local
    fixed-support mode would silently change semantics.  (Trained .npz
    weights may use either mode — the param tree is identical.)"""
    with pytest.raises(SystemExit):
        main(["--mot-dir", mot_fixture, "--tracker", "centertrack",
              "--detector", "centertrack", "--centertrack-arch", "tiny",
              "--centertrack-sampling", "local",
              "--detector-ckpt", "ct.pth",
              "--output-dir", str(tmp_path / "o")])


@pytest.mark.slow
def test_centertrack_converted_pth_through_cli(mot_fixture, tmp_path):
    """End to end: a published-layout CenterTrack .pth (tiny dims) is
    converted on the fly by --detector-ckpt and drives the live
    detector loop (the yolox --detector-ckpt precedent)."""
    import sys

    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_oracles import TorchDLASeg

    torch.manual_seed(0)
    seg = TorchDLASeg(levels=(1, 1, 1, 1, 1, 1),
                      channels=(4, 8, 8, 16, 16, 32), head_conv=16)
    with torch.no_grad():
        for pname, p in seg.named_parameters():
            if "conv_offset_mask" in pname:
                p.mul_(0.05)
    pth = tmp_path / "ct_tiny.pth"
    torch.save({"epoch": 3, "state_dict": seg.state_dict()}, str(pth))

    out = main(["--mot-dir", mot_fixture, "--tracker", "centertrack",
                "--detector", "centertrack", "--centertrack-arch", "tiny",
                "--detector-ckpt", str(pth), "--max-frames", "2",
                "--test-h", "32", "--test-w", "64",
                "--output-dir", str(tmp_path / "o")])
    txt = tmp_path / "o" / "MOT17-05-FRCNN.txt"
    assert txt.exists()
