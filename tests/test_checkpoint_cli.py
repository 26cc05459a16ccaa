"""Checkpoint IO, the .pth converter CLI, profiling hooks, and the run CLI."""

import json
import os

import numpy as np
import pytest
import torch

from busca_tpu.models.checkpoint import (
    load_params_npz,
    restore_checkpoint,
    save_checkpoint,
    save_params_npz,
)
from busca_tpu.utils.profiling import StageTimer
from busca_tpu.utils import get_ram_usage


def _tree():
    return {
        "a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "b": {"c": {"bias": np.ones(4)}},
    }


def test_npz_roundtrip(tmp_path):
    path = str(tmp_path / "p.npz")
    save_params_npz(path, _tree())
    back = load_params_npz(path)
    np.testing.assert_array_equal(back["a"]["w"], _tree()["a"]["w"])
    np.testing.assert_array_equal(back["b"]["c"]["bias"], np.ones(4))


def test_orbax_roundtrip(tmp_path):
    state = {"params": _tree(), "step": np.int32(7)}
    save_checkpoint(str(tmp_path), state, step=7)
    back = restore_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(back["params"]["a"]["w"]), _tree()["a"]["w"]
    )
    assert int(back["step"]) == 7


def test_convert_cli(tmp_path):
    """Full CLI path: torch .pth in reference layout -> npz -> load."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_oracles import TorchGhostResNet50

    from busca_tpu.models import convert

    tm = TorchGhostResNet50(num_classes=5, layers_cfg=(1, 1, 1, 1))
    sd = {k: v for k, v in tm.state_dict().items()}
    pth = str(tmp_path / "model_feats.pth")
    torch.save(sd, pth)
    npz = str(tmp_path / "model_feats.npz")
    convert.main([pth, npz, "--kind", "resnet"])
    tree = load_params_npz(npz)
    assert "conv1" in tree["params"]
    # conv kernels transposed to NHWC layout
    assert tree["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert tree["batch_stats"]["bn1"]["running_mean"].shape == (64,)


def test_stage_timer():
    t = StageTimer()
    with t("work"):
        sum(range(1000))
    with t("work"):
        pass
    s = t.summary()
    assert s["work"]["calls"] == 2
    assert s["work"]["total_s"] >= 0
    assert "work" in t.report()


def test_ram_usage_positive():
    assert get_ram_usage("MB") > 10


def test_run_cli_synthetic_base(capsys):
    from busca_tpu.eval import run

    out = run.main(["--synthetic", "--num-frames", "25"])
    assert "base" in out
    assert out["base"]["mota"] > 0.5
    printed = capsys.readouterr().out
    json.loads(printed[printed.index("{"):])  # valid JSON table


@pytest.mark.parametrize("tracker", ["strongsort", "ghost", "centertrack"])
def test_run_cli_other_trackers(tracker):
    from busca_tpu.eval import run

    out = run.main(["--synthetic", "--num-frames", "20", "--tracker", tracker])
    assert out["base"]["mota"] > 0.3
