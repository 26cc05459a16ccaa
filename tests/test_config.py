"""Config system loads the reference's shipped YAMLs unchanged."""

import os
import types

import pytest

from busca_tpu.config import load_args_from_config, merge_args, load_tracker_bundle

REF_CFG = "/root/reference/config/ByteTrack/MOT17/config_bytetrack_mot17.yml"


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference not mounted")
def test_loads_reference_yaml():
    tracker, trainer = load_args_from_config(REF_CFG)
    assert tracker.seq_len == 11
    assert tracker.num_candidates == 5
    assert tracker.busca_thresh == 0.5
    assert tracker.use_broader_memory is True
    assert tracker.reliable_thresh == [15, 0.037]
    assert tracker.transformer.num_layer == 4
    assert tracker.transformer.trans_dim == 512
    assert trainer.transformer is tracker.transformer
    assert trainer.dataset.neg_threshold == 0.5


@pytest.mark.skipif(not os.path.exists(REF_CFG), reason="reference not mounted")
def test_bundle_materializes_typed_configs():
    args, busca_cfg, tracker_kwargs = load_tracker_bundle(REF_CFG)
    assert busca_cfg.num_layer == 4
    assert busca_cfg.nhead == 4
    assert busca_cfg.ff_size == 1024
    assert busca_cfg.input_flavour == "MEM-SEP-CAN-BAD"
    assert busca_cfg.encode_separator_as_reference is True
    assert tracker_kwargs["seq_len"] == 11
    assert tracker_kwargs["use_camera_motion_compensation"] is True

    # CLI-style overrides win
    args2, cfg2, kw2 = load_tracker_bundle(
        REF_CFG, overrides={"busca_thresh": 0.3, "new_flag": 7}
    )
    assert kw2["busca_thresh"] == 0.3
    assert args2.new_flag == 7


def test_merge_args_semantics():
    base = types.SimpleNamespace(a=1, b=2)
    new = types.SimpleNamespace(a=None, b=5, c="x")
    out = merge_args(base, new)
    assert out.a == 1  # None does not override
    assert out.b == 5
    assert out.c == "x"
