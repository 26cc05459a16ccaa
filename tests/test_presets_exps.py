"""TransCenter experiment presets mirror adapters/TransCenter/exps/*.py."""

import pytest

from busca_tpu.eval.presets import TRANSCENTER_EXPS, transcenter_exp


def test_tables_match_reference_values():
    ab = transcenter_exp("ablation")
    assert ab["val_ann"] == "val_half.json" and ab["test_conf"] == 0.1
    assert ab["test_size"] == (640, 1088) and ab["full_size"] == (800, 1440)
    m20 = transcenter_exp("mot20")
    assert m20["dataset"] == "MOT20" and m20["test_conf"] == 0.001
    assert m20["full_size"] == (896, 1600) and m20["random_size"] == (20, 36)
    mix = transcenter_exp("mix_det")
    assert mix["val_ann"] == "test.json" and mix["test_size"] == (640, 1088)
    assert all(e["track_thresh"] == 0.4 for e in TRANSCENTER_EXPS.values())


def test_unknown_exp_raises():
    with pytest.raises(KeyError):
        transcenter_exp("nope")


def test_copies_are_independent():
    a = transcenter_exp("ablation")
    a["test_conf"] = 999
    assert transcenter_exp("ablation")["test_conf"] == 0.1
