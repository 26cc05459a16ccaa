"""Full-loop smoke: training improves the model and the trained engine runs
live inside the tracker (the complete demo lives in busca_tpu/train/demo.py)."""

import pytest
import numpy as np

from busca_tpu.train.demo import run_trained_rescue, train_demo_model


@pytest.mark.slow
def test_training_learns_and_engine_deploys():
    cfg, params, metrics = train_demo_model(steps=45, batch=12, seed=3)
    # well above the ~37% no-skill rate of the episode mix
    assert metrics["accuracy"] > 0.6
    assert np.isfinite(metrics["loss"])

    out = run_trained_rescue(cfg, params, num_frames=22)
    # the trained engine must not hurt the tracker, and both variants track
    assert out["base"]["mota"] > 0.6
    assert out["busca"]["mota"] >= out["base"]["mota"] - 1e-9
    assert out["busca"]["ids"] == 0


def test_parallel_sequence_evaluation():
    from busca_tpu.eval.runner import evaluate_sequences_parallel

    def seq(n, miss=0):
        gt = {}
        pred = {}
        for f in range(1, n + 1):
            box = np.array([[10.0 + f, 10, 20, 40]])
            gt[f] = (box, np.array([1]))
            if f > miss:
                pred[f] = (box.copy(), np.array([5]), np.array([0.9]))
        return gt, pred

    per_seq = {"a": seq(10), "b": seq(10, miss=5)}
    out = evaluate_sequences_parallel(per_seq, num_workers=2)
    assert out["a"].mota == 1.0
    assert out["b"].num_misses == 5
