"""End-to-end A/B test on a synthetic sequence: base BYTE loses identity
through a detector dropout; BYTE+BUSCA (engine stubbed to trust the Kalman
candidate) preserves it — the framework's golden-number regression pattern."""

import numpy as np

from busca_tpu.eval.runner import run_ab, run_sequence, evaluate_sequence
from busca_tpu.eval.synthetic import default_dropout_sequence
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

from test_byte_tracker import StubEngine


def _setup(num_frames=40):
    seq = default_dropout_sequence(num_frames)
    detections = [seq.detections(t) for t in range(num_frames)]
    gt = seq.ground_truth()
    frames = lambda: (seq.frame(t) for t in range(num_frames))
    return seq, detections, gt, frames


def test_busca_improves_identity_metrics():
    _, detections, gt, frames = _setup()

    out = run_ab(
        make_base_tracker=lambda: ByteTracker(ByteTrackerConfig()),
        make_busca_tracker=lambda: ByteTracker(
            ByteTrackerConfig(use_busca=True),
            assoc_engine=StubEngine(kalman_prob=1.0),
        ),
        frames_factory=frames,
        detections=detections,
        gt=gt,
    )
    base, busca = out["base"], out["busca"]

    # the dropout costs the base tracker misses (8 frames of object 1)
    assert base.num_misses >= 8
    # BUSCA keeps the track alive at the Kalman position: fewer misses
    assert busca.num_misses < base.num_misses
    # and identity preserved across the gap
    assert busca.idf1 > base.idf1
    assert busca.mota > base.mota
    # absolute sanity: with BUSCA both trajectories are near-perfectly tracked
    assert busca.mota > 0.9
    assert busca.num_switches == 0


def test_busca_improves_hota():
    from busca_tpu.eval.metrics import evaluate_hota
    from busca_tpu.eval.runner import results_to_pred

    _, detections, gt, frames = _setup()
    base_res = run_sequence(
        ByteTracker(ByteTrackerConfig()), frames(), detections
    )
    busca_res = run_sequence(
        ByteTracker(
            ByteTrackerConfig(use_busca=True),
            assoc_engine=StubEngine(kalman_prob=1.0),
        ),
        frames(),
        detections,
    )
    h_base = evaluate_hota(gt, results_to_pred(base_res))
    h_busca = evaluate_hota(gt, results_to_pred(busca_res))
    assert h_busca["hota"] > h_base["hota"]
    assert h_busca["deta"] > h_base["deta"]


def test_sequence_runner_outputs_valid_results(tmp_path):
    from busca_tpu.eval import mot

    _, detections, gt, frames = _setup(20)
    result = run_sequence(
        ByteTracker(ByteTrackerConfig()), frames(), detections
    )
    assert result.num_frames == 20
    assert result.fps > 0
    m = evaluate_sequence(result, gt)
    assert m.num_gt == 40  # 2 objects x 20 frames

    path = str(tmp_path / "out.txt")
    mot.write_results(path, result.results)
    back = mot.read_results(path)
    assert len(back) > 0
