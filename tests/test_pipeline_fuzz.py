"""Randomized composed-pipeline parity fuzz.

`test_pipeline_oracle.py` pins the composed ByteTracker+BUSCA pipeline to the
independent torch oracle on ONE hand-written 110-frame stream per adapter.
This file widens that evidence: each seed generates a random scenario —
object count, trajectories, sizes, colors, dropout windows (BUSCA rescues),
low-confidence dips (BYTE's second round, byte_tracker.py:341-361), detector
noise, and optionally global camera drift (ECC CMC, byte_tracker.py:377-378)
— and requires frame-by-frame ID/box/probability parity through the same
`_run_byte_parity` harness.  Randomized streams reach tracker-state
interleavings a single authored sequence cannot (simultaneous dropouts,
re-entry collisions, low-score re-acquisition during a rescue window).

Seeds are fixed (not time-derived) so failures reproduce; the generator is
the randomness.  Slow tier.
"""

import numpy as np
import pytest

from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence

from test_pipeline_oracle import (
    FRAME_H,
    FRAME_W,
    _run_byte_parity,
    _run_centertrack_parity,
    _run_ghost_parity,
    _run_strongsort_parity,
    _run_transcenter_parity,
)

N_FRAMES = 70


def _random_sequence(seed: int, with_drift: bool = False):
    rng = np.random.RandomState(seed)
    n_obj = rng.randint(3, 7)
    drift = (
        (float(rng.uniform(0.3, 1.0)), float(rng.uniform(0.2, 0.6)))
        if with_drift
        else (0.0, 0.0)
    )
    objs = []
    for _ in range(n_obj):
        w = float(rng.uniform(14, 24))
        h = float(rng.uniform(28, 44))
        # endpoints inside the viewport margins; velocity derived so the
        # whole trajectory stays on screen (viewport coords; world velocity
        # adds the camera drift back)
        x0 = float(rng.uniform(4, FRAME_W - w - 4))
        y0 = float(rng.uniform(4, FRAME_H - h - 4))
        x1 = float(rng.uniform(4, FRAME_W - w - 4))
        y1 = float(rng.uniform(4, FRAME_H - h - 4))
        vx = (x1 - x0) / N_FRAMES + drift[0]
        vy = (y1 - y0) / N_FRAMES + drift[1]
        kw = {}
        roll = rng.rand()
        if roll < 0.6:
            start = int(rng.randint(10, N_FRAMES - 22))
            kw["dropout"] = (start, start + int(rng.randint(5, 14)))
        elif roll < 0.85:
            start = int(rng.randint(10, N_FRAMES - 22))
            kw["score_dip"] = (start, start + int(rng.randint(5, 14)))
            kw["dip_score"] = float(rng.uniform(0.2, 0.4))
        objs.append(
            SyntheticObject(
                color=rng.randint(30, 226, 3).astype(np.float64),
                x0=x0, y0=y0, vx=vx, vy=vy, w=w, h=h, **kw,
            )
        )
    return SyntheticSequence(
        objs,
        num_frames=N_FRAMES,
        height=FRAME_H,
        width=FRAME_W,
        det_noise=float(rng.uniform(0.5, 1.5)),
        seed=seed,
        camera_drift=drift,
    )


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_byte_pipeline_fuzz(seed):
    out = _run_byte_parity(_random_sequence(seed))
    # every random stream must still exercise the third round; the parity
    # asserts live inside the harness
    assert out["third_rounds"] >= 1, "stream never reached the third round"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [606, 707])
def test_strongsort_pipeline_fuzz(seed):
    out = _run_strongsort_parity(_random_sequence(seed))
    assert out["third_rounds"] >= 1, "stream never reached the third round"


@pytest.mark.slow
def test_strongsort_assign_protocol_seed():
    """r5 extended-campaign find (seed 8006): a 4x4 appearance-round frame
    where deep_sort's min_cost_matching protocol (clamped full Hungarian,
    over-threshold pairs participate then drop — linear_assignment.py:52-86)
    leaves a track coasting while a ByteTrack cost-limit LAP would match
    it.  The production StrongSORT now implements the reference protocol
    exactly; this pins the frame-by-frame parity on the exposing stream."""
    out = _run_strongsort_parity(_random_sequence(8006))
    assert out["third_rounds"] >= 1


@pytest.mark.slow
@pytest.mark.parametrize("seed", [808, 909])
def test_ghost_pipeline_fuzz(seed):
    out = _run_ghost_parity(_random_sequence(seed))
    assert out["third_rounds"] >= 1, "stream never reached the third round"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [111, 222])
def test_centertrack_pipeline_fuzz(seed):
    # tie_tol widened per the measured fuzz-scene noise (worst 0.021 vs the
    # authored-stream TIE_TOL 0.02; see _run_centertrack_parity docstring).
    out = _run_centertrack_parity(_random_sequence(seed), tie_tol=0.025)
    assert out["third_rounds"] >= 1, "stream never reached the third round"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [333, 444])
def test_transcenter_pipeline_fuzz(seed):
    out = _run_transcenter_parity(_random_sequence(seed))
    assert out["third_rounds"] >= 1, "stream never reached the third round"
    assert out["pos_checked"] >= 1, "position export never exercised"


@pytest.mark.slow
@pytest.mark.parametrize("seed,with_cmc", [(7005, False), (7102, True),
                                           (7103, True)])
def test_byte_pipeline_fuzz_noise_tail(seed, with_cmc):
    """Seeds from the r5 30-run extended campaign where the crop-backend
    LSB noise tail slightly exceeded TIE_TOL=0.02 on ONE probability
    element of ONE frame (measured worst 0.0242) while track IDs, boxes
    and every clear-margin decision stayed identical — i.e. parity holds
    at the behavior level and the committed 0.02 bound is a ~typical-case
    envelope, not a hard one.  Pinned at the measured-tail tolerance so
    the noise distribution is itself regression-tested (the centertrack
    harness records the same phenomenon at tie_tol=0.025)."""
    out = _run_byte_parity(
        _random_sequence(seed, with_drift=with_cmc),
        use_cmc=with_cmc, tie_tol=0.03,
    )
    assert out["third_rounds"] >= 1


@pytest.mark.slow
def test_byte_pipeline_fuzz_cmc():
    """One randomized stream with camera drift and ECC CMC live on both
    pipelines."""
    out = _run_byte_parity(_random_sequence(515, with_drift=True), use_cmc=True)
    assert out["third_rounds"] >= 1
    assert out["warp_shifts"], "CMC never ran"
    assert max(out["warp_shifts"]) > 0.3, "warps were trivial"


@pytest.mark.slow
def test_centertrack_pipeline_fuzz_cmc():
    """CMC live on the dict-IO CenterTrack pipeline over a drifting-camera
    stream — the shipped MOT17 config runs ECC for this adapter too
    (config/CenterTrack/MOT17/config_centertrack_mot17.yml:26)."""
    out = _run_centertrack_parity(
        _random_sequence(626, with_drift=True), tie_tol=0.025, use_cmc=True
    )
    assert out["third_rounds"] >= 1
    assert out["warp_shifts"], "CMC never ran"
    assert max(out["warp_shifts"]) > 0.3, "warps were trivial"


@pytest.mark.slow
def test_transcenter_pipeline_fuzz_cmc():
    """CMC live on the TransCenter pipeline (query-prior export checked
    per frame while warping) over a drifting-camera stream
    (config/TransCenter/MOT17/config_transcenter_mot17.yml:27)."""
    out = _run_transcenter_parity(
        _random_sequence(737, with_drift=True), use_cmc=True
    )
    assert out["third_rounds"] >= 1
    assert out["pos_checked"] >= 1
    assert out["warp_shifts"], "CMC never ran"
    assert max(out["warp_shifts"]) > 0.3, "warps were trivial"
