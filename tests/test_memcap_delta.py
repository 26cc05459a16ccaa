"""The bounded-memory deviation measurement harness (eval/memcap_delta.py).

Companion to test_frozen_delta.py: pins that the unbounded-vs-capped
measurement runs end-to-end and reports well-formed metrics/deltas for
every cap.
"""

import numpy as np
import pytest

from busca_tpu.eval.memcap_delta import measure_memcap_delta


@pytest.mark.slow
def test_measure_memcap_delta_report_shape():
    out = measure_memcap_delta(
        caps=(8,), steps=25, train_batch=10, seed=3, num_frames=40,
        seq_seeds=(0,),
    )
    assert set(out["metrics"]) == {"unbounded", "cap8"}
    for tag, m in out["metrics"].items():
        assert np.isfinite([m["mota"], m["hota"], m["idf1"]]).all(), tag
    assert set(out["delta"]) == {"cap8"}
    assert set(out["delta"]["cap8"]) == {"mota", "idf1", "hota", "fn", "ids"}
    # row-level divergence report (metrics can coincide while output rows
    # differ, so the sweep reports both)
    dv = out["divergence"]["cap8"]
    assert dv["diff_frames_total"] >= 0
    assert dv["first_diff_frame"] is None or (
        0 <= dv["first_diff_frame"] <= 40)


@pytest.mark.slow
def test_broader_arm_divergence_onset_respects_cap():
    """In the broader-memory regime (the even-stride sampler that actually
    reads the compacted archive) a capped run CAN diverge from unbounded —
    but never before a track's admissions exceed the cap, because until
    then the stored memory is the complete history.  Pins the row-level
    divergence machinery end-to-end: ids are counter-reset per run, so the
    first differing frame is a behavior divergence, not an id offset."""
    cap = 8
    out = measure_memcap_delta(
        caps=(cap,), steps=20, train_batch=8, num_frames=50,
        seq_seeds=(0,), long_stream=True, use_broader_memory=True,
    )
    dv = out["divergence"][f"cap{cap}"]
    first = dv["first_diff_frame"]
    # ~one admission per frame for these always-visible synthetic objects:
    # divergence strictly after the cap'th admission (frame index is
    # 1-based, warm-up frames all admit)
    assert first is None or first > cap, dv
