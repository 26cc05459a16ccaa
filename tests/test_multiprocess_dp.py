"""Multi-process data-parallel evaluation, actually executed (VERDICT r3 #6).

Spawns TWO real OS processes joined by ``jax.distributed`` (CPU backend),
each tracking its ``shard_sequences`` shard and aggregating metrics through
``global_metrics`` (process_allgather of tally vectors) — the production
multi-host path that previously had only ever run with process_count=1.
The merged metrics must equal a single-process run over all sequences.

Reference role: the DDP eval spawn at
adapters/ByteTrack/tools/track.py:305-316 with the rank-0 result gather at
mot_evaluator.py:244-248.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_expected():
    from busca_tpu.eval.runner import (
        evaluate_sequence,
        global_metrics,
        run_sequence,
    )
    from busca_tpu.eval.synthetic import default_dropout_sequence
    from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

    per_seq = {}
    for i in range(4):
        seq = default_dropout_sequence(num_frames=30, seed=i)
        dets = [seq.detections(t) for t in range(seq.num_frames)]
        tracker = ByteTracker(ByteTrackerConfig(use_busca=False))
        res = run_sequence(
            tracker, [None] * seq.num_frames, dets, name=f"seq{i}"
        )
        per_seq[f"seq{i}"] = evaluate_sequence(res, seq.ground_truth())
    # process_count == 1 here: global_metrics reduces locally
    return global_metrics(per_seq)


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    out_path = tmp_path / "dp_result.json"
    worker = os.path.join(os.path.dirname(__file__), "dp_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one CPU device per process keeps the 2-process topology unambiguous
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(rank), "2",
             str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    with open(out_path) as f:
        merged = json.load(f)
    assert merged["process_count"] == 2
    # rank 0 only tracked its shard — the merge is genuinely cross-process
    assert merged["local_sequences"] == ["seq0", "seq2"]

    expected = _single_process_expected()
    got = merged["metrics"]
    for field in ("mota", "motp", "idf1", "idp", "idr"):
        np.testing.assert_allclose(
            got[field], getattr(expected, field), atol=1e-9,
            err_msg=f"{field} diverged between 2-process and single-process",
        )
    for field in ("num_switches", "num_false_positives", "num_misses",
                  "num_matches", "num_gt"):
        assert got[field] == getattr(expected, field), field
