"""Multi-process data-parallel evaluation worker (tests/test_multiprocess_dp).

One rank of a ``jax.distributed`` CPU job: shard the synthetic sequence set
with ``shard_sequences``, track the local shard, aggregate metrics across
processes with ``global_metrics`` (the production multi-host path —
process_allgather of tally vectors, eval/run.py), and have rank 0 write the
merged result.  The jax.distributed equivalent of the reference's DDP eval
spawn (adapters/ByteTrack/tools/track.py:305-316 + mot_evaluator.py:244-248),
actually executed as separate OS processes.
"""

import dataclasses
import json
import sys


def main():
    port, pid, nprocs, out_path = sys.argv[1:5]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nprocs),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nprocs), jax.process_count()

    from busca_tpu.eval.runner import (
        evaluate_sequence,
        global_metrics,
        run_sequence,
        shard_sequences,
    )
    from busca_tpu.eval.synthetic import default_dropout_sequence
    from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

    names = [f"seq{i}" for i in range(4)]
    local = shard_sequences(names, jax.process_index(), jax.process_count())

    per_seq = {}
    for name in local:
        seed = int(name[3:])
        seq = default_dropout_sequence(num_frames=30, seed=seed)
        dets = [seq.detections(t) for t in range(seq.num_frames)]
        tracker = ByteTracker(ByteTrackerConfig(use_busca=False))
        res = run_sequence(
            tracker, [None] * seq.num_frames, dets, name=name
        )
        per_seq[name] = evaluate_sequence(res, seq.ground_truth())

    agg = global_metrics(per_seq)  # collective: every rank participates

    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "local_sequences": local,
                    "process_count": jax.process_count(),
                    "metrics": dataclasses.asdict(agg),
                },
                f,
            )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
