"""Quantifying the bounded-memory deviation (``--mem-cap``).

``mem_cap`` (PARITY.md "long-context mechanism", trackers/base.py
``Track._compact_mems``) bounds each track's appearance-memory store for
long-stream serving — the reference grows it for the track's whole life
(byte_tracker.py:150-156).  The cap is a flagged deviation: once a track
outlives the cap, its memory is an even-stride subsample of the admitted
history instead of every admitted frame, so third-round decisions can
differ.  This module measures HOW MUCH, the same way ``frozen_delta``
bounds the frozen-stats mode: the demo-trained decision model tracked
end-to-end over synthetic dropout sequences LONG enough that tracks
outlive the cap, unbounded vs capped, with one shared noise realization
per sequence (MOTA / IDF1 / HOTA / FN / ID-switch deltas).  That the cap
actually engages is pinned separately by tests/test_mem_cap.py (bound +
spacing at every update).

CLI::

    python -m busca_tpu.eval.memcap_delta
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from busca_tpu.eval.frozen_delta import (
    _random_dropout_sequence,
    _track_sequence,
)


def measure_memcap_delta(
    caps: Sequence[int] = (8, 16),
    steps: int = 60,
    train_batch: int = 12,
    seed: int = 3,
    num_frames: int = 120,
    seq_seeds: Sequence[int] = (0, 1, 2),
    cfg=None,
    params=None,
) -> dict:
    """Run the unbounded-vs-capped deviation measurement.

    Trains the demo model (or takes ``cfg``/``params``), then for each
    synthetic dropout sequence runs the BUSCA-attached tracker unbounded
    and once per cap, all on one shared frame/detection realization.
    ``num_frames`` must comfortably exceed every cap (tracks must outlive
    the cap for the deviation to exist at all; with 120 frames a cap of 8
    compacts each surviving track's memory ~4 times).
    """
    from busca_tpu.assoc.engine import AssociationEngine
    from busca_tpu.train.demo import train_demo_model

    seq_len, num_candidates, crop_hw = 3, 2, (64, 32)
    train_metrics = {}
    if cfg is None or params is None:
        cfg, params, train_metrics = train_demo_model(
            steps=steps, batch=train_batch, seed=seed,
            seq_len=seq_len, num_candidates=num_candidates, crop_hw=crop_hw,
        )

    engine = AssociationEngine(
        cfg, {"params": params}, seq_len=seq_len,
        num_candidates=num_candidates, crop_hw=crop_hw, buckets=(1, 2, 4),
    )

    tags = ["unbounded"] + [f"cap{c}" for c in caps]
    per_seq: Dict[str, list] = {t: [] for t in tags}
    for s in seq_seeds:
        seq = _random_dropout_sequence(int(s), num_frames)
        # one noise realization shared by every mode (frozen_delta.py:321)
        frames = [seq.frame(t) for t in range(num_frames)]
        dets = [seq.detections(t) for t in range(num_frames)]
        kw = dict(seq_len=seq_len, num_candidates=num_candidates,
                  crop_hw=crop_hw, frames=frames, dets=dets)
        per_seq["unbounded"].append(_track_sequence(seq, engine, **kw))
        for c in caps:
            per_seq[f"cap{c}"].append(
                _track_sequence(seq, engine, mem_cap=int(c), **kw)
            )

    def agg(rows):
        keys = ("mota", "idf1", "hota", "fn", "ids")
        return {k: float(np.mean([r[k] for r in rows])) for k in keys}

    metrics = {tag: agg(rows) for tag, rows in per_seq.items()}
    deltas = {
        f"cap{c}": {
            k: metrics[f"cap{c}"][k] - metrics["unbounded"][k]
            for k in ("mota", "idf1", "hota", "fn", "ids")
        }
        for c in caps
    }
    return {
        "train": train_metrics,
        "num_frames": num_frames,
        "caps": list(caps),
        "metrics": metrics,
        "per_sequence": per_seq,
        "delta": deltas,
    }


def main():
    out = measure_memcap_delta()
    print(f"train: {out['train']}")
    for tag, m in out["metrics"].items():
        print(
            f"{tag:10s} MOTA={m['mota']:.3f} IDF1={m['idf1']:.3f} "
            f"HOTA={m['hota']:.3f} FN={m['fn']:.1f} IDs={m['ids']:.1f}"
        )
    for tag, d in out["delta"].items():
        print(
            f"{tag}-unbounded delta: MOTA {d['mota']:+.4f} "
            f"IDF1 {d['idf1']:+.4f} HOTA {d['hota']:+.4f} "
            f"FN {d['fn']:+.1f} IDs {d['ids']:+.1f}"
        )
    import json
    print(json.dumps({"metrics": out["metrics"], "delta": out["delta"],
                      "num_frames": out["num_frames"]}))


if __name__ == "__main__":
    main()
