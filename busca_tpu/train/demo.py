"""Full-loop demonstration: train BUSCA, deploy it, rescue tracks.

Trains a small decision model on synthetic multi-choice episodes until it
learns appearance+motion matching, builds an :class:`AssociationEngine` from
the trained parameters, and runs the BYTE strategy over a synthetic sequence
with a detector dropout window — the track must survive on the strength of
the *learned* model (no stubs).  This closes the framework's full loop:
train -> checkpoint -> engine -> tracker -> metrics.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def train_demo_model(
    steps: int = 120,
    batch: int = 16,
    seq_len: int = 3,
    num_candidates: int = 2,
    crop_hw: Tuple[int, int] = (64, 32),
    lr: float = 3e-4,
    seed: int = 0,
    log_every: int = 0,
    mem_stride_max: int = 1,
):
    """Train a tiny BuscaModel on synthetic episodes.

    Returns (config, params, final_metrics).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from busca_tpu.models.busca import BuscaConfig, BuscaModel
    from busca_tpu.train.data import EpisodeSpec, synthetic_batch
    from busca_tpu.train.trainer import make_train_step

    cfg = BuscaConfig(
        num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1),
        dropout_p=0.0,
    )
    spec = EpisodeSpec(
        batch=batch, seq_len=seq_len, num_candidates=num_candidates,
        crop_hw=crop_hw, mem_stride_max=mem_stride_max,
    )
    model = BuscaModel(cfg)
    rng = np.random.RandomState(seed)
    b0 = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, spec).items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        b0["mem_crops"], b0["can_crops"], b0["mem_boxes"], b0["can_boxes"],
    )["params"]
    opt = optax.adamw(lr)
    state = opt.init(params)
    step = jax.jit(make_train_step(model, opt))
    key = jax.random.PRNGKey(seed + 1)
    metrics = {}
    acc_hist = []
    for i in range(steps):
        b = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, spec).items()}
        key, sub = jax.random.split(key)
        params, state, metrics = step(params, state, b, sub)
        acc_hist.append(float(metrics["accuracy"]))
        if log_every and i % log_every == 0:
            print(
                f"step {i}: loss {float(metrics['loss']):.3f} "
                f"acc {acc_hist[-1]:.2f}",
                flush=True,
            )
    return cfg, params, {
        "loss": float(metrics["loss"]),
        "accuracy": float(np.mean(acc_hist[-10:])),
    }


def run_trained_rescue(
    cfg, params, seq_len: int = 3, num_candidates: int = 2,
    crop_hw: Tuple[int, int] = (64, 32), num_frames: int = 26,
) -> Dict[str, dict]:
    """Run base vs trained-BUSCA BYTE tracking over the dropout sequence."""
    from busca_tpu.assoc.engine import AssociationEngine
    from busca_tpu.eval.metrics import evaluate_hota
    from busca_tpu.eval.runner import (
        evaluate_sequence,
        results_to_pred,
        run_sequence,
    )
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence
    from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig

    objs = [
        SyntheticObject(
            color=np.array([40, 200, 60], np.float64),
            x0=40, y0=60, vx=3.0, vy=0.5, w=36, h=72,
            dropout=(12, 18),
        ),
        SyntheticObject(
            color=np.array([210, 60, 180], np.float64),
            x0=280, y0=150, vx=-2.0, vy=-0.8, w=40, h=80,
        ),
    ]
    seq = SyntheticSequence(objs, num_frames=num_frames)
    dets = [seq.detections(t) for t in range(num_frames)]
    gt = seq.ground_truth()

    engine = AssociationEngine(
        cfg, {"params": params}, seq_len=seq_len,
        num_candidates=num_candidates, crop_hw=crop_hw, buckets=(1, 2, 4),
    )
    out = {}
    for tag, eng in (("base", None), ("busca", engine)):
        tracker_cfg = ByteTrackerConfig(
            use_busca=eng is not None, seq_len=seq_len,
            num_candidates=num_candidates, crop_hw=crop_hw,
            # the demo model was trained on consecutive-frame memories, so
            # disable the broader-memory subsampling (a config knob the
            # reference exposes too)
            use_broader_memory=False,
        )
        tracker = ByteTracker(tracker_cfg, assoc_engine=eng)
        res = run_sequence(
            tracker, (seq.frame(t) for t in range(num_frames)), dets
        )
        m = evaluate_sequence(res, gt)
        h = evaluate_hota(gt, results_to_pred(res))
        out[tag] = {
            "mota": m.mota, "idf1": m.idf1, "hota": h["hota"],
            "fn": m.num_misses, "ids": m.num_switches,
        }
    return out


def main():
    print("training the decision model on synthetic episodes...")
    cfg, params, metrics = train_demo_model(log_every=20)
    print(f"trained: {metrics}")
    print("tracking the dropout sequence (base vs trained BUSCA)...")
    out = run_trained_rescue(cfg, params)
    for tag, m in out.items():
        print(
            f"{tag:6s} MOTA={m['mota']:.3f} IDF1={m['idf1']:.3f} "
            f"HOTA={m['hota']:.3f} FN={m['fn']} IDs={m['ids']}"
        )


if __name__ == "__main__":
    main()
