"""Measure the reid_stats='auto' T-crossover: frozen cached path vs one
fused dispatch, per-call steady-state wall time at T in {1,2,4,8,16,32,64}.

The r4 measurement (PARITY.md "Frozen-stats ReID") showed the frozen cached
path LOSES at tiny track counts — its encode+scorer double dispatch and
cache bookkeeping cost more than just shipping the pixels through ONE fused
scorer call — and wins 7x at T=64.  reid_stats='auto' encodes the policy:
below ``engine.AUTO_FUSED_MAX_T`` a call routes through the fused scorer
(same frozen-BN numerics).  This experiment produces the number that
constant pins.

Setup mirrors bench.py's bench_association_frozen: production model shape
(ResNet-50 + 4-layer/512-d decision Transformer, 384x128 crops, seq_len 11,
C=5), random weights (timing is weight-independent), steady state = memory
features cached, the frame's d dets + T Kalman crops fresh.  Run on the TPU
chip (BENCH_SMOKE=1 shrinks shapes for a CPU logic check).

Per-call wall time includes the host<->device sync; on the dev tunnel that
adds the tunnel RTT per sync, which the frozen path pays twice (encode +
score) — noted in the output so the crossover can be read conservatively.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared shape constants)

from busca_tpu.assoc.bank import next_uid, tag  # noqa: E402
from busca_tpu.assoc.engine import AssociationEngine  # noqa: E402
from busca_tpu.models.busca import BuscaConfig, BuscaModel  # noqa: E402
from busca_tpu.trackers.base import Track  # noqa: E402

L_MEM, C, H, W = bench.L_MEM, bench.C, bench.H, bench.W
D = 30 if not os.environ.get("BENCH_SMOKE") else 6
SWEEP = (1, 2, 4, 8, 16, 32, 64)


def build_engine(reid_stats, auto_fused_max_t):
    import jax
    import jax.numpy as jnp

    config = BuscaConfig(
        dtype="bfloat16", reid_use_batch_stats=False, **bench.ASSOC_KW
    )
    model = BuscaModel(config)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, L_MEM, H, W, 3), jnp.float32),
        jnp.zeros((1, C, H, W, 3), jnp.float32),
        jnp.zeros((1, L_MEM, 4), jnp.float32),
        jnp.zeros((1, C, 4), jnp.float32),
    )
    return AssociationEngine(
        config, variables, seq_len=L_MEM, num_candidates=C, crop_hw=(H, W),
        reid_stats=reid_stats, auto_fused_max_t=auto_fused_max_t,
    )


def make_scene(rng, t, d):
    def crop():
        return tag(rng.randint(0, 256, (H, W, 3)).astype(np.uint8),
                   next_uid())

    def track(n_mem, base_xy):
        tr = Track(np.array([base_xy[0], base_xy[1], 30, 60], np.float64),
                   0.9, image=crop())
        for i in range(n_mem - 1):
            tr.images_mem.append(crop())
            tr.tlwh_mem.append(
                np.array([base_xy[0] + i, base_xy[1], 30, 60], np.float64))
        tr.activate(1)
        return tr

    tracks = [track(L_MEM + 1, (30 * (i % 32), 60 * (i // 32)))
              for i in range(t)]
    dets = [Track(np.array([25 + 28 * (i % 32), 60, 30, 60], np.float64),
                  0.8, image=crop()) for i in range(d)]
    kal = [Track(tr.tlwh, 0.10000001, crop(), 1.0) for tr in tracks]
    return tracks, dets, kal


def retag(rng, objs):
    for o in objs:
        o.images_mem[-1] = tag(np.asarray(o.images_mem[-1]), next_uid())


def steady_ms(engine, tracks, dets, kal, rng, iters=8, warmup=3):
    for _ in range(warmup):
        retag(rng, dets + kal)
        engine.associate(tracks, dets, extra_kalman_candidates=kal)
    times = []
    for _ in range(iters):
        retag(rng, dets + kal)
        t0 = time.perf_counter()
        probs, _ = engine.associate(tracks, dets,
                                    extra_kalman_candidates=kal)
        times.append((time.perf_counter() - t0) * 1e3)
        assert probs is not None
    return float(np.median(times))


def main():
    rng = np.random.RandomState(0)
    frozen = build_engine("frozen", 0)
    fused = build_engine("auto", 10**9)  # force the fused path at every T
    rows = []
    for t in SWEEP:
        tracks, dets, kal = make_scene(rng, t, D)
        f_ms = steady_ms(frozen, tracks, dets, kal, rng)
        u_ms = steady_ms(fused, tracks, dets, kal, rng)
        rows.append({"t": t, "frozen_ms": round(f_ms, 2),
                     "fused_ms": round(u_ms, 2),
                     "winner": "frozen" if f_ms < u_ms else "fused"})
        print(json.dumps(rows[-1]), flush=True)
    crossover = next((r["t"] for r in rows if r["winner"] == "frozen"), None)
    print(json.dumps({
        "metric": "reid_auto_crossover",
        "d": D,
        "rows": rows,
        "first_t_where_frozen_wins": crossover,
        "note": "per-call steady-state wall (median); the dev tunnel adds "
                "its RTT per sync which the frozen path pays twice — on a "
                "PCIe host the crossover shifts toward smaller T, so the "
                "shipped AUTO_FUSED_MAX_T reads this conservatively",
    }, indent=None), flush=True)


if __name__ == "__main__":
    main()
