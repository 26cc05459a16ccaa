"""Measure the reid_stats='auto' T-crossover: one fused scorer dispatch vs
the frozen cached path (encode fresh units + bank score), per-call DEVICE
step cost at T in {1,2,4,8,16,32,64}.

Methodology matches bench.py (whose r4 run produced the PARITY.md
"frozen loses at T<=4" finding this policy encodes): both paths are timed
as compiled device programs with pre-staged inputs — async dispatch loops,
one final block — so the dev tunnel's per-sync RTT and upload bandwidth
(absent on a production PCIe host) do not skew the comparison.

  fused(T)  = bench_association_dedup(T, d)["ms"]   — ONE dispatch: memory
              crops + unique candidates through ReID + scorer (the program
              reid_stats='auto' runs below the crossover; frozen-BN math
              differs from the batch-BN benched program only by the
              statistics source, a negligible FLOP delta)
  frozen(T) = bench_association_frozen(T, d)["ms"]  — TWO dispatches:
              encode the frame's d+T fresh units at their bucket, then the
              HBM-feature-bank gather+score at bucket(T); memory features
              ride the cross-frame cache (steady state)

The fused path additionally uploads T*11 memory crops per call from host
(~1.6 MB/track); at PCIe bandwidth that adds <0.1 ms/track — noted in the
output, irrelevant to the small-T crossover.

Run on the TPU chip; BENCH_SMOKE=1 shrinks shapes for a CPU logic check.
The result pins engine.AUTO_FUSED_MAX_T.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared workloads/constants)

D = 30 if not os.environ.get("BENCH_SMOKE") else 6
SWEEP = (1, 2, 4, 8, 16, 32, 64)


def main():
    rows = []
    for t in SWEEP:
        fused = bench.bench_association_dedup(t, D, "bfloat16")
        frozen = bench.bench_association_frozen(t, D, "bfloat16")
        rows.append({
            "t": t,
            "fused_ms": round(fused["ms"], 2),
            "frozen_ms": round(frozen["ms"], 2),
            "frozen_encode_ms": round(frozen["encode_ms"], 2),
            "frozen_score_ms": round(frozen["score_ms"], 2),
            "winner": "frozen" if frozen["ms"] < fused["ms"] else "fused",
        })
        print(json.dumps(rows[-1]), flush=True)
    crossover = next((r["t"] for r in rows if r["winner"] == "frozen"), None)
    print(json.dumps({
        "metric": "reid_auto_crossover",
        "d": D,
        "rows": rows,
        "first_t_where_frozen_wins": crossover,
        "note": "device-step cost per call (bench.py methodology); the "
                "fused path's host->device memory-crop upload adds "
                "<0.1 ms/track on PCIe and is excluded, so read the "
                "crossover conservatively toward fused at small T",
    }), flush=True)


if __name__ == "__main__":
    main()
