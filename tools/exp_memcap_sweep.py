"""Mem-cap deviation vs stream length — the VERDICT r4 Weak #4 sweep.

``eval/memcap_delta.py`` measures the bounded-memory deviation at one
length; this driver produces the deviation-vs-length CURVE the guidance
needs ("cap >= 5x seq_len" was extrapolated from 120 frames, but the
archive stride doubles with age so deviation pressure GROWS with stream
length — /root/reference counterpart: the unbounded growth this bounds,
byte_tracker.py:150-156).

One demo model is trained once (production memory length seq_len=11) and
shared across every (length, cap) cell; each length runs unbounded plus
caps {~2.7x, 5x, 10x} seq_len on one shared noise realization per seed.
Results append to a JSONL so a killed run keeps its finished cells.

Usage::

    python tools/exp_memcap_sweep.py --out /tmp/memcap_sweep.jsonl \
        --lengths 600 2000 6000 --seeds 2
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/memcap_sweep.jsonl")
    p.add_argument("--lengths", type=int, nargs="*",
                   default=[600, 2000, 6000])
    p.add_argument("--seeds", type=int, default=2,
                   help="sequence seeds per length (the longest length "
                        "drops to 1 seed automatically when >4000 frames)")
    p.add_argument("--seq-len", type=int, default=11)
    p.add_argument("--num-candidates", type=int, default=2)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--drop-period", type=int, default=150)
    p.add_argument("--broader", action="store_true",
                   help="run the use_broader_memory=True regime — the "
                        "even-stride sampler is the consumer that actually "
                        "reads the compacted archive")
    args = p.parse_args(argv)

    from busca_tpu.eval.memcap_delta import measure_memcap_delta
    from busca_tpu.train.demo import train_demo_model

    caps = [int(args.seq_len * 2.7), args.seq_len * 5, args.seq_len * 10]
    print(f"caps={caps} (2.7x/5x/10x of seq_len {args.seq_len})")

    t0 = time.time()
    cfg, params, train_metrics = train_demo_model(
        steps=args.steps, batch=12, seed=3,
        seq_len=args.seq_len, num_candidates=args.num_candidates,
        crop_hw=(64, 32),
        mem_stride_max=4 if args.broader else 1,
    )
    print(f"trained demo model in {time.time() - t0:.0f}s: {train_metrics}")

    with open(args.out, "a") as f:
        f.write(json.dumps({"kind": "header", "caps": caps,
                            "seq_len": args.seq_len,
                            "broader": bool(args.broader),
                            "train": train_metrics}) + "\n")
        f.flush()
        for n in args.lengths:
            seeds = 1 if n > 4000 else args.seeds
            t0 = time.time()
            out = measure_memcap_delta(
                caps=caps, num_frames=n, seq_seeds=tuple(range(seeds)),
                cfg=cfg, params=params, seq_len=args.seq_len,
                num_candidates=args.num_candidates, long_stream=True,
                drop_period=args.drop_period,
                use_broader_memory=args.broader,
            )
            row = {"kind": "length", "num_frames": n, "seeds": seeds,
                   "broader": bool(args.broader),
                   "wall_s": round(time.time() - t0, 1),
                   "metrics": out["metrics"], "delta": out["delta"],
                   "divergence": out.get("divergence", {})}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(f"--- {n} frames ({seeds} seeds, {row['wall_s']}s)")
            for tag, m in out["metrics"].items():
                extra = ""
                if "max_stride" in m:
                    extra = (f"  stride={m['max_stride']} "
                             f"mem={m['max_mem_len']}/"
                             f"{m['max_admissions']}adm")
                print(f"  {tag:10s} MOTA={m['mota']:.4f} "
                      f"IDF1={m['idf1']:.4f} HOTA={m['hota']:.4f} "
                      f"FN={m['fn']:.1f} IDs={m['ids']:.1f}" + extra)
            for tag, d in out["delta"].items():
                dv = out.get("divergence", {}).get(tag, {})
                print(f"  {tag}-unbounded: MOTA {d['mota']:+.4f} "
                      f"IDF1 {d['idf1']:+.4f} HOTA {d['hota']:+.4f} "
                      f"FN {d['fn']:+.1f} IDs {d['ids']:+.1f} | rows: "
                      f"{dv.get('diff_frames_total')} differing frames, "
                      f"first at {dv.get('first_diff_frame')}")
    print("sweep done")


if __name__ == "__main__":
    main()
