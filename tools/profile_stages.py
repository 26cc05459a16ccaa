#!/usr/bin/env python3
"""Stage-level device profiles for the busca_tpu hot paths.

Reproduces the profiler-driven breakdowns recorded in PARITY.md ("Detector
stage profile", "Association-call stage profile", CenterTrack/TransCenter
entries) with one command per target::

    python tools/profile_stages.py yolox        # detector stages @800x1440
    python tools/profile_stages.py reid         # ReID ResNet-50 stages
    python tools/profile_stages.py centertrack  # DLA base vs IDAUp DCNs
    python tools/profile_stages.py transcenter  # PVTv2 vs decoder

Timing uses the dispatch-slope method with a SCALAR probe fetch of the last
output — on this dev TPU a full fetch travels a network tunnel and
``block_until_ready`` lies (see bench.py), so (t_k8 - t_k1)/7 with a
4-byte fetch is the reliable per-call device time.  MFU comes from XLA's
compiled cost analysis vs the chip's bf16 peak.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _setup_jax():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


PEAK_BF16 = 197e12  # v5e; see bench.py _PEAK_BF16 for other parts


def device_time(fn, *a):
    def loop_ms(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*a)
        np.asarray(out).ravel()[0]
        return (time.perf_counter() - t0) * 1e3

    loop_ms(1)
    t1 = min(loop_ms(1) for _ in range(3))
    t8 = min(loop_ms(8) for _ in range(3))
    return max((t8 - t1) / 7.0, 0.02)


def flops_of(jitted, *a):
    try:
        ca = jitted.lower(*a).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def report(name, ms, fl):
    mfu = fl / (ms / 1e3) / PEAK_BF16 * 100 if fl else 0.0
    print(f"{name:<34}{ms:>8.2f} ms {fl / 1e9:>9.1f} GF {mfu:>6.1f}% MFU",
          flush=True)


def profile_yolox():
    jax = _setup_jax()
    import jax.numpy as jnp

    from busca_tpu.models.yolox import CSPDarknet, PAFPN, YOLOX, YoloxConfig
    from busca_tpu.ops.nms import yolox_postprocess

    cfg = YoloxConfig.size("x", num_classes=1, dtype="bfloat16")
    model = YOLOX(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 800, 1440, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    dt = jnp.bfloat16

    @jax.jit
    def backbone(v, x):
        outs = CSPDarknet(cfg.depth, cfg.width, dt).apply(
            {"params": v["params"]["backbone"]["backbone"],
             "batch_stats": v["batch_stats"]["backbone"]["backbone"]}, x)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    @jax.jit
    def pafpn(v, x):
        outs = PAFPN(cfg.depth, cfg.width, dt).apply(
            {"params": v["params"]["backbone"],
             "batch_stats": v["batch_stats"]["backbone"]}, x)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    @jax.jit
    def full(v, x):
        return model.apply(v, x).astype(jnp.float32).sum()

    pred = model.apply(variables, x)
    pred = jax.device_put(np.asarray(pred))

    @jax.jit
    def nms(p):
        out, valid = yolox_postprocess(p[0], 1, 0.05, 0.7, 128,
                                       pre_nms_topk=512)
        return out.sum() + valid.sum().astype(jnp.float32)

    for name, fn, args in [
        ("backbone(CSPDarknet)", backbone, (variables, x)),
        ("pafpn(backbone+fpn)", pafpn, (variables, x)),
        ("full model (+heads+decode)", full, (variables, x)),
        ("nms", nms, (pred,)),
    ]:
        report(name, device_time(fn, *args), flops_of(fn, *args))


def profile_reid():
    jax = _setup_jax()
    import jax.numpy as jnp

    from busca_tpu.models.reid import ReIDResNet

    n, h, w = 832, 384, 128
    reid = ReIDResNet(layers=(3, 4, 6, 3), num_classes=299,
                      dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, 3).astype(np.float32))
    v = jax.jit(reid.init)(jax.random.PRNGKey(0),
                           jnp.zeros((2, h, w, 3), jnp.float32),
                           jnp.ones((2,), jnp.float32))

    @jax.jit
    def fwd(v, x):
        _, f = reid.apply({"params": v["params"]}, x)
        return f.astype(jnp.float32).sum()

    report(f"ReID ResNet-50 ({n} crops)", device_time(fwd, v, x),
           flops_of(fwd, v, x))


def profile_centertrack():
    jax = _setup_jax()
    import jax.numpy as jnp

    from busca_tpu.models.centertrack import CenterTrackConfig, CenterTrackNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 544, 960, 3).astype(np.float32))
    hm = jnp.asarray(rng.randn(1, 544, 960, 1).astype(np.float32))
    for sampling in ("deformable", "windowed", "local"):
        net = CenterTrackNet(CenterTrackConfig(sampling=sampling))
        v = jax.jit(net.init)(jax.random.PRNGKey(0), x, x, hm)

        @jax.jit
        def full(v, x, hm):
            out = net.apply(v, x, x, hm)
            return sum(o.astype(jnp.float32).sum() for o in out.values())

        report(f"CenterTrack full ({sampling})", device_time(full, v, x, hm),
               flops_of(full, v, x, hm))


def profile_transcenter():
    jax = _setup_jax()
    import dataclasses

    import jax.numpy as jnp

    from busca_tpu.models.transcenter import (
        PVTv2, TransCenterConfig, TransCenterDETR,
    )

    cfg = dataclasses.replace(TransCenterConfig.for_dataset("mot17"),
                              dtype="bfloat16")
    rng = np.random.RandomState(0)
    curr = jnp.asarray(rng.randn(1, 640, 1088, 3).astype(np.float32))
    hm = jnp.asarray(rng.randn(1, 160, 272, 1).astype(np.float32))
    net = TransCenterDETR(cfg)
    v = jax.jit(net.init)(jax.random.PRNGKey(0), curr, curr, hm)

    @jax.jit
    def full(v, c, h):
        out = net.apply(v, c, c, h)
        return sum(o.astype(jnp.float32).sum() for o in out.values())

    report("TransCenter full", device_time(full, v, curr, hm),
           flops_of(full, v, curr, hm))

    bb = PVTv2(cfg.dims, cfg.heads, cfg.depths, cfg.mlp_ratios,
               cfg.sr_ratios, jnp.bfloat16)
    bv = jax.jit(bb.init)(jax.random.PRNGKey(0), curr)

    @jax.jit
    def backbone(v, x):
        outs = bb.apply(v, x)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    report("PVTv2 one frame", device_time(backbone, bv, curr),
           flops_of(backbone, bv, curr))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("target", choices=("yolox", "reid", "centertrack",
                                           "transcenter"))
    args = parser.parse_args(argv)
    {"yolox": profile_yolox, "reid": profile_reid,
     "centertrack": profile_centertrack,
     "transcenter": profile_transcenter}[args.target]()


if __name__ == "__main__":
    sys.exit(main())
