#!/usr/bin/env python3
"""Detector-MFU experiment: do the high-res CSP stages leave MXU
throughput on the table, and does exact channel-rounding recover it?

PARITY.md's r3 detector profile left the full YOLOX-X step at 7.82 ms @
54.4% MFU and located the residual gap "in the high-res CSP stages
(channel counts 160/320 pad to 256/384 MXU lanes)".  This measures that
hypothesis directly:

1. isolated timings of dark2 (160 ch @ 200x360) and dark3 (320 ch @
   100x180) at the eval shape, with XLA cost-analysis MFU;
2. the same stages with hidden channels zero-padded up to the next
   128-multiple (80 -> 128, 160 -> 256) — an EXACT rewrite: padded conv
   kernels are zero in the new lanes, frozen-stat BN maps the dead lanes
   to a constant that the next conv's zero weights ignore, and the stage
   output channels are unchanged;
3. the full forward with the padded stages, if (2) wins.

Run: python tools/exp_csp_mfu.py   (needs the TPU; ~2 min warm cache)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.profile_stages import PEAK_BF16, device_time, flops_of  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import flax.linen as nn

    from busca_tpu.models.yolox import ConvBnAct, CSPLayer

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    def timed(tag, module, x_shape):
        x = jnp.asarray(rng.randn(*x_shape).astype(np.float32))
        v = jax.jit(module.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def fwd(v, x):
            return module.apply(v, x).astype(jnp.float32).sum()

        ms = device_time(fwd, v, x)
        fl = flops_of(fwd, v, x)
        mfu = fl / (ms / 1e3) / PEAK_BF16 * 100 if fl else 0.0
        print(f"{tag:<44}{ms:>8.2f} ms {fl / 1e9:>8.1f} GF {mfu:>6.1f}% MFU",
              flush=True)
        return ms

    class Stage(nn.Module):
        """dark2/dark3 shape: strided ConvBnAct + CSP with n bottlenecks."""

        features: int
        n: int
        hidden_pad: int = 0  # 0 = stock; else pad CSP hidden to this

        @nn.compact
        def __call__(self, x):
            x = ConvBnAct(self.features, 3, 2, dtype=dt, name="conv")(x)
            if self.hidden_pad:
                # exact channel-rounding: CSPLayer expansion chosen so the
                # hidden dim is the padded value; extra lanes carry zero
                # weights at conversion time, so stock checkpoints stay
                # loadable by zero-extending (here: random init, timing only)
                exp = self.hidden_pad / self.features
                return CSPLayer(self.features, self.n, expansion=exp,
                                dtype=dt, name="csp")(x)
            return CSPLayer(self.features, self.n, dtype=dt, name="csp")(x)

    # YOLOX-X at 800x1440: depth 1.33 -> n = round(3 * 1.33) = 4
    print("== dark2: 160 ch @ 400x720 -> 200x360, CSP n=4 ==")
    t0 = timed("dark2 stock (hidden 80)", Stage(160, 4), (1, 400, 720, 80))
    t1 = timed("dark2 padded (hidden 128)", Stage(160, 4, 128),
               (1, 400, 720, 80))
    print(f"   -> padded / stock = {t1 / t0:.2f}x")

    print("== dark3: 320 ch @ 200x360 -> 100x180, CSP n=12 ==")
    t0 = timed("dark3 stock (hidden 160)", Stage(320, 12),
               (1, 200, 360, 160))
    t1 = timed("dark3 padded (hidden 256)", Stage(320, 12, 256),
               (1, 200, 360, 160))
    print(f"   -> padded / stock = {t1 / t0:.2f}x")

    # roofline: measured stage time vs max(compute floor, HBM floor) from
    # XLA's own cost analysis.  v5e: 197 TF/s bf16, ~819 GB/s HBM.
    HBM_BPS = 819e9

    def bytes_of(jitted, *a):
        ca = jitted.lower(*a).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", 0.0))

    print("== roofline: full YOLOX-X @ 800x1440 ==")
    import jax.random as jrandom

    from busca_tpu.models.yolox import CSPDarknet, PAFPN, YOLOX, YoloxConfig

    cfg = YoloxConfig.size("x", num_classes=1, dtype="bfloat16")
    model = YOLOX(cfg)
    x = jnp.asarray(rng.randn(1, 800, 1440, 3).astype(np.float32))
    variables = jax.jit(model.init)(jrandom.PRNGKey(0), x)

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

    for tag, fn in [("backbone(CSPDarknet)", backbone),
                    ("pafpn(backbone+fpn)", pafpn),
                    ("full model", full)]:
        ms = device_time(fn, variables, x)
        fl = flops_of(fn, variables, x)
        by = bytes_of(fn, variables, x)
        t_mxu = fl / PEAK_BF16 * 1e3
        t_hbm = by / HBM_BPS * 1e3
        floor = max(t_mxu, t_hbm)
        print(f"{tag:<24}{ms:>7.2f} ms | compute {t_mxu:>5.2f} ms, "
              f"HBM {by / 1e6:>6.0f} MB = {t_hbm:>5.2f} ms | "
              f"roofline {floor:>5.2f} ms ({ms / floor:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
