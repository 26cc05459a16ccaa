"""Benchmark: the BUSCA association hot path on real TPU hardware.

Measures the full third-round decision step — GHOST normalization, ReID
ResNet-50 over (T x (11 mem + 7 can)) 384x128 crops, the 4-layer decision
Transformer with on-device 3-D positional encodings, and the candidate
softmax — as one jitted call, i.e. exactly what the tracker runs per frame
for its unmatched tracks (BuscaModel == reference busca/network.py forward).

Baseline: the same computation through an equivalent torch module graph on
this machine's CPU (the reference implementation is CUDA/torch; no GPU exists
here, so the same-host torch build is the reproducible stand-in — the
reference's own published numbers contain no latency figures, BASELINE.md).

Prints ONE JSON line:
  {"metric": "busca_associate_tracks_per_s", "value": ..., "unit": "tracks/s",
   "vs_baseline": <speedup over torch-CPU>}
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache — first-compile of the ResNet graph
    through the TPU tunnel takes minutes; later runs load it in seconds."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

T = 16          # unmatched tracks per call (a busy MOT17 frame)
L_MEM = 11      # memory length (shipped config)
C = 5           # candidate slots (shipped config)
H, W = 384, 128
WARMUP = 3
ITERS = 20
TORCH_ITERS = 1  # one timed call — the CPU baseline is ~60s/call


def _example_batch(rng):
    mem_crops = rng.randint(0, 256, (T, L_MEM, H, W, 3)).astype(np.uint8)
    can_crops = rng.randint(0, 256, (T, C, H, W, 3)).astype(np.uint8)

    def boxes(n):
        xy = rng.uniform(0, 800, (T, n, 2))
        wh = rng.uniform(20, 200, (T, n, 2))
        return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)

    return mem_crops, can_crops, boxes(L_MEM), boxes(C)


def bench_tpu(batch, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from busca_tpu.models.busca import (
        BuscaConfig,
        BuscaModel,
        INPUT_PIXEL_MEAN_BGR,
        INPUT_PIXEL_STD_BGR,
    )

    config = BuscaConfig(dtype=dtype)
    model = BuscaModel(config)
    mem_crops, can_crops, mem_boxes, can_boxes = batch

    mean = jnp.asarray(INPUT_PIXEL_MEAN_BGR)
    std = jnp.asarray(INPUT_PIXEL_STD_BGR)

    @jax.jit
    def associate(params, mem_crops, can_crops, mem_boxes, can_boxes, mask):
        def prep(x):
            x = x.astype(jnp.float32)
            return ((x / 255.0 - mean) / std)[..., ::-1]

        logits = model.apply(
            {"params": params}, prep(mem_crops), prep(can_crops),
            mem_boxes, can_boxes, mask,
        )
        return jax.nn.softmax(logits, axis=-1)

    # init with normalized float crops (cheap path) to build params
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, L_MEM, H, W, 3), jnp.float32),
        jnp.zeros((1, C, H, W, 3), jnp.float32),
        jnp.zeros((1, L_MEM, 4), jnp.float32),
        jnp.zeros((1, C, 4), jnp.float32),
    )
    params = variables["params"]
    args = (
        params,
        jnp.asarray(mem_crops),
        jnp.asarray(can_crops),
        jnp.asarray(mem_boxes),
        jnp.asarray(can_boxes),
        jnp.ones((T,), jnp.float32),
    )
    for _ in range(WARMUP):
        associate(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = associate(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return dt, jax.devices()[0].platform


def bench_torch_cpu(batch):
    """Equivalent torch pipeline on host CPU (reference-architecture stand-in)."""
    try:
        import torch
        import torch.nn as tnn
    except ImportError:
        return None

    torch.set_num_threads(max(torch.get_num_threads(), 8))

    class Bottleneck(tnn.Module):
        def __init__(self, in_ch, planes, stride=1):
            super().__init__()
            out_ch = planes * 4
            self.c1 = tnn.Conv2d(in_ch, planes, 1, bias=False)
            self.b1 = tnn.BatchNorm2d(planes)
            self.c2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.b2 = tnn.BatchNorm2d(planes)
            self.c3 = tnn.Conv2d(planes, out_ch, 1, bias=False)
            self.b3 = tnn.BatchNorm2d(out_ch)
            self.r = tnn.ReLU()
            self.ds = (
                tnn.Sequential(
                    tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                    tnn.BatchNorm2d(out_ch),
                )
                if stride != 1 or in_ch != out_ch
                else None
            )

        def forward(self, x):
            i = x if self.ds is None else self.ds(x)
            x = self.r(self.b1(self.c1(x)))
            x = self.r(self.b2(self.c2(x)))
            return self.r(self.b3(self.c3(x)) + i)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 64, 7, 2, 3, bias=False),
                tnn.BatchNorm2d(64),
                tnn.ReLU(),
                tnn.MaxPool2d(3, 2, 1),
            )
            blocks = []
            in_ch = 64
            for s, (p, n) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
                for b in range(n):
                    blocks.append(
                        Bottleneck(in_ch, p, (1 if s == 0 else 2) if b == 0 else 1)
                    )
                    in_ch = p * 4
            self.blocks = tnn.Sequential(*blocks)
            self.red = tnn.Linear(2048, 512)
            self.enc = tnn.Linear(512, 512)
            layer = tnn.TransformerEncoderLayer(
                512, 4, 1024, 0.0, "gelu", batch_first=True,
                norm_first=False,
            )
            self.trans = tnn.TransformerEncoder(layer, 4)
            self.dec = tnn.Sequential(tnn.LayerNorm(512), tnn.Linear(512, 1))

        @torch.no_grad()
        def forward(self, mem, can, n_tokens=25):
            def feats(x):
                b, l = x.shape[:2]
                x = x.reshape(b * l, *x.shape[2:])
                x = self.blocks(self.stem(x))
                x = torch.amax(x, dim=(2, 3))
                f = torch.nn.functional.normalize(self.red(x), dim=-1)
                return self.enc(f).reshape(b, l, -1) * np.sqrt(512)

            m, c = feats(mem), feats(can)
            seq = torch.cat([m, c.repeat(1, 2, 1), c[:, :4]], dim=1)[:, :n_tokens]
            out = self.trans(seq)
            return torch.softmax(self.dec(out[:, -7:])[..., 0], -1)

    net = Net().train()  # BN batch stats like the reference
    mem_crops, can_crops, _, _ = batch
    mem = torch.from_numpy(
        (mem_crops.astype(np.float32) / 255.0).transpose(0, 1, 4, 2, 3)
    )
    can = torch.from_numpy(
        (can_crops.astype(np.float32) / 255.0).transpose(0, 1, 4, 2, 3)
    )
    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(TORCH_ITERS):
            net(mem, can)
        return (time.perf_counter() - t0) / TORCH_ITERS


def main():
    rng = np.random.RandomState(0)
    batch = _example_batch(rng)
    tpu_dt, platform = bench_tpu(batch, "float32")
    bf16_dt, _ = bench_tpu(batch, "bfloat16")
    torch_dt = bench_torch_cpu(batch)
    tracks_per_s = T / tpu_dt
    vs = (torch_dt / tpu_dt) if torch_dt else None
    print(
        json.dumps(
            {
                "metric": "busca_associate_tracks_per_s",
                "value": round(tracks_per_s, 2),
                "unit": "tracks/s",
                "vs_baseline": round(vs, 2) if vs else None,
                "detail": {
                    "platform": platform,
                    "tpu_ms_per_call_f32": round(tpu_dt * 1e3, 2),
                    "tpu_ms_per_call_bf16": round(bf16_dt * 1e3, 2),
                    "bf16_tracks_per_s": round(T / bf16_dt, 2),
                    "torch_cpu_ms_per_call": round(torch_dt * 1e3, 2)
                    if torch_dt
                    else None,
                    "tracks_per_call": T,
                    "crops_per_call": T * (L_MEM + C),
                    "note": "baseline = equivalent torch pipeline on this "
                    "host's CPU (single core); reference publishes no "
                    "latency numbers (BASELINE.md)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
