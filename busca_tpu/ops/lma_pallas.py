"""Pallas TPU kernel for the local multi-scale weighted-tap sum.

The TransCenter decoder's :class:`LocalMultiScaleAttention` reduces, for
every query pixel, 4 levels x 9 dilated taps of value maps with per-query
softmax weights:

    out[p, h, :] = sum_{l, t} w[p, h, l, t] * V_l[p + dil_l * delta_t, h, :]

In XLA the 36-term chain is elementwise-traffic bound (8.4 ms/call at the
MOT17 shape; the row-chunked ``lax.map`` form gets 3.2 ms — see
models/transcenter.py).  This kernel accumulates all 36 terms while the
output tile stays resident in VMEM, so the accumulator round-trips HBM
once instead of once per term.  The design is shaped by measured Mosaic
constraints:

- grid = (row tiles, head blocks, levels); the out BlockSpec ignores the
  level index, so the tile is revisited (stays in VMEM) across levels;
- tap offsets depend on the level's dilation (a grid index), i.e. they
  are DYNAMIC in-kernel.  Mosaic cannot lower dynamically-offset vector
  loads or tpu.dynamic_rotate on the tiled (minor-two) dims, and fully
  unrolled taps blow the 16 MB scoped-vmem stack (no cross-statement
  buffer reuse; measured 22-37 MB).  So: the value map stays in HBM
  (``memory_space=ANY``) with the dx shifts baked into host-side copies
  (DMA sources reject unaligned dynamic offsets on tiled dims too), and
  the kernel DMAs the three [3*TILE_R, W4] row windows into a VMEM
  scratch, after which the 9-tap ``fori_loop`` (body compiled once)
  only ever slices the scratch dynamically on UNTILED dims;
- per-head weights expand to lanes via a tiny 0/1 matmul with an f32
  accumulator (Mosaic rejects both the lane-splitting reshape a
  ``jnp.repeat`` needs and non-32-bit matmul accumulators).

Equality with the direct formulation is pinned in tests/test_deform.py
and end-to-end vs the chunked path in tests/test_transcenter_model.py.

MEASURED VERDICT (v5e, MOT17 shape L=4/160x272/C=256/8 heads, bf16):
bit-exact vs the reference formulation, but 13.1 ms/call vs 2.9-3.6 ms
for the row-chunked ``lax.map`` XLA form (same-script A/B through the
flax module, scalar-probe dispatch-slope timing, both orders) — the serialized per-step DMA waits
and grid overhead sit on top of the same ~0.8 GB of dy-amplified value
traffic that XLA streams through fused loads with zero added latency.
The chunked XLA form stays production; this kernel is a validated
reference artifact, opt-in via ``TransCenterConfig(
sampling="local_pallas")``, kept for the Mosaic lowering constraints its
history documents (see PARITY.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 8


def _kernel(v_hbm, w_hbm, out_ref, win, wsc, sem, *,
            dils: Tuple[int, ...], w4: int, head_dim: int, cb: int,
            hpb: int):
    # v_hbm:  [L, 3, rowsP, W4, C] in HBM/ANY — dx-shifted copies
    # w_hbm:  [L, 9, heads, rowsP, W4] in HBM/ANY
    # out_ref: [1, TILE_R, W4, CB] f32, revisited across the level grid dim
    # win (VMEM scratch): [3, 3*TILE_R, W4, CB] — dx-shifted row windows
    # wsc (VMEM scratch): [9, hpb, TILE_R, W4] — this step's tap weights
    r = pl.program_id(0)
    hblk = pl.program_id(1)
    lvl = pl.program_id(2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (hpb, cb), 1) // head_dim
    head = jax.lax.broadcasted_iota(jnp.int32, (hpb, cb), 0)
    expand = (lane == head).astype(w_hbm.dtype)  # exact 0/1 head->lane

    # scalar select (a constant dils array would be a captured constant)
    dil = sum(d * (lvl == i).astype(jnp.int32) for i, d in enumerate(dils))

    # The dx shifts are baked into host-side copies: a DMA source may be
    # sliced at arbitrary offsets only on UNTILED dims (tpu.memref_slice
    # rejects unaligned dynamic offsets on the tiled minor-two dims, so a
    # column offset of dx*dil cannot be expressed here).
    # NOTE: serial start/wait per copy.  Starting all four and then
    # waiting (whether on a shared semaphore or a DMA semaphore array)
    # compiles but HANGS at runtime on v5e — overlapped same-kernel DMA
    # batches are not safe here.
    for dxi in range(3):
        cp = pltpu.make_async_copy(
            v_hbm.at[lvl, dxi, pl.ds(TILE_R * r, 3 * TILE_R), :,
                     pl.ds(cb * hblk, cb)],
            win.at[dxi],
            sem,
        )
        cp.start()
        cp.wait()
    cp = pltpu.make_async_copy(
        w_hbm.at[lvl, :, pl.ds(hpb * hblk, hpb), pl.ds(TILE_R * r, TILE_R),
                 :],
        wsc,
        sem,
    )
    cp.start()
    cp.wait()

    @pl.when(lvl == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def tap(t, _):
        # Everything stays 4D with a leading singleton: any squeeze of a
        # dynamically-indexed load lowers as a lane-merging tpu.reshape,
        # which Mosaic rejects.  Dynamic offsets land on UNTILED scratch
        # dims only.
        dy = t // 3 - 1
        sh = win[pl.ds(t % 3, 1), pl.ds(TILE_R + dy * dil, TILE_R)]
        wsel = wsc[pl.ds(t, 1)]  # [1, hpb, TILE_R, W4pad]
        wt = jax.lax.dot_general(
            wsel, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,  # Mosaic wants 32-bit acc
        )[:, :, :w4, :]  # [1, TILE_R, W4, CB]; the W4pad slice is a
        # static 8-aligned SUBLANE slice of the result (allowed), unlike
        # a lane slice of the operand
        out_ref[...] = out_ref[...] + sh.astype(jnp.float32) * wt
        return 0

    jax.lax.fori_loop(0, 9, tap, 0)


@functools.partial(jax.jit, static_argnames=("dils", "heads"))
def local_tap_sum(values: jnp.ndarray, weights: jnp.ndarray,
                  dils: Tuple[int, ...], heads: int):
    """values ``[L, H4, W4, C]`` (value-projected + upsampled to the query
    grid); weights ``[H4, W4, heads, L * 9]`` (level-major, taps ordered
    dy-outer/dx-inner over (-1, 0, 1)).  Returns ``[H4, W4, C]`` in the
    value dtype with a float32 accumulator."""
    levels, h4, w4, c = values.shape
    head_dim = c // heads
    pad = max(dils)
    assert pad <= TILE_R, "halo must fit one neighboring row tile"

    n_tiles = -(-h4 // TILE_R)
    rows_padded = n_tiles * TILE_R
    # per level: three column-shifted copies (dx * dil_l baked in), plus
    # one extra tile of zero rows above and below for the halo windows
    cols = jnp.pad(values, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    vp = jnp.stack([
        jnp.stack([
            cols[lvl, :, pad + (dxi - 1) * dils[lvl]:
                 pad + (dxi - 1) * dils[lvl] + w4]
            for dxi in range(3)
        ])
        for lvl in range(levels)
    ])  # [L, 3, H4, W4, C]
    vp = jnp.pad(vp, (
        (0, 0), (0, 0), (TILE_R, TILE_R + rows_padded - h4), (0, 0), (0, 0)
    ))
    # [H4, W4, heads, L*9] -> [L, 9, heads, H4, W4pad]: tap/level become
    # leading (untiled) dims the kernel's DMA and tap-select index.  W4
    # lands on the LANE dim and is padded to the 128-lane tile multiple:
    # the DMA must copy full lanes (a 272-lane slice of a 384-lane-padded
    # memref is not expressible).
    w4l = -(-w4 // 128) * 128
    wp = jnp.pad(weights, ((0, rows_padded - h4), (0, 0), (0, 0), (0, 0)))
    wp = wp.reshape(rows_padded, w4, heads, levels, 9).transpose(3, 4, 2, 0, 1)
    wp = jnp.pad(wp, ((0, 0), (0, 0), (0, 0), (0, 0), (0, w4l - w4)))

    heads_pb = max(1, 128 // head_dim) if head_dim < 128 else 1
    while heads % heads_pb:
        heads_pb -= 1
    cb = heads_pb * head_dim
    grid = (n_tiles, heads // heads_pb, levels)

    out = pl.pallas_call(
        functools.partial(
            _kernel, dils=dils, w4=w4, head_dim=head_dim, cb=cb,
            hpb=heads_pb,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_R, w4, cb), lambda r, hblk, lvl: (0, r, 0, hblk)
        ),
        out_shape=jax.ShapeDtypeStruct((1, rows_padded, w4, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, 3 * TILE_R, w4, cb), values.dtype),
            pltpu.VMEM((9, heads_pb, TILE_R, w4l), weights.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(vp, wp)
    return out[0, :h4].astype(values.dtype)


def local_tap_sum_reference(values, weights, dils):
    """Direct formulation (test oracle; matches the lax.map math)."""
    levels, h4, w4, c = values.shape
    heads = weights.shape[2]
    head_dim = c // heads
    acc = jnp.zeros((h4, w4, c), jnp.float32)
    for lvl in range(levels):
        dil = dils[lvl]
        vpad = jnp.pad(values[lvl], ((dil, dil), (dil, dil), (0, 0)))
        offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        for t, (dy, dx) in enumerate(offsets):
            sh = vpad[dil + dy * dil: dil + dy * dil + h4,
                      dil + dx * dil: dil + dx * dil + w4]
            wt = jnp.repeat(
                weights[:, :, :, lvl * 9 + t].astype(jnp.float32),
                head_dim, axis=2,
            )
            acc = acc + sh.astype(jnp.float32) * wt
    return acc.astype(values.dtype)
