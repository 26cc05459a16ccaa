"""Pallas TPU kernel for the fused crop-resize(-pad) gather.

Same semantics as :func:`busca_tpu.ops.crop.crop_resize_normalize` (floor/ceil
cutout, clip, mean-pad, INTER_LINEAR), but structured for the TPU memory
hierarchy instead of XLA's generic gather:

- the frame lives **once** in VMEM as a ``[3, H, Wp]`` bf16 plane array
  (uint8; 1080p = 6.2 MB, inside the 16 MB budget);
- the grid iterates over boxes; per-box integer geometry and the pad value
  arrive via **scalar prefetch** (``PrefetchScalarGridSpec``) so the kernel
  can compute its dynamic row slices up front;
- the horizontal resample is expressed as a dense ``[Wp, OW]`` interpolation
  matrix (built from ``broadcasted_iota`` comparisons) so the per-row gather
  becomes an **MXU matmul** ``[6, Wp] @ [Wp, OW]`` — TPUs have no vector
  gather, but they have a systolic array;
- the vertical loop is a ``fori_loop`` over output rows with two dynamic-slice
  row reads (the only dynamic addressing, which Mosaic supports on the
  sublane axis); out-of-clip rows/taps blend to the pad value by weight
  bookkeeping rather than branches.

The public wrapper falls back to the XLA implementation when the frame
exceeds the VMEM budget.  Parity is pinned against the XLA op in
tests/test_crop_pallas.py and validated on hardware.

**Measured outcome (v5e, 64 boxes, 1080p)**: this kernel runs correctly at
~78 ms — the per-row one-hot selects and [3, Wp] x [Wp, OW] matmuls
underutilize the MXU (3 of 128 rows).  The question it was exploring is
now SETTLED in plain XLA: `busca_tpu.ops.crop._crop_matmul` batches ALL
rows and ALL boxes into two dense interpolation einsums (2.97 ms at N=64
vs 6.79 ms for the gather form; production default from N>=16).  This
kernel stays as the validated Pallas reference implementation; see
PARITY.md "Pallas / the crop kernel question".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_OUT_HW = (384, 128)
VMEM_FRAME_BUDGET_BYTES = 14 * 1024 * 1024


def _crop_kernel(iparams_ref, fparams_ref, frame_ref, out_ref, wx_ref,
                 *, out_hw: Tuple[int, int], frame_hw: Tuple[int, int]):
    oh, ow = out_hw
    h, wp = frame_hw
    i = pl.program_id(0)

    x1 = iparams_ref[i, 0]
    y1 = iparams_ref[i, 1]
    wc = iparams_ref[i, 2]
    hc = iparams_ref[i, 3]
    cx1 = iparams_ref[i, 4]
    cx2 = iparams_ref[i, 5]
    cy1 = iparams_ref[i, 6]
    cy2 = iparams_ref[i, 7]
    valid = iparams_ref[i, 8]
    pad_val = fparams_ref[i, 0]

    # ---- horizontal interpolation matrix wx [Wp, OW] (built once per box) --
    wcf = wc.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, ow), 1).astype(jnp.float32)
    sx = (col + 0.5) * (wcf / ow) - 0.5
    sx = jnp.clip(sx, 0.0, jnp.maximum(wcf - 1.0, 0.0))
    ax = x1.astype(jnp.float32) + sx  # absolute frame x, [1, OW]
    x0 = jnp.floor(ax)
    fx = ax - x0

    row_x = jax.lax.broadcasted_iota(jnp.int32, (wp, ow), 0).astype(jnp.float32)
    inside_x = (row_x >= cx1.astype(jnp.float32)) & (
        row_x < cx2.astype(jnp.float32)
    )
    w0 = jnp.where((row_x == x0) & inside_x, 1.0 - fx, 0.0)
    w1 = jnp.where((row_x == x0 + 1.0) & inside_x, fx, 0.0)
    wx_ref[:, :] = w0 + w1
    # weight mass lost to out-of-clip taps -> pad value
    pad_w = 1.0 - jnp.sum(wx_ref[:, :], axis=0, keepdims=True)  # [1, OW]

    hcf = hc.astype(jnp.float32)

    # Mosaic requires sublane-aligned dynamic slices: frame rows are read as
    # 32-row aligned windows with one-hot row selection, and output rows are
    # written in aligned groups of 8.
    WIN = 64
    GROUP = 8
    win_rows = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0)

    def group_body(g, _):
        rows_out = []
        for k in range(GROUP):
            r = g * GROUP + k
            sy = (r.astype(jnp.float32) + 0.5) * (hcf / oh) - 0.5
            sy = jnp.clip(sy, 0.0, jnp.maximum(hcf - 1.0, 0.0))
            ay = y1.astype(jnp.float32) + sy
            y0f = jnp.floor(ay)
            fy = ay - y0f
            y0 = y0f.astype(jnp.int32)

            # 32-aligned base (int8 sublane tile) with a 64-row window so
            # both y0 and y0+1 always land inside it
            base = jnp.clip((y0 // 32) * 32, 0, max(h - WIN, 0))
            base = pl.multiple_of(base, 32)
            # the frame arrives as int8 (bit-reinterpreted uint8, Mosaic has
            # no u8->f32 cast); undo the sign wrap after the f32 cast
            window = frame_ref[:, pl.ds(base, WIN), :].astype(jnp.float32)
            window = window + 256.0 * (window < 0)

            def sample_row(yy):
                sel = (win_rows[:, 0] == (yy - base)).astype(jnp.float32)
                row = (window * sel[None, :, None]).sum(axis=1)  # [3, Wp]
                vals = jnp.dot(row, wx_ref[:, :],
                               preferred_element_type=jnp.float32)  # [3, OW]
                vals = vals + pad_val * pad_w  # x-outside taps -> pad
                inside_y = (yy >= cy1) & (yy < cy2)
                return jnp.where(inside_y, vals, pad_val)

            v0 = sample_row(y0)
            v1 = sample_row(y0 + 1)
            out = v0 * (1.0 - fy) + v1 * fy
            out = jnp.where(valid > 0, out, 0.0)
            rows_out.append(out.reshape(3, 1, ow))
        block = jnp.concatenate(rows_out, axis=1)  # [3, GROUP, OW]
        start = pl.multiple_of(g * GROUP, GROUP)
        out_ref[:, pl.ds(start, GROUP), :] = block
        return _

    jax.lax.fori_loop(0, oh // GROUP, group_body, 0)


@functools.partial(jax.jit, static_argnames=("out_hw", "interpret"))
def _crop_pallas(frame_planes: jnp.ndarray, iparams: jnp.ndarray,
                 fparams: jnp.ndarray, out_hw: Tuple[int, int],
                 interpret: bool = False):
    n = iparams.shape[0]
    _, h, wp = frame_planes.shape
    oh, ow = out_hw
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            # constant index map: the frame is staged into VMEM once and
            # reused across all grid steps
            pl.BlockSpec(
                (3, h, wp), lambda i, *_: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, oh, ow), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((wp, ow), jnp.float32)],
    )

    def kern(ip_ref, fp_ref, frame_ref, out_ref, wx_ref):
        _crop_kernel(
            ip_ref, fp_ref, frame_ref, out_ref.at[0], wx_ref,
            out_hw=out_hw, frame_hw=(h, wp),
        )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 3, oh, ow), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(iparams, fparams, frame_planes)


def crop_resize_pallas(
    frame: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int] = DEFAULT_OUT_HW,
    quantize_uint8: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas-backed equivalent of ``crop.crop_resize_normalize`` with
    ``normalize=False, rgb_output=False`` (raw resized crops, HWC, input
    channel order).  Returns ``[N, out_h, out_w, 3]`` float32.

    Falls back to the XLA implementation when the frame exceeds the VMEM
    budget.
    """
    from busca_tpu.ops.crop import crop_resize_normalize, integral_image

    h, w = int(frame.shape[0]), int(frame.shape[1])
    wp = ((w + 127) // 128) * 128
    if 3 * h * wp > VMEM_FRAME_BUDGET_BYTES:
        return crop_resize_normalize(
            frame, boxes, out_hw, normalize=False,
            bgr_input=True, rgb_output=False, quantize_uint8=quantize_uint8,
        )

    boxes = jnp.asarray(boxes, jnp.float32)
    x1 = jnp.floor(boxes[:, 0]).astype(jnp.int32)
    y1 = jnp.floor(boxes[:, 1]).astype(jnp.int32)
    x2 = jnp.ceil(boxes[:, 2]).astype(jnp.int32)
    y2 = jnp.ceil(boxes[:, 3]).astype(jnp.int32)
    wc, hc = x2 - x1, y2 - y1
    cx1, cx2 = jnp.clip(x1, 0, w), jnp.clip(x2, 0, w)
    cy1, cy2 = jnp.clip(y1, 0, h), jnp.clip(y2, 0, h)

    ii = integral_image(frame)
    cnt = jnp.maximum(cy2 - cy1, 0) * jnp.maximum(cx2 - cx1, 0)
    total = ii[cy2, cx2] - ii[cy1, cx2] - ii[cy2, cx1] + ii[cy1, cx1]
    mean = jnp.where(cnt > 0, total / (cnt.astype(jnp.float32) * 3.0), 0.0)
    pad_val = jnp.trunc(mean) if quantize_uint8 else mean
    valid = ((wc > 0) & (hc > 0) & (cnt > 0)).astype(jnp.int32)

    iparams = jnp.stack(
        [x1, y1, wc, hc, cx1, cx2, cy1, cy2, valid], axis=1
    ).astype(jnp.int32)
    fparams = pad_val[:, None].astype(jnp.float32)

    planes = jnp.transpose(
        jax.lax.bitcast_convert_type(
            jnp.asarray(frame).astype(jnp.uint8), jnp.int8
        ),
        (2, 0, 1),
    )
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, wp - w)))

    out = _crop_pallas(planes, iparams, fparams, out_hw, interpret)  # [N,3,OH,OW]
    out = jnp.transpose(out, (0, 2, 3, 1))
    if quantize_uint8:
        out = jnp.clip(jnp.round(out), 0.0, 255.0)
    return out
