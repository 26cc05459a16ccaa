"""Static-shaped NMS and YOLOX-style detector postprocess in XLA.

Replaces ``torchvision.ops.batched_nms`` in the reference detector
postprocess (adapters/ByteTrack/yolox/utils/boxes.py): class-aware greedy
NMS expressed as a fixed-length ``lax.scan`` over score-sorted candidates, so
it compiles once and runs entirely on device — no dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from busca_tpu.core import boxes as boxlib


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes_tlbr: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy IoU NMS with static output size.

    Args:
      boxes_tlbr: ``[N, 4]``; scores: ``[N]`` (use -inf to mask invalid rows).
    Returns:
      (indices ``[max_outputs]`` into the input, valid ``[max_outputs]`` bool).
    """
    n = boxes_tlbr.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes_tlbr[order]
    sorted_valid = jnp.isfinite(scores[order]) & (scores[order] > -jnp.inf)

    # standard IoU (torchvision convention) — this op stands in for the
    # detector-side batched_nms, not the tracker matching layer (which keeps
    # the +1 cython_bbox convention in core.boxes.iou_matrix)
    iou = boxlib.iou_matrix_std(sorted_boxes, sorted_boxes)

    # Greedy NMS without the sequential scan: the greedy keep set is the
    # UNIQUE fixed point of  keep_j = valid_j ∧ ¬∃ i<j (keep_i ∧ iou_ij>τ)
    # (unique by induction over score order), and synchronous iteration
    # k ← F(k) reaches it in at most max-suppression-chain-depth steps —
    # a handful of [N]x[N,N] mat-vecs on the MXU instead of N dependent
    # scalar steps (~13 ms -> ~0.3 ms for N=512 on v5e).
    suppress = (
        (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
        & (iou > iou_threshold)
        & sorted_valid[:, None]
    ).astype(jnp.float32)

    def body(state):
        k, _ = state
        suppressed = (k.astype(jnp.float32) @ suppress) > 0.0
        k_new = sorted_valid & ~suppressed
        return k_new, jnp.any(k_new != k)

    keep_mask, _ = jax.lax.while_loop(
        lambda s: s[1], body, (sorted_valid, jnp.asarray(True))
    )

    # stable-sort kept rows (already in score order) to the front, then take
    # the first max_outputs — static shapes throughout
    priority = jnp.where(keep_mask, 0, 1)
    perm = jnp.argsort(priority, stable=True)
    kept_sorted = order[perm].astype(jnp.int32)
    num_kept = keep_mask.sum()
    if max_outputs <= n:
        out_idx = kept_sorted[:max_outputs]
    else:
        out_idx = jnp.concatenate(
            [kept_sorted, jnp.zeros(max_outputs - n, jnp.int32)]
        )
    valid = jnp.arange(max_outputs) < jnp.minimum(num_kept, max_outputs)
    out_idx = jnp.where(valid, out_idx, -1)
    return out_idx, valid


@functools.partial(
    jax.jit, static_argnames=("num_classes", "max_outputs", "pre_nms_topk")
)
def yolox_postprocess(
    prediction: jnp.ndarray,
    num_classes: int,
    conf_threshold: float = 0.7,
    nms_threshold: float = 0.45,
    max_outputs: int = 128,
    pre_nms_topk: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """YOLOX detector postprocess (conf filter + class-aware NMS).

    A detector emits ~24k candidate rows at (800, 1440); the greedy NMS's
    pairwise IoU matrix is quadratic, so the ``pre_nms_topk`` highest-scored
    rows are selected first (static shape, ``lax.top_k``) — equivalent to the
    reference for any frame with fewer than ``pre_nms_topk`` above-threshold
    candidates, which is every MOT frame by orders of magnitude.

    Args:
      prediction: ``[N, 5 + num_classes]`` rows of
        (cx, cy, w, h, obj_conf, class scores...).
    Returns:
      (detections ``[max_outputs, 7]`` = (x1, y1, x2, y2, obj_conf,
      class_conf, class), valid ``[max_outputs]``) — padded, static shape.
    """
    cxcywh = prediction[:, :4]
    half = cxcywh[:, 2:4] / 2.0
    tlbr = jnp.concatenate(
        [cxcywh[:, :2] - half, cxcywh[:, :2] + half], axis=1
    )
    obj = prediction[:, 4]
    cls_scores = prediction[:, 5 : 5 + num_classes]
    cls_conf = cls_scores.max(axis=1)
    cls_id = cls_scores.argmax(axis=1)

    keep = obj * cls_conf >= conf_threshold
    scores = jnp.where(keep, obj * cls_conf, -jnp.inf)

    if pre_nms_topk and prediction.shape[0] > pre_nms_topk:
        scores, top_idx = jax.lax.top_k(scores, pre_nms_topk)
        tlbr = tlbr[top_idx]
        obj = obj[top_idx]
        cls_conf = cls_conf[top_idx]
        cls_id = cls_id[top_idx]

    # class-aware NMS: offset boxes per class so classes never suppress each
    # other (the batched_nms trick).  Scale the offset by max_coordinate + 1
    # like torchvision — a fixed 1e6 would quantize coordinates to several
    # pixels at high class ids (float32 ulp at 8e7 is 8).
    max_coord = jnp.max(jnp.where(jnp.isfinite(tlbr), tlbr, 0.0))
    offset = cls_id.astype(jnp.float32)[:, None] * (max_coord + 1.0)
    idx, valid = nms(tlbr + offset, scores, nms_threshold, max_outputs)

    safe = jnp.clip(idx, 0, tlbr.shape[0] - 1)
    out = jnp.concatenate(
        [
            tlbr[safe],
            obj[safe, None],
            cls_conf[safe, None],
            cls_id[safe, None].astype(jnp.float32),
        ],
        axis=1,
    )
    out = jnp.where(valid[:, None], out, 0.0)
    return out, valid
