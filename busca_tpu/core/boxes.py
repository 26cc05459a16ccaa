"""Pure-functional bounding-box algebra and cost matrices.

Everything here is shape-polymorphic jax.numpy acting on ``[..., 4]`` arrays so
it composes with ``jit`` / ``vmap`` / ``shard_map`` and runs batched on the MXU
/ VPU.  Behavioral contract follows the reference tracker stack:

- box formats: ``tlwh`` (top-left x/y, width, height), ``tlbr``
  (min x, min y, max x, max y), ``xyah`` (center x/y, aspect = w/h, height)
  as used by the reference STrack (adapters/ByteTrack/yolox/tracker/
  byte_tracker.py:140-189).
- ``iou_matrix`` reproduces ``cython_bbox.bbox_overlaps`` (the +1 "pixel area"
  convention) used by the reference matching layer
  (adapters/ByteTrack/yolox/tracker/matching.py:53-70).
- ``center_distance`` reproduces ``busca/tracking.py:23-60`` (euclidean
  center-to-center distance, optional size weighting).
- ``fuse_score`` reproduces ``matching.py:173-186``.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Format conversions ([..., 4] -> [..., 4])
# ---------------------------------------------------------------------------

def tlwh_to_tlbr(tlwh: jnp.ndarray) -> jnp.ndarray:
    xy = tlwh[..., :2]
    wh = tlwh[..., 2:]
    return jnp.concatenate([xy, xy + wh], axis=-1)


def tlbr_to_tlwh(tlbr: jnp.ndarray) -> jnp.ndarray:
    xy = tlbr[..., :2]
    br = tlbr[..., 2:]
    return jnp.concatenate([xy, br - xy], axis=-1)


def tlwh_to_xyah(tlwh: jnp.ndarray) -> jnp.ndarray:
    """(top-left, w, h) -> (center x, center y, w/h, h)."""
    xy = tlwh[..., :2] + tlwh[..., 2:] / 2.0
    a = tlwh[..., 2:3] / tlwh[..., 3:4]
    h = tlwh[..., 3:4]
    return jnp.concatenate([xy, a, h], axis=-1)


def xyah_to_tlwh(xyah: jnp.ndarray) -> jnp.ndarray:
    h = xyah[..., 3:4]
    w = xyah[..., 2:3] * h
    xy = xyah[..., :2] - jnp.concatenate([w, h], axis=-1) / 2.0
    return jnp.concatenate([xy, w, h], axis=-1)


def centers(tlbr: jnp.ndarray) -> jnp.ndarray:
    """Box centers from tlbr boxes."""
    return (tlbr[..., :2] + tlbr[..., 2:]) / 2.0


# ---------------------------------------------------------------------------
# Pairwise cost matrices (batched, MXU/VPU friendly)
# ---------------------------------------------------------------------------

def iou_matrix(atlbr: jnp.ndarray, btlbr: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the legacy +1 pixel-area convention.

    Matches ``cython_bbox.bbox_overlaps`` (reference matching.py:53-70):
    ``area = (x2 - x1 + 1) * (y2 - y1 + 1)``, intersections likewise.

    Args:
      atlbr: ``[N, 4]`` boxes (tlbr).
      btlbr: ``[M, 4]`` boxes (tlbr).
    Returns:
      ``[N, M]`` IoU matrix (float32).
    """
    a = atlbr[:, None, :]  # [N, 1, 4]
    b = btlbr[None, :, :]  # [1, M, 4]
    iw = jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]) + 1.0
    ih = jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    inter = iw * ih
    area_a = (a[..., 2] - a[..., 0] + 1.0) * (a[..., 3] - a[..., 1] + 1.0)
    area_b = (b[..., 2] - b[..., 0] + 1.0) * (b[..., 3] - b[..., 1] + 1.0)
    union = area_a + area_b - inter
    # cython_bbox only guards against overlap==0 via the max(0) above; for
    # non-degenerate boxes union > 0.  Guard anyway so padded lanes stay finite.
    return jnp.where(union > 0.0, inter / union, 0.0)


def iou_matrix_std(atlbr: jnp.ndarray, btlbr: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the standard (no +1) area convention.

    Matches ``torchvision.ops.box_iou`` — used by the reference *detector*
    postprocess (``torchvision.ops.batched_nms`` in
    adapters/ByteTrack/yolox/utils/boxes.py), whereas the tracker matching
    layer uses the +1 ``cython_bbox`` convention (:func:`iou_matrix`).
    """
    a = atlbr[:, None, :]
    b = btlbr[None, :, :]
    iw = jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0])
    ih = jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1])
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def iou_distance(atlbr: jnp.ndarray, btlbr: jnp.ndarray) -> jnp.ndarray:
    """1 - IoU cost matrix (reference matching.py:73-91)."""
    return 1.0 - iou_matrix(atlbr, btlbr)


def center_distance(
    atlbr: jnp.ndarray, btlbr: jnp.ndarray, weight_size: bool = False
) -> jnp.ndarray:
    """Euclidean center-to-center distance matrix.

    Matches ``busca/tracking.py:23-60`` including the optional size weighting
    ``max(sa/sb, sb/sa)`` with ``s = sqrt(w * h)``.
    """
    ac = centers(atlbr)  # [N, 2]
    bc = centers(btlbr)  # [M, 2]
    diff = ac[:, None, :] - bc[None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    if weight_size:
        a_sz = jnp.sqrt(
            (atlbr[:, 2] - atlbr[:, 0]) * (atlbr[:, 3] - atlbr[:, 1])
        )
        b_sz = jnp.sqrt(
            (btlbr[:, 2] - btlbr[:, 0]) * (btlbr[:, 3] - btlbr[:, 1])
        )
        ratio = a_sz[:, None] / b_sz[None, :]
        weights = jnp.maximum(ratio, 1.0 / ratio)
        dist = dist * weights
    return dist


def fuse_score(cost_matrix: jnp.ndarray, det_scores: jnp.ndarray) -> jnp.ndarray:
    """Fuse detection confidences into an IoU cost matrix.

    ``fuse_cost = 1 - (1 - cost) * score`` (reference matching.py:173-186).

    Args:
      cost_matrix: ``[N, M]`` IoU distance.
      det_scores: ``[M]`` detection scores.
    """
    iou_sim = 1.0 - cost_matrix
    fuse_sim = iou_sim * det_scores[None, :]
    return 1.0 - fuse_sim
