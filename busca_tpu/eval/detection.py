"""Detection AP evaluation (the reference's COCOeval role, from scratch).

The reference computes detection AP through the compiled ``COCOeval_opt``
extension (mot_evaluator.py:659-711).  This module implements the COCO-style
101-point interpolated AP natively (numpy; evaluation is offline):

- per-image greedy matching of score-sorted detections to ground truth at an
  IoU threshold (each gt matched at most once — the COCO protocol);
- precision-recall curve over the full dataset, monotone-decreasing
  interpolation, 101 recall points;
- AP@[.5:.95] as the mean over the 10 standard thresholds.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_tlbr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    iw = np.maximum(
        np.minimum(a[:, None, 2], b[None, :, 2])
        - np.maximum(a[:, None, 0], b[None, :, 0]),
        0,
    )
    ih = np.maximum(
        np.minimum(a[:, None, 3], b[None, :, 3])
        - np.maximum(a[:, None, 1], b[None, :, 1]),
        0,
    )
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0)


def average_precision(
    detections: Dict[int, Tuple[np.ndarray, np.ndarray]],
    ground_truth: Dict[int, np.ndarray],
    iou_threshold: float = 0.5,
) -> float:
    """COCO-style AP at one IoU threshold.

    Args:
      detections: {image_id: (tlbr [N, 4], scores [N])}.
      ground_truth: {image_id: tlbr [M, 4]}.
    """
    # flatten detections with image ids, sort globally by score
    rows = []
    for img, (boxes, scores) in detections.items():
        for b, s in zip(boxes, scores):
            rows.append((float(s), img, b))
    rows.sort(key=lambda r: -r[0])
    total_gt = sum(len(g) for g in ground_truth.values())
    if total_gt == 0:
        return 0.0 if rows else 1.0

    matched: Dict[int, set] = {img: set() for img in ground_truth}
    tp = np.zeros(len(rows))
    fp = np.zeros(len(rows))
    for i, (_s, img, box) in enumerate(rows):
        gt = ground_truth.get(img, np.zeros((0, 4)))
        if len(gt) == 0:
            fp[i] = 1
            continue
        ious = _iou_tlbr(box[None], gt)[0]
        order = np.argsort(-ious)
        hit = -1
        for j in order:
            if ious[j] < iou_threshold:
                break
            if j not in matched[img]:
                hit = j
                break
        if hit >= 0:
            matched[img].add(hit)
            tp[i] = 1
        else:
            fp[i] = 1

    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(fp)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    # monotone-decreasing precision envelope
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    # 101-point interpolation
    ap = 0.0
    for r in RECALL_POINTS:
        idx = np.searchsorted(recall, r, side="left")
        ap += precision[idx] if idx < len(precision) else 0.0
    return ap / len(RECALL_POINTS)


def coco_map(
    detections: Dict[int, Tuple[np.ndarray, np.ndarray]],
    ground_truth: Dict[int, np.ndarray],
) -> Dict[str, float]:
    """AP@[.5:.95], AP@.5, AP@.75 over the dataset."""
    aps = [
        average_precision(detections, ground_truth, t) for t in IOU_THRESHOLDS
    ]
    return {
        "ap": float(np.mean(aps)),
        "ap50": float(aps[0]),
        "ap75": float(aps[5]),
    }
