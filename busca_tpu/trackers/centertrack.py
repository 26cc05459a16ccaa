"""CenterTrack adapter: the BYTE strategy behind CenterTrack's dict IO.

The reference replaces CenterTrack's native tracker wholesale with the
ByteTrack adapter behind a dict-converting shim
(adapters/CenterTrack/src/lib/utils/tracker.py:7-74): detector results arrive
as ``{'bbox': tlbr, 'score': s, 'class': c, ...}`` dicts, pedestrians
(class 1) are tracked, and outputs are returned as dicts with ``tracking_id``
/ ``ct`` (center) fields.  CenterTrack runs mot20-style association (no score
fusion, tracker.py:9) with ``new_thresh`` as the fresh-track threshold.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig


def dicts_to_arrays(results: List[dict]):
    """CenterTrack dict detections -> (boxes_tlbr, scores) for the
    pedestrian class — the reference shim's flattening
    (utils/tracker.py:40-50).  Shared by the adapter and the serving
    protocol wrapper so the two paths cannot diverge."""
    ped = [r for r in results if r.get("class", 1) == 1]
    if ped:
        boxes = np.vstack([r["bbox"] for r in ped]).astype(np.float64)
        scores = np.array([r["score"] for r in ped], dtype=np.float64)
    else:
        boxes = np.zeros((0, 4))
        scores = np.zeros(0)
    return boxes, scores


class CenterTrackAdapter:
    """Dict-in / dict-out tracker matching CenterTrack's interface."""

    def __init__(
        self,
        config: ByteTrackerConfig,
        assoc_engine=None,
        new_thresh: float = 0.4,
        frame_rate: int = 30,
    ):
        # CenterTrack forces mot20-style matching (tracker.py:9) and its own
        # fresh-track threshold (tracker.py:11).
        config.mot20 = True
        self.new_thresh = new_thresh
        self.frame_rate = frame_rate
        self.tracker = ByteTracker(config, assoc_engine, frame_rate)
        self.tracker.det_thresh = new_thresh
        self.tracks: List[dict] = []

    def reset(self):
        cfg = self.tracker.cfg
        self.tracker = ByteTracker(cfg, self.tracker.engine,
                                   self.frame_rate)
        self.tracker.det_thresh = self.new_thresh
        self.tracks = []

    def cmc_prefetch(self, cur_frame):
        """Forward the lockstep driver's ECC prefetch to the inner
        ByteTracker (which owns the recipe and the warp hint)."""
        return self.tracker.cmc_prefetch(cur_frame)

    def step(
        self,
        results: List[dict],
        frame: Optional[np.ndarray] = None,
        scale: float = 1.0,
    ) -> List[dict]:
        boxes, scores = dicts_to_arrays(results)
        online = self.tracker.update(boxes, scores, scale, frame)

        out = []
        for t in online:
            bbox = t.tlbr
            out.append(
                {
                    "score": t.score,
                    "bbox": bbox,
                    "ct": [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2],
                    "active": 1 if t.is_activated else 0,
                    "tracking_id": t.track_id,
                    "class": 1,
                }
            )
        self.tracks = out
        return out
