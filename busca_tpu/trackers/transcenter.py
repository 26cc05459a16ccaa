"""TransCenter adapter: BYTE strategy + track-position feedback for the
query-based detector.

TransCenter's deformable-DETR detector is *stateful*: the tracker's current
boxes are fed back as center priors (``pre_cts``) for the next frame's
queries (adapters/TransCenter/tracking/byte_tracker.py:658-692,
models/transcenter.py:104-127, mot_evaluator.py:158).  This adapter adds that
feedback hook on top of the BYTE strategy.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from busca_tpu.trackers.base import joint_tracks
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig


class TransCenterByteTracker(ByteTracker):
    """ByteTracker with the detector-feedback position export."""

    def get_detector_positions(
        self,
        use_detector_coordinates: bool = True,
        omit_unconfirmed: bool = False,
        omit_lost: bool = False,
    ) -> Optional[np.ndarray]:
        """Current track boxes (tlbr) for the detector's query priors.

        Mirrors ``get_transcenterdetr_pos`` (byte_tracker.py:658-692):
        tracked (+ optionally lost) tracks, scaled back to detector
        coordinates.  Returns None when there are no tracks, which the
        detector interprets as "no priors".
        """
        tracked = self.tracked
        if omit_unconfirmed:
            tracked = [t for t in tracked if t.is_activated]
        pool = tracked if omit_lost else joint_tracks(tracked, self.lost)
        if not pool:
            return None
        out = []
        for t in pool:
            pos = t.tlbr
            if use_detector_coordinates:
                pos = pos * t.scale
            out.append(pos)
        return np.asarray(out, dtype=np.float32)


def boxes_to_center_priors(
    boxes_tlbr: Optional[np.ndarray], down_ratio: int = 4
) -> Optional[np.ndarray]:
    """Convert feedback boxes to feature-map center priors (``pre_cts``), the
    detector-side transform (models/transcenter.py:104-127)."""
    if boxes_tlbr is None or len(boxes_tlbr) == 0:
        return None
    centers = (boxes_tlbr[:, :2] + boxes_tlbr[:, 2:]) / 2.0
    return centers / down_ratio
