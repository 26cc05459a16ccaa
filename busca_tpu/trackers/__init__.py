from busca_tpu.trackers.base import Track, TrackState
from busca_tpu.trackers.byte import ByteTracker, ByteTrackerConfig
from busca_tpu.trackers.strongsort import StrongSortConfig, StrongSortTracker
from busca_tpu.trackers.ghost import GhostConfig, GhostTracker
from busca_tpu.trackers.centertrack import CenterTrackAdapter
from busca_tpu.trackers.transcenter import TransCenterByteTracker
from busca_tpu.trackers.sort import SortConfig, SortTracker
from busca_tpu.trackers.motdt import MotdtConfig, MotdtTracker

__all__ = [
    "MotdtConfig",
    "MotdtTracker",
    "SortConfig",
    "SortTracker",
    "Track",
    "TrackState",
    "ByteTracker",
    "ByteTrackerConfig",
    "StrongSortConfig",
    "StrongSortTracker",
    "GhostConfig",
    "GhostTracker",
    "CenterTrackAdapter",
    "TransCenterByteTracker",
]
