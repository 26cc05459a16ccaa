from busca_tpu.trackers.base import Track, TrackState

__all__ = ["Track", "TrackState"]
