"""Serving: ahead-of-time export of the hot jitted callables.

TPU-native replacement for the reference's optional TensorRT deployment
path (adapters/ByteTrack/tools/track.py:83,215-224 — torch2trt engine
files; Dockerfile:88-95).  See :mod:`busca_tpu.serve.export`.
"""

from busca_tpu.serve.detector import (  # noqa: F401
    ArtifactBatchDetector,
    ArtifactDetector,
)
from busca_tpu.serve.lockstep import LockstepTrackingServer  # noqa: F401
from busca_tpu.serve.server import (  # noqa: F401
    TrackingClient,
    TrackingServer,
)
from busca_tpu.serve.export import (  # noqa: F401
    ExportedArtifact,
    export_associate_scorer,
    export_detector_batch_steps,
    export_detector_step,
    export_jitted,
    load_artifact,
    load_batch_artifacts,
)
