"""busca_tpu — a TPU-native (JAX/XLA/Pallas) framework for BUSCA-class online
multi-object tracking.

BUSCA (ECCV 2024) is a plug-and-play module that attaches to any online
tracking-by-detection tracker and rescues tracks whose object the detector
missed, by posing a multi-choice question-answering problem to a small decision
Transformer that fuses ReID appearance features with 3-D spatiotemporal
positional encodings.

This package is a ground-up TPU-first rebuild with the same capabilities as the
reference implementation (see SURVEY.md):

- ``core``     — pure-functional bbox algebra and a batched 8-state Kalman filter
- ``ops``      — fused crop-resize-normalize kernels, LAPJV assignment, ECC CMC
- ``models``   — ReID ResNet-50, decision Transformer, 3-D positional encodings
- ``assoc``    — the association engine (``associate_embeddings`` equivalent)
- ``trackers`` — BYTE / StrongSORT / GHOST / CenterTrack / TransCenter strategies
- ``eval``     — MOTChallenge IO, CLEAR/IDF1/HOTA metrics, sequence runner
- ``train``    — multi-choice QA training loop with mesh sharding
- ``parallel`` — device-mesh and sharding helpers
- ``config``   — YAML + CLI config system (reference-config compatible)
"""

__version__ = "0.1.0"
