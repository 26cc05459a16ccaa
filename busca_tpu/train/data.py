"""Training episode generation for the multi-choice QA objective.

The reference trains BUSCA offline on MOTSynth (README.md:17, arXiv paper §4)
with no training code shipped in the repo; the ``dataset.neg_threshold`` knob
(config/*/*.yml) gates when the NON token is the correct answer.  This module
provides:

- ``synthetic_batch``: procedurally generated episodes (moving rectangles on
  noise frames) for smoke training, sharding dry-runs, and benchmarks;
- ``EpisodeSpec``: the batch layout contract shared with real-data loaders
  (a MOT-gt episode builder plugs in here later).

Label convention: ``label in [0, C)`` = the correct candidate slot;
``label == C`` = NON ("none of the above"); ``label == C+1`` = BAD
("corrupt memory", only when the flavour has a BAD token).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class EpisodeSpec:
    batch: int = 8
    seq_len: int = 11
    num_candidates: int = 5
    crop_hw: Tuple[int, int] = (384, 128)
    has_bad: bool = True
    neg_threshold: float = 0.5  # IoU below which no candidate is "correct"

    @property
    def num_choices(self) -> int:
        return self.num_candidates + (2 if self.has_bad else 1)


def synthetic_batch(rng: np.random.RandomState, spec: EpisodeSpec) -> Dict[str, np.ndarray]:
    """Generate one training batch of synthetic episodes.

    Each episode: a target with a distinctive mean color moving with constant
    velocity; memory crops show it at past positions; one candidate (at a
    random slot) shows it at the current position; the other candidates show
    distractors.  With probability ~0.2 the target disappears (label = NON);
    with probability ~0.1 the memory is scrambled (label = BAD, if present).
    """
    b, l, c = spec.batch, spec.seq_len, spec.num_candidates
    h, w = spec.crop_hw
    mem_crops = np.zeros((b, l, h, w, 3), np.float32)
    can_crops = np.zeros((b, c, h, w, 3), np.float32)
    mem_boxes = np.zeros((b, l, 4), np.float32)
    can_boxes = np.zeros((b, c, 4), np.float32)
    labels = np.zeros((b,), np.int32)

    for i in range(b):
        color = rng.uniform(40, 215, 3)
        vx, vy = rng.uniform(-4, 4, 2)
        x0, y0 = rng.uniform(100, 500), rng.uniform(100, 300)
        bw, bh = rng.uniform(30, 60), rng.uniform(60, 120)

        def crop_of(col, noise=12.0):
            return np.clip(
                col + rng.randn(h, w, 3) * noise, 0, 255
            ).astype(np.float32)

        for t in range(l):
            mem_crops[i, t] = crop_of(color)
            x = x0 + vx * (t - l + 1)
            y = y0 + vy * (t - l + 1)
            mem_boxes[i, t] = [x, y, x + bw, y + bh]

        u = rng.uniform()
        if spec.has_bad and u < 0.1:
            labels[i] = c + 1  # BAD: scramble the memory colors
            for t in range(l):
                mem_crops[i, t] = crop_of(rng.uniform(0, 255, 3))
            target_slot = -1
        elif u < 0.3:
            labels[i] = c  # NON: target vanished
            target_slot = -1
        else:
            target_slot = rng.randint(c)
            labels[i] = target_slot

        # detector dropouts mean the correct candidate can be several frames
        # ahead of the last memory entry — sample a random temporal gap so
        # the model learns to extrapolate the motion, not just 1-step moves
        gap = rng.randint(1, 7)
        for ci in range(c):
            if ci == target_slot:
                can_crops[i, ci] = crop_of(color)
                x = x0 + vx * gap
                y = y0 + vy * gap
                can_boxes[i, ci] = [x, y, x + bw, y + bh]
            else:
                can_crops[i, ci] = crop_of(rng.uniform(0, 255, 3))
                dx, dy = rng.uniform(-300, 300, 2)
                x, y = x0 + dx, y0 + dy
                can_boxes[i, ci] = [x, y, x + bw * rng.uniform(0.5, 2),
                                    y + bh * rng.uniform(0.5, 2)]

    # normalize crops the way the inference pipeline does (GHOST BGR stats,
    # then RGB order) so train/test distributions match.
    from busca_tpu.models.busca import INPUT_PIXEL_MEAN_BGR, INPUT_PIXEL_STD_BGR

    for arr in (mem_crops, can_crops):
        arr /= 255.0
        arr -= INPUT_PIXEL_MEAN_BGR
        arr /= INPUT_PIXEL_STD_BGR
    mem_crops = mem_crops[..., ::-1].copy()
    can_crops = can_crops[..., ::-1].copy()

    return {
        "mem_crops": mem_crops,
        "can_crops": can_crops,
        "mem_boxes": mem_boxes,
        "can_boxes": can_boxes,
        "labels": labels,
    }
