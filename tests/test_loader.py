"""Prefetching frame loader: order, completeness, backpressure, reuse."""

import os

import numpy as np
import pytest

from busca_tpu.eval.loader import FramePrefetcher, sequence_frames


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("frames")
    paths = []
    for i in range(12):
        img = np.full((16, 24, 3), i * 10, np.uint8)
        p = str(d / f"{i:06d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 100])
        paths.append(p)
    return paths


def test_order_and_completeness(image_dir):
    frames = list(FramePrefetcher(image_dir, prefetch=3, num_workers=2))
    assert len(frames) == 12
    for i, f in enumerate(frames):
        assert f is not None and f.shape == (16, 24, 3)
        # JPEG is lossy but constant images round-trip closely
        assert abs(int(f.mean()) - i * 10) <= 2


def test_single_worker_and_reuse(image_dir):
    loader = FramePrefetcher(image_dir[:5], prefetch=1, num_workers=1)
    assert len(list(loader)) == 5
    assert len(list(loader)) == 5  # iterable again


def test_empty():
    assert list(FramePrefetcher([])) == []


def test_sequence_frames_adapter(image_dir, tmp_path):
    class FakeInfo:
        seq_length = 4

        def frame_path(self, f):
            return image_dir[f - 1]

    frames = list(sequence_frames(FakeInfo(), prefetch=2))
    assert len(frames) == 4
