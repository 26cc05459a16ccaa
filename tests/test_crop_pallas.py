"""Pallas crop kernel vs the (cv2-validated) XLA implementation.

Runs in Pallas interpreter mode on the CPU test backend; the compiled TPU
path is exercised by the bench/drive on hardware.
"""

import numpy as np
import jax.numpy as jnp

from busca_tpu.ops.crop import crop_resize_normalize
from busca_tpu.ops.crop_pallas import crop_resize_pallas

OUT_HW = (64, 32)


def _frame(rng, h=120, w=160):
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _xla_reference(frame, boxes):
    return np.asarray(
        crop_resize_normalize(
            jnp.asarray(frame), jnp.asarray(boxes), OUT_HW,
            normalize=False, bgr_input=True, rgb_output=False,
        )
    )


def test_pallas_matches_xla_inside_boxes(rng):
    frame = _frame(rng)
    boxes = []
    for _ in range(6):
        x1 = rng.uniform(0, 120)
        y1 = rng.uniform(0, 90)
        boxes.append([x1, y1, x1 + rng.uniform(8, 40), y1 + rng.uniform(10, 30)])
    boxes = np.array(boxes, np.float32)
    got = np.asarray(
        crop_resize_pallas(
            jnp.asarray(frame), jnp.asarray(boxes), OUT_HW, interpret=True
        )
    )
    want = _xla_reference(frame, boxes)
    # bf16 frame storage costs ~1 LSB on 0..255 values
    np.testing.assert_allclose(got, want, atol=2.0)


def test_pallas_matches_xla_padded_and_degenerate(rng):
    frame = _frame(rng)
    boxes = np.array(
        [
            [-15.5, -8.2, 30.7, 40.3],     # clipped top-left (mean padding)
            [140.0, 100.0, 175.0, 135.0],  # clipped bottom-right
            [-50.0, -50.0, -10.0, -10.0],  # fully outside -> zeros
            [50.0, 50.0, 50.0, 50.0],      # degenerate -> zeros
        ],
        np.float32,
    )
    got = np.asarray(
        crop_resize_pallas(
            jnp.asarray(frame), jnp.asarray(boxes), OUT_HW, interpret=True
        )
    )
    want = _xla_reference(frame, boxes)
    np.testing.assert_allclose(got, want, atol=2.0)
    np.testing.assert_array_equal(got[2], 0.0)
    np.testing.assert_array_equal(got[3], 0.0)


def test_oversized_frame_falls_back_to_xla(rng, monkeypatch):
    import busca_tpu.ops.crop_pallas as cp

    monkeypatch.setattr(cp, "VMEM_FRAME_BUDGET_BYTES", 1)
    frame = _frame(rng)
    boxes = np.array([[10.0, 10, 60, 60]], np.float32)
    got = np.asarray(
        crop_resize_pallas(jnp.asarray(frame), jnp.asarray(boxes), OUT_HW)
    )
    want = _xla_reference(frame, boxes)
    np.testing.assert_allclose(got, want, atol=1e-5)
