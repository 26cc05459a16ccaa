"""Crop-resize-normalize kernel vs the cv2/numpy oracle.

The oracle reproduces the reference pipeline exactly: floor/ceil cutout,
clip, pad-with-scalar-mean, cv2.resize INTER_LINEAR, uint8 round-trip,
GHOST normalize.  Tolerance of ~1 LSB covers cv2's fixed-point interpolation.
"""

import math

import cv2
import numpy as np
import jax.numpy as jnp

from busca_tpu.ops.crop import crop_resize_normalize

OUT_HW = (96, 32)  # smaller than (384,128) to keep the test fast; same math


def _oracle_crop(im, bbox, out_hw, normalize):
    """Reference-equivalent crop pipeline (cv2 + numpy)."""
    x1, y1, x2, y2 = bbox
    x1, y1 = int(math.floor(x1)), int(math.floor(y1))
    x2, y2 = int(math.ceil(x2)), int(math.ceil(y2))
    b = np.array([y1, y2, x1, x2])
    lim = np.array([im.shape[0], im.shape[0], im.shape[1], im.shape[1]])
    cb = np.clip(b, 0, lim)
    crop = im[cb[0]:cb[1], cb[2]:cb[3]]
    pad = np.abs(cb - b).astype(np.int32)
    if crop.size == 0:
        crop = np.zeros((max(y2 - y1, 1), max(x2 - x1, 1), 3), im.dtype)
    else:
        crop = np.pad(
            crop,
            [[pad[0], pad[1]], [pad[2], pad[3]], [0, 0]],
            mode="constant",
            constant_values=np.mean(crop),
        )
    if crop.shape[0] == 0 or crop.shape[1] == 0:
        crop = np.zeros((1, 1, 3), crop.dtype)
    out = cv2.resize(crop, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    if normalize:
        out = out.astype(np.float32) / 255.0
        out -= np.array([0.406, 0.456, 0.485])
        out /= np.array([0.225, 0.224, 0.299])
    return out.astype(np.float32)


def _frame(rng, h=240, w=320):
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_inside_boxes_match_cv2(rng):
    im = _frame(rng)
    boxes = []
    for _ in range(8):
        x1 = rng.uniform(0, 250)
        y1 = rng.uniform(0, 180)
        boxes.append([x1, y1, x1 + rng.uniform(8, 60), y1 + rng.uniform(10, 50)])
    boxes = np.array(boxes, dtype=np.float32)

    got = np.asarray(
        crop_resize_normalize(
            jnp.asarray(im), jnp.asarray(boxes), OUT_HW,
            normalize=False, rgb_output=False,
        )
    )
    for i, b in enumerate(boxes):
        want = _oracle_crop(im, b, OUT_HW, normalize=False)
        # cv2 uses fixed-point interpolation -> allow ~1.5 LSB
        np.testing.assert_allclose(got[i], want, atol=1.5)


def test_partially_outside_boxes_match_cv2(rng):
    im = _frame(rng)
    boxes = np.array(
        [
            [-20.5, -10.2, 50.7, 60.3],     # overflows top-left
            [280.1, 200.9, 340.0, 260.0],   # overflows bottom-right
            [-15.0, 100.0, 330.0, 140.0],   # overflows both sides in x
            [10.0, -30.0, 60.0, 20.0],      # overflows top
        ],
        dtype=np.float32,
    )
    got = np.asarray(
        crop_resize_normalize(
            jnp.asarray(im), jnp.asarray(boxes), OUT_HW,
            normalize=False, rgb_output=False,
        )
    )
    for i, b in enumerate(boxes):
        want = _oracle_crop(im, b, OUT_HW, normalize=False)
        np.testing.assert_allclose(got[i], want, atol=1.5)


def test_fully_outside_and_degenerate_boxes_are_zero(rng):
    im = _frame(rng)
    boxes = np.array(
        [
            [-100.0, -100.0, -50.0, -60.0],  # fully outside
            [400.0, 300.0, 500.0, 400.0],    # fully outside (far side)
            [50.0, 50.0, 50.0, 50.0],        # degenerate (zero size)
            [60.0, 60.0, 55.0, 70.0],        # inverted x
        ],
        dtype=np.float32,
    )
    got = np.asarray(
        crop_resize_normalize(
            jnp.asarray(im), jnp.asarray(boxes), OUT_HW,
            normalize=False, rgb_output=False,
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_normalization_and_rgb_flip(rng):
    im = _frame(rng)
    boxes = np.array([[30.0, 40.0, 90.0, 160.0]], dtype=np.float32)
    got = np.asarray(
        crop_resize_normalize(
            jnp.asarray(im), jnp.asarray(boxes), OUT_HW,
            normalize=True, bgr_input=True, rgb_output=True,
        )
    )[0]
    want_bgr = _oracle_crop(im, boxes[0], OUT_HW, normalize=True)
    want_rgb = want_bgr[..., ::-1]
    np.testing.assert_allclose(got, want_rgb, atol=0.03)  # 1.5 LSB / (255*std)


def test_batch_is_vectorized_consistently(rng):
    """Batched output equals per-box outputs (no cross-box leakage)."""
    im = _frame(rng)
    boxes = np.array(
        [[10, 10, 60, 120], [100, 40, 180, 200], [-5, -5, 40, 40]],
        dtype=np.float32,
    )
    full = np.asarray(
        crop_resize_normalize(jnp.asarray(im), jnp.asarray(boxes), OUT_HW)
    )
    for i in range(len(boxes)):
        single = np.asarray(
            crop_resize_normalize(
                jnp.asarray(im), jnp.asarray(boxes[i : i + 1]), OUT_HW
            )
        )[0]
        np.testing.assert_allclose(full[i], single, rtol=1e-5, atol=1e-6)


def test_matmul_method_equals_gather(rng):
    """The dense-interpolation-matmul path must reproduce the gather path
    exactly (same formulas, f32 accumulation; explicit zero terms)."""
    from busca_tpu.ops.crop import crop_resize_normalize

    frame = rng.randint(0, 256, (97, 130, 3)).astype(np.uint8)
    boxes = np.array([
        [10.3, 5.7, 60.9, 80.2],     # interior
        [-20.0, -10.0, 30.0, 40.0],  # clipped at top-left (mean pad)
        [100.0, 60.0, 160.0, 120.0], # clipped at bottom-right
        [50.0, 50.0, 50.0, 50.0],    # degenerate -> zero crop
        [500.0, 500.0, 600.0, 700.0],# fully outside -> zero crop
        [0.0, 0.0, 130.0, 97.0],     # full frame
    ], np.float32)
    for quant in (True, False):
        a = np.asarray(crop_resize_normalize(
            frame, boxes, out_hw=(48, 16), normalize=False,
            rgb_output=False, quantize_uint8=quant, method="gather",
        ))
        b = np.asarray(crop_resize_normalize(
            frame, boxes, out_hw=(48, 16), normalize=False,
            rgb_output=False, quantize_uint8=quant, method="matmul",
        ))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-3 if not quant else 0)
