"""Camera-motion compensation (ECC image alignment).

The reference aligns consecutive grayscale frames with OpenCV's
``findTransformECC`` (Euclidean motion, 100 iterations, eps 1e-5 — tracktor's
recipe, byte_tracker.py:626-650) and warps every unmatched track's position by
the recovered 2x3 matrix.

Host cv2 is used here (one small Gauss-Newton per frame); a Pallas/XLA ECC is
a planned optimization (the gradient correlations are plain convolutions).
Failures (non-converging ECC) fall back to identity, keeping tracks unwarped.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in the image
    cv2 = None


IDENTITY_2X3 = np.eye(2, 3, dtype=np.float32)


def ecc_align(
    prev_frame: np.ndarray,
    cur_frame: np.ndarray,
    number_of_iterations: int = 100,
    termination_eps: float = 1e-5,
    warp_mode: str = "MOTION_EUCLIDEAN",
):
    """Estimate the 2x3 warp aligning ``prev_frame`` to ``cur_frame``.

    Returns (correlation_coefficient, warp_matrix [2, 3]).
    """
    if cv2 is None:
        return 1.0, IDENTITY_2X3.copy()
    # frames may be device arrays (DetectorOutput.image); cv2 needs host
    prev_frame = np.asarray(prev_frame)
    cur_frame = np.asarray(cur_frame)
    modes = {
        "MOTION_EUCLIDEAN": cv2.MOTION_EUCLIDEAN,
        "MOTION_AFFINE": cv2.MOTION_AFFINE,
    }
    if warp_mode not in modes:
        raise ValueError(f"Invalid warp_mode: {warp_mode}")
    g1 = cv2.cvtColor(prev_frame, cv2.COLOR_BGR2GRAY)
    g2 = cv2.cvtColor(cur_frame, cv2.COLOR_BGR2GRAY)
    warp = np.eye(2, 3, dtype=np.float32)
    criteria = (
        cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
        number_of_iterations,
        termination_eps,
    )
    try:
        cc, warp = cv2.findTransformECC(
            templateImage=g1,
            inputImage=g2,
            warpMatrix=warp,
            motionType=modes[warp_mode],
            criteria=criteria,
        )
    except cv2.error:
        return 1.0, IDENTITY_2X3.copy()
    return float(cc), warp


def compensate_tracks(
    tracks: Sequence,
    prev_frame: Optional[np.ndarray],
    cur_frame: Optional[np.ndarray],
    backend: str = "cv2",
) -> float:
    """ECC-align frames and warp each track (byte_tracker.py:626-650).

    backend='jax' runs the alignment on device (busca_tpu.ops.ecc) —
    overlappable with the frame's other device work; 'cv2' is the host
    oracle path.
    """
    if prev_frame is None or cur_frame is None:
        return 1.0
    if backend == "jax":
        from busca_tpu.ops.ecc import estimate_cmc

        cc, warp = estimate_cmc(prev_frame, cur_frame)
    else:
        cc, warp = ecc_align(prev_frame, cur_frame)
    for t in tracks:
        t.apply_camera_motion(warp)
    return cc
