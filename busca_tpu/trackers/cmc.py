"""Camera-motion compensation (ECC image alignment).

The reference aligns consecutive grayscale frames with OpenCV's
``findTransformECC`` (Euclidean motion, 100 iterations, eps 1e-5 — tracktor's
recipe, byte_tracker.py:626-650) and warps every unmatched track's position by
the recovered 2x3 matrix.

Two backends exist: host cv2 (``backend='cv2'``, the production default) and
an on-device Gauss-Newton (``backend='jax'``, busca_tpu.ops.ecc).  Measured
2026-08 on the v5e at 800x1440 (the ByteTrack eval frame size, synthetic
2-3 px shift): cv2 148 ms vs device ~10 s per pair — the device loop's
bilinear-warp gathers are VPU-bound and re-run all 100 iterations without
cv2's eps early exit, so there is no crossover at any realistic frame size.
cv2 stays the default everywhere (including --lockstep, where it overlaps
the next frame's device work on the host); ops/ecc.py remains as the
oracle-validated fallback for cv2-less builds.  Failures (non-converging
ECC) fall back to identity, keeping tracks unwarped.
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
    scale: float = 1.0,
    gauss_filt_size: int = 0,
):
    """Estimate the 2x3 warp aligning ``prev_frame`` to ``cur_frame``.

    ``scale`` < 1 runs the solve on INTER_AREA-downscaled grayscale images
    and rescales the recovered translation back to frame coordinates (the
    rotation block of a Euclidean/affine warp is scale-invariant).  Measured
    2026-08 at 800x1440 on realistic MOT17-scale motions (PARITY.md "ECC"):
    half-res is 5.9x faster with a worst warped-corner error of 0.015 px
    vs the full-res solve; quarter-res 21x at 0.062 px — both deeply
    sub-pixel.  Default 1.0 = the reference's exact full-res recipe
    (byte_tracker.py:626-650); opt in via ``--cmc-scale``.

    ``gauss_filt_size`` > 0 pre-smooths both images inside cv2 (the GHOST
    base tracker's tracktor recipe passes 15, base_tracker.py:618-620);
    0 = no smoothing, the ByteTrack recipe.

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
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"cmc scale must be in (0, 1], got {scale}")
    if scale != 1.0:
        g1 = cv2.resize(g1, None, fx=scale, fy=scale,
                        interpolation=cv2.INTER_AREA)
        g2 = cv2.resize(g2, None, fx=scale, fy=scale,
                        interpolation=cv2.INTER_AREA)
    warp = np.eye(2, 3, dtype=np.float32)
    criteria = (
        cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
        number_of_iterations,
        termination_eps,
    )
    try:
        if gauss_filt_size > 0:
            cc, warp = cv2.findTransformECC(
                g1, g2, warp, modes[warp_mode], criteria, None,
                gauss_filt_size,
            )
        else:
            cc, warp = cv2.findTransformECC(
                templateImage=g1,
                inputImage=g2,
                warpMatrix=warp,
                motionType=modes[warp_mode],
                criteria=criteria,
            )
    except cv2.error:
        return 1.0, IDENTITY_2X3.copy()
    if scale != 1.0:
        warp = warp.copy()
        warp[:, 2] /= scale  # rotation is scale-invariant; translation isn't
    return float(cc), warp


def parse_scale(value):
    """argparse ``type=`` validator for ``--cmc-scale``: float in (0, 1].

    Rejects out-of-range values at parse time instead of deep inside
    :func:`ecc_align` on the first CMC frame (after model load/compile).
    """
    import argparse

    s = float(value)
    if not 0.0 < s <= 1.0:
        raise argparse.ArgumentTypeError(
            f"cmc scale must be in (0, 1], got {s}"
        )
    return s


def apply_warp(tracks: Sequence, warp: np.ndarray):
    """Warp every track's position by a precomputed 2x3 matrix."""
    for t in tracks:
        t.apply_camera_motion(warp)


_EXECUTOR = None


def submit_warp(prev_frame, cur_frame, scale: float = 1.0, **ecc_kwargs):
    """Schedule ``ecc_align(prev, cur, **ecc_kwargs)`` on the shared CMC
    thread pool.

    ECC is the single dominant host cost of the MOT17 configs (~148 ms/pair
    cv2 at 800x1440, and the reference pays it serially inside every
    third-round frame, byte_tracker.py:377).  cv2 releases the GIL during
    the native solve, so in lockstep mode B sequences' alignments run
    concurrently on the host cores while the device batch proceeds — the
    drivers call each tracker's ``cmc_prefetch``, which submits here with
    the tracker's own recipe (frame order, iterations, smoothing) so the
    prefetched warp is identical to the inline path.  Returns a
    ``concurrent.futures.Future`` yielding ``(cc, warp_matrix)``.
    """
    global _EXECUTOR
    if _EXECUTOR is None:
        import concurrent.futures
        import os

        _EXECUTOR = concurrent.futures.ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 1),
            thread_name_prefix="cmc-ecc",
        )
    return _EXECUTOR.submit(
        ecc_align, prev_frame, cur_frame, scale=scale, **ecc_kwargs
    )


def compensate_tracks(
    tracks: Sequence,
    prev_frame: Optional[np.ndarray],
    cur_frame: Optional[np.ndarray],
    backend: str = "cv2",
    scale: float = 1.0,
) -> float:
    """ECC-align frames and warp each track (byte_tracker.py:626-650).

    backend='jax' runs the alignment on device (busca_tpu.ops.ecc) —
    overlappable with the frame's other device work; 'cv2' is the host
    oracle path.
    """
    if prev_frame is None or cur_frame is None:
        return 1.0
    if backend == "jax":
        if scale != 1.0:
            raise ValueError(
                "cmc scale (downscaled ECC) is only implemented for the "
                "cv2 backend; backend='jax' solves at full resolution"
            )
        from busca_tpu.ops.ecc import estimate_cmc

        cc, warp = estimate_cmc(prev_frame, cur_frame)
    else:
        cc, warp = ecc_align(prev_frame, cur_frame, scale=scale)
    for t in tracks:
        t.apply_camera_motion(warp)
    return cc
