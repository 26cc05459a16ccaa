"""JAX ECC vs ground-truth warps and the cv2 oracle."""

import numpy as np
import cv2
import jax.numpy as jnp

from busca_tpu.ops.ecc import ecc_euclidean, estimate_cmc, rgb_to_gray


def _textured(rng, h=120, w=160):
    img = rng.uniform(0, 255, (h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return cv2.GaussianBlur(img, (5, 5), 1.5)


def _apply_warp(img, warp):
    return cv2.warpAffine(
        img, warp, (img.shape[1], img.shape[0]),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
    )


def _invert_affine(m):
    """ECC recovers the inverse of the warp applied to create the image."""
    r = m[:, :2]
    t = m[:, 2]
    r_inv = np.linalg.inv(r)
    return np.concatenate([r_inv, (-r_inv @ t)[:, None]], axis=1)


def test_recovers_translation(rng):
    tpl = _textured(rng)
    true = np.array([[1, 0, 3.0], [0, 1, -2.0]], np.float32)
    img = _apply_warp(tpl, true)
    rho, warp = ecc_euclidean(jnp.asarray(tpl), jnp.asarray(img), 60)
    warp = np.asarray(warp)
    want = _invert_affine(true)
    assert float(rho) > 0.95
    np.testing.assert_allclose(warp[:, 2], want[:, 2], atol=0.2)
    np.testing.assert_allclose(warp[:, :2], want[:, :2], atol=0.02)


def test_recovers_small_rotation(rng):
    tpl = _textured(rng)
    theta = 0.02
    c, s = np.cos(theta), np.sin(theta)
    true = np.array([[c, -s, 2.0], [s, c, 1.0]], np.float32)
    img = _apply_warp(tpl, true)
    rho, warp = ecc_euclidean(jnp.asarray(tpl), jnp.asarray(img), 80)
    warp = np.asarray(warp)
    want = _invert_affine(true)
    assert float(rho) > 0.9
    got_theta = np.arctan2(warp[1, 0], warp[0, 0])
    want_theta = np.arctan2(want[1, 0], want[0, 0])
    np.testing.assert_allclose(got_theta, want_theta, atol=5e-3)
    np.testing.assert_allclose(warp[:, 2], want[:, 2], atol=0.5)


def test_matches_cv2_oracle(rng):
    tpl = _textured(rng)
    true = np.array([[1, 0, 2.5], [0, 1, 1.5]], np.float32)
    img = _apply_warp(tpl, true)

    crit = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 60, 1e-5)
    w0 = np.eye(2, 3, dtype=np.float32)
    _, cv_warp = cv2.findTransformECC(
        templateImage=tpl.astype(np.float32),
        inputImage=img.astype(np.float32),
        warpMatrix=w0,
        motionType=cv2.MOTION_EUCLIDEAN,
        criteria=crit,
    )
    _, jx_warp = ecc_euclidean(jnp.asarray(tpl), jnp.asarray(img), 60)
    np.testing.assert_allclose(np.asarray(jx_warp), cv_warp, atol=0.25)


def test_identity_on_identical_frames(rng):
    frame = rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
    rho, warp = estimate_cmc(frame, frame, num_iterations=20)
    assert rho > 0.99
    np.testing.assert_allclose(warp, np.eye(2, 3), atol=1e-2)


def test_gray_conversion_matches_cv2(rng):
    frame = rng.randint(0, 255, (40, 50, 3), dtype=np.uint8)
    got = np.asarray(rgb_to_gray(jnp.asarray(frame), bgr=True))
    want = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1.0)


def test_cmc_scale_matches_full_res(rng):
    """Downscaled ECC (--cmc-scale) recovers the same warp as full-res.

    Measured motivation in PARITY.md "ECC": half-res is 5.9x faster at
    0.015 px worst corner error on 800x1440 frames.  Here (smaller frames,
    looser texture) we assert the rescaled translation stays sub-pixel-close
    to the full-res solve and to the ground-truth warp.
    """
    from busca_tpu.trackers.cmc import ecc_align

    tpl = _textured(rng, h=240, w=320)
    true = np.array([[1, 0, 4.0], [0, 1, -3.0]], np.float32)
    img = _apply_warp(tpl, true)
    to_bgr = lambda g: np.stack([np.clip(g, 0, 255).astype(np.uint8)] * 3,
                                axis=-1)
    _, w_full = ecc_align(to_bgr(tpl), to_bgr(img), scale=1.0)
    _, w_half = ecc_align(to_bgr(tpl), to_bgr(img), scale=0.5)
    want = _invert_affine(true)
    # both solves near ground truth; half-res near full-res
    np.testing.assert_allclose(w_full[:, 2], want[:, 2], atol=0.2)
    np.testing.assert_allclose(w_half[:, 2], want[:, 2], atol=0.3)
    np.testing.assert_allclose(w_half[:, 2], w_full[:, 2], atol=0.25)
    np.testing.assert_allclose(w_half[:, :2], w_full[:, :2], atol=0.02)


def test_cmc_scale_rejects_out_of_range():
    import pytest

    from busca_tpu.trackers.cmc import ecc_align

    frame = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError):
        ecc_align(frame, frame, scale=0.0)
    with pytest.raises(ValueError):
        ecc_align(frame, frame, scale=1.5)


def test_cmc_scale_parse_time_validation():
    """--cmc-scale rejects out-of-range values at PARSE time (not minutes
    later inside the first CMC frame's ecc_align), and the jax backend
    refuses a scale it would silently ignore."""
    import argparse

    import pytest

    from busca_tpu.trackers.cmc import compensate_tracks, parse_scale

    assert parse_scale("0.5") == 0.5
    for bad in ("0", "-0.25", "1.5"):
        with pytest.raises(argparse.ArgumentTypeError):
            parse_scale(bad)

    frame = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="cv2 backend"):
        compensate_tracks([], frame, frame, backend="jax", scale=0.5)
