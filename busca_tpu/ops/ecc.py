"""ECC image alignment (camera-motion compensation) as a jitted XLA loop.

The reference calls OpenCV's ``findTransformECC`` on full-resolution
grayscale frame pairs every frame with 100 Gauss-Newton iterations
(byte_tracker.py:626-650) — a heavy host-side serial dependency in the
per-frame loop.  This is the TPU-native equivalent: the ECC maximization of
Evangelidis & Psarakis (2008) for Euclidean motion, expressed as a
``lax.fori_loop`` of warps (bilinear gathers), image gradients, and small
3x3 solves — one jit, zero host round-trips, and it overlaps with the rest
of the frame's device work.

``busca_tpu.trackers.cmc`` keeps the cv2 path as a fallback/oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def rgb_to_gray(frame: jnp.ndarray, bgr: bool = True) -> jnp.ndarray:
    """ITU-R BT.601 luma (what cv2.cvtColor uses), float32 [H, W]."""
    f = frame.astype(jnp.float32)
    if bgr:
        b, g, r = f[..., 0], f[..., 1], f[..., 2]
    else:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _warp_bilinear(img: jnp.ndarray, warp: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``img`` at W @ (x, y, 1) for every output pixel.

    Returns (warped [H, W], valid-mask [H, W]).
    """
    h, w = img.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    sx = warp[0, 0] * xs + warp[0, 1] * ys + warp[0, 2]
    sy = warp[1, 0] * xs + warp[1, 1] * ys + warp[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inside, v, 0.0), inside

    v00, m00 = tap(y0i, x0i)
    v01, m01 = tap(y0i, x0i + 1)
    v10, m10 = tap(y0i + 1, x0i)
    v11, m11 = tap(y0i + 1, x0i + 1)
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    valid = m00 & m01 & m10 & m11
    return out, valid


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def ecc_euclidean(
    template: jnp.ndarray,
    image: jnp.ndarray,
    num_iterations: int = 50,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate the Euclidean warp aligning ``image`` to ``template``.

    Args:
      template, image: ``[H, W]`` float32 grayscale.
    Returns:
      (correlation coefficient, warp ``[2, 3]``) such that sampling ``image``
      at ``warp @ (x, y, 1)`` matches the template — the same convention as
      cv2.findTransformECC.
    """
    template = template.astype(jnp.float32)
    image = image.astype(jnp.float32)

    # image gradients (central differences like cv2's Scharr-lite approach)
    gy_img, gx_img = jnp.gradient(image)

    def params_to_warp(p):
        theta, tx, ty = p[0], p[1], p[2]
        c, s = jnp.cos(theta), jnp.sin(theta)
        return jnp.array([[c, -s, tx], [s, c, ty]])

    h, w = template.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32).ravel()
    ys = ys.astype(jnp.float32).ravel()

    def body(_, carry):
        p, _rho = carry
        warp = params_to_warp(p)
        iw, valid = _warp_bilinear(image, warp)
        gxw, _ = _warp_bilinear(gx_img, warp)
        gyw, _ = _warp_bilinear(gy_img, warp)
        vm = valid.ravel().astype(jnp.float32)
        n_valid = jnp.maximum(vm.sum(), 1.0)

        iwf = iw.ravel()
        tf = template.ravel()
        gx = gxw.ravel()
        gy = gyw.ravel()

        # zero-mean over the valid region
        t0 = (tf - (tf * vm).sum() / n_valid) * vm
        i0 = (iwf - (iwf * vm).sum() / n_valid) * vm

        # Jacobian of the warp wrt (theta, tx, ty):
        # dsx/dθ = -sinθ x - cosθ y ; dsy/dθ = cosθ x - sinθ y
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        dsx_dt = -s * xs - c * ys
        dsy_dt = c * xs - s * ys
        g = jnp.stack(
            [
                (gx * dsx_dt + gy * dsy_dt) * vm,
                gx * vm,
                gy * vm,
            ],
            axis=1,
        )  # [N, 3]

        hmat = g.T @ g + 1e-6 * jnp.eye(3)
        g_i = g.T @ i0
        g_t = g.T @ t0
        hinv_gi = jnp.linalg.solve(hmat, g_i)

        norm_i2 = i0 @ i0
        tc = t0 @ i0
        num = norm_i2 - g_i @ hinv_gi
        den = tc - g_t @ hinv_gi
        lam = num / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)

        err = lam * t0 - i0
        dp = jnp.linalg.solve(hmat, g.T @ err)
        p_new = p + dp

        norm_t = jnp.sqrt(t0 @ t0) + 1e-12
        norm_i = jnp.sqrt(norm_i2) + 1e-12
        rho = tc / (norm_t * norm_i)
        return p_new, rho

    p0 = jnp.zeros(3)
    p_final, rho = jax.lax.fori_loop(
        0, num_iterations, body, (p0, jnp.asarray(0.0))
    )
    return rho, params_to_warp(p_final)


def estimate_cmc(
    prev_frame, cur_frame, num_iterations: int = 50, bgr: bool = True
):
    """Frame-to-frame CMC warp, device-side.  Matches the calling convention
    of trackers.cmc.ecc_align (returns (cc, 2x3 numpy warp))."""
    import numpy as np

    g1 = rgb_to_gray(jnp.asarray(prev_frame), bgr)
    g2 = rgb_to_gray(jnp.asarray(cur_frame), bgr)
    rho, warp = ecc_euclidean(g1, g2, num_iterations)
    return float(rho), np.asarray(warp, dtype=np.float32)
