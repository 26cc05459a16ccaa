"""Batched 8-state constant-velocity Kalman filter, as pure JAX linear algebra.

State is ``(x, y, a, h, vx, vy, va, vh)`` — bbox center, aspect ratio (w/h),
height, and their velocities.  All functions are *batched over tracks*
(leading ``N`` axis) and are pure jax.numpy so they jit/vmap/shard cleanly;
per-track loops and ``scipy.linalg`` calls of the reference
(adapters/TransCenter/tracking/mot_online/kalman_filter.py:22-269) become one
fused XLA computation.

Numerical contract (identical to the reference):
- ``initiate``: velocity 0, covariance diag from ``std_weight_*`` times h.
- ``predict``: F x, F P F^T + Q(h) with Q the reference's per-state diag.
- ``update``: Kalman gain via Cholesky solve of the projected covariance.
- ``gating_distance``: squared Mahalanobis (or Gaussian) distance of
  measurements to the projected state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

# 0.95 quantile of the chi-square distribution (gating thresholds), N dof.
CHI2INV95 = {
    1: 3.8415,
    2: 5.9915,
    3: 7.8147,
    4: 9.4877,
    5: 11.070,
    6: 12.592,
    7: 14.067,
    8: 15.507,
    9: 16.919,
}

_NDIM = 4
_DT = 1.0
STD_WEIGHT_POSITION = 1.0 / 20
STD_WEIGHT_VELOCITY = 1.0 / 160


def _motion_mat(dtype=jnp.float32) -> jnp.ndarray:
    f = jnp.eye(2 * _NDIM, dtype=dtype)
    return f.at[jnp.arange(_NDIM), jnp.arange(_NDIM) + _NDIM].set(_DT)


def _update_mat(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(_NDIM, 2 * _NDIM, dtype=dtype)


def initiate(measurement: jnp.ndarray):
    """Create track states from unassociated measurements.

    Args:
      measurement: ``[N, 4]`` xyah boxes.
    Returns:
      mean ``[N, 8]``, covariance ``[N, 8, 8]``.
    """
    measurement = jnp.asarray(measurement)
    if not jnp.issubdtype(measurement.dtype, jnp.floating):
        measurement = measurement.astype(jnp.float32)
    n = measurement.shape[0]
    mean = jnp.concatenate([measurement, jnp.zeros_like(measurement)], axis=-1)
    h = measurement[:, 3]
    std = jnp.stack(
        [
            2 * STD_WEIGHT_POSITION * h,
            2 * STD_WEIGHT_POSITION * h,
            jnp.full_like(h, 1e-2),
            2 * STD_WEIGHT_POSITION * h,
            10 * STD_WEIGHT_VELOCITY * h,
            10 * STD_WEIGHT_VELOCITY * h,
            jnp.full_like(h, 1e-5),
            10 * STD_WEIGHT_VELOCITY * h,
        ],
        axis=-1,
    )  # [N, 8]
    covariance = jnp.zeros((n, 8, 8), dtype=measurement.dtype)
    covariance = covariance.at[:, jnp.arange(8), jnp.arange(8)].set(std * std)
    return mean, covariance


def _motion_cov(h: jnp.ndarray) -> jnp.ndarray:
    """Process-noise diag Q(h), batched. h: [N]."""
    std = jnp.stack(
        [
            STD_WEIGHT_POSITION * h,
            STD_WEIGHT_POSITION * h,
            jnp.full_like(h, 1e-2),
            STD_WEIGHT_POSITION * h,
            STD_WEIGHT_VELOCITY * h,
            STD_WEIGHT_VELOCITY * h,
            jnp.full_like(h, 1e-5),
            STD_WEIGHT_VELOCITY * h,
        ],
        axis=-1,
    )
    n = h.shape[0]
    q = jnp.zeros((n, 8, 8), dtype=h.dtype)
    return q.at[:, jnp.arange(8), jnp.arange(8)].set(std * std)


def predict(mean: jnp.ndarray, covariance: jnp.ndarray):
    """Prediction step, batched.

    Args:
      mean: ``[N, 8]``; covariance: ``[N, 8, 8]``.
    """
    f = _motion_mat(mean.dtype)
    new_mean = mean @ f.T
    new_cov = jnp.einsum("ij,njk,lk->nil", f, covariance, f) + _motion_cov(
        mean[:, 3]
    )
    return new_mean, new_cov


def project(mean: jnp.ndarray, covariance: jnp.ndarray):
    """Project state distribution to measurement space, batched."""
    h = mean[:, 3]
    std = jnp.stack(
        [
            STD_WEIGHT_POSITION * h,
            STD_WEIGHT_POSITION * h,
            jnp.full_like(h, 1e-1),
            STD_WEIGHT_POSITION * h,
        ],
        axis=-1,
    )
    n = mean.shape[0]
    innovation_cov = jnp.zeros((n, 4, 4), dtype=mean.dtype)
    innovation_cov = innovation_cov.at[:, jnp.arange(4), jnp.arange(4)].set(
        std * std
    )
    u = _update_mat(mean.dtype)
    proj_mean = mean @ u.T
    proj_cov = jnp.einsum("ij,njk,lk->nil", u, covariance, u) + innovation_cov
    return proj_mean, proj_cov


def update(mean: jnp.ndarray, covariance: jnp.ndarray, measurement: jnp.ndarray):
    """Correction step, batched.

    Args:
      mean: ``[N, 8]``; covariance: ``[N, 8, 8]``; measurement: ``[N, 4]`` xyah.
    """
    proj_mean, proj_cov = project(mean, covariance)
    u = _update_mat(mean.dtype)
    # kalman_gain = P H^T S^{-1}; solve via Cholesky like the reference.
    chol = jnp.linalg.cholesky(proj_cov)  # [N, 4, 4]
    pht = jnp.einsum("nij,kj->nik", covariance, u)  # [N, 8, 4]
    # Solve S K^T = (P H^T)^T for K^T: two triangular solves per track.
    z = solve_triangular(chol, jnp.swapaxes(pht, 1, 2), lower=True)
    kt = solve_triangular(
        jnp.swapaxes(chol, 1, 2), z, lower=False
    )  # [N, 4, 8] = K^T
    gain = jnp.swapaxes(kt, 1, 2)  # [N, 8, 4]
    innovation = measurement - proj_mean  # [N, 4]
    new_mean = mean + jnp.einsum("nij,nj->ni", gain, innovation)
    new_cov = covariance - jnp.einsum("nij,njk,nlk->nil", gain, proj_cov, gain)
    return new_mean, new_cov


def gating_distance(
    mean: jnp.ndarray,
    covariance: jnp.ndarray,
    measurements: jnp.ndarray,
    only_position: bool = False,
    metric: str = "maha",
) -> jnp.ndarray:
    """Squared gating distance of M measurements to N track states.

    Args:
      mean: ``[N, 8]``; covariance: ``[N, 8, 8]``; measurements: ``[M, 4]`` xyah.
    Returns:
      ``[N, M]`` squared distances.
    """
    proj_mean, proj_cov = project(mean, covariance)
    if only_position:
        proj_mean = proj_mean[:, :2]
        proj_cov = proj_cov[:, :2, :2]
        measurements = measurements[:, :2]

    d = measurements[None, :, :] - proj_mean[:, None, :]  # [N, M, k]
    if metric == "gaussian":
        return jnp.sum(d * d, axis=-1)
    if metric == "maha":
        chol = jnp.linalg.cholesky(proj_cov)  # [N, k, k]
        z = solve_triangular(chol, jnp.swapaxes(d, 1, 2), lower=True)  # [N,k,M]
        return jnp.sum(z * z, axis=1)
    raise ValueError(f"invalid distance metric: {metric}")


# Jitted entry points for the host-side tracker loop.  Tracker code should pad
# track counts to buckets before calling these to avoid recompiles.
predict_jit = jax.jit(predict)
update_jit = jax.jit(update)
initiate_jit = jax.jit(initiate)
gating_distance_jit = jax.jit(
    gating_distance, static_argnames=("only_position", "metric")
)
