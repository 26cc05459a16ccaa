"""Batched JAX Kalman filter vs an independent per-track numpy/scipy oracle.

The oracle below implements the textbook constant-velocity filter with the
reference's noise schedule, written independently (per-track, scipy solves) so
agreement demonstrates the batched XLA formulation is numerically equivalent.
"""

import numpy as np
import scipy.linalg
import jax.numpy as jnp

from busca_tpu.core import kalman


class _NumpyOracle:
    def __init__(self):
        self.F = np.eye(8)
        self.F[np.arange(4), np.arange(4) + 4] = 1.0
        self.H = np.eye(4, 8)
        self.wp = 1.0 / 20
        self.wv = 1.0 / 160

    def initiate(self, m):
        mean = np.r_[m, np.zeros(4)]
        std = [
            2 * self.wp * m[3], 2 * self.wp * m[3], 1e-2, 2 * self.wp * m[3],
            10 * self.wv * m[3], 10 * self.wv * m[3], 1e-5, 10 * self.wv * m[3],
        ]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        h = mean[3]
        std = [
            self.wp * h, self.wp * h, 1e-2, self.wp * h,
            self.wv * h, self.wv * h, 1e-5, self.wv * h,
        ]
        q = np.diag(np.square(std))
        return self.F @ mean, self.F @ cov @ self.F.T + q

    def project(self, mean, cov):
        h = mean[3]
        std = [self.wp * h, self.wp * h, 1e-1, self.wp * h]
        r = np.diag(np.square(std))
        return self.H @ mean, self.H @ cov @ self.H.T + r

    def update(self, mean, cov, z):
        pm, pc = self.project(mean, cov)
        k = cov @ self.H.T @ np.linalg.inv(pc)
        innov = z - pm
        return mean + k @ innov, cov - k @ pc @ k.T

    def gating(self, mean, cov, zs, only_position=False):
        pm, pc = self.project(mean, cov)
        if only_position:
            pm, pc, zs = pm[:2], pc[:2, :2], zs[:, :2]
        d = zs - pm
        L = np.linalg.cholesky(pc)
        y = scipy.linalg.solve_triangular(L, d.T, lower=True)
        return np.sum(y * y, axis=0)


def _random_xyah(rng, n):
    return np.stack(
        [
            rng.uniform(100, 900, n),
            rng.uniform(100, 500, n),
            rng.uniform(0.3, 0.8, n),
            rng.uniform(40, 300, n),
        ],
        axis=1,
    )


def test_initiate_predict_update_gating_match_oracle(rng, x64):
    n = 12
    z0 = _random_xyah(rng, n)
    oracle = _NumpyOracle()

    mean, cov = kalman.initiate(jnp.asarray(z0))
    mean, cov = np.asarray(mean, dtype=np.float64), np.asarray(cov, dtype=np.float64)
    for i in range(n):
        m_ref, c_ref = oracle.initiate(z0[i])
        np.testing.assert_allclose(mean[i], m_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cov[i], c_ref, rtol=1e-5, atol=1e-6)

    # A few predict/update cycles with random measurements.
    means_ref = [oracle.initiate(z0[i]) for i in range(n)]
    mean_j, cov_j = kalman.initiate(jnp.asarray(z0))
    for step in range(3):
        z = _random_xyah(rng, n)
        mean_j, cov_j = kalman.predict(mean_j, cov_j)
        mean_j, cov_j = kalman.update(mean_j, cov_j, jnp.asarray(z))
        for i in range(n):
            m, c = means_ref[i]
            m, c = oracle.predict(m, c)
            m, c = oracle.update(m, c, z[i])
            means_ref[i] = (m, c)
            np.testing.assert_allclose(
                np.asarray(mean_j)[i], m, rtol=1e-3, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(cov_j)[i], c, rtol=1e-3, atol=1e-4
            )

    # Gating distances.
    zs = _random_xyah(rng, 9)
    got = np.asarray(
        kalman.gating_distance(mean_j, cov_j, jnp.asarray(zs))
    )
    for i in range(n):
        m, c = means_ref[i]
        want = oracle.gating(m, c, zs)
        np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-4)

    got_pos = np.asarray(
        kalman.gating_distance(
            mean_j, cov_j, jnp.asarray(zs), only_position=True
        )
    )
    for i in range(n):
        m, c = means_ref[i]
        want = oracle.gating(m, c, zs, only_position=True)
        np.testing.assert_allclose(got_pos[i], want, rtol=1e-3, atol=1e-4)


def test_predict_zeroes_nothing_and_is_stable(rng):
    z0 = _random_xyah(rng, 4)
    mean, cov = kalman.initiate(jnp.asarray(z0))
    for _ in range(50):
        mean, cov = kalman.predict(mean, cov)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(cov)))
    # Constant-velocity with zero initial velocity: position unchanged.
    np.testing.assert_allclose(np.asarray(mean)[:, :4], z0, rtol=1e-4)
