"""Drift guard: numpy host mirrors == jax device implementations."""

import numpy as np
import jax.numpy as jnp

from busca_tpu.core import boxes, kalman, hostmath


def _random_tlbr(rng, n):
    xy = rng.uniform(0, 500, size=(n, 2))
    wh = rng.uniform(5, 200, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


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


def test_geometry_mirrors_match(rng):
    a = _random_tlbr(rng, 11)
    b = _random_tlbr(rng, 7)
    np.testing.assert_allclose(
        hostmath.iou_matrix(a, b),
        np.asarray(boxes.iou_matrix(jnp.asarray(a), jnp.asarray(b))),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        hostmath.center_distance(a, b, weight_size=True),
        np.asarray(
            boxes.center_distance(jnp.asarray(a), jnp.asarray(b), True)
        ),
        rtol=1e-6,
    )
    scores = rng.uniform(0, 1, 7)
    cost = hostmath.iou_distance(a, b)
    np.testing.assert_allclose(
        hostmath.fuse_score(cost, scores),
        np.asarray(boxes.fuse_score(jnp.asarray(cost), jnp.asarray(scores))),
        rtol=1e-6,
    )
    tlwh = hostmath.tlbr_to_tlwh(a)
    np.testing.assert_allclose(
        hostmath.tlwh_to_xyah(tlwh),
        np.asarray(boxes.tlwh_to_xyah(jnp.asarray(tlwh))),
        rtol=1e-6,
    )


def test_kalman_mirror_matches(rng, x64):
    n = 9
    kf = hostmath.HostKalman()
    z0 = _random_xyah(rng, n)
    m_np, c_np = kf.initiate(z0)
    m_j, c_j = kalman.initiate(jnp.asarray(z0))
    np.testing.assert_allclose(m_np, np.asarray(m_j), rtol=1e-6)
    np.testing.assert_allclose(c_np, np.asarray(c_j), rtol=1e-6)

    for _ in range(3):
        z = _random_xyah(rng, n)
        m_np, c_np = kf.predict(m_np, c_np)
        m_j, c_j = kalman.predict(m_j, c_j)
        np.testing.assert_allclose(m_np, np.asarray(m_j), rtol=1e-5, atol=1e-7)
        m_np, c_np = kf.update(m_np, c_np, z)
        m_j, c_j = kalman.update(m_j, c_j, jnp.asarray(z))
        np.testing.assert_allclose(m_np, np.asarray(m_j), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(c_np, np.asarray(c_j), rtol=1e-4, atol=1e-6)

    zs = _random_xyah(rng, 5)
    np.testing.assert_allclose(
        kf.gating_distance(m_np, c_np, zs),
        np.asarray(kalman.gating_distance(m_j, c_j, jnp.asarray(zs))),
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        kf.gating_distance(m_np, c_np, zs, only_position=True),
        np.asarray(
            kalman.gating_distance(m_j, c_j, jnp.asarray(zs), True)
        ),
        rtol=1e-4,
        atol=1e-6,
    )
