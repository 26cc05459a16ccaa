"""LAPJV solver vs scipy oracle + reference cost-limit semantics."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from busca_tpu.ops import lap


def test_native_library_builds_and_loads():
    assert lap._load_native() is not None, "native lapjv failed to build"


def test_square_optimal_cost_matches_scipy(rng):
    for n in (1, 2, 5, 17, 64):
        cost = rng.uniform(0, 10, (n, n))
        total, x, y = lap.lapjv(cost, cost_limit=np.inf)
        rows, cols = linear_sum_assignment(cost)
        np.testing.assert_allclose(total, cost[rows, cols].sum(), rtol=1e-9)
        # x/y consistency
        for i in range(n):
            assert y[x[i]] == i


def test_rectangular_matches_scipy(rng):
    for n, m in [(3, 7), (7, 3), (1, 5), (10, 10)]:
        cost = rng.uniform(0, 10, (n, m))
        total, x, y = lap.lapjv(cost, extend_cost=True, cost_limit=np.inf)
        rows, cols = linear_sum_assignment(cost)
        np.testing.assert_allclose(total, cost[rows, cols].sum(), rtol=1e-9)


def test_cost_limit_rejects_expensive_matches(rng):
    # Two cheap pairs, one expensive pair: with cost_limit between, the
    # expensive pair must stay unmatched.
    cost = np.array(
        [
            [0.1, 5.0, 5.0],
            [5.0, 0.2, 5.0],
            [5.0, 5.0, 2.0],
        ]
    )
    total, x, y = lap.lapjv(cost, extend_cost=True, cost_limit=1.0)
    assert x[0] == 0 and x[1] == 1 and x[2] == -1
    assert y[2] == -1
    np.testing.assert_allclose(total, 0.3, atol=1e-9)

    # raising the limit lets the third pair match
    _, x2, _ = lap.lapjv(cost, extend_cost=True, cost_limit=3.0)
    assert x2[2] == 2


def test_linear_assignment_bytrack_semantics(rng):
    cost = rng.uniform(0, 1, (6, 4))
    matches, u_rows, u_cols = lap.linear_assignment(cost, thresh=0.8)
    assert len(matches) + len(u_rows) == 6
    assert len(matches) + len(u_cols) == 4
    for i, j in matches:
        assert cost[i, j] <= 0.8 + 1e-9

    # empty matrix path
    m, ur, uc = lap.linear_assignment(np.zeros((0, 5)), thresh=0.5)
    assert m.shape == (0, 2) and len(ur) == 0 and len(uc) == 5


def test_solve_dense_with_forbidden_pairs(rng):
    cost = np.array(
        [
            [1.0, np.inf, 3.0],
            [np.inf, np.inf, np.inf],
            [2.0, 0.5, np.inf],
        ]
    )
    rows, cols = lap.solve_dense(cost)
    pairs = dict(zip(rows.tolist(), cols.tolist()))
    # row 1 is fully forbidden -> unmatched; rows 0, 2 pick finite minima
    assert 1 not in pairs
    assert pairs[0] in (0, 2) and pairs[2] in (0, 1)
    # optimal: (0,0)+(2,1) = 1.5
    got = cost[rows, cols].sum()
    np.testing.assert_allclose(got, 1.5)


def test_solve_dense_matches_scipy_on_random(rng):
    for n, m in [(5, 9), (9, 5), (8, 8)]:
        cost = rng.uniform(0, 4, (n, m))
        rows, cols = lap.solve_dense(cost)
        srows, scols = linear_sum_assignment(cost)
        np.testing.assert_allclose(
            cost[rows, cols].sum(), cost[srows, scols].sum(), rtol=1e-9
        )


def test_scipy_fallback_agrees_with_native(rng, monkeypatch):
    cost = rng.uniform(0, 5, (9, 6))
    t1, x1, y1 = lap.lapjv(cost, cost_limit=2.0)
    monkeypatch.setattr(lap, "_lib", None)
    monkeypatch.setattr(lap, "_lib_attempted", True)
    t2, x2, y2 = lap.lapjv(cost, cost_limit=2.0)
    np.testing.assert_allclose(t1, t2, rtol=1e-9)
