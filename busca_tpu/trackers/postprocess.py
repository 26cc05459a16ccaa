"""Offline trajectory post-processing: interpolation + GSI smoothing.

The reference's StrongSORT path optionally applies AFLink and GSI after
tracking (adapters/StrongSORT/strong_sort.py:29-46).

- ``linear_interpolation``: fill detection gaps (<= ``interval`` frames) in
  each trajectory by linear interpolation — the classic ByteTrack/StrongSORT
  post-step.
- ``gaussian_smoothed_interpolation`` (GSI, Du et al. 2023): after linear
  interpolation, smooth each coordinate with Gaussian-process regression
  (RBF kernel, length scale ``tau``), implemented here in closed form with
  numpy — no sklearn dependency.
- AFLink requires its own trained link-prediction model, which the reference
  repo does not ship either (it is downloaded from the StrongSORT release);
  ``aflink`` raises with a pointer until a weights path is provided.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _split_tracks(results: np.ndarray) -> Dict[int, np.ndarray]:
    """rows [frame, id, x, y, w, h, score, ...] -> {id: rows sorted by frame}"""
    out = {}
    for tid in np.unique(results[:, 1]).astype(int):
        rows = results[results[:, 1] == tid]
        out[tid] = rows[np.argsort(rows[:, 0])]
    return out


def linear_interpolation(results: np.ndarray, interval: int = 20) -> np.ndarray:
    """Fill per-track frame gaps up to ``interval`` with linear interpolation.

    Args:
      results: ``[N, >=7]`` MOT rows (frame, id, x, y, w, h, score, ...).
    """
    if len(results) == 0:
        return results
    results = np.asarray(results, dtype=np.float64)
    out = [results]
    for tid, rows in _split_tracks(results).items():
        frames = rows[:, 0].astype(int)
        for i in range(1, len(frames)):
            gap = frames[i] - frames[i - 1]
            if 1 < gap <= interval:
                for k in range(1, gap):
                    a = k / gap
                    row = rows[i - 1] * (1 - a) + rows[i] * a
                    row[0] = frames[i - 1] + k
                    row[1] = tid
                    out.append(row[None])
    merged = np.concatenate(out, axis=0)
    order = np.lexsort((merged[:, 1], merged[:, 0]))
    return merged[order]


def _gpr_smooth(t: np.ndarray, y: np.ndarray, tau: float) -> np.ndarray:
    """Closed-form RBF Gaussian-process regression, evaluated at the inputs.

    k(a, b) = exp(-(a-b)^2 / (2 tau^2)), observation noise 1e-2.
    """
    t = t.astype(np.float64)[:, None]
    d2 = (t - t.T) ** 2
    k = np.exp(-d2 / (2.0 * tau * tau))
    alpha = np.linalg.solve(k + 1e-2 * np.eye(len(t)), y)
    return k @ alpha


def gaussian_smoothed_interpolation(
    results: np.ndarray, interval: int = 20, tau: float = 10.0
) -> np.ndarray:
    """GSI: linear interpolation + per-coordinate GP smoothing per track."""
    results = linear_interpolation(results, interval)
    if len(results) == 0:
        return results
    out = []
    for tid, rows in _split_tracks(results).items():
        rows = rows.copy()
        if len(rows) >= 2:
            t = rows[:, 0]
            # adaptive length scale like the paper: tau scaled by track span
            tau_eff = min(tau, max(1.0, len(rows) / 10.0 * tau))
            for col in range(2, 6):
                rows[:, col] = _gpr_smooth(t, rows[:, col], tau_eff)
        out.append(rows)
    merged = np.concatenate(out, axis=0)
    order = np.lexsort((merged[:, 1], merged[:, 0]))
    return merged[order]


def aflink(*_args, **_kwargs):
    """Appearance-free link (AFLink) post-processing.

    Requires the trained AFLink model from the StrongSORT release, which the
    reference repo itself does not vendor.  Provide weights and implement the
    link scorer before use.
    """
    raise NotImplementedError(
        "AFLink needs its trained link model (not shipped with the reference "
        "either); use linear_interpolation / gaussian_smoothed_interpolation."
    )
