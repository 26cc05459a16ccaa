"""Unit tests for core bbox algebra against independent numpy references."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.distance import cdist

from busca_tpu.core import boxes


def _random_tlbr(rng, n):
    xy = rng.uniform(0, 500, size=(n, 2))
    wh = rng.uniform(5, 200, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1)


def test_format_roundtrips(rng):
    tlwh = np.concatenate(
        [rng.uniform(0, 500, (32, 2)), rng.uniform(5, 100, (32, 2))], axis=1
    )
    tlbr = boxes.tlwh_to_tlbr(jnp.asarray(tlwh))
    back = boxes.tlbr_to_tlwh(tlbr)
    np.testing.assert_allclose(np.asarray(back), tlwh, rtol=1e-4, atol=1e-4)

    xyah = boxes.tlwh_to_xyah(jnp.asarray(tlwh))
    back2 = boxes.xyah_to_tlwh(xyah)
    np.testing.assert_allclose(np.asarray(back2), tlwh, rtol=1e-4, atol=1e-4)

    # xyah semantics: center, aspect = w/h, height
    xyah_np = np.asarray(xyah)
    np.testing.assert_allclose(
        xyah_np[:, 0], tlwh[:, 0] + tlwh[:, 2] / 2, rtol=1e-5
    )
    np.testing.assert_allclose(xyah_np[:, 2], tlwh[:, 2] / tlwh[:, 3], rtol=1e-5)


def _iou_plus_one(a, b):
    """Independent numpy reimplementation of cython_bbox.bbox_overlaps."""
    out = np.zeros((len(a), len(b)))
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            iw = min(bi[2], bj[2]) - max(bi[0], bj[0]) + 1
            ih = min(bi[3], bj[3]) - max(bi[1], bj[1]) + 1
            if iw > 0 and ih > 0:
                inter = iw * ih
                ua = (
                    (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
                    + (bj[2] - bj[0] + 1) * (bj[3] - bj[1] + 1)
                    - inter
                )
                out[i, j] = inter / ua
    return out


def test_iou_matrix_matches_cython_bbox_convention(rng):
    a = _random_tlbr(rng, 17)
    b = _random_tlbr(rng, 23)
    got = np.asarray(boxes.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = _iou_plus_one(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_center_distance_matches_reference(rng):
    a = _random_tlbr(rng, 9)
    b = _random_tlbr(rng, 13)
    got = np.asarray(boxes.center_distance(jnp.asarray(a), jnp.asarray(b)))
    ac = (a[:, :2] + a[:, 2:]) / 2
    bc = (b[:, :2] + b[:, 2:]) / 2
    want = cdist(ac, bc)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # size weighting: * max(sa/sb, sb/sa)
    got_w = np.asarray(
        boxes.center_distance(jnp.asarray(a), jnp.asarray(b), weight_size=True)
    )
    a_sz = np.sqrt((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))
    b_sz = np.sqrt((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))
    w = np.maximum(
        a_sz[:, None] / b_sz[None, :], b_sz[None, :] / a_sz[:, None]
    )
    np.testing.assert_allclose(got_w, want * w, rtol=1e-5)


def test_fuse_score(rng):
    cost = rng.uniform(0, 1, (5, 7))
    scores = rng.uniform(0, 1, 7)
    got = np.asarray(boxes.fuse_score(jnp.asarray(cost), jnp.asarray(scores)))
    want = 1 - (1 - cost) * scores[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)
