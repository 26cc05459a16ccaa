"""Tests for the closed-form 3-D positional encodings.

The numpy oracle below re-implements the published PositionalEncoding3D
formula (tatp22/multidim-positional-encoding: per-axis interleaved sin/cos
over geometric frequencies, channel groups [x|y|z] truncated to d_model) and
the reference's bucketing semantics (clamp, x15, trunc-toward-zero, shift),
written independently of the source module.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from busca_tpu.models import encodings


# ------------------------- oracle: PositionalEncoding3D --------------------

def _oracle_pe3d(xy, size, t, d_model):
    """Table-free oracle of PositionalEncoding3D evaluated at integer coords."""
    ch = int(np.ceil(d_model / 6) * 2)
    if ch % 2:
        ch += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float64) / ch))

    def axis(p):
        ang = np.asarray(p, dtype=np.float64)[..., None] * inv_freq
        # get_emb: stack (sin, cos) on a new last axis then flatten -> interleave
        return np.stack([np.sin(ang), np.cos(ang)], axis=-1).reshape(
            *ang.shape[:-1], ch
        )

    full = np.concatenate([axis(xy), axis(size), axis(t)], axis=-1)
    return full[..., :d_model]


def test_sinusoid_matches_oracle(rng):
    idx = rng.randint(0, 211, size=(4, 7, 3))
    xy, size = idx[..., 0], idx[..., 1]
    t = rng.randint(0, 61, size=(4, 7))
    for d_model in (512, 256, 96):
        got = np.asarray(
            encodings.sinusoid_3d(
                jnp.asarray(xy), jnp.asarray(size), jnp.asarray(t), d_model,
                quantize_fp16=False,
            )
        )
        want = _oracle_pe3d(xy, size, t, d_model)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


def test_sinusoid_fp16_quantization_matches_table_cast(rng):
    xy = rng.randint(0, 211, size=(5,))
    size = rng.randint(0, 211, size=(5,))
    t = rng.randint(0, 61, size=(5,))
    got = np.asarray(
        encodings.sinusoid_3d(
            jnp.asarray(xy), jnp.asarray(size), jnp.asarray(t), 512,
            quantize_fp16=True,
        )
    )
    want = _oracle_pe3d(xy, size, t, 512).astype(np.float16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


# ------------------------- oracle: bucket indices ---------------------------

def _oracle_distance_values(bbox, ref):
    xmin, ymin, xmax, ymax = ref[..., 0], ref[..., 1], ref[..., 2], ref[..., 3]
    w_ref, h_ref = xmax - xmin + 1, ymax - ymin + 1
    cxr, cyr = 0.5 * (xmin + xmax), 0.5 * (ymin + ymax)
    xmin, ymin, xmax, ymax = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    w, h = xmax - xmin + 1, ymax - ymin + 1
    cx, cy = 0.5 * (xmin + xmax), 0.5 * (ymin + ymax)
    xy = np.log(np.sqrt(((cx - cxr) / w) ** 2 + ((cy - cyr) / h) ** 2) + 1e-3)
    size = np.log(w / w_ref + 1e-3) + np.log(h / h_ref + 1e-3)
    return xy, size


def _random_ltrb(rng, *shape):
    xy = rng.uniform(0, 800, size=shape + (2,))
    wh = rng.uniform(5, 300, size=shape + (2,))
    return np.concatenate([xy, xy + wh], axis=-1)


def test_spatial_indices_match_torch_semantics(rng):
    boxes = _random_ltrb(rng, 6, 9)
    ref = boxes[:, -1:, :]
    xy_idx, size_idx = encodings.spatial_indices(
        jnp.asarray(boxes), jnp.asarray(ref)
    )
    xy, size = _oracle_distance_values(boxes, ref)
    want_xy = np.trunc(np.clip(xy * 15.0, -105, 105)).astype(np.int64) + 105
    want_size = np.trunc(np.clip(size * 15.0, -105, 105)).astype(np.int64) + 105
    np.testing.assert_array_equal(np.asarray(xy_idx), want_xy)
    np.testing.assert_array_equal(np.asarray(size_idx), want_size)
    assert np.asarray(xy_idx).min() >= 0 and np.asarray(xy_idx).max() <= 210


def test_sentinel_bbox_buckets_are_finite_and_extreme():
    ref = jnp.asarray(_random_ltrb(np.random.RandomState(0), 1, 1))
    fake = jnp.asarray(
        encodings.missing_candidate_bbox("ltrb")[None, None, :]
    ).astype(jnp.float32)
    xy_idx, size_idx = encodings.spatial_indices(fake, ref)
    assert np.isfinite(np.asarray(xy_idx)).all()
    # BAD sentinel: size ratio astronomically large -> clamps to max bucket.
    assert int(size_idx[0, 0]) == 210
    assert 0 <= int(xy_idx[0, 0]) <= 210


def test_temporal_indices():
    mem_t, can_t = encodings.temporal_indices(mem_len=11, num_candidates=7)
    # mem: (-10..0)*2 + 30 = 10,12,..,30
    np.testing.assert_array_equal(mem_t, np.arange(10, 31, 2))
    # can: [1,2]*7 scaled by 2 + 30 -> [32,34] tiled
    np.testing.assert_array_equal(can_t, np.tile([32, 34], 7))
    # long memory clamps at -30
    mem_t2, _ = encodings.temporal_indices(mem_len=40, num_candidates=7)
    assert mem_t2[0] == 0 and mem_t2[-1] == 30


def test_insert_fake_bboxes_layout(rng):
    b, c = 3, 5
    can = jnp.asarray(_random_ltrb(rng, b, c))
    ref = jnp.asarray(_random_ltrb(rng, b, 1))
    out = np.asarray(
        encodings.insert_fake_bboxes(can, ref, "MEM-SEP-CAN-BAD", True)
    )
    assert out.shape == (b, 2 * (c + 2), 4)
    ref_np, can_np = np.asarray(ref), np.asarray(can)
    # [SEP=ref, CAN_i] pairs
    for i in range(c):
        np.testing.assert_array_equal(out[:, 2 * i], ref_np[:, 0])
        np.testing.assert_array_equal(out[:, 2 * i + 1], can_np[:, i])
    # NON group: [ref, ref]
    np.testing.assert_array_equal(out[:, 2 * c], ref_np[:, 0])
    np.testing.assert_array_equal(out[:, 2 * c + 1], ref_np[:, 0])
    # BAD group: distant fake sentinel (the ltwh-flavoured values, used as
    # ltrb — reference encodings.py:21)
    fake = encodings.missing_candidate_bbox("ltwh")
    np.testing.assert_allclose(out[:, 2 * c + 2], np.tile(fake, (b, 1)), rtol=1e-6)
    np.testing.assert_allclose(out[:, 2 * c + 3], np.tile(fake, (b, 1)), rtol=1e-6)

    # encode_sep_as_ref=False: SEP carries the candidate's own bbox
    out2 = np.asarray(
        encodings.insert_fake_bboxes(can, ref, "MEM-SEP-CAN-BAD", False)
    )
    for i in range(c):
        np.testing.assert_array_equal(out2[:, 2 * i], can_np[:, i])

    # MEM-CAN-SEP order flips each pair
    out3 = np.asarray(
        encodings.insert_fake_bboxes(can, ref, "MEM-CAN-SEP-BAD", True)
    )
    for i in range(c):
        np.testing.assert_array_equal(out3[:, 2 * i], can_np[:, i])
        np.testing.assert_array_equal(out3[:, 2 * i + 1], ref_np[:, 0])


@pytest.mark.slow
def test_positional_encodings_end_to_end(rng):
    b, l_mem, c, d = 4, 11, 5, 512
    mem = jnp.asarray(_random_ltrb(rng, b, l_mem))
    can = jnp.asarray(_random_ltrb(rng, b, c))
    mem_pe, can_pe = encodings.positional_encodings(
        mem, can, d, "MEM-SEP-CAN-BAD"
    )
    assert mem_pe.shape == (b, l_mem, d)
    assert can_pe.shape == (b, 2 * (c + 2), d)
    assert np.isfinite(np.asarray(mem_pe)).all()
    assert np.isfinite(np.asarray(can_pe)).all()

    # The last memory token is the reference box itself:
    # xy = log(1e-3)*15 -> bucket 2 ; size = log(1.001)*2*15 -> bucket 105 ;
    # t = 30.  Check against the oracle directly.
    want = _oracle_pe3d(np.array([2]), np.array([105]), np.array([30]), d)[0]
    got = np.asarray(mem_pe)[0, -1]
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
