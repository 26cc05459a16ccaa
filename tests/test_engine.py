"""Association engine semantics: memory sampling, sentinels, Kalman slot,
bucketing invariance, one-hot post-processing."""

import pytest
import numpy as np
import jax

from busca_tpu.assoc.engine import AssociationEngine, _get_track_mem
from busca_tpu.models.busca import BuscaConfig, BuscaModel
from busca_tpu.trackers.base import Track

H, W = 96, 32
SEQ_LEN, NUM_CAN = 5, 3


def _track(rng, n_mem, scale=1.0, base_xy=(50, 60)):
    t = Track(
        np.array([base_xy[0], base_xy[1], 30, 60], dtype=np.float64),
        0.9,
        image=rng.randint(0, 255, (H, W, 3), dtype=np.uint8),
        scale=scale,
    )
    for i in range(n_mem - 1):
        t.images_mem.append(rng.randint(0, 255, (H, W, 3), dtype=np.uint8))
        t.tlwh_mem.append(
            np.array([base_xy[0] + 2 * i, base_xy[1], 30, 60], dtype=np.float64)
        )
    t.activate(1)
    return t


def _det(rng, xy):
    return Track(
        np.array([xy[0], xy[1], 30, 60], dtype=np.float64),
        0.8,
        image=rng.randint(0, 255, (H, W, 3), dtype=np.uint8),
        scale=1.0,
    )


@pytest.fixture(scope="module", name="engine")
def _engine_fixture():
    return _engine(np.random.RandomState(7))


def _engine(rng):
    cfg = BuscaConfig(num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1))
    model = BuscaModel(cfg)
    mem = np.zeros((1, SEQ_LEN, H, W, 3), np.float32)
    can = np.zeros((1, NUM_CAN, H, W, 3), np.float32)
    boxes_m = np.tile(np.array([0, 0, 10, 10], np.float32), (1, SEQ_LEN, 1))
    boxes_c = np.tile(np.array([0, 0, 10, 10], np.float32), (1, NUM_CAN, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), mem, can, boxes_m, boxes_c
    )
    return AssociationEngine(
        cfg,
        {"params": variables["params"]},
        seq_len=SEQ_LEN,
        num_candidates=NUM_CAN,
        crop_hw=(H, W),
        buckets=(1, 2, 4, 8),
    )


def test_track_mem_sampling_broader_memory(rng):
    t = _track(rng, 12)
    crops, bboxes = _get_track_mem(t, SEQ_LEN, use_broader_memory=True)
    # even-stride sampling over 12 entries: i * 11/4
    want_idx = [int(i * 11 / 4) for i in range(SEQ_LEN)]
    assert len(crops) == SEQ_LEN
    for c, wi in zip(crops, want_idx):
        np.testing.assert_array_equal(c, t.images_mem[wi])
    # without broader memory: last seq_len
    crops2, _ = _get_track_mem(t, SEQ_LEN, use_broader_memory=False)
    for c, im in zip(crops2, t.images_mem[-SEQ_LEN:]):
        np.testing.assert_array_equal(c, im)


def test_track_mem_scale_applied(rng):
    t = _track(rng, 6, scale=0.5)
    _, bboxes = _get_track_mem(t, SEQ_LEN, True)
    assert np.allclose(bboxes[:, 2], 15.0)  # width 30 * 0.5


@pytest.mark.slow
def test_associate_shapes_and_reliability(rng):
    eng = _engine(rng)
    tracks = [_track(rng, SEQ_LEN + 2), _track(rng, 2)]  # second incomplete
    dets = [_det(rng, (52, 60)), _det(rng, (200, 10))]
    kalman = [
        Track(t.tlwh, 0.10000001, rng.randint(0, 255, (H, W, 3), np.uint8), 1.0)
        for t in tracks
    ]
    probs, reliable = eng.associate(
        tracks, dets, extra_kalman_candidates=kalman,
        select_highest_candidate=False,
    )
    assert probs.shape == (2, len(dets) + len(tracks))
    assert reliable.tolist() == [True, False]
    # each track's probs over (dets + own kalman) are <= 1 and nonneg
    assert (probs >= 0).all() and (probs <= 1).all()
    # kalman prob lives at column D + t
    assert probs[0, len(dets) + 0] > 0 or probs[0].sum() > 0


def test_associate_empty_inputs(rng, engine):
    eng = engine
    assert eng.associate([], [], np.zeros((0, 0))) == (None, None)
    t = _track(rng, SEQ_LEN)
    assert eng.associate([t], [], np.zeros((1, 0))) == (None, None)


@pytest.mark.slow
def test_select_highest_candidate_one_hot(rng):
    eng = _engine(rng)
    tracks = [_track(rng, SEQ_LEN + 1)]
    dets = [_det(rng, (52, 60)), _det(rng, (80, 60))]
    kal = [Track(tracks[0].tlwh, 0.1, rng.randint(0, 255, (H, W, 3), np.uint8), 1.0)]

    raw, _ = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=False,
    )
    hot, _ = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=True,
    )
    # one-hot: at most a single 1.0, everything else 0
    nz = hot[0][hot[0] > 0]
    assert len(nz) <= 1
    if len(nz) == 1:
        assert nz[0] == 1.0
        # placed at the argmax of the raw scatter
        assert hot[0].argmax() == raw[0].argmax()

    # keep_highest_value preserves the probability value
    kept, _ = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=True, keep_highest_value=True,
    )
    nzk = kept[0][kept[0] > 0]
    if len(nzk) == 1:
        np.testing.assert_allclose(nzk[0], raw[0].max(), rtol=1e-5)

    # a minimum threshold above the max suppresses everything
    none, _ = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=True,
        highest_candidate_minimum_thresh=1.1,
    )
    assert (none[0] == 0).all()


@pytest.mark.slow
def test_bucketing_invariance(rng):
    """Scores must not depend on how much the batch was padded.

    (Note: *batch composition* legitimately changes scores — BN uses batch
    statistics, like the reference.  What must be invariant is the amount of
    padding added to reach a bucket.)
    """
    eng = _engine(rng)
    tracks = [_track(rng, SEQ_LEN + i) for i in range(3)]
    dets = [_det(rng, (52, 60))]
    kal = [
        Track(t.tlwh, 0.1, rng.randint(0, 255, (H, W, 3), np.uint8), 1.0)
        for t in tracks
    ]
    # same 3 tracks, padded to bucket 4 vs bucket 8
    p_pad4, _ = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=False,
    )
    eng8 = AssociationEngine(
        eng.config, eng.variables, seq_len=SEQ_LEN,
        num_candidates=NUM_CAN, crop_hw=(H, W), buckets=(8,),
    )
    p_pad8, _ = eng8.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=False,
    )
    np.testing.assert_allclose(p_pad4, p_pad8, rtol=1e-3, atol=1e-5)


def test_more_dets_than_candidate_slots(rng, engine):
    """Kalman replaces the last slot when detections overflow the slots."""
    eng = engine
    tracks = [_track(rng, SEQ_LEN + 1)]
    dets = [_det(rng, (52 + 5 * i, 60)) for i in range(6)]  # 6 > NUM_CAN=3
    kal = [Track(tracks[0].tlwh, 0.1, rng.randint(0, 255, (H, W, 3), np.uint8), 1.0)]
    probs, _ = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=False,
    )
    assert probs.shape == (1, 7)
    # only the 2 nearest dets + the kalman column can be nonzero
    # (num_available = min(6+1, 3) = 3 slots, one taken by kalman)
    nonzero_cols = np.where(probs[0] > 0)[0]
    assert len(nonzero_cols) <= 3
    assert 6 in nonzero_cols or probs[0, 6] >= 0  # kalman col = D + 0 = 6


def test_debug_montage_written(rng, tmp_path):
    """debug_dir dumps a decision montage per associate call
    (reference network.py:234-242)."""
    import os

    eng = _engine(rng)
    eng.debug_dir = str(tmp_path / "montages")
    tracks = [_track(rng, SEQ_LEN)]
    dets = [_det(rng, (12, 10))]
    eng.associate(tracks, dets)
    files = os.listdir(eng.debug_dir)
    assert len(files) == 1 and files[0].endswith(".jpg")


@pytest.mark.slow
def test_dedup_candidates_matches_duplicated_path(rng):
    """Deduplicated candidate ReID (unique crops + multiplicity-weighted BN
    stats) must reproduce the duplicated [T, C] batch's probabilities."""
    eng = _engine(rng)
    tracks = [_track(rng, SEQ_LEN + i, base_xy=(40 + 30 * i, 60))
              for i in range(3)]
    dets = [_det(rng, (52, 60)), _det(rng, (90, 62))]  # shared det pool
    kal = [
        Track(t.tlwh, 0.1, rng.randint(0, 255, (H, W, 3), np.uint8), 1.0)
        for t in tracks
    ]
    kwargs = dict(extra_kalman_candidates=kal, select_highest_candidate=False)

    eng.dedup_candidates = False
    p_dup, r_dup = eng.associate(tracks, dets, **kwargs)
    eng.dedup_candidates = True
    p_ded, r_ded = eng.associate(tracks, dets, **kwargs)

    np.testing.assert_array_equal(r_dup, r_ded)
    np.testing.assert_allclose(p_ded, p_dup, rtol=2e-4, atol=2e-6)


def test_associate_many_matches_individual_calls(rng, engine):
    """Batched multi-request association (per-request BN groups) must
    reproduce each request's standalone associate() call; empty requests
    yield (None, None)."""
    eng = engine

    def make_req(seed, n_tracks, n_dets):
        r = np.random.RandomState(seed)
        tracks = [_track(r, SEQ_LEN + i, base_xy=(40 + 25 * i, 60))
                  for i in range(n_tracks)]
        dets = [_det(r, (50 + 20 * j, 60)) for j in range(n_dets)]
        kal = [Track(t.tlwh, 0.1, r.randint(0, 255, (H, W, 3), np.uint8), 1.0)
               for t in tracks]
        return (tracks, dets, None, kal)

    requests = [make_req(1, 2, 2), ([], [], None, []), make_req(2, 1, 3)]
    kw = dict(select_highest_candidate=False)
    batched = eng.associate_many(requests, **kw)

    assert batched[1] == (None, None)
    for idx in (0, 2):
        tracks, dets, _, kal = requests[idx]
        p_solo, r_solo = eng.associate(
            tracks, dets, extra_kalman_candidates=kal, **kw
        )
        p_b, r_b = batched[idx]
        np.testing.assert_array_equal(r_b, r_solo)
        np.testing.assert_allclose(p_b, p_solo, rtol=2e-4, atol=2e-6)


def test_associate_many_r5_group_padding(rng, engine):
    """Five live requests pad the group count to 8 — per-request results
    still match standalone calls exactly."""
    eng = engine

    def make_req(seed):
        r = np.random.RandomState(seed)
        tracks = [_track(r, SEQ_LEN + 1, base_xy=(40 + 7 * seed, 60))]
        dets = [_det(r, (50 + 5 * seed, 60))]
        kal = [Track(tracks[0].tlwh, 0.1,
                     r.randint(0, 255, (H, W, 3), np.uint8), 1.0)]
        return (tracks, dets, None, kal)

    requests = [make_req(s) for s in range(5)]
    kw = dict(select_highest_candidate=False)
    batched = eng.associate_many(requests, **kw)
    for req, (p_b, r_b) in zip(requests, batched):
        tracks, dets, _, kal = req
        p_s, r_s = eng.associate(tracks, dets,
                                 extra_kalman_candidates=kal, **kw)
        np.testing.assert_array_equal(r_b, r_s)
        np.testing.assert_allclose(p_b, p_s, rtol=2e-4, atol=2e-6)
