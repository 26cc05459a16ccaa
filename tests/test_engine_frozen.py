"""Frozen-stats ReID mode (reid_stats='frozen'): feats-path forward parity,
cross-frame feature-cache correctness, and batched-request equality.

This mode is the opt-in throughput deviation documented in PARITY.md
"Frozen-stats ReID": BN normalizes with the checkpoint's stored running
statistics (torch eval mode) instead of the GHOST batch-stat domain
adaptation, which makes ReID features batch-independent and therefore
cacheable across frames.  Within the mode, caching must be semantics-free:
results never depend on cache warmth, capacity, or eviction.
"""

import numpy as np
import pytest

import jax

from busca_tpu.assoc.bank import next_uid, tag
from busca_tpu.assoc.engine import AssociationEngine
from busca_tpu.models.busca import BuscaConfig, BuscaModel
from busca_tpu.models.reid import ReIDResNet
from busca_tpu.trackers.base import Track

H, W = 96, 32
SEQ_LEN, NUM_CAN = 5, 3

CFG = BuscaConfig(
    num_layer=1,
    reid_num_classes=5,
    reid_layers=(1, 1, 1, 1),
    reid_use_batch_stats=False,
)


def _init_variables(cfg):
    model = BuscaModel(cfg)
    mem = np.zeros((1, SEQ_LEN, H, W, 3), np.float32)
    can = np.zeros((1, NUM_CAN, H, W, 3), np.float32)
    boxes_m = np.tile(np.array([0, 0, 10, 10], np.float32), (1, SEQ_LEN, 1))
    boxes_c = np.tile(np.array([0, 0, 10, 10], np.float32), (1, NUM_CAN, 1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), mem, can, boxes_m, boxes_c
    )
    # non-trivial running stats so frozen mode is distinguishable from the
    # init defaults (zero mean / unit var)
    rng = np.random.RandomState(3)
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            np.abs(rng.randn(*x.shape)).astype(np.float32) + 0.5
            if "running_var" in str(path)
            else (
                rng.randn(*x.shape).astype(np.float32) * 0.1
                if "running_mean" in str(path)
                else x
            )
        ),
        variables,
    )
    return model, variables


@pytest.fixture(scope="module", name="setup")
def _setup():
    return _init_variables(CFG)


def _frozen_engine(setup, **kw):
    _, variables = setup
    return AssociationEngine(
        CFG,
        variables,
        seq_len=SEQ_LEN,
        num_candidates=NUM_CAN,
        crop_hw=(H, W),
        buckets=(1, 2, 4, 8),
        reid_stats="frozen",
        **kw,
    )


def _tagged_crop(rng):
    return tag(rng.randint(0, 255, (H, W, 3), dtype=np.uint8), next_uid())


def _track(rng, n_mem, scale=1.0, base_xy=(50, 60)):
    t = Track(
        np.array([base_xy[0], base_xy[1], 30, 60], dtype=np.float64),
        0.9,
        image=_tagged_crop(rng),
        scale=scale,
    )
    for i in range(n_mem - 1):
        t.images_mem.append(_tagged_crop(rng))
        t.tlwh_mem.append(
            np.array(
                [base_xy[0] + 2 * i, base_xy[1], 30, 60], dtype=np.float64
            )
        )
    t.activate(1)
    return t


def _det(rng, xy):
    return Track(
        np.array([xy[0], xy[1], 30, 60], dtype=np.float64),
        0.8,
        image=_tagged_crop(rng),
        scale=1.0,
    )


def _scene(rng, n_tracks=3, n_dets=4):
    tracks = [
        _track(rng, SEQ_LEN + 1 + i, base_xy=(40 + 30 * i, 60))
        for i in range(n_tracks)
    ]
    tracks[-1] = _track(rng, 2, base_xy=(160, 60))  # incomplete memory
    dets = [_det(rng, (45 + 28 * i, 62)) for i in range(n_dets)]
    kal = [
        Track(t.tlwh, 0.10000001, _tagged_crop(rng), 1.0) for t in tracks
    ]
    return tracks, dets, kal


def test_frozen_requires_batch_stats():
    with pytest.raises(ValueError, match="batch_stats"):
        AssociationEngine(
            CFG, {"params": {}}, crop_hw=(H, W), reid_stats="frozen"
        )


def test_model_feats_path_matches_crops_path(setup):
    """Feeding precomputed frozen ReID features reproduces the crops-path
    forward (the feats path is an execution split, not a semantic change)."""
    model, variables = setup
    rng = np.random.RandomState(11)
    b = 2
    mem_crops = rng.rand(b, SEQ_LEN, H, W, 3).astype(np.float32)
    can_crops = rng.rand(b, NUM_CAN, H, W, 3).astype(np.float32)
    mem_boxes = rng.uniform(0, 200, (b, SEQ_LEN, 4)).astype(np.float32)
    can_boxes = rng.uniform(0, 200, (b, NUM_CAN, 4)).astype(np.float32)
    mem_boxes[..., 2:] += 220
    can_boxes[..., 2:] += 220

    logits_crops = model.apply(
        variables, mem_crops, can_crops, mem_boxes, can_boxes
    )

    reid = ReIDResNet(
        layers=CFG.reid_layers,
        num_classes=CFG.reid_num_classes,
        use_batch_stats=False,
    )
    reid_vars = {
        "params": variables["params"]["reid_encoder"],
        "batch_stats": variables["batch_stats"]["reid_encoder"],
    }
    _, mem_feats = reid.apply(
        reid_vars, mem_crops.reshape(-1, H, W, 3)
    )
    _, can_feats = reid.apply(
        reid_vars, can_crops.reshape(-1, H, W, 3)
    )
    logits_feats = model.apply(
        variables,
        None,
        None,
        mem_boxes,
        can_boxes,
        mem_feats=np.asarray(mem_feats).reshape(b, SEQ_LEN, -1),
        can_feats=np.asarray(can_feats).reshape(b, NUM_CAN, -1),
    )
    np.testing.assert_allclose(
        np.asarray(logits_feats), np.asarray(logits_crops),
        rtol=0, atol=2e-5,
    )


def _count_encodes(eng, calls):
    """Wrap the engine's encode entry point (bank scatter or host encode)
    so each device encode dispatch appends its batch size to ``calls``."""
    if eng._feat_bank:
        inner = eng._encode_scatter

        def wrapped(v, bank, crops, slots, **kw):
            calls.append(crops.shape[0])
            return inner(v, bank, crops, slots, **kw)

        eng._encode_scatter = wrapped
    else:
        inner = eng._encode
        eng._encode = lambda v, c, **kw: calls.append(c.shape[0]) or inner(
            v, c, **kw
        )


@pytest.mark.parametrize("feat_bank", [True, False])
def test_frozen_cache_warmth_invariance(setup, feat_bank):
    """Identical request scored with a cold vs warm cache gives identical
    results, and the warm pass encodes nothing (device bank and host cache
    alike)."""
    rng = np.random.RandomState(5)
    tracks, dets, kal = _scene(rng)

    eng = _frozen_engine(setup, feat_bank=feat_bank)
    calls = []
    _count_encodes(eng, calls)

    cold, rel_cold = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=False,
    )
    n_cold_calls = len(calls)
    assert n_cold_calls > 0
    warm, rel_warm = eng.associate(
        tracks, dets, extra_kalman_candidates=kal,
        select_highest_candidate=False,
    )
    assert len(calls) == n_cold_calls  # everything was cached
    np.testing.assert_array_equal(warm, cold)
    np.testing.assert_array_equal(rel_warm, rel_cold)


def test_frozen_cache_eviction_invariance(setup):
    """A 2-slot host cache (constant eviction) scores identically to the
    default capacity — capacity affects speed, never results."""
    rng = np.random.RandomState(6)
    tracks, dets, kal = _scene(rng)
    big = _frozen_engine(setup, feat_bank=False)
    tiny = _frozen_engine(setup, feat_cache_slots=2, feat_bank=False)
    kw = dict(extra_kalman_candidates=kal, select_highest_candidate=False)
    p_big, _ = big.associate(tracks, dets, **kw)
    p_big2, _ = big.associate(tracks, dets, **kw)  # warm
    p_tiny, _ = tiny.associate(tracks, dets, **kw)
    p_tiny2, _ = tiny.associate(tracks, dets, **kw)  # evicted + re-encoded
    np.testing.assert_allclose(p_tiny, p_big, rtol=0, atol=1e-6)
    np.testing.assert_allclose(p_tiny2, p_big2, rtol=0, atol=1e-6)
    np.testing.assert_allclose(p_big2, p_big, rtol=0, atol=1e-6)


def test_frozen_bank_matches_host_cache(setup):
    """The device feature bank (encode+scatter then gather+score in HBM) is
    an execution split of the host-cache path: identical probabilities on
    cold AND warm calls."""
    rng = np.random.RandomState(13)
    scenes = [_scene(rng, n_tracks=3, n_dets=4) for _ in range(2)]
    bank_eng = _frozen_engine(setup, feat_bank=True)
    host_eng = _frozen_engine(setup, feat_bank=False)
    kw = dict(select_highest_candidate=False)
    for tracks, dets, kal in scenes + scenes:  # second pass = warm caches
        p_bank, r_bank = bank_eng.associate(
            tracks, dets, extra_kalman_candidates=kal, **kw
        )
        p_host, r_host = host_eng.associate(
            tracks, dets, extra_kalman_candidates=kal, **kw
        )
        np.testing.assert_allclose(p_bank, p_host, rtol=0, atol=1e-6)
        np.testing.assert_array_equal(r_bank, r_host)


def test_frozen_bank_eviction_invariance(setup):
    """A bank barely larger than one call's working set (constant eviction
    between alternating scenes) scores identically to the default capacity."""
    rng = np.random.RandomState(14)
    scene_a = _scene(rng, n_tracks=3, n_dets=4)
    scene_b = _scene(rng, n_tracks=3, n_dets=4)
    big = _frozen_engine(setup, feat_bank=True)
    # one call references ~ zero + 3 tracks x SEQ_LEN mems + 4 dets +
    # 3 Kalman crops <= 23 distinct units; 26 slots forces the alternating
    # scene's units to evict each other every call
    tiny = _frozen_engine(setup, feat_bank=True, feat_cache_slots=26)
    kw = dict(select_highest_candidate=False)
    for tracks, dets, kal in (scene_a, scene_b, scene_a, scene_b):
        p_big, _ = big.associate(
            tracks, dets, extra_kalman_candidates=kal, **kw
        )
        p_tiny, _ = tiny.associate(
            tracks, dets, extra_kalman_candidates=kal, **kw
        )
        np.testing.assert_allclose(p_tiny, p_big, rtol=0, atol=1e-6)


def test_frozen_bank_exhaustion_raises(setup):
    """A call referencing more distinct crops than the bank holds fails
    loudly (never silently evicts an in-flight slot)."""
    rng = np.random.RandomState(15)
    tracks, dets, kal = _scene(rng)
    eng = _frozen_engine(setup, feat_bank=True, feat_cache_slots=4)
    with pytest.raises(RuntimeError, match="feature bank exhausted"):
        eng.associate(
            tracks, dets, extra_kalman_candidates=kal,
            select_highest_candidate=False,
        )


def test_frozen_bank_failed_call_rolls_back(setup):
    """A call that fails before its scatter dispatches must unregister its
    keys (later calls would otherwise gather never-written bank rows) and
    free its slots; a failure AFTER the scatter resets the bank — either
    way the next call still returns the correct probabilities."""
    rng = np.random.RandomState(16)
    tracks, dets, kal = _scene(rng)
    kw = dict(extra_kalman_candidates=kal, select_highest_candidate=False)

    ref_eng = _frozen_engine(setup, feat_bank=True)
    p_ref, _ = ref_eng.associate(tracks, dets, **kw)

    # (a) pre-flush failure: exhaustion fires during slot resolution
    eng = _frozen_engine(setup, feat_bank=True, feat_cache_slots=4)
    n_free = len(eng._free_slots)
    with pytest.raises(RuntimeError, match="feature bank exhausted"):
        eng.associate(tracks, dets, **kw)
    assert not eng._slot_of  # every registration rolled back
    assert len(eng._free_slots) == n_free  # every slot reclaimed

    # (b) post-flush failure: scorer blows up after the scatter dispatched
    eng = _frozen_engine(setup, feat_bank=True)
    real_score = eng._score_bank
    eng._score_bank = lambda *a, **k: (_ for _ in ()).throw(
        ValueError("injected")
    )
    with pytest.raises(ValueError, match="injected"):
        eng.associate(tracks, dets, **kw)
    assert eng._bank is None and not eng._slot_of  # bank dropped whole
    eng._score_bank = real_score
    p_after, _ = eng.associate(tracks, dets, **kw)  # clean re-encode
    np.testing.assert_allclose(p_after, p_ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("feat_bank", [True, False])
def test_frozen_associate_many_matches_single(setup, feat_bank):
    """The batched multi-request path equals per-request standalone calls
    (no BN coupling exists in frozen mode by construction)."""
    rng = np.random.RandomState(8)
    scenes = [_scene(rng, n_tracks=2, n_dets=3) for _ in range(3)]
    kw = dict(select_highest_candidate=False)

    batched_eng = _frozen_engine(setup, feat_bank=feat_bank)
    requests = [(t, d, None, k) for t, d, k in scenes]
    batched = batched_eng.associate_many(requests, **kw)

    single_eng = _frozen_engine(setup, feat_bank=feat_bank)
    for (tracks, dets, kal), (p_b, r_b) in zip(scenes, batched):
        p_s, r_s = single_eng.associate(
            tracks, dets, extra_kalman_candidates=kal, **kw
        )
        np.testing.assert_allclose(p_b, p_s, rtol=0, atol=1e-5)
        np.testing.assert_array_equal(r_b, r_s)


def test_frozen_differs_from_batch_mode(setup):
    """Sanity: frozen mode is a real semantic change (running stats differ
    from batch statistics), so probabilities must differ from batch mode."""
    model, variables = setup
    rng = np.random.RandomState(9)
    tracks, dets, kal = _scene(rng)
    frozen = _frozen_engine(setup)
    batch = AssociationEngine(
        BuscaConfig(
            num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1)
        ),
        {"params": variables["params"]},
        seq_len=SEQ_LEN,
        num_candidates=NUM_CAN,
        crop_hw=(H, W),
        buckets=(1, 2, 4, 8),
    )
    kw = dict(extra_kalman_candidates=kal, select_highest_candidate=False)
    p_f, _ = frozen.associate(tracks, dets, **kw)
    p_b, _ = batch.associate(tracks, dets, **kw)
    # probabilities can be tiny with random weights, so compare relatively:
    # the two normalization modes must disagree beyond numeric noise
    assert not np.allclose(p_f, p_b, rtol=0.5, atol=1e-30)


def test_frozen_montage_rejected(setup):
    with pytest.raises(ValueError, match="montage"):
        _frozen_engine(setup, debug_dir="/tmp/nope")


# ---------------------------------------------------------------------------
# reid_stats='auto': frozen numerics, fused execution below the T-crossover
# ---------------------------------------------------------------------------


def _auto_engine(setup, **kw):
    _, variables = setup
    return AssociationEngine(
        CFG,
        variables,
        seq_len=SEQ_LEN,
        num_candidates=NUM_CAN,
        crop_hw=(H, W),
        buckets=(1, 2, 4, 8),
        reid_stats="auto",
        **kw,
    )


def test_auto_requires_batch_stats():
    with pytest.raises(ValueError, match="batch_stats"):
        AssociationEngine(
            CFG, {"params": {}}, crop_hw=(H, W), reid_stats="auto"
        )


def test_auto_matches_frozen_numerics_both_sides_of_crossover(setup):
    """auto == frozen results at every T — below the crossover it runs the
    single fused dispatch, above it the cached/banked path, but BN uses the
    stored running stats either way so the numbers must agree."""
    for n_tracks, n_dets in [(1, 2), (2, 3), (6, 4), (8, 5)]:
        rng = np.random.RandomState(100 + n_tracks)
        tracks, dets, kal = _scene(rng, n_tracks=n_tracks, n_dets=n_dets)
        frozen = _frozen_engine(setup)
        auto = _auto_engine(setup, auto_fused_max_t=4)
        pf, rf = frozen.associate(
            tracks, dets, extra_kalman_candidates=kal
        )
        pa, ra = auto.associate(
            tracks, dets, extra_kalman_candidates=kal
        )
        np.testing.assert_allclose(pa, pf, rtol=0, atol=2e-5)
        np.testing.assert_array_equal(ra, rf)


def test_auto_routes_by_t_crossover(setup, monkeypatch):
    """Tiny-T calls take the fused scorer; above-crossover calls take the
    frozen cached path (the VERDICT r4 'auto policy' done-criterion)."""
    engine = _auto_engine(setup, auto_fused_max_t=2)
    calls = {"fused": 0, "frozen": 0}

    orig_fused = AssociationEngine._score_bucketed_unique
    orig_slots = AssociationEngine._frozen_request_slots

    def spy_fused(self, *a, **kw):
        calls["fused"] += 1
        return orig_fused(self, *a, **kw)

    def spy_slots(self, *a, **kw):
        calls["frozen"] += 1
        return orig_slots(self, *a, **kw)

    monkeypatch.setattr(AssociationEngine, "_score_bucketed_unique",
                        spy_fused)
    monkeypatch.setattr(AssociationEngine, "_frozen_request_slots",
                        spy_slots)

    rng = np.random.RandomState(7)
    tracks, dets, kal = _scene(rng, n_tracks=2, n_dets=3)
    engine.associate(tracks, dets, extra_kalman_candidates=kal)
    assert calls == {"fused": 1, "frozen": 0}

    tracks, dets, kal = _scene(rng, n_tracks=5, n_dets=3)
    engine.associate(tracks, dets, extra_kalman_candidates=kal)
    assert calls == {"fused": 1, "frozen": 1}


def test_auto_associate_many_matches_frozen(setup):
    """Batched requests route by the COMBINED track count and match the
    frozen-mode results on both sides of the crossover."""
    rng = np.random.RandomState(21)
    small = [_scene(rng, n_tracks=1, n_dets=2) for _ in range(2)]
    large = [_scene(rng, n_tracks=4, n_dets=3) for _ in range(2)]
    for scenes in (small, large):
        reqs = [(t, d, None, k) for t, d, k in scenes]
        frozen = _frozen_engine(setup)
        auto = _auto_engine(setup, auto_fused_max_t=3)
        rf = frozen.associate_many(reqs)
        ra = auto.associate_many(reqs)
        for (pf, relf), (pa, rela) in zip(rf, ra):
            np.testing.assert_allclose(pa, pf, rtol=0, atol=2e-5)
            np.testing.assert_array_equal(rela, relf)
