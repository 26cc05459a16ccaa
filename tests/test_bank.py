"""Device crop bank: slot bookkeeping, eviction, and scoring parity.

The bank (assoc/bank.py) must be a pure cache: with ANY capacity, banked
scoring produces bit-identical probabilities to the pixel-shipping path,
because misses re-upload from the host mirrors.  These tests force heavy
eviction with tiny capacities to prove that.
"""

import numpy as np
import pytest

from busca_tpu.assoc.bank import BankedCrop, DeviceCropBank, tag
from busca_tpu.trackers.base import extract_uint8_crops

from test_engine import (
    H,
    NUM_CAN,
    SEQ_LEN,
    W,
    _det,
    _engine,
    _track,
)


def _crop(rng):
    return rng.randint(0, 255, (H, W, 3), np.uint8)


def _bank_host(bank):
    return np.asarray(bank.array)


class TestBankBookkeeping:
    def test_resolve_roundtrip(self, rng):
        bank = DeviceCropBank((H, W), capacity=8)
        crops = [tag(_crop(rng), bank.new_uid()) for _ in range(3)]
        slots = bank.resolve(crops)
        assert len(set(slots.tolist())) == 3 and 0 not in slots
        arr = _bank_host(bank)
        for c, s in zip(crops, slots):
            np.testing.assert_array_equal(arr[s], c)
        # second resolve: cache hit, same slots, no re-upload
        slots2 = bank.resolve(crops)
        np.testing.assert_array_equal(slots, slots2)

    def test_none_is_zero_slot(self, rng):
        bank = DeviceCropBank((H, W), capacity=8)
        slots = bank.resolve([None, tag(_crop(rng), bank.new_uid()), None])
        assert slots[0] == 0 and slots[2] == 0 and slots[1] != 0

    def test_zero_slot_survives_padded_scatter(self, rng):
        bank = DeviceCropBank((H, W), capacity=8)
        # 3 uploads pad to 4; the pad row targets slot 0 with a zero crop
        bank.resolve([tag(_crop(rng), bank.new_uid()) for _ in range(3)])
        np.testing.assert_array_equal(_bank_host(bank)[0], 0)

    def test_lru_eviction_and_reupload(self, rng):
        bank = DeviceCropBank((H, W), capacity=4)  # 3 usable slots
        a, b, c, d = (tag(_crop(rng), bank.new_uid()) for _ in range(4))
        sa = bank.resolve([a])[0]
        bank.resolve([b, c])
        # bank full; touching a keeps it warm, d must evict b (the LRU)
        assert bank.resolve([a])[0] == sa
        sd = bank.resolve([d])[0]
        arr = _bank_host(bank)
        np.testing.assert_array_equal(arr[sd], d)
        # b was evicted: resolving it re-uploads (evicting c now)
        sb = bank.resolve([b])[0]
        np.testing.assert_array_equal(_bank_host(bank)[sb], b)

    def test_pinning_within_one_call(self, rng):
        bank = DeviceCropBank((H, W), capacity=4)
        crops = [tag(_crop(rng), bank.new_uid()) for _ in range(3)]
        slots = bank.resolve(crops)  # fills all 3 usable slots, all pinned
        assert len(set(slots.tolist())) == 3
        with pytest.raises(RuntimeError, match="exhausted"):
            bank.resolve([tag(_crop(rng), bank.new_uid()) for _ in range(4)])

    def test_put_device_exhaustion_recovers(self, rng):
        # mid-put exhaustion must clear the call's pins so the bank stays
        # usable (bank.py::put_device's finally clause)
        import jax.numpy as jnp

        bank = DeviceCropBank((H, W), capacity=4)  # 3 usable slots
        crops = jnp.asarray(
            rng.randint(0, 255, (8, H, W, 3), np.uint8)
        )
        with pytest.raises(RuntimeError, match="exhausted"):
            bank.put_device(crops, 8)
        assert not bank._pinned
        uids = bank.put_device(crops[:2], 2)
        assert len(uids) == 2
        slots = bank.resolve(
            [tag(np.asarray(crops[i]), uids[i]) for i in range(2)]
        )
        arr = _bank_host(bank)
        for i, s in enumerate(slots):
            np.testing.assert_array_equal(arr[s], np.asarray(crops[i]))

    def test_upload_failure_rolls_back_registrations(self, rng):
        # a crop whose shape mismatches crop_hw raises during the batched
        # upload AFTER its uid was registered; the rollback must cover that
        # (bank.py resolve) or later resolves cache-hit unwritten pixels
        bank = DeviceCropBank((H, W), capacity=8)
        good = tag(_crop(rng), bank.new_uid())
        bad = tag(rng.randint(0, 255, (H + 1, W, 3), np.uint8),
                  bank.new_uid())
        with pytest.raises(Exception):
            bank.resolve([good, bad])
        assert not bank._pinned
        assert len(bank) == 0  # both registrations rolled back
        # retrying with only the good crop uploads real pixels
        s = bank.resolve([good])[0]
        np.testing.assert_array_equal(_bank_host(bank)[s], good)

    def test_untagged_crop_uploads(self, rng):
        bank = DeviceCropBank((H, W), capacity=8)
        plain = _crop(rng)  # no uid attribute
        s = bank.resolve([plain])[0]
        np.testing.assert_array_equal(_bank_host(bank)[s], plain)


def test_extract_crops_admits_to_bank(rng):
    bank = DeviceCropBank((H, W), capacity=16)
    frame = rng.randint(0, 255, (240, 320, 3), np.uint8)
    boxes = np.array([[10, 20, 80, 200], [100, 30, 180, 220], [5, 5, 60, 90]],
                     np.float32)
    crops = extract_uint8_crops(frame, boxes, (H, W), bank=bank)
    assert all(isinstance(c, BankedCrop) and c.uid is not None for c in crops)
    slots = bank.resolve(crops)  # must hit: no re-upload path exercised
    arr = _bank_host(bank)
    for c, s in zip(crops, slots):
        assert s != 0
        np.testing.assert_array_equal(arr[s], np.asarray(c))


@pytest.mark.slow
@pytest.mark.parametrize("capacity", [256, 20])
def test_banked_associate_parity(rng, capacity):
    """Banked scoring == pixel scoring, including under heavy eviction
    (capacity 20: one call's ~16 crops fit, the second call evicts)."""
    eng_ref = _engine(np.random.RandomState(3))
    eng_bank = _engine(np.random.RandomState(3))
    eng_bank.bank = DeviceCropBank((H, W), capacity=capacity)
    assert eng_bank.banked

    def scenario(seed):
        r = np.random.RandomState(seed)
        tracks = [_track(r, SEQ_LEN + 3), _track(r, 2), _track(r, SEQ_LEN)]
        dets = [_det(r, (52, 60)), _det(r, (80, 70)), _det(r, (200, 10))]
        from busca_tpu.trackers.base import Track

        kal = [
            Track(t.tlwh, 0.10000001, r.randint(0, 255, (H, W, 3), np.uint8),
                  1.0)
            for t in tracks
        ]
        return tracks, dets, kal

    for seed in (11, 12):
        t1, d1, k1 = scenario(seed)
        p_ref, rel_ref = eng_ref.associate(
            t1, d1, extra_kalman_candidates=k1,
            select_highest_candidate=False,
        )
        p_b, rel_b = eng_bank.associate(
            t1, d1, extra_kalman_candidates=k1,
            select_highest_candidate=False,
        )
        np.testing.assert_array_equal(rel_ref, rel_b)
        np.testing.assert_allclose(p_ref, p_b, rtol=0, atol=0)


@pytest.mark.slow
def test_banked_associate_many_parity(rng):
    """Grouped multi-request banked scoring == unbanked grouped scoring."""
    eng_ref = _engine(np.random.RandomState(5))
    eng_bank = _engine(np.random.RandomState(5))
    eng_bank.bank = DeviceCropBank((H, W), capacity=256)

    def request(seed):
        r = np.random.RandomState(seed)
        tracks = [_track(r, SEQ_LEN + 1), _track(r, SEQ_LEN + 4)]
        dets = [_det(r, (52, 60)), _det(r, (90, 40))]
        from busca_tpu.trackers.base import Track

        kal = [
            Track(t.tlwh, 0.10000001, r.randint(0, 255, (H, W, 3), np.uint8),
                  1.0)
            for t in tracks
        ]
        return (tracks, dets, None, kal)

    reqs = [request(21), request(22), request(23)]
    outs_ref = eng_ref.associate_many(reqs, select_highest_candidate=False)
    outs_b = eng_bank.associate_many(reqs, select_highest_candidate=False)
    assert len(outs_ref) == len(outs_b) == 3
    for (p1, r1), (p2, r2) in zip(outs_ref, outs_b):
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_allclose(p1, p2, rtol=0, atol=0)
