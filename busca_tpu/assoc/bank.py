"""Device-resident appearance-crop bank.

The reference ships every track's memory crops from host to device on every
``associate_embeddings`` call (busca/network.py:293-398: numpy stack ->
``.to(device)`` of a ``[T, seq_len, 3, 384, 128]`` tensor, ~20 MB per third
round).  On TPU that host->HBM traffic — and the host-side ``np.stack`` that
feeds it — dominates the BUSCA-attached frame budget once the model itself is
fast.

TPU-first fix: crops are *born* on device (ops/crop.py produces them from the
frame in one fused call), so the framework keeps them there.  The bank is a
fixed-capacity uint8 HBM array ``[capacity, H, W, 3]``; tracks' host-side
memory lists keep lightweight numpy mirrors tagged with a unit id, and the
association engine ships only **slot indices** — the jitted scorer gathers
crops from the bank in HBM.  Slot 0 is permanently the all-zero crop (the
reference's "missing candidate" / incomplete-memory zero image,
busca/network.py:300-308, 352-355).

Eviction is LRU: the bank is a cache, not the source of truth — the host
mirror re-uploads on a miss (one batched scatter per resolve), so capacity
only affects performance, never results.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BankedCrop(np.ndarray):
    """A host crop mirror that remembers its bank unit id.

    Plain ``np.ndarray`` view subclass: behaves exactly like the underlying
    uint8 array everywhere (np.stack, indexing, oracle diffs); the ``uid``
    attribute is only consulted by :meth:`DeviceCropBank.resolve`.  Views and
    copies intentionally drop the uid (they are new buffers as far as the
    bank is concerned).
    """

    uid: Optional[int]

    def __array_finalize__(self, obj):
        self.uid = None


def tag(arr: np.ndarray, uid: int) -> "BankedCrop":
    v = arr.view(BankedCrop)
    v.uid = uid
    return v


# One process-wide uid space: crop identity is shared by the crop bank and
# the association engine's frozen-stats feature cache, so uids must never
# collide across allocators (a bank and a bankless feature-cache engine can
# coexist in one process).
_uid_iter = iter(range(1, 2**62))


def next_uid() -> int:
    return next(_uid_iter)


class DeviceCropBank:
    """Fixed-capacity LRU cache of ReID crops in device HBM."""

    def __init__(self, crop_hw: Tuple[int, int] = (384, 128),
                 capacity: int = 4096):
        if capacity < 2:
            raise ValueError("capacity must be >= 2 (slot 0 is reserved)")
        self.crop_hw = tuple(crop_hw)
        self.capacity = int(capacity)
        self._array = None  # lazy: [capacity, h, w, 3] uint8 on device
        self._slot_of = {}  # uid -> slot
        self._uid_at: List[Optional[int]] = [None] * self.capacity
        # slot 0 reserved for the zero crop; never allocated
        self._free = list(range(self.capacity - 1, 0, -1))
        self._last_used = np.zeros(self.capacity, np.int64)
        self._clock = 0
        self._pinned: set = set()

        @functools.partial(jax.jit, donate_argnums=0)
        def _scatter(bank, slots, crops):
            # pad entries target slot 0 with zero crops, keeping it zero
            return bank.at[slots].set(crops.astype(jnp.uint8))

        self._scatter = _scatter

    # ------------------------------------------------------------------ state --
    @property
    def array(self):
        """The device bank array (materialized on first use)."""
        if self._array is None:
            h, w = self.crop_hw
            self._array = jnp.zeros((self.capacity, h, w, 3), jnp.uint8)
        return self._array

    def __len__(self):
        return self.capacity - 1 - len(self._free)

    def new_uid(self) -> int:
        return next_uid()

    def _touch(self, slot: int):
        self._clock += 1
        self._last_used[slot] = self._clock

    def _alloc(self) -> int:
        """One free slot, evicting the LRU unpinned resident if needed."""
        if self._free:
            slot = self._free.pop()
        else:
            used = self._last_used.copy()
            used[0] = np.iinfo(np.int64).max
            if self._pinned:
                used[list(self._pinned)] = np.iinfo(np.int64).max
            slot = int(used.argmin())
            if used[slot] == np.iinfo(np.int64).max:
                raise RuntimeError(
                    f"crop bank exhausted: all {self.capacity} slots pinned "
                    "by one call — raise the capacity"
                )
            old = self._uid_at[slot]
            if old is not None:
                del self._slot_of[old]
        self._uid_at[slot] = None
        self._touch(slot)
        self._pinned.add(slot)
        return slot

    def _register(self, slot: int, uid: int):
        self._uid_at[slot] = uid
        self._slot_of[uid] = slot

    # ------------------------------------------------------------------- put --
    def put_device(self, crops_device, n: int) -> List[int]:
        """Admit ``n`` freshly cropped device crops (the first ``n`` rows of a
        possibly padded batch) without any host round-trip.

        Args:
          crops_device: ``[N_pad, h, w, 3]`` device array (float with
            integral 0..255 values, or uint8).
          n: number of real crops; pad rows must be zero crops (they are
            scattered into slot 0, which stays zero).
        Returns:
          the ``n`` unit ids, to be attached to the host mirrors via
          :func:`tag`.
        """
        n_pad = crops_device.shape[0]
        if not 0 <= n <= n_pad:
            raise ValueError(f"n={n} outside the batch of {n_pad} crops")
        uids = []
        slots = np.zeros(n_pad, np.int32)
        try:
            try:
                for i in range(n):
                    slot = self._alloc()
                    uid = self.new_uid()
                    self._register(slot, uid)
                    uids.append(uid)
                    slots[i] = slot
                self._array = self._scatter(
                    self.array, jnp.asarray(slots), crops_device
                )
            except Exception:
                # roll back this call's registrations: a failed put must not
                # leak occupied slots or leave uids that cache-hit unwritten
                # pixels
                for i in range(len(uids)):
                    slot = int(slots[i])
                    del self._slot_of[uids[i]]
                    self._uid_at[slot] = None
                    self._free.append(slot)
                raise
        finally:
            # pins protect this call's slots only; a mid-loop exhaustion
            # error must not leave slots permanently unevictable
            self._pinned.clear()
        return uids

    # --------------------------------------------------------------- resolve --
    def resolve(self, crops: Sequence[Optional[np.ndarray]]) -> np.ndarray:
        """Slot indices for a batch of host crop mirrors.

        ``None`` entries map to slot 0 (the zero crop).  Crops whose uid is
        resident hit the cache; the rest are uploaded in ONE batched scatter
        (count padded to a power of two with zero crops into slot 0, so the
        scatter kernel compiles once per bucket).  All returned slots are
        protected from eviction for the duration of this call.
        """
        slots = np.zeros(len(crops), np.int32)
        missing: List[Tuple[int, np.ndarray]] = []
        try:
            try:
                for i, crop in enumerate(crops):
                    if crop is None:
                        continue
                    uid = getattr(crop, "uid", None)
                    slot = self._slot_of.get(uid) if uid is not None else None
                    if slot is not None:
                        self._touch(slot)
                        self._pinned.add(slot)
                        slots[i] = slot
                        continue
                    slot = self._alloc()
                    if uid is None:
                        uid = self.new_uid()
                        if isinstance(crop, BankedCrop):
                            crop.uid = uid
                    self._register(slot, uid)
                    slots[i] = slot
                    missing.append((i, crop))
                if missing:
                    from busca_tpu.utils.padding import next_pow2

                    h, w = self.crop_hw
                    m_pad = next_pow2(len(missing), min_bucket=8)
                    up = np.zeros((m_pad, h, w, 3), np.uint8)
                    up_slots = np.zeros(m_pad, np.int32)
                    for j, (i, crop) in enumerate(missing):
                        up[j] = crop
                        up_slots[j] = slots[i]
                    self._array = self._scatter(
                        self.array, jnp.asarray(up_slots), jnp.asarray(up)
                    )
            except Exception:
                # roll back slots registered but never (successfully)
                # uploaded — a later resolve must not cache-hit stale pixels.
                # Covers both the enumeration loop AND the batched upload
                # (e.g. a crop whose shape mismatches crop_hw raises in
                # `up[j] = crop` after its uid was registered).
                for i, _ in missing:
                    slot = int(slots[i])
                    uid = self._uid_at[slot]
                    if uid is not None:
                        del self._slot_of[uid]
                    self._uid_at[slot] = None
                    self._free.append(slot)
                raise
        finally:
            self._pinned.clear()
        return slots
