"""The association engine — TPU-native ``BUSCA.associate_embeddings``.

This is the single entry point every tracker strategy calls for the third
association round (busca/network.py:282-429).  Given unmatched tracks and the
frame's considered detections it returns a ``[T, D(+T)]`` probability matrix
plus a per-track reliability flag.

TPU-first structure:
- all tensor math (normalize, ReID, Transformer, softmax) runs in ONE jitted
  device call with **bucketed** track counts — the track batch is padded to
  the next bucket size so per-frame shape churn never recompiles
  (SURVEY.md §7.3.1); padded lanes carry ``sample_mask=0`` and are excluded
  from ReID BN statistics.
- memory/candidate *selection* (variable-length Python lists, argsorts,
  scatter into the global matrix) stays on host — it is tiny bookkeeping.

Reference semantics preserved exactly:
- memory sampling incl. ``use_broader_memory`` even-stride re-sampling
  (``_get_track_mem``, network.py:247-279) and the ``track.scale`` rescale.
- incomplete memories -> zero crops + dummy ``[250, 250, 500, 500]`` boxes,
  flagged unreliable (network.py:300-308).
- candidates: ``num_candidates`` nearest detections by center distance;
  missing slots -> zero crop + the ltwh sentinel box (network.py:329-355).
- the Kalman candidate replaces slot ``min(len(dets), C-1)``
  (network.py:363-380) with index ``D + t`` in the output matrix.
- ``select_highest_candidate`` / ``highest_candidate_minimum_thresh`` /
  ``keep_highest_value`` one-hot post-processing (network.py:415-422).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from busca_tpu.core import hostmath
from busca_tpu.models import encodings
from busca_tpu.models.busca import (
    BuscaConfig,
    BuscaModel,
    INPUT_PIXEL_MEAN_BGR,
    INPUT_PIXEL_STD_BGR,
)
from busca_tpu.utils.padding import next_pow2

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)

# reid_stats='auto' crossover: at or below this per-call track count ONE
# fused dispatch beats the frozen cached path's encode+score double
# dispatch.  Measured on v5e at d=30 (tools/exp_reid_auto.py, device-step
# cost, PARITY.md "Frozen-stats ReID / auto" table): fused wins only at
# T=1 (7.9 vs 8.9 ms); from T=2 the cached path wins (9.3 vs 11.9 ms,
# widening to 15.2 vs 107.9 ms at T=64).  Frozen BN numerics either way.
AUTO_FUSED_MAX_T = 1
INCOMPLETE_MEM_BBOX_TLWH = np.array([250.0, 250.0, 500.0, 500.0])


def _get_track_mem(track, seq_len: int, use_broader_memory: bool):
    """Memory sampling (network.py:247-279). Returns (crops list, ltwh [L,4])."""
    full = track.images_mem
    n = len(full)
    if use_broader_memory and n >= seq_len and seq_len > 1:
        sep = float(n - 1) / float(seq_len - 1)
        idx = [int(i * sep) for i in range(seq_len)]
        crops = [full[i] for i in idx]
        bboxes = [track.tlwh_mem[i] for i in idx]
    else:
        crops = full[-seq_len:]
        bboxes = track.tlwh_mem[-seq_len:]
    bboxes = np.array(bboxes, dtype=np.float64) * track.scale
    return crops, bboxes


def _dedup_gather(det_inds, start, end, c, b, unit_crop):
    """Unique-candidate bookkeeping shared by the bucketed dedup scorers:
    maps each (track, candidate slot) to a unique crop index (0 = the
    zero/missing crop) and counts slot occurrences as the BN multiplicity
    weights.  Returns (gather [b, c] int32, weights list, crops list with
    crops[0] = None for the zero crop)."""
    unit_to_idx = {}
    gather = np.zeros((b, c), dtype=np.int32)  # 0 = zero crop
    weights = [0.0]  # slot-occurrence counts; [0] = missing slots
    crops_list = [None]  # zero crop materialized by the caller
    for ti in range(start, end):
        for ci, di in enumerate(det_inds[ti]):
            if di is None:
                weights[0] += 1.0
                continue
            if di not in unit_to_idx:
                unit_to_idx[di] = len(crops_list)
                crops_list.append(unit_crop(di))
                weights.append(0.0)
            ui = unit_to_idx[di]
            gather[ti - start, ci] = ui
            weights[ui] += 1.0
    return gather, weights, crops_list


class AssociationEngine:
    """Bucketed, jitted BUSCA association."""

    def __init__(
        self,
        config: BuscaConfig,
        variables: dict,
        seq_len: int = 11,
        num_candidates: int = 5,
        crop_hw: Tuple[int, int] = (384, 128),
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        debug_dir: Optional[str] = None,
        dedup_candidates: bool = True,
        bank=None,
        reid_stats: str = "batch",
        feat_cache_slots: int = 16384,
        feat_bank: bool = True,
        auto_fused_max_t: int = AUTO_FUSED_MAX_T,
    ):
        if reid_stats not in ("batch", "frozen", "auto"):
            raise ValueError(f"reid_stats must be 'batch', 'frozen' or "
                             f"'auto', got {reid_stats!r}")
        if reid_stats in ("frozen", "auto"):
            # Opt-in deviation (PARITY.md "Frozen-stats ReID"): BN uses the
            # checkpoint's stored running statistics instead of the GHOST
            # batch-stat domain adaptation.  Features become batch-
            # independent, so they are cached across frames keyed by crop
            # uid — steady state re-encodes only the frame's NEW crops.
            if "batch_stats" not in variables:
                raise ValueError(
                    f"reid_stats={reid_stats!r} needs "
                    "variables['batch_stats'] (running BN statistics: "
                    "convert_busca_state_dict provides them from a .pth "
                    "checkpoint, or init the model with "
                    "reid_use_batch_stats=False)"
                )
            if debug_dir is not None:
                raise ValueError(
                    "the decision montage is not supported with "
                    f"reid_stats={reid_stats!r} (use the default batch "
                    "mode)"
                )
            import dataclasses as _dc

            config = _dc.replace(config, reid_use_batch_stats=False)
        self.reid_stats = reid_stats
        self.auto_fused_max_t = int(auto_fused_max_t)
        self.config = config
        self.model = BuscaModel(config)
        self.variables = variables
        self.seq_len = seq_len
        self.num_candidates = num_candidates
        self.crop_hw = crop_hw
        self.buckets = tuple(sorted(buckets))
        # Device-resident crop bank (assoc/bank.py): tracks' memory crops
        # stay in HBM and the scorer gathers them by slot index — the host
        # never re-assembles/re-uploads the [T, L, H, W, 3] memory tensor
        # (the reference re-ships it every call, network.py:293-398).
        if bank is not None and tuple(bank.crop_hw) != tuple(crop_hw):
            raise ValueError("bank crop_hw mismatch")
        self.bank = bank
        # Deduplicated candidate ReID: tracks share one detection pool, so
        # the [T, C] candidate batch is mostly repeats — run ReID once per
        # unique crop with multiplicity-weighted BN statistics (numerics
        # equal to the duplicated batch; see BuscaModel docstring).  The
        # duplicated path is kept for the A/B test and the debug montage.
        self.dedup_candidates = dedup_candidates
        # decision-montage debugging (reference network.py:234-242 renders
        # the memory/candidate montage with predicted probabilities when
        # visualization is enabled)
        self.debug_dir = debug_dir
        self._debug_count = 0

        mean = jnp.asarray(INPUT_PIXEL_MEAN_BGR)
        std = jnp.asarray(INPUT_PIXEL_STD_BGR)

        model = self.model

        def mvars(variables):
            # frozen/auto configs read BN running stats from the
            # batch_stats collection; batch mode has none to pass
            if "batch_stats" in variables:
                return {"params": variables["params"],
                        "batch_stats": variables["batch_stats"]}
            return {"params": variables["params"]}

        def prep(x, normalize_ims):
            x = x.astype(jnp.float32)
            if normalize_ims:
                x = (x / 255.0 - mean) / std
            return x[..., ::-1]  # BGR -> RGB (network.py:396-398)

        @functools.partial(jax.jit, static_argnames=("normalize_ims",))
        def _score(variables, mem_crops, can_crops, mem_boxes, can_boxes,
                   mask, normalize_ims=True):
            """crops: uint8 (or float) BGR HWC; boxes: ltrb f32; mask: [T]."""
            logits = model.apply(
                mvars(variables),
                prep(mem_crops, normalize_ims),
                prep(can_crops, normalize_ims),
                mem_boxes,
                can_boxes,
                mask,
            )
            return jax.nn.softmax(logits, axis=-1)

        self._score = _score

        @functools.partial(jax.jit, static_argnames=("normalize_ims",))
        def _score_unique(variables, mem_crops, uniq_can_crops, can_weights,
                          can_gather, mem_boxes, can_boxes, mask,
                          normalize_ims=True):
            """Dedup mode: unique candidate crops [U] + occurrence weights +
            per-slot gather indices [T, C]."""
            logits = model.apply(
                mvars(variables),
                prep(mem_crops, normalize_ims),
                prep(uniq_can_crops, normalize_ims),
                mem_boxes,
                can_boxes,
                mask,
                can_weights=can_weights,
                can_gather=can_gather,
            )
            return jax.nn.softmax(logits, axis=-1)

        self._score_unique = _score_unique

        @functools.partial(
            jax.jit, static_argnames=("normalize_ims", "num_groups")
        )
        def _score_unique_grouped(variables, mem_crops, uniq_can_crops,
                                  can_weights, can_gather, mem_boxes,
                                  can_boxes, mask, mem_group, can_group,
                                  num_groups, normalize_ims=True):
            """Multi-request batch: several independent association calls
            in one forward, BN statistics per (request, mem|can) group."""
            logits = model.apply(
                mvars(variables),
                prep(mem_crops, normalize_ims),
                prep(uniq_can_crops, normalize_ims),
                mem_boxes,
                can_boxes,
                mask,
                can_weights=can_weights,
                can_gather=can_gather,
                mem_group=mem_group,
                can_group=can_group,
                num_groups=num_groups,
            )
            return jax.nn.softmax(logits, axis=-1)

        self._score_unique_grouped = _score_unique_grouped

        @functools.partial(jax.jit, static_argnames=("normalize_ims",))
        def _score_unique_banked(variables, bank_arr, mem_slots, uniq_slots,
                                 can_weights, can_gather, mem_boxes,
                                 can_boxes, mask, normalize_ims=True):
            """Banked dedup mode: crops gathered from the HBM bank by slot
            index (slot 0 = the zero crop)."""
            logits = model.apply(
                mvars(variables),
                prep(bank_arr[mem_slots], normalize_ims),
                prep(bank_arr[uniq_slots], normalize_ims),
                mem_boxes,
                can_boxes,
                mask,
                can_weights=can_weights,
                can_gather=can_gather,
            )
            return jax.nn.softmax(logits, axis=-1)

        self._score_unique_banked = _score_unique_banked

        @functools.partial(
            jax.jit, static_argnames=("normalize_ims", "num_groups")
        )
        def _score_unique_grouped_banked(variables, bank_arr, mem_slots,
                                         uniq_slots, can_weights, can_gather,
                                         mem_boxes, can_boxes, mask,
                                         mem_group, can_group, num_groups,
                                         normalize_ims=True):
            logits = model.apply(
                mvars(variables),
                prep(bank_arr[mem_slots], normalize_ims),
                prep(bank_arr[uniq_slots], normalize_ims),
                mem_boxes,
                can_boxes,
                mask,
                can_weights=can_weights,
                can_gather=can_gather,
                mem_group=mem_group,
                can_group=can_group,
                num_groups=num_groups,
            )
            return jax.nn.softmax(logits, axis=-1)

        self._score_unique_grouped_banked = _score_unique_grouped_banked

        # ------------------------------------------------- frozen-stats mode --
        if reid_stats in ("frozen", "auto"):
            from collections import OrderedDict

            from busca_tpu.models.reid import ReIDResNet

            # uid-keyed LRU of encoded features.  With the device feature
            # bank (feat_bank=True, default) the LRU maps uid -> HBM slot
            # index and the features live in a [cap, F] f32 device array
            # (16384 slots at F=512 ≈ 32 MB HBM); with feat_bank=False the
            # LRU stores the [F] f32 vectors on host (≈ 32 MB host RAM).
            self._feat_cache: "OrderedDict" = OrderedDict()
            self._feat_cache_cap = int(feat_cache_slots)
            h, w = crop_hw
            self._zero_crop = np.zeros((h, w, 3), np.uint8)

            reid_frozen = ReIDResNet(
                layers=config.reid_layers,
                num_classes=config.reid_num_classes,
                use_batch_stats=False,
                dtype=jnp.dtype(config.dtype),
            )

            @functools.partial(jax.jit, static_argnames=("normalize_ims",))
            def _encode(variables, crops, normalize_ims=True):
                """uint8 BGR crops [N, h, w, 3] -> L2-normalized feats
                [N, F] (torch eval-mode BN: per-sample, batch-independent)."""
                _, feats = reid_frozen.apply(
                    {
                        "params": variables["params"]["reid_encoder"],
                        "batch_stats":
                            variables["batch_stats"]["reid_encoder"],
                    },
                    prep(crops, normalize_ims),
                )
                return feats

            self._encode = _encode

            @jax.jit
            def _score_feats(variables, mem_feats, can_feats, mem_boxes,
                             can_boxes, mask):
                """Decision forward from precomputed ReID features:
                [B, L, F] memory + [B, C, F] candidate feats -> probs."""
                logits = model.apply(
                    mvars(variables),
                    None,
                    None,
                    mem_boxes,
                    can_boxes,
                    mask,
                    mem_feats=mem_feats,
                    can_feats=can_feats,
                )
                return jax.nn.softmax(logits, axis=-1)

            self._score_feats = _score_feats

            # Device-resident FEATURE bank (default): cached features live
            # in a [cap, F] f32 HBM array and the host LRU maps crop uid ->
            # slot index.  Per third round the engine dispatches (at most)
            # two ASYNC programs — encode-the-fresh-crops + scatter into the
            # bank, then gather-by-slot + score — and blocks only on the
            # final probs fetch.  The host-cache path above (feat_bank=
            # False) pays a blocking device->host fetch of the encoded
            # features plus a per-call re-upload of every gathered feature;
            # here features never leave HBM.  Same numerics by
            # construction (same _encode outputs, scatter/gather is exact);
            # capacity/eviction affect speed, never results — pinned by
            # tests/test_engine_frozen.py.  Slot 0 is scratch: encode-batch
            # padding rows scatter there and score-batch padding rows
            # gather from it (padded lanes are masked out and the feats
            # scorer has no cross-row coupling, so scratch values are
            # inert).
            self._feat_bank = bool(feat_bank)
            if self._feat_bank:
                self._slot_of: "OrderedDict" = OrderedDict()
                self._free_slots = list(
                    range(self._feat_cache_cap - 1, 0, -1)
                )
                self._bank = None  # lazy [cap, F] f32 device zeros
                self._bank_gen = 0  # bumped by _reset_bank (recovery)

                @functools.partial(
                    jax.jit,
                    static_argnames=("normalize_ims",),
                    donate_argnums=(1,),
                )
                def _encode_scatter(variables, bank, crops, slots,
                                    normalize_ims=True):
                    """Encode uint8 crops [m, h, w, 3] and scatter the
                    features into the donated bank at ``slots`` [m]."""
                    feats = _encode(variables, crops,
                                    normalize_ims=normalize_ims)
                    return bank.at[slots].set(feats.astype(bank.dtype))

                self._encode_scatter = _encode_scatter

                @jax.jit
                def _score_bank(variables, bank, mem_slots, can_slots,
                                mem_boxes, can_boxes, mask):
                    """Feats scorer fed by bank gathers: ``mem_slots``
                    [B, L] / ``can_slots`` [B, C] index the bank rows."""
                    logits = model.apply(
                        mvars(variables),
                        None,
                        None,
                        mem_boxes,
                        can_boxes,
                        mask,
                        mem_feats=bank[mem_slots],
                        can_feats=bank[can_slots],
                    )
                    return jax.nn.softmax(logits, axis=-1)

                self._score_bank = _score_bank

    @property
    def banked(self) -> bool:
        """Whether scoring ships bank slot indices instead of pixel tensors
        (requires dedup mode; the debug montage needs the pixels on host).
        Frozen mode never gathers pixels on device — it ships features."""
        return (
            self.bank is not None
            and self.dedup_candidates
            and self.debug_dir is None
            and self.reid_stats not in ("frozen", "auto")
        )

    @property
    def _keep_mem_lists(self) -> bool:
        """Request prep keeps per-track crop LISTS (not one stacked array)
        when per-crop identity matters: banked pixel gather or the frozen
        feature cache."""
        return self.banked or self.reid_stats in ("frozen", "auto")

    # ------------------------------------------------------------------ api --
    def associate(
        self,
        tracks: Sequence,
        dets: Sequence,
        dists_matrix: Optional[np.ndarray] = None,
        *,
        use_broader_memory: bool = True,
        select_highest_candidate: bool = True,
        highest_candidate_minimum_thresh: Optional[float] = None,
        keep_highest_value: bool = False,
        extra_kalman_candidates: Sequence = (),
        normalize_ims: bool = True,
    ):
        """Returns (probs_matrix [T, D(+T)], reliable [T]) or (None, None)."""
        req = self._prep_request(
            tracks, dets, dists_matrix,
            use_broader_memory=use_broader_memory,
            extra_kalman_candidates=extra_kalman_candidates,
        )
        if req is None:
            return None, None
        probs = self._score_prepped(req, normalize_ims)
        (_, _, reliable, det_inds, _, _, num_available, d_count, _) = req
        return self._postprocess(
            probs, reliable, det_inds, num_available,
            d_count + len(extra_kalman_candidates),
            select_highest_candidate=select_highest_candidate,
            highest_candidate_minimum_thresh=highest_candidate_minimum_thresh,
            keep_highest_value=keep_highest_value,
        )

    def _score_prepped(self, req, normalize_ims) -> np.ndarray:
        """Score one prepped request (dedup or duplicated path)."""
        (mem_crops, mem_boxes, reliable, det_inds, can_boxes, unit_crop,
         num_available, d_count, t_count) = req
        if self.reid_stats in ("frozen", "auto"):
            if self.reid_stats == "auto" and \
                    t_count <= self.auto_fused_max_t:
                # tiny call: ONE fused dispatch beats the cached path's
                # encode+scorer double dispatch (measured crossover,
                # AUTO_FUSED_MAX_T).  BN runs on stored running stats in
                # both paths, so numerics are mode-identical either way.
                return self._score_bucketed_unique(
                    self._stack_mem_lists(mem_crops), det_inds, unit_crop,
                    mem_boxes, can_boxes, normalize_ims,
                )
            if self._feat_bank:
                ctx = self._new_bank_ctx()
                try:
                    mem_slots, can_slots = self._frozen_request_slots(
                        mem_crops, det_inds, unit_crop, normalize_ims, ctx
                    )
                    self._flush_fresh(ctx, normalize_ims)
                    probs = self._score_bank_chunked(
                        mem_slots, can_slots, mem_boxes, can_boxes
                    )
                except Exception:
                    if ctx["flushed"]:
                        # failure after the scatter dispatched: the bank's
                        # runtime state is unknowable — drop it (speed-only)
                        self._reset_bank()
                    self._rollback_ctx(ctx)
                    raise
                self._release_ephemeral(ctx)
                return probs  # [T, c + extras]
            mem_feats, can_feats = self._frozen_request_feats(
                mem_crops, det_inds, unit_crop, normalize_ims
            )
            return self._score_feats_chunked(
                mem_feats, can_feats, mem_boxes, can_boxes
            )  # [T, c + extras]
        if self.banked:
            return self._score_bucketed_unique_b(
                mem_crops, det_inds, unit_crop, mem_boxes, can_boxes,
                normalize_ims,
            )  # [T, c + extras]
        if self.dedup_candidates and self.debug_dir is None:
            return self._score_bucketed_unique(
                mem_crops, det_inds, unit_crop, mem_boxes, can_boxes,
                normalize_ims,
            )  # [T, c + extras]
        c = self.num_candidates
        h, w = self.crop_hw
        can_crops = np.zeros((t_count, c, h, w, 3), dtype=np.uint8)
        for ti in range(t_count):
            for ci, di in enumerate(det_inds[ti]):
                if di is not None:
                    can_crops[ti, ci] = unit_crop(di)
        probs = self._score_bucketed(
            mem_crops, can_crops, mem_boxes, can_boxes, normalize_ims
        )
        if self.debug_dir is not None:
            self._write_debug_montage(mem_crops, can_crops, probs)
        return probs

    def associate_many(
        self,
        requests: Sequence,
        *,
        use_broader_memory: bool = True,
        select_highest_candidate: bool = True,
        highest_candidate_minimum_thresh: Optional[float] = None,
        keep_highest_value: bool = False,
        normalize_ims: bool = True,
    ):
        """Batch several INDEPENDENT association calls into one forward.

        ``requests``: sequence of ``(tracks, dets, dists_matrix_or_None,
        extra_kalman_candidates)`` — e.g. one request per lockstep sequence.
        Per-request BN groups keep every request's numerics equal to its own
        standalone :meth:`associate` call (see BuscaModel ``mem_group``).

        Returns one ``(probs_matrix, reliable)`` (or ``(None, None)``) per
        request, in order.
        """
        results = [(None, None)] * len(requests)
        preps = []
        for i, (tracks, dets, dists, kal) in enumerate(requests):
            req = self._prep_request(
                tracks, dets, dists,
                use_broader_memory=use_broader_memory,
                extra_kalman_candidates=kal,
            )
            if req is not None:
                preps.append((i, req, len(dets) + len(kal)))
        if not preps:
            return results

        post_kw = dict(
            select_highest_candidate=select_highest_candidate,
            highest_candidate_minimum_thresh=highest_candidate_minimum_thresh,
            keep_highest_value=keep_highest_value,
        )

        t_total = sum(p[1][8] for p in preps)
        frozen_like = self.reid_stats == "frozen" or (
            self.reid_stats == "auto"
            and t_total > self.auto_fused_max_t
        )
        if frozen_like:
            # Frozen features have no BN coupling between requests, so the
            # multi-request batch needs none of the grouped-BN machinery:
            # concatenate every request's feature batch and run the feats
            # scorer once (chunked by bucket).  Numerics equal per-request
            # standalone calls by construction.
            ctx = self._new_bank_ctx() if self._feat_bank else None
            mem_f, can_f, mem_b, can_b, spans = [], [], [], [], []
            try:
                for i, req, ndt in preps:
                    (m_crops, m_boxes, reliable, det_inds, can_boxes,
                     unit_crop, num_avail, _d_count, t_count) = req
                    if ctx is not None:
                        mf, cf = self._frozen_request_slots(
                            m_crops, det_inds, unit_crop, normalize_ims, ctx
                        )
                    else:
                        mf, cf = self._frozen_request_feats(
                            m_crops, det_inds, unit_crop, normalize_ims
                        )
                    mem_f.append(mf)
                    can_f.append(cf)
                    mem_b.append(m_boxes)
                    can_b.append(can_boxes)
                    spans.append(
                        (i, t_count, reliable, det_inds, num_avail, ndt)
                    )
                if ctx is not None:
                    self._flush_fresh(ctx, normalize_ims)
                    probs = self._score_bank_chunked(
                        np.concatenate(mem_f),
                        np.concatenate(can_f),
                        np.concatenate(mem_b),
                        np.concatenate(can_b),
                    )
                else:
                    probs = self._score_feats_chunked(
                        np.concatenate(mem_f),
                        np.concatenate(can_f),
                        np.concatenate(mem_b),
                        np.concatenate(can_b),
                    )
            except Exception:
                if ctx is not None:
                    if ctx["flushed"]:
                        self._reset_bank()
                    self._rollback_ctx(ctx)
                raise
            if ctx is not None:
                self._release_ephemeral(ctx)
            row = 0
            for i, t_count, reliable, det_inds, num_avail, ndt in spans:
                results[i] = self._postprocess(
                    probs[row:row + t_count], reliable, det_inds,
                    num_avail, ndt, **post_kw,
                )
                row += t_count
            return results

        if (
            self.reid_stats == "auto"  # below the crossover: fused per-
            # request dispatches beat the cached path (_score_prepped
            # applies the same policy; frozen BN numerics either way)
            or len(preps) == 1
            or t_total > self.buckets[-1]
            or not self.dedup_candidates
            or self.debug_dir is not None
        ):
            # one live request / oversized batch / non-dedup mode / tiny
            # auto batch: score the already-prepped requests individually
            # (no duplicate prep work)
            for i, req, ndt in preps:
                probs = self._score_prepped(req, normalize_ims)
                (_, _, reliable, det_inds, _, _, num_avail, _, _) = req
                results[i] = self._postprocess(
                    probs, reliable, det_inds, num_avail, ndt, **post_kw
                )
            return results

        seq_len, c = self.seq_len, self.num_candidates
        h, w = self.crop_hw
        b = self._bucket(t_total)
        r = len(preps)
        r_pad = next_pow2(r)

        banked = self.banked
        if banked:
            mem_entries_flat: List[Optional[list]] = []
        else:
            mem_crops = np.zeros((b, seq_len, h, w, 3), np.uint8)
        mem_boxes = np.zeros((b, seq_len, 4), np.float32)
        can_boxes_all = np.zeros((b, c, 4), np.float32)
        mask = np.zeros(b, np.float32)
        mem_group = np.zeros(b, np.int32)
        gather = np.zeros((b, c), np.int32)

        # per-request unique candidate units; every request gets its OWN
        # zero "missing slot" entry so its weight lands in that request's
        # BN group (in banked mode the zero unit keeps its weight row but
        # maps to the bank's zero slot)
        uniq_crops: List[Optional[np.ndarray]] = []
        uniq_weights: List[float] = []
        uniq_group: List[int] = []
        row = 0
        spans = []
        for slot, (i, req, ndt) in enumerate(preps):
            (m_crops, m_boxes, reliable, det_inds, can_boxes, unit_crop,
             num_available, d_count, t_count) = req
            zero_idx = len(uniq_crops)
            uniq_crops.append(None if banked else np.zeros((h, w, 3), np.uint8))
            uniq_weights.append(0.0)
            uniq_group.append(slot)
            unit_to_idx = {}
            for ti in range(t_count):
                for ci, di in enumerate(det_inds[ti]):
                    if di is None:
                        uniq_weights[zero_idx] += 1.0
                        gather[row + ti, ci] = zero_idx
                        continue
                    if di not in unit_to_idx:
                        unit_to_idx[di] = len(uniq_crops)
                        uniq_crops.append(unit_crop(di))
                        uniq_weights.append(0.0)
                        uniq_group.append(slot)
                    ui = unit_to_idx[di]
                    gather[row + ti, ci] = ui
                    uniq_weights[ui] += 1.0
            if banked:
                mem_entries_flat.extend(m_crops)
            else:
                mem_crops[row:row + t_count] = m_crops
            mem_boxes[row:row + t_count] = m_boxes
            can_boxes_all[row:row + t_count] = can_boxes
            mask[row:row + t_count] = 1.0
            mem_group[row:row + t_count] = slot
            spans.append((i, row, t_count, reliable, det_inds,
                          num_available, ndt))
            row += t_count

        u = len(uniq_crops)
        u_pad = next_pow2(u, min_bucket=8)
        w_arr = np.zeros(u_pad, np.float32)
        w_arr[:u] = uniq_weights
        g_arr = np.zeros(u_pad, np.int32)
        g_arr[:u] = uniq_group

        if banked:
            flat: list = []
            for e in mem_entries_flat:
                flat.extend(e if e is not None else [None] * seq_len)
            flat.extend(uniq_crops)
            slots = self.bank.resolve(flat)
            n_mem = row * seq_len
            mem_slots = np.zeros((b, seq_len), np.int32)
            mem_slots[:row] = slots[:n_mem].reshape(row, seq_len)
            uniq_slots = np.zeros(u_pad, np.int32)
            uniq_slots[:u] = slots[n_mem:]
            probs = np.asarray(
                self._score_unique_grouped_banked(
                    self.variables,
                    self.bank.array,
                    jnp.asarray(mem_slots),
                    jnp.asarray(uniq_slots),
                    jnp.asarray(w_arr),
                    jnp.asarray(gather),
                    jnp.asarray(mem_boxes),
                    jnp.asarray(can_boxes_all),
                    jnp.asarray(mask),
                    jnp.asarray(mem_group),
                    jnp.asarray(g_arr),
                    num_groups=r_pad,
                    normalize_ims=normalize_ims,
                )
            )
        else:
            uniq = np.zeros((u_pad, h, w, 3), np.uint8)
            uniq[:u] = np.stack(uniq_crops)
            probs = np.asarray(
                self._score_unique_grouped(
                    self.variables,
                    jnp.asarray(mem_crops),
                    jnp.asarray(uniq),
                    jnp.asarray(w_arr),
                    jnp.asarray(gather),
                    jnp.asarray(mem_boxes),
                    jnp.asarray(can_boxes_all),
                    jnp.asarray(mask),
                    jnp.asarray(mem_group),
                    jnp.asarray(g_arr),
                    num_groups=r_pad,
                    normalize_ims=normalize_ims,
                )
            )
        for i, row0, t_count, reliable, det_inds, num_available, ndt in spans:
            results[i] = self._postprocess(
                probs[row0:row0 + t_count], reliable, det_inds,
                num_available, ndt, **post_kw,
            )
        return results

    def _prep_request(
        self,
        tracks: Sequence,
        dets: Sequence,
        dists_matrix: Optional[np.ndarray] = None,
        *,
        use_broader_memory: bool = True,
        extra_kalman_candidates: Sequence = (),
    ):
        """Host-side request prep shared by associate/associate_many.

        Returns (mem_crops, mem_boxes, reliable, det_inds, can_boxes,
        unit_crop, num_available, d_count, t_count) or None for an empty
        request."""
        if len(tracks) == 0:
            return None
        if len(dets) == 0 and len(extra_kalman_candidates) == 0:
            return None

        if dists_matrix is None:
            dists_matrix = self._center_distances(tracks, dets)

        seq_len, c = self.seq_len, self.num_candidates
        h, w = self.crop_hw
        t_count = len(tracks)
        d_count = len(dets)

        keep_lists = self._keep_mem_lists
        if keep_lists:
            # mem crops stay as per-track host-mirror lists; the scorer
            # gathers them from the device bank by slot — or resolves them
            # through the frozen feature cache (None = zero memory)
            mem_crops: list = [None] * t_count
        else:
            mem_crops = np.zeros((t_count, seq_len, h, w, 3), dtype=np.uint8)
        mem_boxes = np.zeros((t_count, seq_len, 4), dtype=np.float64)
        reliable = np.zeros(t_count, dtype=bool)
        for ti, track in enumerate(tracks):
            crops, bboxes = _get_track_mem(track, seq_len, use_broader_memory)
            if len(crops) == seq_len:
                reliable[ti] = True
                mem_crops[ti] = crops if keep_lists else np.stack(crops)
                mem_boxes[ti] = bboxes
            else:
                mem_boxes[ti] = INCOMPLETE_MEM_BBOX_TLWH  # zero crops stay

        can_boxes = np.tile(
            encodings.missing_candidate_bbox("ltwh"), (t_count, c, 1)
        )
        det_inds: List[List[Optional[int]]] = []
        num_available = min(d_count, c)
        for ti in range(t_count):
            order = np.argsort(dists_matrix[ti])[:c].tolist() if d_count else []
            order += [None] * (c - len(order))
            det_inds.append(order)
            for ci, di in enumerate(order):
                if di is None:
                    continue
                det = dets[di]
                can_boxes[ti, ci] = (
                    np.asarray(det.tlwh_mem[-1], dtype=np.float64) * det.scale
                )

        if len(extra_kalman_candidates) > 0:
            num_available = min(d_count + 1, c)
            k_slot = min(d_count, c - 1)
            for ti, kdet in enumerate(extra_kalman_candidates):
                det_inds[ti][k_slot] = d_count + ti
                can_boxes[ti, k_slot] = np.asarray(kdet.tlwh) * kdet.scale

        def unit_crop(idx: int) -> np.ndarray:
            """Candidate-unit crop: detection index or d_count+ti = Kalman."""
            if idx < d_count:
                return dets[idx].images_mem[-1]
            return extra_kalman_candidates[idx - d_count].images_mem[-1]

        # tlwh -> ltrb (network.py:391-394)
        mem_boxes = hostmath.tlwh_to_tlbr(mem_boxes).astype(np.float32)
        can_boxes = hostmath.tlwh_to_tlbr(can_boxes).astype(np.float32)
        return (mem_crops, mem_boxes, reliable, det_inds, can_boxes,
                unit_crop, num_available, d_count, t_count)

    @staticmethod
    def _postprocess(
        probs, reliable, det_inds, num_available, num_dets_total,
        *,
        select_highest_candidate: bool = True,
        highest_candidate_minimum_thresh: Optional[float] = None,
        keep_highest_value: bool = False,
    ):
        """Scatter per-track probabilities into the global [T, D(+T)]
        matrix with the one-hot post-processing (network.py:407-429)."""
        t_count = probs.shape[0]
        probs_matrix = np.zeros((t_count, num_dets_total))
        for ti in range(t_count):
            track_probs = probs[ti]
            if select_highest_candidate:
                new = np.zeros_like(track_probs)
                mt = highest_candidate_minimum_thresh
                if mt is None or mt == 0 or track_probs.max() >= mt:
                    new[track_probs.argmax()] = (
                        track_probs.max() if keep_highest_value else 1.0
                    )
                track_probs = new
            inds = det_inds[ti][:num_available]
            probs_matrix[ti, inds] = track_probs[:num_available]
        return probs_matrix, reliable

    def _write_debug_montage(self, mem_crops, can_crops, probs):
        """Dump the decision montage for this association call
        (network.py:234-242 / visualization.py create_batch_image)."""
        import os

        import cv2

        from busca_tpu.viz import create_batch_image

        montage = create_batch_image(mem_crops, can_crops, probs)
        os.makedirs(self.debug_dir, exist_ok=True)
        path = os.path.join(
            self.debug_dir, f"decision_{self._debug_count:06d}.jpg"
        )
        cv2.imwrite(path, montage)
        self._debug_count += 1

    def center_distances(self, tracks, dets) -> np.ndarray:
        """Center-distance matrix from track/det current boxes
        (busca/tracking.py:23-60, called at byte_tracker.py:489) — the
        candidate-selection distance every strategy's third round uses."""
        if len(tracks) == 0 or len(dets) == 0:
            return np.zeros((len(tracks), len(dets)))
        a = np.stack([t.tlbr for t in tracks])
        b = np.stack([d.tlbr for d in dets])
        return hostmath.center_distance(a, b)

    # backwards-compatible private alias
    _center_distances = center_distances

    def _bucket(self, t: int) -> int:
        for b in self.buckets:
            if t <= b:
                return b
        return self.buckets[-1]

    # -------------------------------------------------- frozen-stats scoring --
    def _resolve_feats(self, units, normalize_ims) -> np.ndarray:
        """Features for a list of ``(uid_or_None, crop_or_None)`` units.

        ``crop=None`` means the zero crop (missing slot / incomplete
        memory) — its frozen feature is f(zero image), cached under key 0
        like the reference's zero-image forwards (network.py:300-308,
        352-355).  Cached uids hit the LRU; the rest are encoded in ONE
        bucketed device call and inserted.  Untagged crops (uid None) are
        encoded fresh every time — production crops are always tagged
        (trackers/base.py batch_crops)."""
        n = len(units)
        f_dim = self.config.dim_embedding
        out = np.zeros((n, f_dim), np.float32)
        cache = self._feat_cache
        enc_crops: list = []
        enc_keys: list = []
        enc_pos: List[List[int]] = []
        pending = {}  # cache key -> row in enc_crops
        for i, (uid, crop) in enumerate(units):
            if crop is None:
                uid, crop = 0, self._zero_crop
            key = None if uid is None else (uid, bool(normalize_ims))
            if key is not None:
                hit = cache.get(key)
                if hit is not None:
                    cache.move_to_end(key)
                    out[i] = hit
                    continue
                j = pending.get(key)
                if j is not None:
                    enc_pos[j].append(i)
                    continue
                pending[key] = len(enc_crops)
            enc_keys.append(key)
            enc_pos.append([i])
            enc_crops.append(crop)
        if enc_crops:
            h, w = self.crop_hw
            m = next_pow2(len(enc_crops), min_bucket=8)
            batch = np.zeros((m, h, w, 3), np.uint8)
            for j, cr in enumerate(enc_crops):
                batch[j] = cr
            feats = np.asarray(
                self._encode(
                    self.variables, jnp.asarray(batch),
                    normalize_ims=bool(normalize_ims),
                )
            )
            for j, key in enumerate(enc_keys):
                f = feats[j]
                for i in enc_pos[j]:
                    out[i] = f
                if key is not None:
                    cache[key] = f
                    if len(cache) > self._feat_cache_cap:
                        cache.popitem(last=False)
        return out

    def _frozen_request_feats(self, mem_entries, det_inds, unit_crop,
                              normalize_ims):
        """One request's feature batches: ``([T, L, F], [T, C, F])``.

        Memory crops hit the cross-frame cache (they were encoded when they
        first appeared as detections); candidates are deduplicated across
        tracks before encoding, then expanded per slot on host."""
        t_count = len(mem_entries)
        seq_len, c = self.seq_len, self.num_candidates
        units: list = []
        for e in mem_entries:
            if e is None:
                units.extend([(0, None)] * seq_len)
            else:
                units.extend(
                    [(getattr(cr, "uid", None), cr) for cr in e]
                )
        unit_to_row = {}
        can_units: list = [(0, None)]  # row 0 = the zero crop
        gather = np.zeros((t_count, c), np.int64)
        for ti in range(t_count):
            for ci, di in enumerate(det_inds[ti]):
                if di is None:
                    continue  # gather stays 0 -> zero-crop feature
                row = unit_to_row.get(di)
                if row is None:
                    crop = unit_crop(di)
                    row = len(can_units)
                    unit_to_row[di] = row
                    can_units.append((getattr(crop, "uid", None), crop))
                gather[ti, ci] = row
        feats = self._resolve_feats(units + can_units, normalize_ims)
        n_mem = t_count * seq_len
        mem_feats = feats[:n_mem].reshape(t_count, seq_len, -1)
        can_feats = feats[n_mem:][gather]  # [T, C, F]
        return mem_feats, can_feats

    # ------------------------------------------ frozen device feature bank --
    def _new_bank_ctx(self) -> dict:
        """Per-call bank context: fresh crops to encode, their target
        slots, ephemeral (untagged-crop) slots to release after the call,
        the keys referenced by the call (protected from eviction), the
        keys REGISTERED by the call (rolled back if it fails before its
        scatter dispatches), and the bank generation it was built against."""
        return {"fresh_crops": [], "fresh_slots": [], "ephemeral": [],
                "referenced": set(), "new_keys": [], "flushed": False,
                "gen": self._bank_gen}

    def _reset_bank(self):
        """Drop the bank and every registration — the recovery path after
        a failed scatter (the donated input buffer is invalidated even
        when the program errors, so the old bank is unusable).  Purely a
        speed event: every feature re-encodes deterministically on the
        next call."""
        self._bank = None
        self._slot_of.clear()
        self._free_slots = list(range(self._feat_cache_cap - 1, 0, -1))
        self._bank_gen += 1

    def _rollback_ctx(self, ctx):
        """Undo a failed call's registrations: keys registered by this
        call would otherwise cache-hit never-written bank rows (the same
        discipline as DeviceCropBank.put_device's rollback)."""
        if ctx["gen"] != self._bank_gen:
            # the bank was reset underneath this call — registrations and
            # slot ids are already gone / reclaimed
            ctx["new_keys"].clear()
            ctx["ephemeral"].clear()
            return
        for key, slot in ctx["new_keys"]:
            if self._slot_of.get(key) == slot:
                del self._slot_of[key]
                self._free_slots.append(slot)
        ctx["new_keys"].clear()
        self._release_ephemeral(ctx)

    def _alloc_slot(self, ctx) -> int:
        if self._free_slots:
            return self._free_slots.pop()
        # evict the least-recently-used key NOT referenced by this call —
        # an in-flight call's gather indices must stay valid until its
        # score dispatch
        referenced = ctx["referenced"]
        for key in self._slot_of:
            if key not in referenced:
                return self._slot_of.pop(key)
        raise RuntimeError(
            "feature bank exhausted: one call references more than "
            f"{self._feat_cache_cap - 1} distinct crops — raise "
            "feat_cache_slots"
        )

    def _slot_for(self, uid, crop, normalize_flag: bool, ctx) -> int:
        """Bank slot for one unit; queues a fresh encode on a miss.
        ``crop=None`` = the zero crop (cached under uid 0, like the host
        path)."""
        if crop is None:
            uid = 0
        key = None if uid is None else (uid, normalize_flag)
        slots = self._slot_of
        if key is not None:
            s = slots.get(key)
            if s is not None:
                slots.move_to_end(key)
                ctx["referenced"].add(key)
                return s
        s = self._alloc_slot(ctx)
        ctx["fresh_crops"].append(
            self._zero_crop if crop is None else crop
        )
        ctx["fresh_slots"].append(s)
        if key is None:
            # untagged crop: encoded for this call only, never recorded
            ctx["ephemeral"].append(s)
        else:
            slots[key] = s
            ctx["referenced"].add(key)
            ctx["new_keys"].append((key, s))
        return s

    def _frozen_request_slots(self, mem_entries, det_inds, unit_crop,
                              normalize_ims, ctx):
        """One request's bank gather maps: ``([T, L] i32, [T, C] i32)``.
        Mirrors :meth:`_frozen_request_feats` with slot indices instead of
        host feature rows."""
        t_count = len(mem_entries)
        seq_len, c = self.seq_len, self.num_candidates
        flag = bool(normalize_ims)
        zero_slot = self._slot_for(0, None, flag, ctx)
        mem_slots = np.full((t_count, seq_len), zero_slot, np.int32)
        for ti, e in enumerate(mem_entries):
            if e is None:
                continue  # incomplete memory -> zero-crop features
            for li, cr in enumerate(e):
                mem_slots[ti, li] = self._slot_for(
                    getattr(cr, "uid", None), cr, flag, ctx
                )
        can_slots = np.full((t_count, c), zero_slot, np.int32)
        unit_slot: dict = {}
        for ti in range(t_count):
            for ci, di in enumerate(det_inds[ti]):
                if di is None:
                    continue
                s = unit_slot.get(di)
                if s is None:
                    cr = unit_crop(di)
                    s = self._slot_for(
                        getattr(cr, "uid", None), cr, flag, ctx
                    )
                    unit_slot[di] = s
                can_slots[ti, ci] = s
        return mem_slots, can_slots

    def _bank_init(self):
        if self._bank is None:
            self._bank = jnp.zeros(
                (self._feat_cache_cap, self.config.dim_embedding),
                jnp.float32,
            )

    def _flush_fresh(self, ctx, normalize_ims):
        """ONE async encode+scatter dispatch for the call's fresh crops
        (bucketed; padding rows scatter to the scratch slot 0)."""
        crops = ctx["fresh_crops"]
        if not crops:
            return
        self._bank_init()
        h, w = self.crop_hw
        m = next_pow2(len(crops), min_bucket=8)
        batch = np.zeros((m, h, w, 3), np.uint8)
        for j, cr in enumerate(crops):
            batch[j] = cr
        slots = np.zeros(m, np.int32)
        slots[: len(crops)] = ctx["fresh_slots"]
        try:
            new_bank = self._encode_scatter(
                self.variables, self._bank, jnp.asarray(batch),
                jnp.asarray(slots), normalize_ims=bool(normalize_ims),
            )
        except Exception:
            # the donated bank buffer may already be invalidated — drop
            # everything; re-encodes are deterministic, so this only
            # costs speed
            self._reset_bank()
            raise
        self._bank = new_bank
        ctx["flushed"] = True

    def _chunked_scores(self, t_count, arrays, scorer) -> np.ndarray:
        """Shared chunk loop of the two frozen scorers: bucket-pad each
        ``arrays`` slice, build the sample mask, call ``scorer(*padded,
        mask)``, and trim/concatenate the probability rows."""
        max_b = self.buckets[-1]
        out = []
        for start in range(0, t_count, max_b):
            end = min(start + max_b, t_count)
            n = end - start
            b = self._bucket(n)
            pad = b - n

            def padded(x):
                if pad == 0:
                    return x[start:end]
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x[start:end], widths)

            mask = np.zeros(b, dtype=np.float32)
            mask[:n] = 1.0
            probs = scorer(
                *(jnp.asarray(padded(a)) for a in arrays),
                jnp.asarray(mask),
            )
            out.append(np.asarray(probs)[:n])
        return np.concatenate(out, axis=0)

    def _score_bank_chunked(self, mem_slots, can_slots, mem_boxes,
                            can_boxes) -> np.ndarray:
        """Bucket-pad the slot batch and run the bank scorer; padding rows
        gather the scratch slot (masked out, no cross-row coupling)."""
        self._bank_init()
        return self._chunked_scores(
            mem_slots.shape[0],
            (mem_slots, can_slots, mem_boxes, can_boxes),
            lambda *a: self._score_bank(self.variables, self._bank, *a),
        )

    def _release_ephemeral(self, ctx):
        # safe to recycle once the call's programs are DISPATCHED: device
        # programs execute in dispatch order, so a later scatter cannot
        # overtake this call's gathers.  No-op if the bank was reset
        # underneath the call (the reset already reclaimed every slot).
        if ctx["gen"] == self._bank_gen:
            self._free_slots.extend(ctx["ephemeral"])
        ctx["ephemeral"].clear()

    def _score_feats_chunked(self, mem_feats, can_feats, mem_boxes,
                             can_boxes) -> np.ndarray:
        """Bucket-pad the feature batch and run the feats scorer; chunk
        batches larger than the biggest bucket."""
        return self._chunked_scores(
            mem_feats.shape[0],
            (mem_feats, can_feats, mem_boxes, can_boxes),
            lambda *a: self._score_feats(self.variables, *a),
        )

    def _stack_mem_lists(self, mem_entries) -> np.ndarray:
        """Densify per-track crop LISTS (the frozen/auto prep format) into
        the ``[T, L, H, W, 3]`` array the fused scorers take.  ``None`` =
        incomplete memory -> zero crops (network.py:300-308)."""
        h, w = self.crop_hw
        t_count = len(mem_entries)
        out = np.zeros((t_count, self.seq_len, h, w, 3), np.uint8)
        for ti, entry in enumerate(mem_entries):
            if entry is not None:
                for li, cr in enumerate(entry):
                    out[ti, li] = cr
        return out

    def _score_bucketed_unique(
        self, mem_crops, det_inds, unit_crop, mem_boxes, can_boxes,
        normalize_ims,
    ) -> np.ndarray:
        """Dedup scoring: per chunk, gather the chunk's unique candidate
        units once, count slot occurrences as BN weights, and hand the
        jitted scorer [U_pad] unique crops + a [B, C] gather map.

        Index 0 of the unique array is the all-zero "missing slot" crop (the
        reference feeds a zero image for empty slots, network.py:352-355) —
        its weight is the number of missing slots so BN statistics equal the
        duplicated batch's exactly.
        """
        t_count = mem_crops.shape[0]
        c = can_boxes.shape[1]
        h, w = self.crop_hw
        max_b = self.buckets[-1]
        out = []
        for start in range(0, t_count, max_b):
            end = min(start + max_b, t_count)
            n = end - start
            b = self._bucket(n)
            pad = b - n

            # unique candidate units of this chunk
            gather, weights, crops_list = _dedup_gather(
                det_inds, start, end, c, b, unit_crop)

            u = len(crops_list)
            u_pad = next_pow2(u, min_bucket=8)
            uniq = np.zeros((u_pad, h, w, 3), dtype=np.uint8)
            for ui, crop in enumerate(crops_list[1:], start=1):
                uniq[ui] = crop
            w_arr = np.zeros(u_pad, dtype=np.float32)
            w_arr[:u] = weights

            def padded(x):
                if pad == 0:
                    return x[start:end]
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x[start:end], widths)

            mask = np.zeros(b, dtype=np.float32)
            mask[:n] = 1.0
            probs = self._score_unique(
                self.variables,
                jnp.asarray(padded(mem_crops)),
                jnp.asarray(uniq),
                jnp.asarray(w_arr),
                jnp.asarray(gather),
                jnp.asarray(padded(mem_boxes)),
                jnp.asarray(padded(can_boxes)),
                jnp.asarray(mask),
                normalize_ims=normalize_ims,
            )
            out.append(np.asarray(probs)[:n])
        return np.concatenate(out, axis=0)

    def _score_bucketed_unique_b(
        self, mem_entries, det_inds, unit_crop, mem_boxes, can_boxes,
        normalize_ims,
    ) -> np.ndarray:
        """Banked dedup scoring: one :meth:`DeviceCropBank.resolve` per chunk
        covers the chunk's memory crops AND its unique candidate units; the
        jitted scorer receives only slot indices (plus boxes/weights) and
        gathers pixels from HBM.  Numerics are identical to
        :meth:`_score_bucketed_unique` — the bank stores the same uint8
        crops the host mirrors hold.
        """
        t_count = len(mem_entries)
        seq_len = self.seq_len
        c = can_boxes.shape[1]
        max_b = self.buckets[-1]
        out = []
        for start in range(0, t_count, max_b):
            end = min(start + max_b, t_count)
            n = end - start
            b = self._bucket(n)
            pad = b - n

            # crops_list[0] = None maps to the bank's zero slot
            gather, weights, crops_list = _dedup_gather(
                det_inds, start, end, c, b, unit_crop)

            u = len(crops_list)
            u_pad = next_pow2(u, min_bucket=8)
            w_arr = np.zeros(u_pad, dtype=np.float32)
            w_arr[:u] = weights

            flat: list = []
            for ti in range(start, end):
                e = mem_entries[ti]
                flat.extend(e if e is not None else [None] * seq_len)
            flat.extend(crops_list[1:])
            slots = self.bank.resolve(flat)
            mem_slots = np.zeros((b, seq_len), np.int32)
            mem_slots[:n] = slots[: n * seq_len].reshape(n, seq_len)
            uniq_slots = np.zeros(u_pad, np.int32)
            uniq_slots[1:u] = slots[n * seq_len:]

            def padded(x):
                if pad == 0:
                    return x[start:end]
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x[start:end], widths)

            mask = np.zeros(b, dtype=np.float32)
            mask[:n] = 1.0
            probs = self._score_unique_banked(
                self.variables,
                self.bank.array,
                jnp.asarray(mem_slots),
                jnp.asarray(uniq_slots),
                jnp.asarray(w_arr),
                jnp.asarray(gather),
                jnp.asarray(padded(mem_boxes)),
                jnp.asarray(padded(can_boxes)),
                jnp.asarray(mask),
                normalize_ims=normalize_ims,
            )
            out.append(np.asarray(probs)[:n])
        return np.concatenate(out, axis=0)

    def _score_bucketed(
        self, mem_crops, can_crops, mem_boxes, can_boxes, normalize_ims
    ) -> np.ndarray:
        """Pad the track batch to a bucket and run the jitted scorer; chunk
        batches larger than the biggest bucket."""
        t_count = mem_crops.shape[0]
        max_b = self.buckets[-1]
        out = []
        for start in range(0, t_count, max_b):
            end = min(start + max_b, t_count)
            n = end - start
            b = self._bucket(n)
            pad = b - n

            def padded(x):
                if pad == 0:
                    return x[start:end]
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x[start:end], widths)

            mask = np.zeros(b, dtype=np.float32)
            mask[:n] = 1.0
            probs = self._score(
                self.variables,
                jnp.asarray(padded(mem_crops)),
                jnp.asarray(padded(can_crops)),
                jnp.asarray(padded(mem_boxes)),
                jnp.asarray(padded(can_boxes)),
                jnp.asarray(mask),
                normalize_ims=normalize_ims,
            )
            out.append(np.asarray(probs)[:n])
        return np.concatenate(out, axis=0)
