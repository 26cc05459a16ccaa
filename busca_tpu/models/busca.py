"""The BUSCA decision model: multi-choice QA over track memory vs candidates.

This is the TPU-native equivalent of the reference ``BUSCA`` module
(busca/network.py:11-507): given a batch of unmatched tracks, each with a
memory of past appearance crops + boxes and a set of candidate crops + boxes
(nearest detections plus the track's Kalman prediction), produce a probability
distribution over candidates (+ NON = "none of the above", + BAD = "corrupt
memory").

Design differences from the reference (all TPU-motivated):
- one fused jitted forward: crops -> ReID -> shared linear -> token assembly ->
  on-device closed-form 3-D positional encodings -> 4-layer post-LN
  Transformer -> CAN-position decoder.  No host round-trips.
- static shapes everywhere: batch = bucketed track count, ``seq_len`` memory
  tokens, ``num_candidates`` candidate slots.  Padded lanes are excluded from
  the ReID BatchNorm statistics via ``sample_mask`` so numerics match an
  unpadded reference batch.
- token layout is computed once at trace time (tuple indices), mirroring
  ``_assemble_input`` (busca/network.py:103-165).

Numerical contract preserved: shared ``encoder`` linear scaled by
``sqrt(d_model)`` (network.py:203-204), special tokens appended *after* the
encoder (network.py:127-136), decoder = LayerNorm + Linear(d,1) over CAN
positions (network.py:93-94, 222-232), ReID BN in batch-stat mode
(network.py:554-556) with memory and candidate crops normalized in *separate*
ReID batches (network.py:192-193).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from busca_tpu.models import encodings
from busca_tpu.models.reid import ReIDResNet
from busca_tpu.models.transformer import (
    TorchLinear,
    TransformerEncoder,
    get_activation,
)


@dataclasses.dataclass(frozen=True)
class BuscaConfig:
    """Transformer-section config (mirrors config/*/*/*.yml keys)."""

    num_layer: int = 4
    nhead: int = 4
    dim_embedding: int = 512
    trans_dim: int = 512
    ff_size: int = 1024
    activation: str = "gelu"
    dropout_p: float = 0.1
    input_flavour: str = "MEM-SEP-CAN-BAD"
    output_flavour: str = "CAN"
    encode_separator_as_reference: bool = True
    encode_special_tokens: bool = False
    reid_num_classes: int = 299
    # ResNet stage depths: (3, 4, 6, 3) = ResNet-50 (the shipped weights);
    # smaller variants for experimentation / cheap tests.
    reid_layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    # True = GHOST domain adaptation (BN normalizes with the CURRENT batch's
    # statistics, network.py:554-556) — the reference semantics and the
    # production default.  False = torch eval mode (stored running stats);
    # features become batch-independent, which unlocks cross-frame feature
    # caching (AssociationEngine reid_stats="frozen").  A conscious,
    # opt-in deviation — see PARITY.md "Frozen-stats ReID".
    reid_use_batch_stats: bool = True
    quantize_pe_fp16: bool = True
    dtype: str = "float32"

    @classmethod
    def from_dict(cls, d: dict) -> "BuscaConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        if "reid_layers" in kw:
            kw["reid_layers"] = tuple(kw["reid_layers"])
        return cls(**kw)

    @property
    def has_bad(self) -> bool:
        return "BAD" in self.input_flavour

    @property
    def has_cls(self) -> bool:
        """CLS-prefixed flavours prepend a learned token before the memory
        (busca/network.py:117-122).  NOTE: the reference's CLS path cannot
        actually run — its temporal-id assignment destroys the index tensor
        (``mem_inds = mem_inds[0] = 0``, busca/encodings.py:160-161 rebinds
        mem_inds to the int 0, crashing torch.clamp) — so this implements
        the evident *intent* (CLS temporal id 0, ref-bbox spatial encoding);
        no torch parity oracle is possible.  See PARITY.md "CLS flavour"."""
        return self.input_flavour.startswith("CLS-")

    @property
    def num_extra_candidates(self) -> int:
        """NON (+ BAD) choices appended after the real candidate slots."""
        return 2 if self.has_bad else 1


def can_token_positions(
    mem_len: int, num_candidate_groups: int, flavour: str
) -> Tuple[int, ...]:
    """Sequence positions of the CAN tokens (busca/network.py:138-160).

    ``mem_len`` counts memory *crops*; a CLS- prefix adds one leading token
    so the candidate block starts one position later.
    """
    start = mem_len + (1 if flavour.startswith("CLS-") else 0)
    if "MEM-SEP-CAN" in flavour:
        return tuple(
            start + i for i in range(1, num_candidate_groups * 2 + 1, 2)
        )
    if "MEM-CAN-SEP" in flavour:
        return tuple(
            start + i for i in range(0, num_candidate_groups * 2, 2)
        )
    raise NotImplementedError(f"input flavour {flavour!r} not supported")


class BuscaModel(nn.Module):
    """The decision Transformer + ReID encoder, one jittable forward."""

    config: BuscaConfig = BuscaConfig()

    @nn.compact
    def __call__(
        self,
        mem_crops: jnp.ndarray,
        can_crops: jnp.ndarray,
        mem_bboxes: jnp.ndarray,
        can_bboxes: jnp.ndarray,
        sample_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_att: bool = False,
        can_weights: Optional[jnp.ndarray] = None,
        can_gather: Optional[jnp.ndarray] = None,
        mem_group: Optional[jnp.ndarray] = None,
        can_group: Optional[jnp.ndarray] = None,
        num_groups: int = 1,
        mem_feats: Optional[jnp.ndarray] = None,
        can_feats: Optional[jnp.ndarray] = None,
    ):
        """Score candidates for a batch of tracks.

        Args:
          mem_crops: ``[B, L_mem, H, W, 3]`` normalized RGB memory crops.
            May be ``None`` when ``mem_feats`` is given.
          can_crops: ``[B, C, H, W, 3]`` normalized RGB candidate crops — OR,
            in deduplicated mode, ``[U, H, W, 3]`` *unique* candidate crops.
            May be ``None`` when ``can_feats`` is given.
          mem_bboxes: ``[B, L_mem, 4]`` ltrb boxes (detector coordinates).
          can_bboxes: ``[B, C, 4]`` ltrb candidate boxes.
          sample_mask: ``[B]`` 1 for real tracks, 0 for padded lanes — padded
            lanes are excluded from ReID BN statistics.
          deterministic: disables dropout.
          return_att: also return per-layer attention maps.
          can_weights / can_gather: deduplicated-candidate mode.  Tracks
            share one detection pool, so the per-track candidate batch is
            mostly duplicates; passing the unique crops ``[U]`` with their
            occurrence counts ``can_weights [U]`` and the per-slot index map
            ``can_gather [B, C]`` runs ReID once per unique crop.  The
            multiplicity-weighted BN statistics equal the duplicated batch's
            statistics exactly, so this is numerics-preserving (the
            reference's T x C duplicated forward, network.py:193, computed
            with U unique crops).
          mem_group / can_group / num_groups: multi-request batching —
            several *independent* association calls (e.g. one per lockstep
            sequence) computed in ONE forward.  ``mem_group [B]`` /
            ``can_group [U or B]`` assign every track / candidate crop to
            its originating request r < ``num_groups``; BN statistics are
            computed per (request, mem|can) group, so each request's
            numerics equal its own standalone call.
          mem_feats / can_feats: precomputed ReID features instead of crops
            (``[B, L_mem, F]`` / ``[U, F]`` with ``can_gather`` or
            ``[B, C, F]`` without).  The ReID stage is skipped entirely —
            only meaningful with ``reid_use_batch_stats=False``, where
            features are batch-independent and can be cached across calls
            (AssociationEngine ``reid_stats='frozen'``).  Both must be given
            together.

        Returns:
          logits ``[B, C + extras]`` (softmax upstream), and attention list if
          ``return_att``.
        """
        cfg = self.config
        b, l_mem = mem_bboxes.shape[0], mem_bboxes.shape[1]
        c = can_bboxes.shape[1]
        d_model = cfg.trans_dim
        dtype = jnp.dtype(cfg.dtype)

        if (mem_feats is None) != (can_feats is None):
            raise ValueError("mem_feats and can_feats must be given together")

        if mem_feats is not None:
            # Precomputed-feature path (frozen-stats feature caching): skip
            # the ReID stage; expand unique candidate feats per slot.
            if can_gather is not None:
                can_feats = can_feats[can_gather]  # [B, C, F]
        else:
            reid = ReIDResNet(
                layers=cfg.reid_layers,
                num_classes=cfg.reid_num_classes,
                use_batch_stats=cfg.reid_use_batch_stats,
                dtype=dtype,
                name="reid_encoder",
            )

            # ONE ReID pass over memory + candidate crops.  The reference
            # runs two forwards so BN statistics stay per-group
            # (network.py:192-193); here the grouped ``sample_mask`` ([N, 2]
            # weights: group 0 = memory, group 1 = candidates, zero rows =
            # padded lanes) reproduces those numerics inside a single conv
            # pass — ~8% faster at T=64 on v5e.
            n_mem = b * l_mem
            if can_gather is not None:
                n_can = can_crops.shape[0]  # unique candidate crops
                can_flat = can_crops
                w_can = can_weights.astype(jnp.float32)
            else:
                n_can = b * c
                can_flat = can_crops.reshape((n_can,) + can_crops.shape[2:])
                if sample_mask is not None:
                    w_can = jnp.repeat(sample_mask.astype(jnp.float32), c)
                else:
                    w_can = jnp.ones((n_can,), jnp.float32)
            flat = jnp.concatenate(
                [mem_crops.reshape((n_mem,) + mem_crops.shape[2:]), can_flat],
                axis=0,
            )
            if sample_mask is not None:
                w_mem = jnp.repeat(sample_mask.astype(jnp.float32), l_mem)
            else:
                w_mem = jnp.ones((n_mem,), jnp.float32)
            r = int(num_groups)
            if mem_group is None:
                mem_cols = jnp.zeros((n_mem,), jnp.int32)
            else:
                mem_cols = jnp.repeat(mem_group.astype(jnp.int32), l_mem)
            if can_group is not None:
                can_src = can_group
            elif mem_group is not None and can_gather is None:
                can_src = mem_group
            else:
                can_src = jnp.zeros((n_can,), jnp.int32)
            if can_gather is None and can_src.shape[0] == b:
                can_cols = jnp.repeat(can_src.astype(jnp.int32), c)
            else:
                can_cols = can_src.astype(jnp.int32)
            group_mask = jnp.concatenate(
                [
                    jax.nn.one_hot(mem_cols, 2 * r, dtype=jnp.float32)
                    * w_mem[:, None],
                    jax.nn.one_hot(can_cols + r, 2 * r, dtype=jnp.float32)
                    * w_can[:, None],
                ],
                axis=0,
            )  # [n_mem + n_can, 2 * num_groups]
            _, feats = reid(flat, group_mask)
            mem_feats = feats[:n_mem].reshape(b, l_mem, -1)
            if can_gather is not None:
                can_feats = feats[n_mem:][can_gather]  # [B, C, F]
            else:
                can_feats = feats[n_mem:].reshape(b, c, -1)

        enc = TorchLinear(cfg.dim_embedding, d_model, name="encoder")
        scale = jnp.sqrt(jnp.asarray(d_model, jnp.float32))
        mem_emb = enc(mem_feats) * scale
        can_emb = enc(can_feats) * scale

        # Learned special tokens, appended after the encoder linear
        # (network.py:45-70, 127-136).
        tok_size = cfg.dim_embedding if cfg.encode_special_tokens else d_model
        non_token = self.param(
            "non_token", nn.initializers.normal(1.0), (tok_size,)
        )
        sep_token = self.param(
            "sep_token", nn.initializers.normal(1.0), (tok_size,)
        )
        bad_token = (
            self.param("bad_token", nn.initializers.normal(1.0), (tok_size,))
            if cfg.has_bad
            else None
        )
        cls_token = (
            self.param("cls_token", nn.initializers.normal(1.0), (tok_size,))
            if cfg.has_cls
            else None
        )

        def tile(tok):
            return jnp.broadcast_to(tok, (b, 1, d_model))

        if cfg.has_cls:
            # CLS prepended before the memory tokens (busca/network.py:117-122)
            mem_emb = jnp.concatenate([tile(cls_token), mem_emb], axis=1)

        cand_groups = [can_emb[:, i : i + 1, :] for i in range(c)]
        cand_groups.append(tile(non_token))
        if cfg.has_bad:
            cand_groups.append(tile(bad_token))

        sep = tile(sep_token)
        interleaved = []
        for g in cand_groups:
            if "MEM-SEP-CAN" in cfg.input_flavour:
                interleaved.extend([sep, g])
            else:  # MEM-CAN-SEP
                interleaved.extend([g, sep])
        can_seq = jnp.concatenate(interleaved, axis=1)

        # On-device positional encodings (replaces the reference's 2.7 GB
        # fp16 table + per-token Python lookups, encodings.py:69-85).
        mem_pe, can_pe = encodings.positional_encodings(
            mem_bboxes,
            can_bboxes,
            d_model,
            cfg.input_flavour,
            cfg.encode_separator_as_reference,
            cfg.quantize_pe_fp16,
        )
        x = jnp.concatenate([mem_emb + mem_pe, can_seq + can_pe], axis=1)
        x = nn.Dropout(rate=cfg.dropout_p)(x, deterministic=deterministic)

        transformer = TransformerEncoder(
            num_layers=cfg.num_layer,
            d_model=d_model,
            nhead=cfg.nhead,
            dim_feedforward=cfg.ff_size,
            dropout=cfg.dropout_p,
            activation=get_activation(cfg.activation),
            dtype=dtype,
            name="transformer_encoder",
        )
        out = transformer(x, deterministic, return_att=return_att)
        if return_att:
            out, attentions = out

        positions = can_token_positions(
            l_mem, c + cfg.num_extra_candidates, cfg.input_flavour
        )
        can_out = out[:, jnp.asarray(positions), :]

        can_out = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(can_out)
        logits = TorchLinear(d_model, 1, name="decoder_linear")(can_out)[..., 0]

        if return_att:
            return logits, attentions
        return logits


# ---------------------------------------------------------------------------
# Crop normalization constants (GHOST pipeline, BGR order)
# ---------------------------------------------------------------------------

# Note the 0.299 std (not the ImageNet 0.229) — a GHOST idiosyncrasy the
# weights were trained with (busca/tracking.py:64-65, network.py:470-478).
INPUT_PIXEL_MEAN_BGR = np.array([0.406, 0.456, 0.485], dtype=np.float32)
INPUT_PIXEL_STD_BGR = np.array([0.225, 0.224, 0.299], dtype=np.float32)
INPUT_PIXEL_MEAN_RGB = INPUT_PIXEL_MEAN_BGR[::-1].copy()
INPUT_PIXEL_STD_RGB = INPUT_PIXEL_STD_BGR[::-1].copy()
