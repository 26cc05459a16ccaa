"""3-D spatiotemporal positional encodings, evaluated closed-form on device.

The reference (busca/encodings.py) precomputes a ``pe[211, 211, 61, 512]``
fp16 table — ``PositionalEncoding3D`` (tatp22/multidim-positional-encoding)
evaluated on the full (xy-distance, size, time) bucket grid, ~2.7 GB — and
then performs a *per-token Python loop* of ``.item()`` lookups
(busca/encodings.py:69-85).  That table is just a fixed sinusoid function
evaluated on a grid, so the TPU-native build computes it closed-form per
token inside the jitted forward pass: zero memory, zero host round-trips,
fully batched on the VPU.

Bucketing semantics are kept bit-compatible with the reference:

- geometry features from MEGA-style log-space relative distances vs the
  *reference bbox* (= last memory bbox) — ``extract_distance_values``
  (busca/encodings.py:238-271), including the ``+1`` width/height convention
  and the ``1e-3`` log offsets.
- ``idx = trunc(clamp(value * range_factor, ±max)) + max`` — torch's
  ``.to(torch.long)`` truncates toward zero, reproduced here with
  ``jnp.trunc`` (busca/encodings.py:206-233).
- temporal ids: memory tokens at ``-L+1..0``, candidate tokens tile
  ``[1, 2]`` per (SEP, CAN) pair, all scaled by 2 and clamped to ±30
  (busca/encodings.py:150-180).
- SEP/NON tokens take the reference bbox; BAD takes the "distant fake"
  sentinel (busca/encodings.py:97-148, busca/tracking.py:7-20).
- the fp16 quantization of the reference table is reproduced by an optional
  fp16 round-trip (default on) so activations match the trained weights.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

MAX_TEMP_DIST = 30
MAX_DISTANCE_DIST = 105
MAX_SIZE_DIST = 105
SPATIAL_RANGE_FACTOR = 15.0
TEMPORAL_RANGE_FACTOR = 2.0

FLOAT32_MIN = float(np.finfo(np.float32).min)

SUPPORTED_FLAVOURS = (
    "MEM-SEP-CAN",
    "MEM-SEP-CAN-BAD",
    "MEM-CAN-SEP",
    "MEM-CAN-SEP-BAD",
    # CLS- flavours prepend a learned token before the memory.  The
    # reference's own CLS path crashes (busca/encodings.py:160-161 rebinds
    # mem_inds to int 0 via chained assignment); this implements the evident
    # intent: CLS gets the reference bbox and temporal id 0 — i.e. the same
    # encoding as the last memory token (busca/encodings.py:56-60, 167).
    "CLS-MEM-SEP-CAN",
    "CLS-MEM-SEP-CAN-BAD",
    "CLS-MEM-CAN-SEP",
    "CLS-MEM-CAN-SEP-BAD",
)


def missing_candidate_bbox(flavour: str = "ltrb") -> np.ndarray:
    """Sentinel bbox marking a missing candidate slot (busca/tracking.py:7-20).

    Extreme float32-min values that, after the clamped log-space bucketing,
    land in the most-distant buckets.
    """
    if flavour == "ltrb":
        return np.array(
            [FLOAT32_MIN, FLOAT32_MIN, FLOAT32_MIN / 100.0, FLOAT32_MIN / 100.0]
        )
    if flavour == "ltwh":
        return np.array(
            [FLOAT32_MIN, FLOAT32_MIN, -FLOAT32_MIN / 100.0, -FLOAT32_MIN / 100.0]
        )
    raise ValueError(f"Unknown flavour: {flavour}")


# ---------------------------------------------------------------------------
# The 3-D sinusoid (closed form of the reference's precomputed table)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _group_channels(d_model: int) -> int:
    """Per-axis channel count of PositionalEncoding3D: ceil(d/6)*2, even."""
    ch = int(math.ceil(d_model / 6) * 2)
    if ch % 2:
        ch += 1
    return ch


def _axis_embedding(pos: jnp.ndarray, ch: int) -> jnp.ndarray:
    """Interleaved [sin(p f0), cos(p f0), sin(p f1), ...] for one axis.

    ``inv_freq[k] = 1 / 10000^(2k / ch)``, ``k = 0..ch/2-1``.
    """
    k = jnp.arange(0, ch, 2, dtype=jnp.float32)
    inv_freq = 1.0 / (10000.0 ** (k / ch))
    ang = pos[..., None].astype(jnp.float32) * inv_freq  # [..., ch/2]
    emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., ch/2, 2]
    return emb.reshape(*ang.shape[:-1], ch)


def sinusoid_3d(
    xy_idx: jnp.ndarray,
    size_idx: jnp.ndarray,
    t_idx: jnp.ndarray,
    d_model: int,
    quantize_fp16: bool = True,
) -> jnp.ndarray:
    """Evaluate the 3-D positional sinusoid at integer bucket indices.

    Equivalent to indexing the reference's precomputed table
    ``pe[xy_idx, size_idx, t_idx]`` (busca/encodings.py:28-32, 69-85): channel
    layout is [x-group | y-group | z-group(truncated)], each group interleaved
    sin/cos over geometric frequencies.

    Args:
      xy_idx, size_idx, t_idx: integer arrays of identical shape ``[...]``.
      d_model: embedding width (512 in shipped configs).
      quantize_fp16: round to fp16 like the reference table (encodings.py:31).
    Returns:
      ``[..., d_model]`` float32 encodings.
    """
    ch = _group_channels(d_model)
    emb_x = _axis_embedding(xy_idx, ch)
    emb_y = _axis_embedding(size_idx, ch)
    emb_z = _axis_embedding(t_idx, ch)
    out = jnp.concatenate([emb_x, emb_y, emb_z], axis=-1)[..., :d_model]
    if quantize_fp16:
        out = out.astype(jnp.float16).astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Bucket index computation (bit-compatible with the reference)
# ---------------------------------------------------------------------------

def extract_distance_values(bbox: jnp.ndarray, ref_bbox: jnp.ndarray):
    """MEGA-style log-space relative geometry (busca/encodings.py:238-271).

    Args:
      bbox, ref_bbox: ``[..., 4]`` ltrb boxes (broadcastable).
    Returns:
      (xy_distance, size_distance) each ``[...]``.
    """
    rxmin, rymin, rxmax, rymax = jnp.split(ref_bbox, 4, axis=-1)
    w_ref = rxmax - rxmin + 1.0
    h_ref = rymax - rymin + 1.0
    cx_ref = 0.5 * (rxmin + rxmax)
    cy_ref = 0.5 * (rymin + rymax)

    xmin, ymin, xmax, ymax = jnp.split(bbox, 4, axis=-1)
    w = xmax - xmin + 1.0
    h = ymax - ymin + 1.0
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)

    dx = ((cx - cx_ref) / w) ** 2
    dy = ((cy - cy_ref) / h) ** 2
    xy = jnp.log(jnp.sqrt(dx + dy) + 1e-3)

    dw = jnp.log(w / w_ref + 1e-3)
    dh = jnp.log(h / h_ref + 1e-3)
    size = dw + dh
    return xy[..., 0], size[..., 0]


def _bucketize(value: jnp.ndarray, max_dist: int) -> jnp.ndarray:
    """``trunc(clamp(v * 15, ±max)) + max`` — torch ``.to(long)`` truncates."""
    v = jnp.clip(value * SPATIAL_RANGE_FACTOR, -max_dist, max_dist)
    return jnp.trunc(v).astype(jnp.int32) + max_dist


def spatial_indices(bboxes: jnp.ndarray, ref_bbox: jnp.ndarray):
    """Spatial bucket indices for a set of token bboxes vs a reference box.

    Args:
      bboxes: ``[B, L, 4]`` ltrb token boxes.
      ref_bbox: ``[B, 1, 4]`` ltrb reference (last memory box).
    Returns:
      (xy_idx, size_idx) int32 ``[B, L]``.
    """
    xy, size = extract_distance_values(bboxes, ref_bbox)
    return (
        _bucketize(xy, MAX_DISTANCE_DIST),
        _bucketize(size, MAX_SIZE_DIST),
    )


def temporal_indices(mem_len: int, num_candidates: int, elems_per_can: int = 2):
    """Static temporal bucket indices (busca/encodings.py:150-180).

    Memory tokens: ``(-L+1..0) * 2``; candidate tokens tile ``(1, 2) * 2``
    per (SEP, CAN) pair — both clamped to ±30 then shifted by +30.

    Args:
      mem_len: number of memory tokens.
      num_candidates: candidate groups incl. NON (and BAD if present).
    Returns:
      (mem_t_idx ``[mem_len]``, can_t_idx ``[num_candidates*elems_per_can]``)
      numpy int32 (static — bake into the jitted graph).
    """
    mem = np.arange(-mem_len + 1, 1, dtype=np.float64)
    can = np.tile(np.arange(1, 1 + elems_per_can, dtype=np.float64), num_candidates)
    mem = np.clip(mem * TEMPORAL_RANGE_FACTOR, -MAX_TEMP_DIST, MAX_TEMP_DIST)
    can = np.clip(can * TEMPORAL_RANGE_FACTOR, -MAX_TEMP_DIST, MAX_TEMP_DIST)
    mem = np.trunc(mem).astype(np.int32) + MAX_TEMP_DIST
    can = np.trunc(can).astype(np.int32) + MAX_TEMP_DIST
    return mem, can


def insert_fake_bboxes(
    can_bboxes: jnp.ndarray,
    ref_bbox: jnp.ndarray,
    flavour: str,
    encode_sep_as_ref: bool = True,
) -> jnp.ndarray:
    """Assign bboxes to SEP/NON/BAD tokens (busca/encodings.py:97-148).

    Args:
      can_bboxes: ``[B, C, 4]`` ltrb real-candidate boxes.
      ref_bbox: ``[B, 1, 4]`` reference box.
      flavour: one of SUPPORTED_FLAVOURS.
    Returns:
      ``[B, 2*(C + extras), 4]`` token-aligned boxes, where extras is 2 with
      BAD (NON+BAD) else 1 (NON).
    """
    if flavour not in SUPPORTED_FLAVOURS:
        raise NotImplementedError(f"input flavour {flavour!r} not supported")
    b, c, _ = can_bboxes.shape
    has_bad = "BAD" in flavour
    # NOTE: the reference takes the *ltwh*-flavoured sentinel and uses it
    # verbatim as an ltrb box for the BAD token (busca/encodings.py:21) —
    # i.e. [f32min, f32min, -f32min/100, -f32min/100].  Preserved as-is, the
    # trained weights saw these exact buckets.
    fake = jnp.broadcast_to(
        jnp.asarray(missing_candidate_bbox("ltwh"), dtype=can_bboxes.dtype),
        (b, 1, 4),
    )
    ref = jnp.broadcast_to(ref_bbox, (b, 1, 4))

    groups = []
    for i in range(c):
        can_i = can_bboxes[:, i : i + 1, :]
        pad = ref if encode_sep_as_ref else can_i
        if "MEM-SEP-CAN" in flavour:
            groups.extend([pad, can_i])
        else:  # MEM-CAN-SEP
            groups.extend([can_i, pad])
    groups.extend([ref, ref])  # NON group (SEP+NON or NON+SEP)
    if has_bad:
        groups.extend([fake, fake])  # BAD group
    return jnp.concatenate(groups, axis=1)


def positional_encodings(
    mem_bboxes: jnp.ndarray,
    can_bboxes: jnp.ndarray,
    d_model: int,
    flavour: str,
    encode_sep_as_ref: bool = True,
    quantize_fp16: bool = True,
):
    """Per-token positional encodings for memory and candidate tokens.

    This is the whole of the reference ``PositionalEncoding.forward``
    (busca/encodings.py:43-94) minus dropout, as one fused device computation.

    Args:
      mem_bboxes: ``[B, L_mem, 4]`` ltrb memory boxes (detector coordinates).
      can_bboxes: ``[B, C, 4]`` ltrb real-candidate boxes.
      d_model: embedding width.
      flavour: input flavour string.
    Returns:
      (mem_pe ``[B, L_mem, d]``, can_pe ``[B, 2*(C+extras), d]``) float32.
    """
    ref_bbox = mem_bboxes[:, -1:, :]
    can_token_bboxes = insert_fake_bboxes(
        can_bboxes, ref_bbox, flavour, encode_sep_as_ref
    )

    has_bad = "BAD" in flavour
    num_candidates = can_bboxes.shape[1] + (2 if has_bad else 1)
    mem_t, can_t = temporal_indices(mem_bboxes.shape[1], num_candidates)
    b = mem_bboxes.shape[0]
    mem_t = jnp.broadcast_to(jnp.asarray(mem_t), (b, mem_t.shape[0]))
    can_t = jnp.broadcast_to(jnp.asarray(can_t), (b, can_t.shape[0]))

    mem_xy, mem_size = spatial_indices(mem_bboxes, ref_bbox)
    can_xy, can_size = spatial_indices(can_token_bboxes, ref_bbox)

    mem_pe = sinusoid_3d(mem_xy, mem_size, mem_t, d_model, quantize_fp16)
    can_pe = sinusoid_3d(can_xy, can_size, can_t, d_model, quantize_fp16)
    if flavour.startswith("CLS-"):
        # CLS: ref-bbox spatial (busca/encodings.py:56-60) + temporal id 0 —
        # identical buckets to the last memory token, whose bbox IS the
        # reference and whose temporal id is 0.
        mem_pe = jnp.concatenate([mem_pe[:, -1:, :], mem_pe], axis=1)
    return mem_pe, can_pe
