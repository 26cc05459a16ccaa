"""Device mesh + sharding rules for the BUSCA model family.

The reference's only distribution is NCCL DDP over eval processes
(tools/track.py:305-316) — embarrassingly-parallel sequences with a final
gather.  The TPU-native equivalents:

- **dp** (data parallel): track-batches / training batches sharded across
  chips; XLA inserts the gradient all-reduce over ICI automatically under
  GSPMD.
- **tp** (tensor parallel): the decision Transformer's FF and attention
  projections sharded column/row-wise (Megatron layout) so the matmuls stay
  large per chip.
- sequence/pipeline/expert parallelism intentionally do NOT apply: attention
  is over a fixed 25-token window (the reference handles long temporal
  context by memory subsampling, SURVEY.md §5.7), the model is 4 layers, and
  there are no experts.  The mesh API leaves room for more axes for future
  model families.

Sequence-level data parallelism across hosts (one MOT sequence per host) is
handled in :mod:`busca_tpu.eval.runner`, not here — it needs no collectives
until the final metric gather.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, str] = ("dp", "tp"),
    tp_size: Optional[int] = None,
) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices.

    tp defaults to 2 when the device count is even (ICI-neighbor pairs),
    else 1.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp_size is None:
        tp_size = 2 if n % 2 == 0 and n >= 2 else 1
    if n % tp_size != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp_size}")
    grid = np.asarray(devices).reshape(n // tp_size, tp_size)
    return Mesh(grid, axes)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def _spec_for_param(path: Tuple[str, ...], value, tp_size: int = 2) -> P:
    """Megatron-style partition spec for one parameter.

    torch-layout linears (``weight [out, in]``):
    - attention in_proj / FF linear1: split the *out* dim over tp
      (column parallel);
    - attention out_proj / FF linear2: split the *in* dim over tp
      (row parallel);
    - ReID conv kernels (``[kh, kw, cin, cout]``): split the *output
      channel* dim over tp, with the matching BN scale/bias split the same
      way — batch-stat BN is per-channel, so its reductions stay local to
      the shard (no collective inside the BN);
    - norms, special tokens, the decoder head: replicated (tiny).
    """
    names = [str(p) for p in path]
    joined = "/".join(names)
    if "in_proj_weight" in joined or "linear1/weight" in joined:
        return P("tp", None)
    if "in_proj_bias" in joined or "linear1/bias" in joined:
        return P("tp")
    if "out_proj/weight" in joined or "linear2/weight" in joined:
        return P(None, "tp")
    if "reid_encoder" in joined and value.ndim == 4:
        # conv kernel [kh, kw, cin, cout] — column (output-channel) parallel
        if value.shape[3] % tp_size == 0:
            return P(None, None, None, "tp")
        return P(None, None, None, None)
    if (
        "reid_encoder" in joined
        and ("/bn" in joined or "downsample_bn" in joined)
        and value.ndim == 1
        and value.shape[0] % tp_size == 0
    ):
        return P("tp")
    return P(*([None] * value.ndim))


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a BuscaModel param tree."""

    def to_sharding(path, value):
        names = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return NamedSharding(
            mesh, _spec_for_param(names, value, mesh.shape.get("tp", 1))
        )

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def replicated(mesh: Mesh, tree):
    """Fully-replicated shardings for an arbitrary pytree."""
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(mesh, P(*([None] * np.ndim(v)))), tree
    )
