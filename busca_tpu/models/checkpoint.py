"""Checkpoint save/load: orbax for training state, npz for portable params.

The reference's checkpoint story is weights-only .pth files with envelope
unwrapping and partial loads (busca/network.py:432-467, SURVEY.md §5.4).
This framework adds proper train-state checkpointing:

- ``save_checkpoint`` / ``restore_checkpoint``: orbax PyTree checkpoints of
  {params, opt_state, step} — resumable training, multi-host safe.
- ``save_params_npz`` / ``load_params_npz``: flat-key npz export of a param
  tree (the portable interchange format; also what the .pth converter CLI
  emits).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, params: dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(params))


def load_params_npz(path: str) -> dict:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def save_checkpoint(directory: str, state: Any, step: int = 0):
    """Orbax PyTree checkpoint (async-safe, multi-host aware)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)
    return path


def restore_checkpoint(directory: str, step: Optional[int] = None):
    """Restore the given (or latest) orbax checkpoint from a directory."""
    import orbax.checkpoint as ocp

    if step is None:
        steps = sorted(
            int(d.split("_")[1])
            for d in os.listdir(directory)
            if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        step = steps[-1]
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)
