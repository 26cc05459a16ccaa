"""Checkpoint conversion: reference PyTorch ``.pth`` -> busca_tpu param pytrees.

The reference ships two checkpoints (README.md:69-78):
- ``model_busca.pth`` — the full BUSCA module (decision Transformer + special
  tokens + the ReID encoder under ``reid_encoder.model.*``), possibly wrapped
  in a ``{model_state_dict, optimizer_state_dict}`` envelope
  (busca/network.py:432-467).
- ``model_feats.pth`` — the bare GHOST ResNet-50 (busca/reid/
  load_trained_net.py:43-63).

``convert_busca_state_dict`` maps the torch key layout onto the
:class:`~busca_tpu.models.busca.BuscaModel` variable tree.  Weights keep the
torch ``[out, in]`` layout (our ``TorchLinear``), convs transpose
``[out, in, kh, kw] -> [kh, kw, in, out]`` (NHWC), LayerNorm ``weight`` becomes
``scale``.  Running BN statistics are converted into the ``batch_stats``
collection (used only when domain adaptation is off).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _map_resnet_key(key: str) -> Optional[Tuple[Tuple[str, ...], bool]]:
    """Map a torch ResNet-50 key (sans prefix) to (path, is_conv)."""
    if key == "conv1.weight":
        return ("conv1", "kernel"), True
    m = re.fullmatch(r"bn1\.(weight|bias)", key)
    if m:
        return ("bn1", m.group(1)), False
    m = re.fullmatch(r"bn1\.running_(mean|var)", key)
    if m:
        return ("bn1", f"running_{m.group(1)}"), False
    m = re.fullmatch(
        r"layer(\d)\.(\d+)\.conv(\d)\.weight", key
    )
    if m:
        s, b, k = m.groups()
        return (f"layer{s}_{b}", f"conv{k}", "kernel"), True
    m = re.fullmatch(
        r"layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|running_mean|running_var)", key
    )
    if m:
        s, b, k, p = m.groups()
        return (f"layer{s}_{b}", f"bn{k}", p), False
    m = re.fullmatch(r"layer(\d)\.(\d+)\.downsample\.0\.weight", key)
    if m:
        s, b = m.groups()
        return (f"layer{s}_{b}", "downsample_conv", "kernel"), True
    m = re.fullmatch(
        r"layer(\d)\.(\d+)\.downsample\.1\.(weight|bias|running_mean|running_var)",
        key,
    )
    if m:
        s, b, p = m.groups()
        return (f"layer{s}_{b}", "downsample_bn", p), False
    m = re.fullmatch(r"(red|fc|fc_person)\.(weight|bias)", key)
    if m:
        return (m.group(1), m.group(2)), False
    if key.endswith("num_batches_tracked"):
        return None  # irrelevant bookkeeping
    raise KeyError(f"unrecognized ResNet key: {key!r}")


def convert_resnet_state_dict(
    state_dict: Dict[str, np.ndarray]
) -> Dict[str, dict]:
    """Convert a bare GHOST ResNet-50 state dict (``model_feats.pth``).

    Returns a dict with 'params' and 'batch_stats' trees matching
    :class:`~busca_tpu.models.reid.ReIDResNet`.
    """
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        mapped = _map_resnet_key(key)
        if mapped is None:
            continue
        path, is_conv = mapped
        value = np.asarray(value)
        if is_conv:
            value = _conv_kernel(value)
        if path[-1].startswith("running_"):
            _set(batch_stats, path, value)
        else:
            _set(params, path, value)
    return {"params": params, "batch_stats": batch_stats}


def convert_busca_state_dict(
    state_dict: Dict[str, np.ndarray],
    ignore_reid: bool = False,
    ignore_reid_fc: bool = True,
) -> Dict[str, dict]:
    """Convert a full BUSCA state dict (``model_busca.pth``).

    Args:
      state_dict: flat torch key -> array mapping (already unwrapped from any
        ``model_state_dict`` envelope; use :func:`unwrap_envelope`).
      ignore_reid: drop all ``reid_encoder.model.*`` entries.
      ignore_reid_fc: drop the ReID classifier heads (fc / fc_person), like
        ``load_pretrained(ignore_reid_fc=True)`` (busca/network.py:445-448).
    Returns:
      variable dict with 'params' (+ 'batch_stats') for
      :class:`~busca_tpu.models.busca.BuscaModel`.
    """
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        value = np.asarray(value)
        if key in ("cls_token", "sep_token", "non_token", "bad_token", "pad_token"):
            if key != "pad_token":  # pad token is a constant zeros buffer
                _set(params, (key,), value)
            continue
        if key.startswith("reid_encoder.model."):
            if ignore_reid:
                continue
            sub = key[len("reid_encoder.model."):]
            if ignore_reid_fc and re.match(r"(fc|fc_person)\.", sub):
                continue
            mapped = _map_resnet_key(sub)
            if mapped is None:
                continue
            path, is_conv = mapped
            if is_conv:
                value = _conv_kernel(value)
            full = ("reid_encoder",) + path
            if path[-1].startswith("running_"):
                _set(batch_stats, full, value)
            else:
                _set(params, full, value)
            continue
        m = re.fullmatch(r"encoder\.(weight|bias)", key)
        if m:
            _set(params, ("encoder", m.group(1)), value)
            continue
        m = re.fullmatch(r"decoder\.0\.(weight|bias)", key)
        if m:  # LayerNorm: torch 'weight' -> flax 'scale'
            name = "scale" if m.group(1) == "weight" else "bias"
            _set(params, ("decoder_norm", name), value)
            continue
        m = re.fullmatch(r"decoder\.1\.(weight|bias)", key)
        if m:
            _set(params, ("decoder_linear", m.group(1)), value)
            continue
        m = re.fullmatch(
            r"transformer_encoder\.layers\.(\d+)\.(.+)", key
        )
        if m:
            i, rest = m.groups()
            layer = f"layers_{i}"
            mapping = {
                "self_attn.in_proj_weight": ("self_attn", "in_proj_weight"),
                "self_attn.in_proj_bias": ("self_attn", "in_proj_bias"),
                "self_attn.out_proj.weight": ("self_attn", "out_proj", "weight"),
                "self_attn.out_proj.bias": ("self_attn", "out_proj", "bias"),
                "linear1.weight": ("linear1", "weight"),
                "linear1.bias": ("linear1", "bias"),
                "linear2.weight": ("linear2", "weight"),
                "linear2.bias": ("linear2", "bias"),
                "norm1.weight": ("norm1", "scale"),
                "norm1.bias": ("norm1", "bias"),
                "norm2.weight": ("norm2", "scale"),
                "norm2.bias": ("norm2", "bias"),
            }
            if rest not in mapping:
                raise KeyError(f"unrecognized transformer key: {key!r}")
            _set(
                params,
                ("transformer_encoder", layer) + mapping[rest],
                value,
            )
            continue
        raise KeyError(f"unrecognized BUSCA key: {key!r}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def unwrap_envelope(state_dict: dict) -> Dict[str, np.ndarray]:
    """Unwrap ``{model_state_dict, optimizer_state_dict}`` envelopes
    (busca/network.py:438-443) and CenterTrack/CenterNet's
    ``{epoch, state_dict}`` envelope, then convert tensors to numpy."""
    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]
    elif "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        # DataParallel-saved checkpoints prefix every key with "module."
        out[k[len("module."):] if k.startswith("module.") else k] = (
            np.asarray(v)
        )
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` file to a flat numpy state dict (requires torch)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return unwrap_envelope(state)


_BN_FLAX = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def convert_centertrack_state_dict(
    state_dict: Dict[str, np.ndarray]
) -> Dict[str, dict]:
    """Convert a published CenterTrack DLA-34 checkpoint (``.pth``).

    Maps the canonical DLASeg layout (``base.*`` DLA trunk with
    ``pre_img_layer``/``pre_hm_layer``, ``dla_up.ida_K.{proj,up,node}_i``,
    the final ``ida_up``, and the ``hm/reg/wh/tracking`` head Sequentials)
    onto :class:`~busca_tpu.models.centertrack.CenterTrackNet` variables.
    DCN ``conv_offset_mask`` channels keep their order (our kernel reads the
    same interleaved (dy, dx) + mask layout as the DCNv2 CUDA op); the
    grouped transposed-conv ``up_i`` kernels are stored spatially flipped
    for the equivalent lhs-dilated depthwise conv (models/centertrack.py
    ``UpConv``).  BatchNorms land in flax naming (scale/bias + mean/var).
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(collection_path, value):
        coll, path = collection_path
        _set(params if coll == "params" else batch_stats, path, value)

    def bn(prefix: Tuple[str, ...], tail: str, value):
        coll, leaf = _BN_FLAX[tail]
        put((coll, prefix + (leaf,)), value)

    head_map = {"0": "conv", "2": "out"}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        value = np.asarray(value)
        parts = key.split(".")

        # heads: hm.0.weight / hm.2.bias ...
        m = re.fullmatch(
            r"(hm|reg|wh|tracking)\.([02])\.(weight|bias)", key
        )
        if m:
            h, idx, p = m.groups()
            leaf = "kernel" if p == "weight" else "bias"
            v = _conv_kernel(value) if p == "weight" else value
            put(("params", (f"{h}_{head_map[idx]}", leaf)), v)
            continue

        # decoder: dla_up.ida_K.* and ida_up.*
        m = re.fullmatch(
            r"(dla_up\.ida_\d+|ida_up)\.(proj|node|up)_(\d+)\.(.+)", key
        )
        if m:
            owner, kind, i, rest = m.groups()
            prefix = tuple(owner.split(".")) + (f"{kind}_{i}",)
            if kind == "up":
                if rest != "weight":
                    raise KeyError(f"unrecognized CenterTrack key: {key!r}")
                # [o, 1, k, k] -> spatial flip -> [k, k, 1, o]
                v = value[:, :, ::-1, ::-1].transpose(2, 3, 1, 0)
                put(("params", prefix + ("kernel",)),
                    np.ascontiguousarray(v))
            elif rest == "conv.weight":
                put(("params", prefix + ("weight",)), _conv_kernel(value))
            elif rest == "conv.bias":
                put(("params", prefix + ("bias",)), value)
            elif rest == "conv.conv_offset_mask.weight":
                put(("params", prefix + ("conv_offset_mask", "kernel")),
                    _conv_kernel(value))
            elif rest == "conv.conv_offset_mask.bias":
                put(("params", prefix + ("conv_offset_mask", "bias")), value)
            elif rest.startswith("actf.0."):
                bn(prefix + ("bn",), rest[len("actf.0."):], value)
            else:
                raise KeyError(f"unrecognized CenterTrack key: {key!r}")
            continue

        # trunk
        if parts[0] == "base":
            name = parts[1]
            if name in ("base_layer", "pre_img_layer", "pre_hm_layer",
                        "level0", "level1"):
                idx, tail = parts[2], ".".join(parts[3:])
                if idx == "0" and tail == "weight":
                    put(("params", ("base", name, "conv", "kernel")),
                        _conv_kernel(value))
                elif idx == "1":
                    bn(("base", name, "bn"), tail, value)
                else:
                    raise KeyError(f"unrecognized CenterTrack key: {key!r}")
                continue
            if re.fullmatch(r"level[2-5]", name):
                path: Tuple[str, ...] = ("base", name)
                rest = parts[2:]
                while rest and rest[0] in ("tree1", "tree2"):
                    path = path + (rest[0],)
                    rest = rest[1:]
                sub = ".".join(rest)
                m = re.fullmatch(r"conv(\d)\.weight", sub)
                if m:
                    put(("params", path + (f"conv{m.group(1)}", "kernel")),
                        _conv_kernel(value))
                    continue
                m = re.fullmatch(r"bn(\d)\.(.+)", sub)
                if m:
                    bn(path + (f"bn{m.group(1)}",), m.group(2), value)
                    continue
                if sub == "project.0.weight":
                    put(("params", path + ("project_conv", "kernel")),
                        _conv_kernel(value))
                    continue
                m = re.fullmatch(r"project\.1\.(.+)", sub)
                if m:
                    bn(path + ("project_bn",), m.group(1), value)
                    continue
                if sub == "root.conv.weight":
                    put(("params", path + ("root", "conv", "kernel")),
                        _conv_kernel(value))
                    continue
                m = re.fullmatch(r"root\.bn\.(.+)", sub)
                if m:
                    bn(path + ("root", "bn"), m.group(1), value)
                    continue
        raise KeyError(f"unrecognized CenterTrack key: {key!r}")
    return {"params": params, "batch_stats": batch_stats}


def convert_aflink_state_dict(state_dict: dict) -> dict:
    """Torch AFLink (the StrongSORT ``PostLinker`` role) -> AFLinkModel params.

    The upstream PostLinker lives in the StrongSORT submodule (empty in the
    reference checkout) and its trained weights are a release download the
    reference does not vendor (strong_sort.py:29-38), so the torch layout
    accepted here is the canonical naming of this framework's published-
    design rebuild (models/aflink.py; the torch twin lives in
    tests/oracle_pipeline.TorchAFLink):

    - ``temporal.{i}.conv.weight`` — (7x1) conv, no bias
    - ``temporal.{i}.norm.{weight,bias}`` — LayerNorm over channels
    - ``fusion.{weight,bias}`` — (1x3) feature-fusion conv
    - ``fc1.{weight,bias}`` / ``fc2.{weight,bias}`` — classifier head
    """
    sd = unwrap_envelope(state_dict)
    params: dict = {}
    for key, value in sd.items():
        v = np.asarray(value)
        m = re.fullmatch(r"temporal\.(\d+)\.conv\.weight", key)
        if m:
            _set(params, (f"temporal_{m.group(1)}", "conv", "kernel"),
                 _conv_kernel(v))
            continue
        m = re.fullmatch(r"temporal\.(\d+)\.norm\.(weight|bias)", key)
        if m:
            name = "scale" if m.group(2) == "weight" else "bias"
            _set(params, (f"temporal_{m.group(1)}", "norm", name), v)
            continue
        if key == "fusion.weight":
            _set(params, ("fusion", "kernel"), _conv_kernel(v))
            continue
        if key == "fusion.bias":
            _set(params, ("fusion", "bias"), v)
            continue
        m = re.fullmatch(r"(fc1|fc2)\.(weight|bias)", key)
        if m:
            name, p = m.groups()
            # flax Dense kernel is [in, out] = torch weight transposed
            _set(params, (name, "kernel" if p == "weight" else "bias"),
                 np.ascontiguousarray(v.T) if p == "weight" else v)
            continue
        raise KeyError(f"unrecognized AFLink key: {key!r}")
    return {"params": params}


def main(argv=None):
    """CLI: convert a reference ``.pth`` checkpoint to the npz param format.

    Usage: ``python -m busca_tpu.models.convert model_busca.pth out.npz
    [--kind busca|resnet] [--keep-reid-fc]``
    """
    import argparse

    from busca_tpu.models.checkpoint import save_params_npz

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("src", help="reference .pth checkpoint")
    parser.add_argument("dst", help="output .npz")
    parser.add_argument(
        "--kind", choices=("busca", "resnet", "centertrack", "aflink"),
        default="busca",
        help="busca = model_busca.pth layout; resnet = model_feats.pth; "
        "centertrack = published CenterTrack DLA-34 .pth; aflink = the "
        "StrongSORT PostLinker link model",
    )
    parser.add_argument("--keep-reid-fc", action="store_true")
    args = parser.parse_args(argv)

    state = load_torch_checkpoint(args.src)
    if args.kind == "busca":
        variables = convert_busca_state_dict(
            state, ignore_reid_fc=not args.keep_reid_fc
        )
    elif args.kind == "centertrack":
        variables = convert_centertrack_state_dict(state)
    elif args.kind == "aflink":
        variables = convert_aflink_state_dict(state)
    else:
        variables = convert_resnet_state_dict(state)
    save_params_npz(args.dst, variables)
    n = sum(v.size for v in _iter_leaves(variables))
    print(f"wrote {args.dst}: {n / 1e6:.2f}M parameters")


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


def merge_params(base: dict, update: dict) -> dict:
    """Recursively overlay ``update`` onto ``base`` (missing keys keep base).

    Mirrors the reference's partial-load behavior: ``model_dict.update(...)``
    (busca/network.py:465-467) — converted checkpoints may omit e.g. the ReID
    fc head, whose randomly-initialized values are then kept.
    """
    out = dict(base)
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            out[k] = v
    return out

if __name__ == "__main__":
    main()
