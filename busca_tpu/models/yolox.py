"""YOLOX detector in Flax (NHWC, TPU-first) with torch-checkpoint conversion.

The reference's canonical tracker (ByteTrack) runs a YOLOX-X detector
(adapters/ByteTrack/tools/track.py, exps/*); TransCenter wraps its own
deformable-DETR behind a YOLOX-shaped output (models/transcenter.py:180-192).
This module provides the detector family natively: CSPDarknet backbone
(Focus stem, CSP stages, SPP), PAFPN neck, decoupled head, and the
grid-decode to ``[N, 5 + num_classes]`` rows of
``(cx, cy, w, h, obj, cls...)`` that feeds ``ops.nms.yolox_postprocess``.

Sizes via the standard (depth, width) multipliers:
  yolox-s (0.33, 0.50) / -m (0.67, 0.75) / -l (1.0, 1.0) / -x (1.33, 1.25).

Inference BN uses stored running statistics (torch eval mode, eps 1e-3).
``convert_yolox_state_dict`` maps the official torch key layout
(backbone.backbone.*, backbone.(PAFPN parts), head.*) onto this tree.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from busca_tpu.models.reid import BatchNorm


def _round_repeats(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class ConvBnAct(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(
            self.features, eps=1e-3, use_batch_stats=False, name="bn"
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class _FocusKernel(nn.Module):
    """Owns the stem's 3x3x(4C)xF kernel at the standard ``conv/kernel``
    param path (so checkpoints and the torch converter are unchanged)."""

    features: int
    in_features: int = 12

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )


class _FocusConvBnAct(nn.Module):
    """ConvBnAct-equivalent for the Focus stem, applied as ONE 6x6/stride-2
    convolution on the raw image instead of 4 strided slices + concat +
    3x3 conv.  The two are the same linear map: s2d channel (di, dj) at
    s2d-grid offset (ki, kj) reads raw pixel offset (2ki + di, 2kj + dj),
    so scattering the 3x3x12 kernel into a 6x6x3 kernel (stride 2,
    padding (2, 3)) reproduces Focus exactly (max |diff| 1.4e-6 f32).
    Measured on v5e at 800x1440 bf16: 8.9 ms -> 1.2 ms (the strided-slice
    formulation ran at 0.3% MFU and was half the backbone's runtime)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k3 = _FocusKernel(self.features, name="conv")()
        # [ki, kj, g*3+c, o] with g = dj*2 + di (concat order tl, bl, tr,
        # br) -> [2ki+di, 2kj+dj, c, o]
        k = k3.reshape(3, 3, 2, 2, 3, self.features)  # ki, kj, dj, di, c, o
        k = k.transpose(0, 3, 1, 2, 4, 5)  # ki, di, kj, dj, c, o
        k6 = k.reshape(6, 6, 3, self.features)
        # r3 refinement: even the single 6x6/2 conv is MXU-lane-starved —
        # XLA pads C_in 3 -> 128 lanes, so it burns ~42x redundant MXU work
        # (measured 1.3 ms @ 2% MFU at 800x1440 bf16, exactly the padded-
        # FLOPs bound).  Re-expressing s2d as 0/1 row/column-selection
        # einsums (the MXU does the relayout; strided slicing lowers
        # catastrophically on TPU) + a 3x3/1 conv on the 12-channel s2d
        # image runs the chain at 0.38 ms (3.4x); the full YOLOX-X forward
        # drops 9.53 -> 7.82 ms (MFU 43.8 -> 54.4%) — the extra gain is the
        # downstream layout XLA picks once the stem output is a plain
        # NHWC conv result.  Same linear map; the selection weights are
        # exact 0/1 so the s2d values are bit-exact.
        n, ih, iw, _ = x.shape
        oh, ow = (ih + 1) // 2, (iw + 1) // 2
        xd = x.astype(self.dtype)
        ey = [
            (jnp.arange(oh)[:, None] * 2 + d == jnp.arange(ih)[None, :])
            .astype(self.dtype)
            for d in range(2)
        ]
        ex = [
            (jnp.arange(ow)[:, None] * 2 + d == jnp.arange(iw)[None, :])
            .astype(self.dtype)
            for d in range(2)
        ]
        subs = []
        for dy in range(2):
            zy = jnp.einsum("ih,bhwc->biwc", ey[dy], xd)
            for dx in range(2):
                subs.append(jnp.einsum("jw,biwc->bijc", ex[dx], zy))
        s2d = jnp.concatenate(subs, axis=-1)  # [n, oh, ow, (dy, dx, c)]
        # k6 row 2ki+dy / col 2kj+dx -> 3x3 kernel over (dy, dx, c) channels
        ks = (
            k6.reshape(3, 2, 3, 2, 3, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(3, 3, 12, self.features)
        )
        y = jax.lax.conv_general_dilated(
            s2d,
            ks.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = BatchNorm(
            self.features, eps=1e-3, use_batch_stats=False, name="bn"
        )(y)
        return nn.silu(y)


class Focus(nn.Module):
    """Space-to-depth stem: (H, W, C) -> (H/2, W/2, 4C) -> conv, computed
    as the equivalent single 6x6/2 convolution (see _FocusConvBnAct)."""

    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # the 6x6 rewrite hardcodes the 3x3-over-s2d kernel shape
        assert self.kernel == 3, "Focus 6x6 rewrite requires kernel=3"
        return _FocusConvBnAct(self.features, dtype=self.dtype,
                               name="conv")(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, dtype=self.dtype, name="conv1")(x)
        y = ConvBnAct(self.features, 3, dtype=self.dtype, name="conv2")(y)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class SPPBottleneck(nn.Module):
    features: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, dtype=self.dtype, name="conv1")(x)
        if tuple(self.kernel_sizes) == (5, 9, 13):
            # SPPF form: max is associative, so the 9x9 and 13x13 windows
            # are chained 5x5 pools (exact; -inf padding keeps borders
            # equal).  Measured 12x faster on v5e (0.25 -> 0.02 ms).
            pools = [x]
            for _ in range(3):
                pools.append(
                    nn.max_pool(pools[-1], (5, 5), strides=(1, 1),
                                padding=[(2, 2), (2, 2)])
                )
        else:
            pools = [x]
            for k in self.kernel_sizes:
                p = k // 2
                pools.append(
                    nn.max_pool(
                        x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)]
                    )
                )
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype, name="conv2")(x)


class CSPLayer(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.features * self.expansion)
        main = ConvBnAct(hidden, 1, dtype=self.dtype, name="conv1")(x)
        short = ConvBnAct(hidden, 1, dtype=self.dtype, name="conv2")(x)
        for i in range(self.n):
            main = Bottleneck(
                hidden, self.shortcut, 1.0, self.dtype, name=f"m_{i}"
            )(main)
        x = jnp.concatenate([main, short], axis=-1)
        return ConvBnAct(self.features, 1, dtype=self.dtype, name="conv3")(x)


class CSPDarknet(nn.Module):
    depth: float = 0.33
    width: float = 0.50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = lambda c: int(c * self.width)
        d = lambda n: _round_repeats(n, self.depth)
        x = Focus(w(64), 3, self.dtype, name="stem")(x)
        x = ConvBnAct(w(128), 3, 2, dtype=self.dtype, name="dark2_conv")(x)
        x = CSPLayer(w(128), d(3), dtype=self.dtype, name="dark2_csp")(x)
        x = ConvBnAct(w(256), 3, 2, dtype=self.dtype, name="dark3_conv")(x)
        c3 = CSPLayer(w(256), d(9), dtype=self.dtype, name="dark3_csp")(x)
        x = ConvBnAct(w(512), 3, 2, dtype=self.dtype, name="dark4_conv")(c3)
        c4 = CSPLayer(w(512), d(9), dtype=self.dtype, name="dark4_csp")(x)
        x = ConvBnAct(w(1024), 3, 2, dtype=self.dtype, name="dark5_conv")(c4)
        x = SPPBottleneck(w(1024), dtype=self.dtype, name="dark5_spp")(x)
        c5 = CSPLayer(
            w(1024), d(3), shortcut=False, dtype=self.dtype, name="dark5_csp"
        )(x)
        return c3, c4, c5


def _upsample2x(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class PAFPN(nn.Module):
    depth: float = 0.33
    width: float = 0.50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = lambda c: int(c * self.width)
        d = lambda n: _round_repeats(n, self.depth)
        c3, c4, c5 = CSPDarknet(self.depth, self.width, self.dtype,
                                name="backbone")(x)

        lat0 = ConvBnAct(w(512), 1, dtype=self.dtype, name="lateral_conv0")(c5)
        p4 = CSPLayer(
            w(512), d(3), shortcut=False, dtype=self.dtype, name="C3_p4"
        )(jnp.concatenate([_upsample2x(lat0), c4], axis=-1))

        red1 = ConvBnAct(w(256), 1, dtype=self.dtype, name="reduce_conv1")(p4)
        p3 = CSPLayer(
            w(256), d(3), shortcut=False, dtype=self.dtype, name="C3_p3"
        )(jnp.concatenate([_upsample2x(red1), c3], axis=-1))

        n3 = ConvBnAct(w(256), 3, 2, dtype=self.dtype, name="bu_conv2")(p3)
        n3 = CSPLayer(
            w(512), d(3), shortcut=False, dtype=self.dtype, name="C3_n3"
        )(jnp.concatenate([n3, red1], axis=-1))

        n4 = ConvBnAct(w(512), 3, 2, dtype=self.dtype, name="bu_conv1")(n3)
        n4 = CSPLayer(
            w(1024), d(3), shortcut=False, dtype=self.dtype, name="C3_n4"
        )(jnp.concatenate([n4, lat0], axis=-1))
        return p3, n3, n4


class YOLOXHead(nn.Module):
    num_classes: int = 1
    width: float = 0.50
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features):
        w = int(256 * self.width)
        outputs = []
        for lvl, feat in enumerate(features):
            x = ConvBnAct(w, 1, dtype=self.dtype, name=f"stem_{lvl}")(feat)
            cls_x = x
            for i in range(2):
                cls_x = ConvBnAct(
                    w, 3, dtype=self.dtype, name=f"cls_conv_{lvl}_{i}"
                )(cls_x)
            reg_x = x
            for i in range(2):
                reg_x = ConvBnAct(
                    w, 3, dtype=self.dtype, name=f"reg_conv_{lvl}_{i}"
                )(reg_x)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          name=f"cls_pred_{lvl}")(cls_x)
            reg = nn.Conv(4, (1, 1), dtype=self.dtype,
                          name=f"reg_pred_{lvl}")(reg_x)
            obj = nn.Conv(1, (1, 1), dtype=self.dtype,
                          name=f"obj_pred_{lvl}")(reg_x)
            outputs.append((reg, obj, cls))
        return outputs


@dataclasses.dataclass(frozen=True)
class YoloxConfig:
    depth: float = 0.33
    width: float = 0.50
    num_classes: int = 1
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: str = "float32"

    @classmethod
    def size(cls, name: str, **kw) -> "YoloxConfig":
        table = {
            "tiny": (0.33, 0.375),
            "s": (0.33, 0.50),
            "m": (0.67, 0.75),
            "l": (1.0, 1.0),
            "x": (1.33, 1.25),
        }
        d, w = table[name]
        return cls(depth=d, width=w, **kw)


class YOLOX(nn.Module):
    """Full detector: PAFPN features -> decoupled head -> decoded rows."""

    config: YoloxConfig = YoloxConfig()

    @nn.compact
    def __call__(self, x, decode: bool = True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        feats = PAFPN(cfg.depth, cfg.width, dtype, name="backbone")(x)
        raw = YOLOXHead(
            cfg.num_classes, cfg.width, cfg.strides, dtype, name="head"
        )(feats)
        if not decode:
            return raw
        return decode_outputs(raw, cfg.strides)


def decode_outputs(raw, strides: Sequence[int]) -> jnp.ndarray:
    """Grid-decode head outputs to ``[B, N, 5 + C]``:
    ``xy = (pred + grid) * stride``, ``wh = exp(pred) * stride``,
    sigmoid obj/cls — the standard YOLOX decode."""
    rows = []
    for (reg, obj, cls), stride in zip(raw, strides):
        b, h, w, _ = reg.shape
        gy, gx = jnp.mgrid[0:h, 0:w]
        grid = jnp.stack([gx, gy], axis=-1).astype(reg.dtype)  # (h, w, 2)
        xy = (reg[..., :2] + grid) * stride
        wh = jnp.exp(reg[..., 2:4]) * stride
        out = jnp.concatenate(
            [xy, wh, nn.sigmoid(obj), nn.sigmoid(cls)], axis=-1
        )
        rows.append(out.reshape(b, h * w, -1))
    return jnp.concatenate(rows, axis=1)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (official YOLOX key layout)
# ---------------------------------------------------------------------------

def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convbn(tree, path, torch_prefix, sd, params, stats):
    w = sd[f"{torch_prefix}.conv.weight"]
    _set(params, path + ("conv", "kernel"),
         np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0)))
    _set(params, path + ("bn", "weight"), np.asarray(sd[f"{torch_prefix}.bn.weight"]))
    _set(params, path + ("bn", "bias"), np.asarray(sd[f"{torch_prefix}.bn.bias"]))
    _set(stats, path + ("bn", "running_mean"),
         np.asarray(sd[f"{torch_prefix}.bn.running_mean"]))
    _set(stats, path + ("bn", "running_var"),
         np.asarray(sd[f"{torch_prefix}.bn.running_var"]))


def _csp(tree_path, torch_prefix, sd, params, stats, n):
    _convbn(None, tree_path + ("conv1",), f"{torch_prefix}.conv1", sd, params, stats)
    _convbn(None, tree_path + ("conv2",), f"{torch_prefix}.conv2", sd, params, stats)
    _convbn(None, tree_path + ("conv3",), f"{torch_prefix}.conv3", sd, params, stats)
    for i in range(n):
        _convbn(None, tree_path + (f"m_{i}", "conv1"),
                f"{torch_prefix}.m.{i}.conv1", sd, params, stats)
        _convbn(None, tree_path + (f"m_{i}", "conv2"),
                f"{torch_prefix}.m.{i}.conv2", sd, params, stats)


def convert_yolox_state_dict(
    sd: Dict[str, np.ndarray], config: YoloxConfig
) -> Dict[str, dict]:
    """Official YOLOX torch state dict -> this module's variables."""
    params: dict = {}
    stats: dict = {}
    d = lambda n: _round_repeats(n, config.depth)
    bb = ("backbone", "backbone")

    _convbn(None, bb + ("stem", "conv"), "backbone.backbone.stem.conv",
            sd, params, stats)
    _convbn(None, bb + ("dark2_conv",), "backbone.backbone.dark2.0",
            sd, params, stats)
    _csp(bb + ("dark2_csp",), "backbone.backbone.dark2.1", sd, params, stats, d(3))
    _convbn(None, bb + ("dark3_conv",), "backbone.backbone.dark3.0",
            sd, params, stats)
    _csp(bb + ("dark3_csp",), "backbone.backbone.dark3.1", sd, params, stats, d(9))
    _convbn(None, bb + ("dark4_conv",), "backbone.backbone.dark4.0",
            sd, params, stats)
    _csp(bb + ("dark4_csp",), "backbone.backbone.dark4.1", sd, params, stats, d(9))
    _convbn(None, bb + ("dark5_conv",), "backbone.backbone.dark5.0",
            sd, params, stats)
    _convbn(None, bb + ("dark5_spp", "conv1"), "backbone.backbone.dark5.1.conv1",
            sd, params, stats)
    _convbn(None, bb + ("dark5_spp", "conv2"), "backbone.backbone.dark5.1.conv2",
            sd, params, stats)
    _csp(bb + ("dark5_csp",), "backbone.backbone.dark5.2", sd, params, stats, d(3))

    neck = ("backbone",)
    _convbn(None, neck + ("lateral_conv0",), "backbone.lateral_conv0",
            sd, params, stats)
    _csp(neck + ("C3_p4",), "backbone.C3_p4", sd, params, stats, d(3))
    _convbn(None, neck + ("reduce_conv1",), "backbone.reduce_conv1",
            sd, params, stats)
    _csp(neck + ("C3_p3",), "backbone.C3_p3", sd, params, stats, d(3))
    _convbn(None, neck + ("bu_conv2",), "backbone.bu_conv2", sd, params, stats)
    _csp(neck + ("C3_n3",), "backbone.C3_n3", sd, params, stats, d(3))
    _convbn(None, neck + ("bu_conv1",), "backbone.bu_conv1", sd, params, stats)
    _csp(neck + ("C3_n4",), "backbone.C3_n4", sd, params, stats, d(3))

    for lvl in range(3):
        _convbn(None, ("head", f"stem_{lvl}"), f"head.stems.{lvl}",
                sd, params, stats)
        for i in range(2):
            _convbn(None, ("head", f"cls_conv_{lvl}_{i}"),
                    f"head.cls_convs.{lvl}.{i}", sd, params, stats)
            _convbn(None, ("head", f"reg_conv_{lvl}_{i}"),
                    f"head.reg_convs.{lvl}.{i}", sd, params, stats)
        for name, tname in (
            (f"cls_pred_{lvl}", f"head.cls_preds.{lvl}"),
            (f"reg_pred_{lvl}", f"head.reg_preds.{lvl}"),
            (f"obj_pred_{lvl}", f"head.obj_preds.{lvl}"),
        ):
            w = np.asarray(sd[f"{tname}.weight"])
            _set(params, ("head", name, "kernel"),
                 np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
            _set(params, ("head", name, "bias"),
                 np.asarray(sd[f"{tname}.bias"]))
    return {"params": params, "batch_stats": stats}
