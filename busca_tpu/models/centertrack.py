"""CenterTrack detector: DLA-34 + deformable upsampling, TPU-native.

Rebuilds the detector the CenterTrack adapter drives
(adapters/CenterTrack/src/lib/detector.py:100-190): the DLA-34 backbone
(Deep Layer Aggregation: hierarchical Tree stages with Root fusion), the
DLAUp/IDAUp decoder where every projection/node conv is a DCNv2 modulated
deformable convolution (ops/deform.py replaces the CUDA extension), the
CenterTrack input fusion (current image + previous image + prior heatmap
summed after their stem convs), and CenterNet heads at stride 4.

The CenterTrack submodule itself is empty in the reference checkout; the
architecture is layer-exact with the published DLA-34/DLASeg design
(``base`` Trees, iterative ``dla_up.ida_i`` stages, the final ``ida_up``,
grouped bilinear-init transposed-conv upsamples, DCNv2 proj/node convs) so
published ``.pth`` checkpoints load through
:func:`busca_tpu.models.convert.convert_centertrack_state_dict`; the IO
contract (dict detections into the ByteTrack-based shim
``adapters/CenterTrack/src/lib/utils/tracker.py:40-74``, per-video reset,
``pre_img``/``pre_hm`` statefulness) matches the adapter exactly.
Decode reuses :func:`busca_tpu.models.transcenter.generic_decode` (the same
CenterNet peak decode both detectors share upstream).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from busca_tpu.ops.deform import deform_conv2d


class ConvBn(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=[(p, p), (p, p)],
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """DLA basic residual block (two 3x3 convs)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn2")(y)
        return nn.relu(y + residual)


class Root(nn.Module):
    """DLA root: concat children -> 1x1 conv (+ optional residual)."""

    features: int
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, children):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn")(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """DLA hierarchical aggregation tree (dla.py Tree of the published DLA)."""

    levels: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None):
        children = [] if children is None else list(children)
        if self.stride > 1:
            bottom = nn.max_pool(
                x, (self.stride, self.stride),
                strides=(self.stride, self.stride),
            )
        else:
            bottom = x
        if x.shape[-1] != self.features:
            project = nn.Conv(
                self.features, (1, 1), use_bias=False, dtype=self.dtype,
                name="project_conv",
            )(bottom)
            project = nn.BatchNorm(
                use_running_average=True, dtype=self.dtype, name="project_bn"
            )(project)
        else:
            project = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            t1 = BasicBlock(
                self.features, self.stride, self.dtype, name="tree1"
            )(x, residual=project)
            t2 = BasicBlock(self.features, 1, self.dtype, name="tree2")(t1)
            return Root(
                self.features, self.root_residual, self.dtype, name="root"
            )([t2, t1] + children)
        t1 = Tree(
            self.levels - 1, self.features, self.stride,
            root_residual=self.root_residual, dtype=self.dtype, name="tree1",
        )(x, residual=project)
        return Tree(
            self.levels - 1, self.features, 1,
            root_residual=self.root_residual, dtype=self.dtype, name="tree2",
        )(t1, children=children + [t1])


class DLABase(nn.Module):
    """DLA backbone trunk with the CenterTrack input fusion.

    CenterTrack extends DLA's base layer with two extra stems whose outputs
    are *summed* into the image stem: one for the previous frame and one for
    the prior heatmap (the published DLASeg ``pre_img_layer``/
    ``pre_hm_layer`` design).
    """

    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    levels: Tuple[int, ...] = (1, 1, 1, 2, 2, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None):
        ch = self.channels
        base = ConvBn(ch[0], 7, 1, self.dtype, name="base_layer")(x)
        if pre_img is not None:
            base = base + ConvBn(ch[0], 7, 1, self.dtype,
                                 name="pre_img_layer")(pre_img)
        if pre_hm is not None:
            base = base + ConvBn(ch[0], 7, 1, self.dtype,
                                 name="pre_hm_layer")(pre_hm)
        outs = []
        y = ConvBn(ch[0], 3, 1, self.dtype, name="level0")(base)
        outs.append(y)
        y = ConvBn(ch[1], 3, 2, self.dtype, name="level1")(y)
        outs.append(y)
        y = Tree(self.levels[2], ch[2], 2, level_root=False,
                 dtype=self.dtype, name="level2")(y)
        outs.append(y)
        y = Tree(self.levels[3], ch[3], 2, level_root=True,
                 dtype=self.dtype, name="level3")(y)
        outs.append(y)
        y = Tree(self.levels[4], ch[4], 2, level_root=True,
                 dtype=self.dtype, name="level4")(y)
        outs.append(y)
        y = Tree(self.levels[5], ch[5], 2, level_root=True,
                 dtype=self.dtype, name="level5")(y)
        outs.append(y)
        return outs  # strides 1, 2, 4, 8, 16, 32


class DeformConvBlock(nn.Module):
    """DCNv2 conv with self-predicted offsets+mask (the DLAUp node/proj op —
    replaces the DCNv2 CUDA extension via ops/deform.deform_conv2d).

    ``sampling="local"`` pins the taps to the integer grid (modulation
    kept) — the dense-MXU throughput mode for training from scratch; the
    free-form bilinear gathers are the entire cost of the exact DCN on TPU
    (measured ~10.5 ms/block at [136, 240, 64] vs ~1 ms local; converted
    checkpoints need the exact default).  ``sampling="windowed"`` is the
    middle ground for converted checkpoints: gather-free dense shifted
    sums, bit-equal to the exact DCN wherever ``|offset| <= window``
    (ops/deform.deform_conv2d_windowed)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    sampling: str = "deformable"
    window: int = 3

    @nn.compact
    def __call__(self, x):
        # offset/mask conv: 3*3*3 channels = (dy,dx) * 9 taps + 9 masks
        om = nn.Conv(
            27, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_offset_mask",
        )(x)
        offset = om[..., :18]
        mask = jax.nn.sigmoid(om[..., 18:])
        weight = self.param(
            "weight",
            nn.initializers.he_normal(),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.sampling == "local":
            from busca_tpu.ops.deform import local_modulated_conv2d

            y = local_modulated_conv2d(x, weight, mask, bias, stride=1,
                                       padding=1)
        elif self.sampling == "windowed":
            from busca_tpu.ops.deform import deform_conv2d_windowed

            y = deform_conv2d_windowed(x, offset, weight, mask, bias,
                                       stride=1, padding=1,
                                       window=self.window)
        else:
            y = deform_conv2d(x, offset, weight, mask, bias, stride=1,
                              padding=1)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="bn")(y)
        return nn.relu(y)


def _bilinear_up_kernel(k: int) -> np.ndarray:
    """The published ``fill_up_weights`` bilinear kernel for size ``k``."""
    f = int(np.ceil(k / 2.0))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    v = 1.0 - np.abs(np.arange(k) / f - c)
    return (v[:, None] * v[None, :]).astype(np.float32)


class UpConv(nn.Module):
    """Grouped learned upsample — torch ``ConvTranspose2d(o, o, 2f, stride=f,
    padding=f//2, groups=o)`` with the published bilinear ``fill_up_weights``
    init, expressed as the equivalent lhs-dilated depthwise conv (the
    converter stores the torch kernel spatially flipped)."""

    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        k = 2 * f
        o = x.shape[-1]

        def init(key, shape, dtype=jnp.float32):
            base = _bilinear_up_kernel(k)[:, :, None, None]
            return jnp.asarray(np.broadcast_to(base, shape), dtype)

        kernel = self.param("kernel", init, (k, k, 1, o))
        pad = k - 1 - f // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=o,
        )


class IDAUp(nn.Module):
    """Iterative deep aggregation, layer-exact with the published IDAUp
    (CenterNet pose_dla_dcn / CenterTrack dla.py): for each level past
    ``startp``, DCN-project to the target width, learned-upsample to the
    previous level's stride, and fuse with a DCN node conv, mutating the
    level list in place.  Upsample factors are derived from the static
    spatial shapes (== the published ``up_f`` lists for every shipped
    configuration)."""

    dtype: jnp.dtype = jnp.float32
    sampling: str = "deformable"
    window: int = 3

    @nn.compact
    def __call__(self, layers, startp, endp):
        layers = list(layers)
        o = layers[startp].shape[-1]
        for i in range(startp + 1, endp):
            k = i - startp
            y = DeformConvBlock(o, self.dtype, self.sampling, self.window,
                                name=f"proj_{k}")(layers[i])
            f = layers[i - 1].shape[1] // y.shape[1]
            if f > 1:
                y = UpConv(f, self.dtype, name=f"up_{k}")(y)
            layers[i] = DeformConvBlock(o, self.dtype, self.sampling,
                                        self.window,
                                        name=f"node_{k}")(y + layers[i - 1])
        return layers


class DLAUp(nn.Module):
    """The published DLAUp: ``ida_i`` stages repeatedly fuse the deepest
    levels into shallower scales; returns the per-scale aggregated pyramid
    ``[stride 2^first_level, ..., deepest original]``."""

    first_level: int
    dtype: jnp.dtype = jnp.float32
    sampling: str = "deformable"
    window: int = 3

    @nn.compact
    def __call__(self, layers):
        layers = list(layers)
        n = len(layers)
        out = [layers[-1]]
        for i in range(n - self.first_level - 1):
            layers = IDAUp(self.dtype, self.sampling, self.window,
                           name=f"ida_{i}")(layers, n - i - 2, n)
            out.insert(0, layers[-1])
        return out


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand 1x1 -> depthwise 3x3 -> linear
    1x1), ReLU6 activations — the published block the reference's mobilenet
    backbone compatibility file wraps
    (adapters/CenterTrack/src/lib/model/networks/backbones/mobilenet.py:56-83).
    """

    features: int
    stride: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name="expand_bn")(y)
            y = jnp.minimum(nn.relu(y), 6.0)
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], feature_group_count=hidden,
            use_bias=False, dtype=self.dtype, name="dw_conv",
        )(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="dw_bn")(y)
        y = jnp.minimum(nn.relu(y), 6.0)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                         name="project_bn")(y)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


class MobileNetV2Backbone(nn.Module):
    """MobileNetV2 feature pyramid (strides 4/8/16/32) with the CenterTrack
    pre_img/pre_hm stem fusion — the alternate backbone the reference adapter
    patches in (backbones/mobilenet.py:85-183; inverted-residual settings
    t,c,n,s per the published table)."""

    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None):
        def c(ch):
            return max(int(ch * self.width_mult + 0.5), 4)

        def stem(inp, name):
            y = nn.Conv(c(32), (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(inp)
            y = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"{name}_bn")(y)
            return jnp.minimum(nn.relu(y), 6.0)

        y = stem(x, "stem")
        if pre_img is not None:
            y = y + stem(pre_img, "pre_img_stem")
        if pre_hm is not None:
            y = y + stem(pre_hm, "pre_hm_stem")

        # (expand t, channels c, repeats n, stride s) — published V2 table
        settings = [
            (1, 16, 1, 1),
            (6, 24, 2, 2),   # -> stride 4
            (6, 32, 3, 2),   # -> stride 8
            (6, 64, 4, 2),
            (6, 96, 3, 1),   # -> stride 16
            (6, 160, 3, 2),
            (6, 320, 1, 1),  # -> stride 32
        ]
        outs = []
        idx = 0
        for si, (t, ch, n, s) in enumerate(settings):
            for i in range(n):
                y = InvertedResidual(
                    c(ch), s if i == 0 else 1, t, self.dtype,
                    name=f"block{idx}",
                )(y)
                idx += 1
            if si in (1, 2, 4, 6):
                outs.append(y)
        return outs  # strides 4, 8, 16, 32


@dataclasses.dataclass(frozen=True)
class CenterTrackConfig:
    backbone: str = "dla"  # "dla" (DLA-34) or "mobilenet" (MobileNetV2)
    channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    levels: Tuple[int, ...] = (1, 1, 1, 2, 2, 1)
    width_mult: float = 1.0  # mobilenet width multiplier
    head_dim: int = 256
    down_ratio: int = 4
    num_classes: int = 1
    K: int = 100
    dtype: str = "float32"
    # "deformable" = exact DCNv2 (converted checkpoints); "windowed" =
    # gather-free dense shifts, == exact wherever |offset| <= dcn_window
    # (converted-checkpoint throughput mode); "local" = fixed-support
    # modulated conv (from-scratch throughput mode)
    sampling: str = "deformable"
    dcn_window: int = 3

    @classmethod
    def tiny(cls, **kw) -> "CenterTrackConfig":
        defaults = dict(
            channels=(4, 8, 8, 16, 16, 32),
            levels=(1, 1, 1, 1, 1, 1),
            width_mult=0.125,
            head_dim=16,
            K=8,
        )
        defaults.update(kw)
        return cls(**defaults)


class CenterTrackNet(nn.Module):
    """(image, pre_img, pre_hm) -> {hm, reg, wh, tracking} at stride 4."""

    config: CenterTrackConfig = CenterTrackConfig()

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        if cfg.backbone == "mobilenet":
            pyramid = MobileNetV2Backbone(
                cfg.width_mult, dtype, name="base"
            )(x, pre_img, pre_hm)  # strides 4, 8, 16, 32
            first_level = 0
        else:
            pyramid = DLABase(cfg.channels, cfg.levels, dtype, name="base")(
                x, pre_img, pre_hm
            )  # strides 1..32
            first_level = int(np.log2(cfg.down_ratio))
        # Published DLASeg decode: DLAUp over all levels, then a final IDAUp
        # over the aggregated scales below last_level, heads on its output.
        outs = DLAUp(first_level, dtype, cfg.sampling, cfg.dcn_window,
                     name="dla_up")(pyramid)
        y = outs[: len(outs) - 1]  # last_level - first_level scales
        fused = IDAUp(dtype, cfg.sampling, cfg.dcn_window,
                      name="ida_up")(y, 0, len(y))[-1]

        def head(out_d, name, bias_init=0.0):
            h = nn.Conv(
                cfg.head_dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype,
                name=f"{name}_conv",
            )(fused)
            h = nn.relu(h)
            return nn.Conv(
                out_d, (1, 1), dtype=dtype,
                bias_init=nn.initializers.constant(bias_init),
                name=f"{name}_out",
            )(h)

        return {
            "hm": head(cfg.num_classes, "hm", bias_init=-4.6),
            "reg": head(2, "reg"),
            "wh": head(2, "wh"),
            "tracking": head(2, "tracking"),
        }
