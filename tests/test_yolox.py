"""YOLOX-JAX vs a torch oracle built with the official module layout.

The torch oracle below reproduces the published YOLOX graph (Focus stem, CSP
stages, SPP, PAFPN, decoupled head) with the official attribute names, so its
``state_dict()`` has exactly the reference checkpoint key layout — pushing it
through ``convert_yolox_state_dict`` validates both the model and converter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from busca_tpu.models.yolox import (
    YOLOX,
    YoloxConfig,
    convert_yolox_state_dict,
    decode_outputs,
)

DEPTH, WIDTH, NC = 0.33, 0.25, 2


import pytest

pytestmark = pytest.mark.slow  # heavy: training / full-size torch oracles


class TConv(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)
        self.act = tnn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TFocus(tnn.Module):
    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.conv = TConv(cin * 4, cout, k)

    def forward(self, x):
        tl = x[..., ::2, ::2]
        bl = x[..., 1::2, ::2]
        tr = x[..., ::2, 1::2]
        br = x[..., 1::2, 1::2]
        return self.conv(torch.cat([tl, bl, tr, br], 1))


class TBottleneck(tnn.Module):
    def __init__(self, cin, cout, shortcut=True):
        super().__init__()
        self.conv1 = TConv(cin, cout, 1)
        self.conv2 = TConv(cout, cout, 3)
        self.add = shortcut and cin == cout

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.add else y


class TSPP(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        hidden = cin // 2
        self.conv1 = TConv(cin, hidden, 1)
        self.m = tnn.ModuleList(
            [tnn.MaxPool2d(k, 1, k // 2) for k in (5, 9, 13)]
        )
        self.conv2 = TConv(hidden * 4, cout, 1)

    def forward(self, x):
        x = self.conv1(x)
        return self.conv2(torch.cat([x] + [m(x) for m in self.m], 1))


class TCSP(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=True):
        super().__init__()
        hidden = int(cout * 0.5)
        self.conv1 = TConv(cin, hidden, 1)
        self.conv2 = TConv(cin, hidden, 1)
        self.conv3 = TConv(2 * hidden, cout, 1)
        self.m = tnn.Sequential(
            *[TBottleneck(hidden, hidden, shortcut) for _ in range(n)]
        )

    def forward(self, x):
        a = self.m(self.conv1(x))
        b = self.conv2(x)
        return self.conv3(torch.cat([a, b], 1))


def _d(n):
    return max(round(n * DEPTH), 1)


def _w(c):
    return int(c * WIDTH)


class TDarknet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stem = TFocus(3, _w(64), 3)
        self.dark2 = tnn.Sequential(
            TConv(_w(64), _w(128), 3, 2), TCSP(_w(128), _w(128), _d(3))
        )
        self.dark3 = tnn.Sequential(
            TConv(_w(128), _w(256), 3, 2), TCSP(_w(256), _w(256), _d(9))
        )
        self.dark4 = tnn.Sequential(
            TConv(_w(256), _w(512), 3, 2), TCSP(_w(512), _w(512), _d(9))
        )
        self.dark5 = tnn.Sequential(
            TConv(_w(512), _w(1024), 3, 2),
            TSPP(_w(1024), _w(1024)),
            TCSP(_w(1024), _w(1024), _d(3), shortcut=False),
        )

    def forward(self, x):
        x = self.stem(x)
        x = self.dark2(x)
        c3 = self.dark3(x)
        c4 = self.dark4(c3)
        c5 = self.dark5(c4)
        return c3, c4, c5


class TPAFPN(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TDarknet()
        self.upsample = tnn.Upsample(scale_factor=2, mode="nearest")
        self.lateral_conv0 = TConv(_w(1024), _w(512), 1)
        self.C3_p4 = TCSP(_w(1024), _w(512), _d(3), shortcut=False)
        self.reduce_conv1 = TConv(_w(512), _w(256), 1)
        self.C3_p3 = TCSP(_w(512), _w(256), _d(3), shortcut=False)
        self.bu_conv2 = TConv(_w(256), _w(256), 3, 2)
        self.C3_n3 = TCSP(_w(512), _w(512), _d(3), shortcut=False)
        self.bu_conv1 = TConv(_w(512), _w(512), 3, 2)
        self.C3_n4 = TCSP(_w(1024), _w(1024), _d(3), shortcut=False)

    def forward(self, x):
        c3, c4, c5 = self.backbone(x)
        lat0 = self.lateral_conv0(c5)
        p4 = self.C3_p4(torch.cat([self.upsample(lat0), c4], 1))
        red1 = self.reduce_conv1(p4)
        p3 = self.C3_p3(torch.cat([self.upsample(red1), c3], 1))
        n3 = self.C3_n3(torch.cat([self.bu_conv2(p3), red1], 1))
        n4 = self.C3_n4(torch.cat([self.bu_conv1(n3), lat0], 1))
        return p3, n3, n4


class TYOLOX(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TPAFPN()
        w = _w(256)
        self.head = tnn.Module()
        self.head.stems = tnn.ModuleList()
        self.head.cls_convs = tnn.ModuleList()
        self.head.reg_convs = tnn.ModuleList()
        self.head.cls_preds = tnn.ModuleList()
        self.head.reg_preds = tnn.ModuleList()
        self.head.obj_preds = tnn.ModuleList()
        for lvl, cin in enumerate((_w(256), _w(512), _w(1024))):
            self.head.stems.append(TConv(cin, w, 1))
            self.head.cls_convs.append(
                tnn.Sequential(TConv(w, w, 3), TConv(w, w, 3))
            )
            self.head.reg_convs.append(
                tnn.Sequential(TConv(w, w, 3), TConv(w, w, 3))
            )
            self.head.cls_preds.append(tnn.Conv2d(w, NC, 1))
            self.head.reg_preds.append(tnn.Conv2d(w, 4, 1))
            self.head.obj_preds.append(tnn.Conv2d(w, 1, 1))

    def forward(self, x):
        feats = self.backbone(x)
        outs = []
        for lvl, f in enumerate(feats):
            s = self.head.stems[lvl](f)
            c = self.head.cls_convs[lvl](s)
            r = self.head.reg_convs[lvl](s)
            outs.append(
                (
                    self.head.reg_preds[lvl](r),
                    self.head.obj_preds[lvl](r),
                    self.head.cls_preds[lvl](c),
                )
            )
        return outs


def test_yolox_matches_torch_oracle(rng):
    torch.manual_seed(1)
    tm = TYOLOX().eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * 0.5 + 0.75
                )

    x = rng.randn(1, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        t_raw = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    cfg = YoloxConfig(depth=DEPTH, width=WIDTH, num_classes=NC)
    model = YOLOX(cfg)
    variables = convert_yolox_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, cfg
    )
    raw = model.apply(variables, jnp.asarray(x), decode=False)

    for (reg, obj, cls), (t_reg, t_obj, t_cls) in zip(raw, t_raw):
        np.testing.assert_allclose(
            np.asarray(reg), t_reg.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(obj), t_obj.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(cls), t_cls.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )

    # decoded rows: count = sum of grid sizes, xywh in input pixels
    decoded = model.apply(variables, jnp.asarray(x), decode=True)
    want_rows = (64 // 8) * (96 // 8) + (64 // 16) * (96 // 16) + (64 // 32) * (96 // 32)
    assert decoded.shape == (1, want_rows, 5 + NC)
    d = np.asarray(decoded)
    assert (d[..., 4] >= 0).all() and (d[..., 4] <= 1).all()  # sigmoid obj


def test_yolox_sizes():
    assert YoloxConfig.size("x").depth == 1.33
    assert YoloxConfig.size("x").width == 1.25
    assert YoloxConfig.size("s").width == 0.50


def test_yolox_feeds_postprocess(rng):
    from busca_tpu.ops.nms import yolox_postprocess

    cfg = YoloxConfig(depth=DEPTH, width=WIDTH, num_classes=NC)
    model = YOLOX(cfg)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    decoded = model.apply(variables, x)
    out, valid = yolox_postprocess(decoded[0], NC, 0.01, 0.5, 32)
    assert out.shape == (32, 7)


def test_focus_conv6_equals_s2d_conv3(rng):
    """The 6x6/2 stem rewrite must equal the literal s2d + 3x3 conv
    formulation bit-for-bit up to f32 reassociation."""
    import jax
    import jax.numpy as jnp

    from busca_tpu.models.yolox import Focus

    x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
    mod = Focus(24)
    variables = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(variables, x)

    # literal reference formulation with the same parameters
    k3 = variables["params"]["conv"]["conv"]["kernel"]
    s2d = jnp.concatenate(
        [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )
    ref = jax.lax.conv_general_dilated(
        s2d, k3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    from busca_tpu.models.reid import BatchNorm

    bn = BatchNorm(24, eps=1e-3, use_batch_stats=False)
    ref = bn.apply(
        {"params": variables["params"]["conv"]["bn"],
         "batch_stats": variables["batch_stats"]["conv"]["bn"]},
        ref,
    )
    import flax.linen as nn

    ref = nn.silu(ref)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5
    )


def test_sppf_equals_literal_spp(rng):
    """Chained 5x5 max pools == direct 5/9/13 pools, elementwise."""
    import flax.linen as nn
    import jax.numpy as jnp

    x = jnp.asarray(rng.randn(2, 13, 17, 8).astype(np.float32))
    p5 = nn.max_pool(x, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
    p9 = nn.max_pool(x, (9, 9), strides=(1, 1), padding=[(4, 4), (4, 4)])
    p13 = nn.max_pool(x, (13, 13), strides=(1, 1), padding=[(6, 6), (6, 6)])
    c5 = p5
    c9 = nn.max_pool(c5, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
    c13 = nn.max_pool(c9, (5, 5), strides=(1, 1), padding=[(2, 2), (2, 2)])
    np.testing.assert_array_equal(np.asarray(p9), np.asarray(c9))
    np.testing.assert_array_equal(np.asarray(p13), np.asarray(c13))
