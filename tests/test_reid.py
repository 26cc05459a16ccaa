"""Parity of the Flax GHOST ResNet-50 vs a stock torch ResNet-50 oracle.

The torch oracle below is the standard torchvision-style ResNet-50 (written
here from the published architecture) with the GHOST head: global max pool,
``red`` linear 2048->512, fc classifier, L2-normalized features.  BN runs in
train mode (batch statistics) to mirror the domain-adaptation behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from busca_tpu.models.reid import ReIDResNet

NUM_CLASSES = 13


class _TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, planes, stride=1):
        super().__init__()
        out_ch = planes * 4
        self.conv1 = tnn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
        self.relu = tnn.ReLU()
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class _TorchGhostResNet50(tnn.Module):
    def __init__(self, num_classes=NUM_CLASSES, red=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        in_ch = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3))
        ):
            stride = 1 if stage == 0 else 2
            stage_blocks = []
            for b in range(blocks):
                stage_blocks.append(
                    _TorchBottleneck(in_ch, planes, stride if b == 0 else 1)
                )
                in_ch = planes * 4
            layers.append(tnn.Sequential(*stage_blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.pool = tnn.AdaptiveMaxPool2d((1, 1))
        self.red = tnn.Linear(2048, 2048 // red)
        self.fc = tnn.Linear(2048 // red, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.pool(x).flatten(1)
        fc7 = self.red(x)
        logits = self.fc(fc7)
        feats = torch.nn.functional.normalize(fc7, p=2, dim=1)
        return logits, feats


def _np(t):
    return t.detach().cpu().numpy()


def _convert_bn(bn):
    return {
        "weight": jnp.asarray(_np(bn.weight)),
        "bias": jnp.asarray(_np(bn.bias)),
    }


def _convert_bottleneck(tb):
    p = {
        "conv1": {"kernel": jnp.asarray(_np(tb.conv1.weight).transpose(2, 3, 1, 0))},
        "bn1": _convert_bn(tb.bn1),
        "conv2": {"kernel": jnp.asarray(_np(tb.conv2.weight).transpose(2, 3, 1, 0))},
        "bn2": _convert_bn(tb.bn2),
        "conv3": {"kernel": jnp.asarray(_np(tb.conv3.weight).transpose(2, 3, 1, 0))},
        "bn3": _convert_bn(tb.bn3),
    }
    if tb.downsample is not None:
        p["downsample_conv"] = {
            "kernel": jnp.asarray(_np(tb.downsample[0].weight).transpose(2, 3, 1, 0))
        }
        p["downsample_bn"] = _convert_bn(tb.downsample[1])
    return p


def _convert_resnet(tm):
    params = {
        "conv1": {"kernel": jnp.asarray(_np(tm.conv1.weight).transpose(2, 3, 1, 0))},
        "bn1": _convert_bn(tm.bn1),
        "red": {
            "weight": jnp.asarray(_np(tm.red.weight)),
            "bias": jnp.asarray(_np(tm.red.bias)),
        },
        "fc": {
            "weight": jnp.asarray(_np(tm.fc.weight)),
            "bias": jnp.asarray(_np(tm.fc.bias)),
        },
    }
    for stage, layer in enumerate([tm.layer1, tm.layer2, tm.layer3, tm.layer4]):
        for b, block in enumerate(layer):
            params[f"layer{stage + 1}_{b}"] = _convert_bottleneck(block)
    return params


def test_reid_resnet_matches_torch_batchstat_mode(rng):
    torch.manual_seed(11)
    tm = _TorchGhostResNet50()
    tm.train()  # BN uses batch statistics — the domain-adaptation mode

    # Small crops keep the CPU test fast; parity is architecture-level.
    x = rng.randn(4, 96, 32, 3).astype(np.float32)
    with torch.no_grad():
        t_logits, t_feats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = ReIDResNet(num_classes=NUM_CLASSES)
    variables = {"params": _convert_resnet(tm)}
    logits, feats = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(feats), _np(t_feats), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits), _np(t_logits), rtol=1e-3, atol=1e-3
    )


def test_masked_bn_ignores_padding(rng):
    """Padded lanes must not change real samples' features."""
    torch.manual_seed(5)
    model = ReIDResNet(num_classes=NUM_CLASSES)
    x_real = rng.randn(3, 96, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_real))

    _, feats_real = model.apply(variables, jnp.asarray(x_real))

    # Pad with garbage lanes and mask them out.
    garbage = 100.0 * rng.randn(5, 96, 32, 3).astype(np.float32)
    x_pad = np.concatenate([x_real, garbage], axis=0)
    mask = np.array([1, 1, 1, 0, 0, 0, 0, 0], dtype=np.float32)
    _, feats_pad = model.apply(
        variables, jnp.asarray(x_pad), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(feats_pad)[:3], np.asarray(feats_real), rtol=1e-3, atol=1e-4
    )


def test_unmasked_bn_uses_whole_batch(rng):
    """Without a mask, adding samples changes BN stats (reference behavior)."""
    model = ReIDResNet(num_classes=NUM_CLASSES)
    x = rng.randn(2, 96, 32, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, f2 = model.apply(variables, jnp.asarray(x))
    x4 = np.concatenate([x, 10 * rng.randn(2, 96, 32, 3).astype(np.float32)])
    _, f4 = model.apply(variables, jnp.asarray(x4))
    assert not np.allclose(np.asarray(f4)[:2], np.asarray(f2), atol=1e-4)


def test_grouped_bn_matches_two_separate_calls(rng):
    """A single ReID pass with an [N, 2] group mask must reproduce two
    independent passes (the reference's separate memory/candidate batches,
    busca/network.py:192-193) — including padded lanes in each group."""
    model = ReIDResNet(layers=(1, 1, 1, 1), num_classes=5)
    n_a, n_b, h, w = 6, 4, 32, 16
    xa = rng.randn(n_a, h, w, 3).astype(np.float32)
    xb = rng.randn(n_b, h, w, 3).astype(np.float32)
    wa = np.array([1, 1, 1, 1, 0, 0], np.float32)  # 2 padded lanes
    wb = np.array([1, 1, 1, 0], np.float32)  # 1 padded lane
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(xa), jnp.asarray(wa)
    )

    _, fa = model.apply(variables, jnp.asarray(xa), jnp.asarray(wa))
    _, fb = model.apply(variables, jnp.asarray(xb), jnp.asarray(wb))

    merged = np.concatenate([xa, xb], axis=0)
    group = np.zeros((n_a + n_b, 2), np.float32)
    group[:n_a, 0] = wa
    group[n_a:, 1] = wb
    _, fm = model.apply(variables, jnp.asarray(merged), jnp.asarray(group))

    # real lanes must match the separate-call stats exactly; padded lanes are
    # excluded from statistics and dropped downstream — only finiteness
    # matters there (they normalize with a fallback group's stats).
    np.testing.assert_allclose(np.asarray(fm[:4]), np.asarray(fa[:4]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm[n_a:n_a + 3]),
                               np.asarray(fb[:3]), rtol=2e-4, atol=2e-5)
    assert np.isfinite(np.asarray(fm)).all()
