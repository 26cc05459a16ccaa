"""Shared torch oracle models for parity tests.

These are standard published architectures (ResNet-50 bottleneck stacks,
post-LN Transformer blocks, multidimensional sinusoidal positional encodings)
assembled from stock ``torch.nn`` primitives — written here independently as
test oracles for the Flax implementations.
"""

import numpy as np
import torch
import torch.nn as tnn


class TorchBottleneck(tnn.Module):
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


class TorchGhostResNet50(tnn.Module):
    """ResNet-50 with the GHOST head: max pool, red linear, L2-norm feats."""

    def __init__(self, num_classes=299, red=4, layers_cfg=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        in_ch = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), layers_cfg)
        ):
            stride = 1 if stage == 0 else 2
            stage_blocks = []
            for b in range(blocks):
                stage_blocks.append(
                    TorchBottleneck(in_ch, planes, stride if b == 0 else 1)
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

    def reference_state_dict(self):
        """State dict with the reference's ``reid_encoder.model.*`` layout."""
        out = {}
        for k, v in self.state_dict().items():
            out[f"reid_encoder.model.{k}"] = v.detach().numpy()
        return out


class TorchPostLNLayer(tnn.Module):
    """Post-LN encoder block (BUSCA layer arrangement)."""

    def __init__(self, d_model, nhead, ff, activation="gelu"):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(
            d_model, nhead, dropout=0.0, batch_first=True
        )
        self.linear1 = tnn.Linear(d_model, ff)
        self.linear2 = tnn.Linear(ff, d_model)
        self.norm1 = tnn.LayerNorm(d_model)
        self.norm2 = tnn.LayerNorm(d_model)
        self.act = {"gelu": tnn.GELU(), "relu": tnn.ReLU()}[activation]

    def forward(self, src):
        a, w = self.self_attn(src, src, src, average_attn_weights=False)
        src = self.norm1(src + a)
        f = self.linear2(self.act(self.linear1(src)))
        src = self.norm2(src + f)
        return src, w


def oracle_pe3d(xy, size, t, d_model):
    """PositionalEncoding3D evaluated at integer coords (numpy, f64)."""
    ch = int(np.ceil(d_model / 6) * 2)
    if ch % 2:
        ch += 1
    inv_freq = 1.0 / (10000 ** (np.arange(0, ch, 2, dtype=np.float64) / ch))

    def axis(p):
        ang = np.asarray(p, dtype=np.float64)[..., None] * inv_freq
        return np.stack([np.sin(ang), np.cos(ang)], axis=-1).reshape(
            *ang.shape[:-1], ch
        )

    full = np.concatenate([axis(xy), axis(size), axis(t)], axis=-1)
    return full[..., :d_model]


def oracle_distance_values(bbox, ref):
    xmin, ymin, xmax, ymax = ref[..., 0], ref[..., 1], ref[..., 2], ref[..., 3]
    w_ref, h_ref = xmax - xmin + 1, ymax - ymin + 1
    cxr, cyr = 0.5 * (xmin + xmax), 0.5 * (ymin + ymax)
    xmin, ymin, xmax, ymax = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    w, h = xmax - xmin + 1, ymax - ymin + 1
    cx, cy = 0.5 * (xmin + xmax), 0.5 * (ymin + ymax)
    xy = np.log(np.sqrt(((cx - cxr) / w) ** 2 + ((cy - cyr) / h) ** 2) + 1e-3)
    size = np.log(w / w_ref + 1e-3) + np.log(h / h_ref + 1e-3)
    return xy, size


def oracle_spatial_buckets(bbox, ref, max_dist=105):
    xy, size = oracle_distance_values(bbox, ref)
    xyb = np.trunc(np.clip(xy * 15.0, -max_dist, max_dist)).astype(int) + max_dist
    szb = np.trunc(np.clip(size * 15.0, -max_dist, max_dist)).astype(int) + max_dist
    return xyb, szb
