"""ReID appearance encoder: GHOST-variant ResNet-50 in Flax (NHWC, TPU-first).

Architecture parity with the reference (busca/reid/resnet.py, loaded by
busca/reid/load_trained_net.py:19-22 as ``resnet50(neck=0, red=4, pool='max')``
wrapped by ``ReID_Encoder`` at busca/network.py:510-575):

- stem: 7x7/2 conv (no bias) + BN + ReLU + 3x3/2 max-pool
- stages: bottleneck blocks [3, 4, 6, 3]
- head: global **max** pool -> ``red`` linear 2048->512 -> (classifier fc) and
  the feature output = **L2-normalized** 512-d vector (``output_option='plain'``,
  busca/reid/resnet.py:319-322).

The load-bearing quirk reproduced here: the reference keeps all BatchNorms in
*train* mode at inference ("on-the-fly domain adaptation",
busca/network.py:554-556), i.e. normalization uses the statistics of the
current batch, never the stored running averages.  Because the TPU build pads
track batches to bucketed shapes, BN exposes a ``sample_mask`` so statistics
are computed over *real* samples only — padded lanes must not perturb the
numerics (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from busca_tpu.models.transformer import TorchLinear

PRETRAINED_SIZE = (384, 128)  # (H, W) crop size the weights were trained with


class BatchNorm(nn.Module):
    """BatchNorm2d/1d with torch-train-mode semantics and optional masking.

    In ``use_batch_stats`` mode (the default — GHOST domain adaptation), the
    normalization statistics are the *biased* mean/var of the current batch;
    ``sample_mask`` excludes padded samples from the statistics while still
    normalizing them.  With ``use_batch_stats=False`` the stored running
    statistics are used (torch eval mode).

    ``sample_mask`` shapes:
      - ``[N]`` weights in {0,1}: one statistics group over the real samples.
      - ``[N, G]`` one-hot group weights (zero rows = padded): statistics are
        computed *per group* and each sample is normalized with its own
        group's statistics.  This lets one conv pass serve batches that the
        reference normalizes separately (e.g. memory vs candidate crops,
        busca/network.py:192-193) with identical numerics.

    Stats are computed as per-sample spatial partial sums reduced in f32,
    then combined across the batch with the mask weights — one fused pass
    over the activations, no full-tensor mask broadcast.
    """

    features: int
    eps: float = 1e-5
    use_batch_stats: bool = True

    def _sow_calib(self, count, sum_x, sum_x2):
        """Calibration aggregates for estimating frozen-mode running
        statistics (eval/frozen_delta.calibrate_batch_stats): when the
        ``bn_calib`` collection is mutable, record the batch's masked
        channel sums so the caller can pool exact population statistics
        across calibration batches.  No-op (and no extra compute) in
        ordinary forwards."""
        self.sow("bn_calib", "count", count)
        self.sow("bn_calib", "sum_x", sum_x)
        self.sow("bn_calib", "sum_x2", sum_x2)

    @nn.compact
    def __call__(self, x, sample_mask: Optional[jnp.ndarray] = None):
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        calibrating = self.is_mutable_collection("bn_calib")
        reduce_axes = tuple(range(x.ndim - 1))  # all but channel
        mean = var = None
        if not self.use_batch_stats:
            # torch eval mode: stored running statistics (only declared when
            # needed so batch-stat checkpoints don't have to carry them).
            running_mean = self.variable(
                "batch_stats", "running_mean",
                lambda: jnp.zeros((self.features,), jnp.float32),
            )
            running_var = self.variable(
                "batch_stats", "running_var",
                lambda: jnp.ones((self.features,), jnp.float32),
            )
            mean, var = running_mean.value, running_var.value
        elif sample_mask is None:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            if calibrating:
                n = float(np.prod(x.shape[:-1]))
                self._sow_calib(jnp.asarray(n, jnp.float32),
                                mean * n, (var + jnp.square(mean)) * n)
        else:
            xf = x.astype(jnp.float32)
            spatial_axes = tuple(range(1, x.ndim - 1))
            spatial = 1
            for s in x.shape[1:-1]:
                spatial *= s
            s1 = jnp.sum(xf, axis=spatial_axes)  # [N, C]
            s2 = jnp.sum(jnp.square(xf), axis=spatial_axes)  # [N, C]
            w = sample_mask.astype(jnp.float32)
            if w.ndim == 1:
                denom = jnp.maximum(jnp.sum(w) * spatial, 1.0)
                mean = (w @ s1) / denom  # [C]
                ex2 = (w @ s2) / denom
                var = ex2 - jnp.square(mean)
                if calibrating:
                    self._sow_calib(jnp.sum(w) * spatial, w @ s1, w @ s2)
            else:
                # grouped: [N, G] one-hot weights -> per-group stats, then
                # each sample selects its group's statistics.
                denom_g = jnp.maximum(
                    jnp.sum(w, axis=0) * spatial, 1.0
                )  # [G]
                mean_g = (w.T @ s1) / denom_g[:, None]  # [G, C]
                ex2_g = (w.T @ s2) / denom_g[:, None]
                var_g = jnp.maximum(ex2_g - jnp.square(mean_g), 0.0)
                inv_g = jnp.reciprocal(jnp.sqrt(var_g + self.eps))
                # per-sample stat selection: every row has at most one
                # nonzero group weight (one-hot up to multiplicity), so a
                # gather by argmax replaces two [N,G]@[G,C] matmuls per BN
                # (measurably cheaper at G=2R in batched multi-request
                # mode); padded rows (all-zero w) fall back to group 0
                ids = jnp.argmax(w, axis=-1)  # zero rows -> 0
                shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.features,)
                mean_n = mean_g[ids].reshape(shape)
                inv_n = inv_g[ids].reshape(shape)
                if calibrating:
                    m = jnp.sum(w, axis=1)  # per-sample multiplicity
                    self._sow_calib(jnp.sum(m) * spatial, m @ s1, m @ s2)
                y = (x.astype(jnp.float32) - mean_n) * inv_n * scale + bias
                return y.astype(x.dtype)
        var = jnp.maximum(var, 0.0)
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(x.dtype)


class Bottleneck(nn.Module):
    """torch-style bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4), post-add ReLU."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    use_batch_stats: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sample_mask=None):
        width = self.planes
        out_ch = self.planes * 4

        def conv(name, features, kernel, stride=1, padding=0):
            return nn.Conv(
                features,
                (kernel, kernel),
                strides=(stride, stride),
                padding=[(padding, padding)] * 2,
                use_bias=False,
                dtype=self.dtype,
                name=name,
            )

        identity = x
        out = conv("conv1", width, 1)(x)
        out = BatchNorm(width, use_batch_stats=self.use_batch_stats, name="bn1")(
            out, sample_mask
        )
        out = nn.relu(out)
        out = conv("conv2", width, 3, self.stride, 1)(out)
        out = BatchNorm(width, use_batch_stats=self.use_batch_stats, name="bn2")(
            out, sample_mask
        )
        out = nn.relu(out)
        out = conv("conv3", out_ch, 1)(out)
        out = BatchNorm(
            out_ch, use_batch_stats=self.use_batch_stats, name="bn3"
        )(out, sample_mask)
        if self.has_downsample:
            identity = conv("downsample_conv", out_ch, 1, self.stride)(x)
            identity = BatchNorm(
                out_ch, use_batch_stats=self.use_batch_stats,
                name="downsample_bn",
            )(identity, sample_mask)
        return nn.relu(out + identity)


class ReIDResNet(nn.Module):
    """GHOST ResNet-50 feature extractor.

    Returns ``(logits, feats)`` like the reference forward
    (busca/reid/resnet.py:266-334).  ``feats`` is the 512-d L2-normalized
    embedding (``output_option='plain'``); set ``output_option='norm'`` for
    the raw (unnormalized) fc7 features.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 299
    red: int = 4
    pool: str = "max"
    use_batch_stats: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        sample_mask: Optional[jnp.ndarray] = None,
        output_option: str = "plain",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward.

        Args:
          x: ``[N, H, W, 3]`` NHWC crops, normalized (the BGR mean/std pipeline
            happens upstream in the crop kernel).
          sample_mask: ``[N]`` 0/1 — samples excluded from BN statistics.
        """
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = BatchNorm(64, use_batch_stats=self.use_batch_stats, name="bn1")(
            x, sample_mask
        )
        x = nn.relu(x)
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        plane_sizes = (64, 128, 256, 512)
        in_ch = 64
        for stage, (planes, blocks) in enumerate(zip(plane_sizes, self.layers)):
            stride = 1 if stage == 0 else 2
            for block in range(blocks):
                s = stride if block == 0 else 1
                has_ds = block == 0 and (s != 1 or in_ch != planes * 4)
                x = Bottleneck(
                    planes,
                    s,
                    has_ds,
                    self.use_batch_stats,
                    self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, sample_mask)
                in_ch = planes * 4

        if self.pool == "max":
            x = jnp.max(x, axis=(1, 2))
        else:
            x = jnp.mean(x, axis=(1, 2))
        fc7 = x.astype(jnp.float32)  # [N, 2048]

        if self.red and self.red != 1:
            fc7 = TorchLinear(2048, 2048 // self.red, name="red")(fc7)

        logits = TorchLinear(
            2048 // (self.red or 1), self.num_classes, name="fc"
        )(fc7)

        if output_option == "plain":
            norm = jnp.maximum(
                jnp.linalg.norm(fc7, axis=-1, keepdims=True), 1e-12
            )
            feats = fc7 / norm
        elif output_option == "norm":
            feats = fc7
        else:
            raise ValueError(f"unsupported output_option: {output_option!r}")
        return logits, feats
