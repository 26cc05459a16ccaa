"""Per-detection ReID feature extraction for the live tracking paths.

The GHOST path computes ReID features for every detection each frame
(adapters/GHOST/src/base_tracker.py:116 ``get_features``; manager.py loads
the net at :139-146), and GHOST's BUSCA Kalman candidates need *fresh*
features computed on the crop (src/tracker.py:684-708).  StrongSORT normally
reads precomputed features from .npy but falls back to the same encoder when
they are absent.

TPU-first: crops -> GHOST normalization -> ReID ResNet-50 (batch-stat BN =
domain adaptation) as one jitted call with **bucketed** batch sizes, so the
per-frame detection-count churn never recompiles; padded lanes are excluded
from the BN statistics by the sample mask (the §7.3.2 parity trap).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


class ReidFeatureExtractor:
    """``crops_uint8 [N, H, W, 3] (BGR) -> features [N, D]`` callable.

    Plugs into ``GhostTracker(feature_extractor=...)`` and the StrongSORT
    live path.  Weights come from the converted GHOST checkpoint
    (``models/convert.py`` on ``model_feats.pth``) or random init for
    integration tests.
    """

    def __init__(
        self,
        variables: Optional[dict] = None,
        layers: Sequence[int] = (3, 4, 6, 3),
        num_classes: int = 299,
        crop_hw: Tuple[int, int] = (384, 128),
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        dtype: str = "float32",
        output_option: str = "plain",
    ):
        import jax
        import jax.numpy as jnp

        from busca_tpu.models.busca import (
            INPUT_PIXEL_MEAN_BGR,
            INPUT_PIXEL_STD_BGR,
        )
        from busca_tpu.models.reid import ReIDResNet

        self.crop_hw = tuple(crop_hw)
        self.buckets = tuple(sorted(buckets))
        model = ReIDResNet(
            layers=tuple(layers),
            num_classes=num_classes,
            dtype=jnp.dtype(dtype),
        )
        h, w = self.crop_hw
        if variables is None:
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32)
            )
        self.variables = variables
        mean = jnp.asarray(INPUT_PIXEL_MEAN_BGR)
        std = jnp.asarray(INPUT_PIXEL_STD_BGR)
        option = output_option

        @functools.partial(jax.jit, static_argnames=())
        def run(variables, crops_u8, mask):
            x = crops_u8.astype(jnp.float32)
            x = ((x / 255.0 - mean) / std)[..., ::-1]  # BGR norm -> RGB
            _, feats = model.apply(
                variables, x, sample_mask=mask, output_option=option
            )
            return feats

        self._run = run

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def __call__(self, crops_uint8: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        crops = np.asarray(crops_uint8)
        n = crops.shape[0]
        if n == 0:
            return np.zeros((0, 512), np.float32)
        out = []
        max_b = self.buckets[-1]
        for start in range(0, n, max_b):
            chunk = crops[start : start + max_b]
            c = len(chunk)
            b = self._bucket(c)
            if b > c:
                pad = np.zeros((b - c,) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            mask = np.zeros((b,), np.float32)
            mask[:c] = 1.0
            feats = self._run(
                self.variables, jnp.asarray(chunk), jnp.asarray(mask)
            )
            out.append(np.asarray(feats)[:c])
        return np.concatenate(out, axis=0)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "ReidFeatureExtractor":
        """Build from a converted (.npz) or reference (.pth) GHOST ReID
        checkpoint (busca/reid/load_trained_net.py semantics)."""
        if path.endswith(".npz"):
            from busca_tpu.models.checkpoint import load_params_npz

            variables = load_params_npz(path)
        else:
            from busca_tpu.models.convert import (
                convert_resnet_state_dict,
                load_torch_checkpoint,
            )

            variables = convert_resnet_state_dict(load_torch_checkpoint(path))
        return cls(variables=variables, **kw)
