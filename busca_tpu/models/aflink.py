"""AFLink: appearance-free tracklet linking (StrongSORT post-processing).

The reference optionally applies AFLink after StrongSORT
(adapters/StrongSORT/strong_sort.py:29-38: ``PostLinker`` model + ``AFLink``
linker with thrT=(0, 30), thrS=75, thrP=0.05).  The model itself lives in the
StrongSORT submodule (empty in the reference checkout) and its trained
weights are a release download the reference does not vendor — so this is a
full rebuild of the published design (Du et al., StrongSORT: Make DeepSORT
Great Again, AFLink module):

- each tracklet contributes a 30-frame window of (frame, cx, cy) features;
- a temporal module of four (7x1) convolutions reduces the time axis, a
  fusion convolution mixes the three feature channels;
- the two branches share weights; pooled embeddings are concatenated into a
  2-way same/different classifier.

Because the trained weights are unavailable upstream, the module ships a
synthetic trainer (``train_aflink_synthetic``): same-identity pairs are cut
from continuous noisy trajectories, negatives from different trajectories —
the same spatiotemporal-continuity signal the published model learns.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SEG_LEN = 30  # the published AFLink temporal window
FEATURES = 3  # (frame, cx, cy)


class TemporalBlock(nn.Module):
    """(7x1) conv over time, per-feature-channel batch norm, ReLU."""

    features: int

    @nn.compact
    def __call__(self, x):  # [B, T, 3, C]
        x = nn.Conv(
            self.features, (7, 1), padding="VALID", use_bias=False,
            name="conv",
        )(x)
        x = nn.LayerNorm(name="norm")(x)
        return nn.relu(x)


class AFLinkModel(nn.Module):
    """Two shared-weight tracklet branches -> same/different logits."""

    widths: Tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, seg1, seg2):
        """seg1/seg2: ``[B, SEG_LEN, 3]`` normalized (frame, cx, cy) windows.

        Returns ``[B, 2]`` logits (index 1 = same identity).
        """
        temporal = [
            TemporalBlock(w, name=f"temporal_{i}")
            for i, w in enumerate(self.widths)
        ]
        fusion = nn.Conv(
            self.widths[-1], (1, FEATURES), padding="VALID", name="fusion"
        )

        def branch(seg):
            x = seg[..., None]  # [B, T, 3, 1]
            for blk in temporal:
                x = blk(x)
            x = nn.relu(fusion(x))  # [B, T', 1, C]
            return x.mean(axis=(1, 2))  # [B, C]

        e1, e2 = branch(seg1), branch(seg2)
        h = jnp.concatenate([e1, e2], axis=-1)
        h = nn.relu(nn.Dense(self.widths[-1], name="fc1")(h))
        return nn.Dense(2, name="fc2")(h)


@dataclasses.dataclass
class AFLinkConfig:
    widths: Tuple[int, ...] = (32, 64, 128, 256)
    # normalization scales: frames and pixels to O(1) inputs
    frame_scale: float = 30.0
    pos_scale: float = 1000.0


def normalize_segment(
    rows: np.ndarray, ref_frame: float, config: AFLinkConfig,
    tail: bool,
) -> np.ndarray:
    """MOT rows ``[N, >=6]`` (frame, id, x, y, w, h) -> ``[SEG_LEN, 3]``.

    Takes the last (``tail=True``) or first 30 rows, zero-pads at the far
    end, normalizes frame offsets by ``frame_scale`` and box centers by
    ``pos_scale`` relative to the link point so the model sees
    translation-invariant features.
    """
    rows = rows[-SEG_LEN:] if tail else rows[:SEG_LEN]
    seg = np.zeros((SEG_LEN, FEATURES), np.float32)
    f = (rows[:, 0] - ref_frame) / config.frame_scale
    cx = rows[:, 2] + rows[:, 4] / 2.0
    cy = rows[:, 3] + rows[:, 5] / 2.0
    ref_x = cx[-1] if tail else cx[0]
    ref_y = cy[-1] if tail else cy[0]
    feats = np.stack(
        [f, (cx - ref_x) / config.pos_scale, (cy - ref_y) / config.pos_scale],
        axis=1,
    ).astype(np.float32)
    if tail:
        seg[-len(rows):] = feats
    else:
        seg[: len(rows)] = feats
    return seg


def make_score_fn(model: AFLinkModel, params):
    """Jitted ``(seg1 [B,30,3], seg2 [B,30,3]) -> P(same) [B]``."""

    @jax.jit
    def score(seg1, seg2):
        logits = model.apply({"params": params}, seg1, seg2)
        return jax.nn.softmax(logits, axis=-1)[:, 1]

    return score


# ---------------------------------------------------------------------------
# synthetic training (the upstream weights are not distributable)
# ---------------------------------------------------------------------------

def _synthetic_pair(rng, config: AFLinkConfig, positive: bool):
    """One (tail segment, head segment, label) from synthetic trajectories."""
    n1 = rng.randint(8, SEG_LEN + 1)
    n2 = rng.randint(8, SEG_LEN + 1)
    gap = rng.randint(1, 25)

    def traj(x0, y0, vx, vy, f0, n):
        f = f0 + np.arange(n)
        x = x0 + vx * np.arange(n) + rng.randn(n) * 2.0
        y = y0 + vy * np.arange(n) + rng.randn(n) * 2.0
        w = np.full(n, 40.0)
        h = np.full(n, 90.0)
        return np.stack(
            [f, np.zeros(n), x - w / 2, y - h / 2, w, h], axis=1
        )

    x0, y0 = rng.uniform(100, 900, 2)
    vx, vy = rng.uniform(-4, 4, 2)
    t1 = traj(x0, y0, vx, vy, 0, n1)
    if positive:
        # continuation of the same motion after the gap
        t2 = traj(
            x0 + vx * (n1 + gap), y0 + vy * (n1 + gap), vx, vy,
            n1 + gap, n2,
        )
    else:
        kind = rng.randint(3)
        if kind == 0:  # different place
            bx, by = rng.uniform(100, 900, 2)
            while abs(bx - (x0 + vx * (n1 + gap))) < 120:
                bx = rng.uniform(100, 900)
            t2 = traj(bx, by, *rng.uniform(-4, 4, 2), n1 + gap, n2)
        elif kind == 1:  # same place, inconsistent motion
            t2 = traj(
                x0 + vx * (n1 + gap) + rng.choice([-1, 1]) * 60,
                y0 + vy * (n1 + gap) + rng.choice([-1, 1]) * 60,
                -vx, -vy, n1 + gap, n2,
            )
        else:  # overlapping in time (cannot be the same identity)
            t2 = traj(x0 + 80, y0 + 80, vx, vy, max(n1 - 4, 0), n2)
    ref = t1[-1, 0] + 1
    seg1 = normalize_segment(t1, ref, config, tail=True)
    seg2 = normalize_segment(t2, ref, config, tail=False)
    return seg1, seg2, int(positive)


def synthetic_batch(rng, batch: int, config: AFLinkConfig):
    s1, s2, y = [], [], []
    for i in range(batch):
        a, b, label = _synthetic_pair(rng, config, positive=i % 2 == 0)
        s1.append(a)
        s2.append(b)
        y.append(label)
    return (
        np.stack(s1),
        np.stack(s2),
        np.asarray(y, np.int32),
    )


def train_aflink_synthetic(
    steps: int = 300,
    batch: int = 64,
    seed: int = 0,
    config: Optional[AFLinkConfig] = None,
    learning_rate: float = 1e-3,
):
    """Train AFLink on synthetic continuity data; returns (model, params,
    final accuracy)."""
    import optax

    config = config or AFLinkConfig()
    model = AFLinkModel(config.widths)
    rng = np.random.RandomState(seed)
    s1, s2, y = synthetic_batch(rng, batch, config)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(seed), jnp.asarray(s1), jnp.asarray(s2)
    )["params"]
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, s1, s2, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, s1, s2)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            acc = (logits.argmax(-1) == y).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    acc = 0.0
    for i in range(steps):
        s1, s2, y = synthetic_batch(rng, batch, config)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(s1), jnp.asarray(s2),
            jnp.asarray(y),
        )
    return model, params, float(acc)
