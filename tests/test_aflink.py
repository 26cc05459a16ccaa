"""AFLink: model contract, synthetic training signal, and the offline linker
merging an artificially split trajectory (reference strong_sort.py:29-38)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from busca_tpu.models.aflink import (
    SEG_LEN,
    AFLinkConfig,
    AFLinkModel,
    make_score_fn,
    normalize_segment,
    synthetic_batch,
    train_aflink_synthetic,
)
from busca_tpu.trackers.postprocess import aflink


def test_model_forward_contract(rng):
    model = AFLinkModel((4, 8, 8, 16))
    s1 = jnp.asarray(rng.randn(3, SEG_LEN, 3).astype(np.float32))
    s2 = jnp.asarray(rng.randn(3, SEG_LEN, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), s1, s2)["params"]
    logits = model.apply({"params": params}, s1, s2)
    assert logits.shape == (3, 2)
    probs = np.asarray(make_score_fn(model, params)(s1, s2))
    assert probs.shape == (3,)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_normalize_segment_shapes_and_anchor():
    rows = np.stack(
        [
            np.arange(10) + 5,          # frames 5..14
            np.zeros(10),
            100 + 3.0 * np.arange(10),  # x
            50 + 1.0 * np.arange(10),   # y
            np.full(10, 40.0),
            np.full(10, 90.0),
        ],
        axis=1,
    )
    cfg = AFLinkConfig()
    tail = normalize_segment(rows, ref_frame=15, config=cfg, tail=True)
    head = normalize_segment(rows, ref_frame=15, config=cfg, tail=False)
    assert tail.shape == head.shape == (SEG_LEN, 3)
    # tail: padded at the front, anchored at its last row
    assert (tail[: SEG_LEN - 10] == 0).all()
    assert tail[-1, 1] == 0 and tail[-1, 2] == 0  # position anchor
    assert tail[-1, 0] == pytest.approx((14 - 15) / cfg.frame_scale)
    # head: padded at the back, anchored at its first row
    assert (head[10:] == 0).all()
    assert head[0, 1] == 0 and head[0, 2] == 0


def test_synthetic_batch_balance(rng):
    s1, s2, y = synthetic_batch(rng, 32, AFLinkConfig())
    assert s1.shape == (32, SEG_LEN, 3)
    assert y.sum() == 16  # alternating labels


@pytest.mark.slow
def test_training_learns_and_linker_merges(rng):
    """Train briefly on synthetic continuity; the linker must then merge an
    artificially split constant-velocity trajectory and leave a distant
    second identity alone."""
    model, params, acc = train_aflink_synthetic(steps=150, batch=64, seed=0)
    assert acc > 0.8, f"synthetic AFLink training failed to learn: acc={acc}"

    rows = []
    # identity A split into ids 1 and 2 with a 6-frame gap
    for f in range(1, 21):
        rows.append([f, 1, 100 + 3.0 * f, 50 + 1.0 * f, 40, 90, 1, -1, -1, -1])
    for f in range(27, 46):
        rows.append([f, 2, 100 + 3.0 * f, 50 + 1.0 * f, 40, 90, 1, -1, -1, -1])
    # identity B far away, overlapping in time (must stay separate)
    for f in range(1, 46):
        rows.append([f, 7, 900 - 2.0 * f, 700, 40, 90, 1, -1, -1, -1])
    results = np.asarray(rows, np.float64)

    linked = aflink(results, model=model, params=params)
    ids_a_tail = np.unique(linked[(linked[:, 0] >= 27) &
                                  (linked[:, 2] < 500), 1])
    assert ids_a_tail.tolist() == [1.0], "split trajectory was not merged"
    assert 7.0 in np.unique(linked[:, 1]), "distant identity must survive"
    assert 2.0 not in np.unique(linked[:, 1])


def test_aflink_requires_model():
    with pytest.raises(ValueError):
        aflink(np.zeros((2, 10)))
