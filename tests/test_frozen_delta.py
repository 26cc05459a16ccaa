"""The frozen-stats deviation measurement harness (eval/frozen_delta.py).

Pins the machinery VERDICT r3 asked for: (1) running-statistics calibration
is exact — frozen-mode BN fed the statistics calibrated on a single batch
reproduces batch-stat BN on that same batch at every layer (induction over
the net); (2) the dual-engine recorder reports zero flips when both sides
are the same mode; (3) the full measurement returns a well-formed report.
"""

import numpy as np
import pytest

from busca_tpu.eval.frozen_delta import (
    DualEngine,
    calibrate_batch_stats,
    measure_frozen_delta,
)
from busca_tpu.models.busca import BuscaConfig


def _tiny_cfg():
    return BuscaConfig(
        num_layer=1, reid_num_classes=5, reid_layers=(1, 1, 1, 1),
        dropout_p=0.0,
    )


def test_single_batch_calibration_reproduces_batch_stat_forward():
    """Calibrating on ONE batch makes frozen BN == batch-stat BN on that
    batch: the calibrated running stats ARE that batch's biased statistics,
    layer by layer, so the features must agree."""
    import jax
    import jax.numpy as jnp

    from busca_tpu.models.busca import BuscaModel
    from busca_tpu.models.reid import ReIDResNet

    cfg = _tiny_cfg()
    h, w = 64, 32
    rng = np.random.RandomState(0)
    x = rng.randn(12, h, w, 3).astype(np.float32)

    model = BuscaModel(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, h, w, 3), jnp.float32),
        jnp.zeros((1, 2, h, w, 3), jnp.float32),
        jnp.zeros((1, 2, 4), jnp.float32),
        jnp.zeros((1, 2, 4), jnp.float32),
    )
    params = variables["params"]

    stats = calibrate_batch_stats(cfg, params, [x])

    reid_batch = ReIDResNet(layers=cfg.reid_layers,
                            num_classes=cfg.reid_num_classes)
    reid_frozen = ReIDResNet(layers=cfg.reid_layers,
                             num_classes=cfg.reid_num_classes,
                             use_batch_stats=False)
    _, f_batch = reid_batch.apply(
        {"params": params["reid_encoder"]}, jnp.asarray(x)
    )
    _, f_frozen = reid_frozen.apply(
        {"params": params["reid_encoder"],
         "batch_stats": stats["reid_encoder"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.asarray(f_batch), np.asarray(f_frozen), atol=2e-4, rtol=1e-3
    )


def test_calibration_pools_across_batches():
    """Two batches calibrated together == their concatenation calibrated as
    one batch (exact population pooling, not an EMA approximation)."""
    import jax
    import jax.numpy as jnp

    from busca_tpu.models.busca import BuscaModel

    cfg = _tiny_cfg()
    h, w = 64, 32
    rng = np.random.RandomState(1)
    a = rng.randn(6, h, w, 3).astype(np.float32)
    b = rng.randn(10, h, w, 3).astype(np.float32)

    model = BuscaModel(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, h, w, 3), jnp.float32),
        jnp.zeros((1, 2, h, w, 3), jnp.float32),
        jnp.zeros((1, 2, 4), jnp.float32),
        jnp.zeros((1, 2, 4), jnp.float32),
    )["params"]

    two = calibrate_batch_stats(cfg, params, [a, b])
    one = calibrate_batch_stats(cfg, params, [np.concatenate([a, b])])

    # NOTE: not exactly equal — deep layers see batch-normalized inputs whose
    # statistics depend on the batch composition (that IS the deviation being
    # measured) — but the first BN (stem bn1) sees raw conv outputs per
    # sample, so ITS pooled statistics must agree exactly.
    np.testing.assert_allclose(
        np.asarray(two["reid_encoder"]["bn1"]["running_mean"]),
        np.asarray(one["reid_encoder"]["bn1"]["running_mean"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(two["reid_encoder"]["bn1"]["running_var"]),
        np.asarray(one["reid_encoder"]["bn1"]["running_var"]),
        rtol=1e-3, atol=1e-5,
    )


class _FakeEngine:
    """Deterministic stand-in with the engine's tracker-facing surface."""

    def __init__(self, probs):
        self._probs = probs

    def center_distances(self, tracks, dets):
        return np.zeros((len(tracks), len(dets)))

    _center_distances = center_distances

    def associate(self, tracks, dets, dists_matrix=None, **kw):
        p = self._probs(len(tracks), len(dets))
        return p, np.ones(len(tracks), bool)


def test_dual_engine_same_mode_zero_flips():
    def probs(t, d):
        p = np.zeros((t, d + t))
        for i in range(t):
            p[i, d + i] = 0.9
        return p

    dual = DualEngine(_FakeEngine(probs), _FakeEngine(probs),
                      rescue_thresh=0.5)
    pb, rb = dual.associate([0, 1], [0, 1, 2])
    assert pb.shape == (2, 5)
    s = dual.summary()
    assert s["rows"] == 2
    assert s["argmax_flips"] == 0 and s["rescue_flips"] == 0
    assert s["rescues_batch"] == 2 and s["rescues_frozen"] == 2
    assert s["argmax_flip_rate"] == 0.0 and s["rescue_flip_rate"] == 0.0


def test_dual_engine_counts_flips():
    def probs_win(t, d):
        p = np.zeros((t, d + t))
        for i in range(t):
            p[i, d + i] = 0.9
        return p

    def probs_lose(t, d):
        p = np.zeros((t, d + t))
        for i in range(t):
            p[i, 0] = 0.9
        return p

    dual = DualEngine(_FakeEngine(probs_win), _FakeEngine(probs_lose),
                      rescue_thresh=0.5)
    dual.associate([0, 1, 2], [0])
    s = dual.summary()
    assert s["rows"] == 3
    assert s["argmax_flips"] == 3 and s["rescue_flips"] == 3
    assert s["rescues_batch"] == 3 and s["rescues_frozen"] == 0
    assert s["argmax_flip_rate"] == 1.0


@pytest.mark.slow
def test_measure_frozen_delta_report_shape():
    out = measure_frozen_delta(
        steps=25, train_batch=10, seed=3, num_frames=24, seq_seeds=(0,),
        calib_batches=3,
    )
    f = out["flip"]
    assert f["calls"] > 0 and f["rows"] > 0
    assert 0.0 <= f["argmax_flip_rate"] <= 1.0
    assert 0.0 <= f["rescue_flip_rate"] <= 1.0
    for tag in ("base", "batch", "frozen"):
        m = out["metrics"][tag]
        assert np.isfinite([m["mota"], m["hota"], m["idf1"]]).all()
    assert set(out["delta"]) == {"mota", "idf1", "hota", "fn", "ids"}


def test_shift_transform_shapes_and_determinism():
    from busca_tpu.eval.frozen_delta import shift_transform

    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    assert shift_transform("none") is None
    for kind in ("dim", "glare"):
        f = shift_transform(kind)
        out1, out2 = f(frame), f(frame)
        assert out1.shape == frame.shape and out1.dtype == np.uint8
        np.testing.assert_array_equal(out1, out2)  # deterministic
        assert np.abs(out1.astype(int) - frame.astype(int)).mean() > 5
    with pytest.raises(ValueError, match="unknown shift"):
        shift_transform("fog")


@pytest.mark.slow
def test_measure_frozen_delta_shift_arm_runs():
    """The calibrate-on-A / deploy-on-B arm: same report shape, decisions
    recorded, and the shifted frames really reach the tracker (the arm would
    otherwise silently measure in-domain again)."""
    from busca_tpu.eval.frozen_delta import shift_transform

    seen = {"calls": 0}
    dim = shift_transform("dim")

    def spying_dim(frame):
        seen["calls"] += 1
        return dim(frame)

    out = measure_frozen_delta(
        steps=25, train_batch=10, seed=3, num_frames=24, seq_seeds=(0,),
        calib_batches=3, frame_transform=spying_dim, n_drop=2,
    )
    assert seen["calls"] == 24
    f = out["flip"]
    assert f["calls"] > 0 and f["rows"] > 0
    for tag in ("base", "batch", "frozen"):
        m = out["metrics"][tag]
        assert np.isfinite([m["mota"], m["hota"], m["idf1"]]).all()
