"""NMS vs a greedy numpy oracle, HOTA on hand-computed scenarios, viz smoke."""

import numpy as np
import jax.numpy as jnp

from busca_tpu.eval.metrics import evaluate_hota
from busca_tpu.ops.nms import nms, yolox_postprocess
from busca_tpu.viz import create_batch_image, id_color, plot_box


# ------------------------------- NMS ----------------------------------------

def _greedy_nms_oracle(boxes, scores, thr):
    """torchvision.ops.nms semantics: greedy, standard (no +1) IoU.

    torchvision itself is not in the image, so this mirrors its documented
    algorithm exactly (descending score, suppress if IoU > threshold).
    """
    order = np.argsort(-scores)
    kept = []
    for i in order:
        if not np.isfinite(scores[i]):
            continue
        ok = True
        for j in kept:
            bi, bj = boxes[i], boxes[j]
            iw = min(bi[2], bj[2]) - max(bi[0], bj[0])
            ih = min(bi[3], bj[3]) - max(bi[1], bj[1])
            if iw > 0 and ih > 0:
                inter = iw * ih
                ua = (
                    (bi[2] - bi[0]) * (bi[3] - bi[1])
                    + (bj[2] - bj[0]) * (bj[3] - bj[1])
                    - inter
                )
                if inter / ua > thr:
                    ok = False
                    break
        if ok:
            kept.append(i)
    return kept


def test_nms_matches_greedy_oracle(rng):
    for trial in range(5):
        n = 40
        xy = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(10, 60, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        want = _greedy_nms_oracle(boxes, scores, 0.5)
        assert got == want


def test_nms_fixed_point_deep_chains(rng):
    """Dense clusters create deep suppression chains — the fixed-point
    iteration must still reproduce the sequential greedy solution exactly."""
    n = 300
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(20, 60, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thr in (0.3, 0.5, 0.7):
        idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), thr, n)
        got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        want = _greedy_nms_oracle(boxes, scores, thr)
        assert got == want, f"thr={thr}"


def test_nms_respects_max_outputs(rng):
    boxes = np.array([[i * 100.0, 0, i * 100 + 10, 10] for i in range(8)],
                     np.float32)
    scores = np.linspace(0.9, 0.1, 8).astype(np.float32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3)
    assert np.asarray(valid).sum() == 3
    assert np.asarray(idx)[:3].tolist() == [0, 1, 2]


def test_yolox_postprocess(rng):
    n, nc = 30, 2
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, 0] = rng.uniform(50, 400, n)  # cx
    pred[:, 1] = rng.uniform(50, 400, n)  # cy
    pred[:, 2:4] = rng.uniform(20, 60, (n, 2))
    pred[:, 4] = rng.uniform(0, 1, n)
    pred[:, 5:] = rng.uniform(0, 1, (n, nc))
    out, valid = yolox_postprocess(jnp.asarray(pred), nc, 0.3, 0.5, 16)
    out, valid = np.asarray(out), np.asarray(valid)
    for row, v in zip(out, valid):
        if v:
            assert row[4] * row[5] >= 0.3 - 1e-6  # conf filter held
            assert row[2] > row[0] and row[3] > row[1]
    assert (out[~valid] == 0).all()


def test_yolox_postprocess_class_offset_precision(rng):
    """High class ids must not quantize coordinates (offset scales with
    max coordinate, not a fixed 1e6 — the torchvision batched_nms rule)."""
    nc = 80
    # two overlapping boxes in class 79, one clearly lower-scored: the worse
    # one must be suppressed even at the largest class offset
    pred = np.zeros((2, 5 + nc), np.float32)
    pred[:, 0:2] = [[100.0, 100.0], [104.0, 102.0]]
    pred[:, 2:4] = [[40.0, 40.0], [40.0, 40.0]]
    pred[:, 4] = [0.9, 0.8]
    pred[:, 5 + 79] = [0.9, 0.9]
    out, valid = yolox_postprocess(jnp.asarray(pred), nc, 0.3, 0.5, 8)
    assert int(np.asarray(valid).sum()) == 1
    # per-class separation still holds: same boxes, different classes -> both kept
    pred2 = pred.copy()
    pred2[1, 5 + 79] = 0.0
    pred2[1, 5 + 3] = 0.9
    out2, valid2 = yolox_postprocess(jnp.asarray(pred2), nc, 0.3, 0.5, 8)
    assert int(np.asarray(valid2).sum()) == 2


# ------------------------------- HOTA ---------------------------------------

def _box(x, y=50, w=20, h=40):
    return np.array([x, y, w, h], dtype=float)


def _seq(frames):
    out = {}
    for f, items in enumerate(frames, start=1):
        if items:
            out[f] = (
                np.stack([b for _, b in items]),
                np.array([i for i, _ in items], int),
            )
        else:
            out[f] = (np.zeros((0, 4)), np.zeros(0, int))
    return out


def _pred(frames):
    g = _seq(frames)
    return {f: (b, i, np.ones(len(i))) for f, (b, i) in g.items()}


def test_hota_perfect_is_one():
    frames = [[(1, _box(10)), (2, _box(100))] for _ in range(10)]
    h = evaluate_hota(_seq(frames), _pred(frames))
    assert abs(h["hota"] - 1.0) < 1e-6
    assert abs(h["deta"] - 1.0) < 1e-6
    assert abs(h["assa"] - 1.0) < 1e-6


def test_hota_identity_switch_halves_assa():
    # one object, 8 frames; prediction switches id halfway:
    # DetA = 1, AssA = 0.5, HOTA = sqrt(0.5)
    gt = [[(1, _box(10 + t))] for t in range(8)]
    pr = [[(100 if t < 4 else 200, _box(10 + t))] for t in range(8)]
    h = evaluate_hota(_seq(gt), _pred(pr))
    np.testing.assert_allclose(h["deta"], 1.0, atol=1e-6)
    np.testing.assert_allclose(h["assa"], 0.5, atol=1e-6)
    np.testing.assert_allclose(h["hota"], np.sqrt(0.5), atol=1e-6)


def test_hota_misses_lower_deta():
    gt = [[(1, _box(10))] for _ in range(10)]
    pr = [[(9, _box(10))] if t < 5 else [] for t in range(10)]
    h = evaluate_hota(_seq(gt), _pred(pr))
    # TP=5, FN=5, FP=0 -> DetA = 0.5 ; AssA: pair jaccard = 5/10
    np.testing.assert_allclose(h["deta"], 0.5, atol=1e-6)
    np.testing.assert_allclose(h["assa"], 0.5, atol=1e-6)


def test_hota_empty_pred():
    gt = [[(1, _box(10))] for _ in range(5)]
    h = evaluate_hota(_seq(gt), {})
    assert h["hota"] == 0.0


# ------------------------------- viz ----------------------------------------

def test_viz_smoke(rng):
    frame = np.zeros((100, 200, 3), np.uint8)
    for style in ("solid", "dashed", "dotted"):
        plot_box(frame, 3, [10, 10, 80, 90], style=style, display_id=True)
    assert frame.sum() > 0  # something was drawn
    assert id_color(3) == id_color(83)  # palette wraps at 80

    mem = rng.randint(0, 255, (2, 3, 32, 16, 3), dtype=np.uint8)
    can = rng.randint(0, 255, (2, 2, 32, 16, 3), dtype=np.uint8)
    probs = np.array([[0.7, 0.1, 0.1, 0.1], [0.2, 0.6, 0.1, 0.1]])
    img = create_batch_image(mem, can, probs)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.dtype == np.uint8


def test_hota_submetrics_identity_switch():
    # TrackEval summary-row extras on the id-switch case: detection is
    # perfect (DetRe = DetPr = LocA = 1); each pred id covers half the gt
    # track (AssRe 0.5) but is pure (AssPr 1).
    gt = [[(1, _box(10 + t))] for t in range(8)]
    pr = [[(100 if t < 4 else 200, _box(10 + t))] for t in range(8)]
    h = evaluate_hota(_seq(gt), _pred(pr))
    np.testing.assert_allclose(h["detre"], 1.0, atol=1e-6)
    np.testing.assert_allclose(h["detpr"], 1.0, atol=1e-6)
    np.testing.assert_allclose(h["assre"], 0.5, atol=1e-6)
    np.testing.assert_allclose(h["asspr"], 1.0, atol=1e-6)
    np.testing.assert_allclose(h["loca"], 1.0, atol=1e-6)


def test_hota_submetrics_misses():
    # half the frames unpredicted: recall 0.5, precision 1 on both axes
    gt = [[(1, _box(10))] for _ in range(10)]
    pr = [[(9, _box(10))] if t < 5 else [] for t in range(10)]
    h = evaluate_hota(_seq(gt), _pred(pr))
    np.testing.assert_allclose(h["detre"], 0.5, atol=1e-6)
    np.testing.assert_allclose(h["detpr"], 1.0, atol=1e-6)
    np.testing.assert_allclose(h["assre"], 0.5, atol=1e-6)
    np.testing.assert_allclose(h["asspr"], 1.0, atol=1e-6)
    np.testing.assert_allclose(h["loca"], 1.0, atol=1e-6)


def test_hota_loca_tracks_overlap():
    # pred shifted by half a box width: IoU = (10*40)/(2*800 - 400) = 1/3.
    # Matches exist only for the 6 alphas <= 0.30; there LocA = 1/3, and at
    # the 13 TP-free alphas TrackEval defines LocA = eps/eps = 1.
    gt = [[(1, _box(10))] for _ in range(10)]
    pr = [[(9, _box(20))] for _ in range(10)]
    h = evaluate_hota(_seq(gt), _pred(pr))
    alphas = np.arange(0.05, 0.99, 0.05)
    n_match = int((alphas <= 1 / 3 + 1e-8).sum())
    expect = (n_match * (1 / 3) + (len(alphas) - n_match) * 1.0) / len(alphas)
    np.testing.assert_allclose(h["loca"], expect, atol=1e-6)
