"""AFLink + GSI composed behind a full StrongSORT run, vs the torch oracle.

The reference chains AFLink and GSI after each StrongSORT sequence
(adapters/StrongSORT/strong_sort.py:29-46).  This composes the same chain on
both sides — the production busca_tpu postprocess (flax link model through
the production ``convert_aflink_state_dict`` converter) and an independent
torch/numpy oracle (tests/oracle_pipeline.TorchAFLink + oracle_aflink +
oracle_gsi) — over the REAL output of a full StrongSORT tracker run on a
fragmenting synthetic sequence, and asserts output-row equality (VERDICT r3
item 5).  The torch model is the weight SOURCE (trained in torch), so the
converter is exercised in its production direction.
"""

import numpy as np
import pytest

SEED = 4


def _train_torch_aflink(steps=200, batch=32):
    """Train the oracle's torch AFLink on the shared synthetic pair data."""
    import torch

    from busca_tpu.models.aflink import AFLinkConfig, synthetic_batch
    from oracle_pipeline import TorchAFLink

    model = TorchAFLink(seed=SEED)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    rng = np.random.RandomState(SEED)
    cfg = AFLinkConfig()
    acc = 0.0
    for _ in range(steps):
        s1, s2, y = synthetic_batch(rng, batch, cfg)
        logits = model(torch.from_numpy(s1), torch.from_numpy(s2))
        loss = torch.nn.functional.cross_entropy(
            logits, torch.from_numpy(y).long()
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        acc = float((logits.argmax(-1).numpy() == y).mean())
    return model, acc


def _fragmenting_seq():
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence

    objs = [
        SyntheticObject(
            color=np.array([40, 200, 60], np.float64),
            x0=30, y0=60, vx=1.5, vy=0.3, w=30, h=60,
            dropout=(20, 32),  # 12 frames > max_age=8 -> fragment
        ),
        SyntheticObject(
            color=np.array([210, 60, 180], np.float64),
            x0=300, y0=150, vx=-1.0, vy=-0.3, w=34, h=68,
        ),
    ]
    return SyntheticSequence(objs, num_frames=60, seed=SEED)


def _fragmenting_rows():
    """Full StrongSORT run over a sequence whose dropout outlives max_age,
    so one identity fragments into two tracklets (the AFLink scenario).
    Returns MOT rows [frame, id, x, y, w, h, score]."""
    from busca_tpu.trackers import StrongSortConfig, StrongSortTracker

    seq = _fragmenting_seq()
    objs = seq.objects
    rng_feats = {
        oid: np.random.RandomState(700 + oid).randn(32)
        for oid in range(len(objs))
    }

    tracker = StrongSortTracker(StrongSortConfig(max_age=8, use_busca=False))
    rows = []
    for t in range(seq.num_frames):
        boxes, scores = seq.detections(t)
        feats = []
        for oid, obj in enumerate(objs):
            if not obj.detected_at(t):
                continue
            f = rng_feats[oid] + np.random.RandomState(
                1000 * t + oid
            ).randn(32) * 0.05
            feats.append(f / np.linalg.norm(f))
        feats = np.asarray(feats) if feats else None
        tracker.predict()
        online = tracker.update(boxes, scores, feats, seq.frame(t))
        for tr in online:
            x, y, w, h = tr.tlwh
            rows.append([t + 1, tr.track_id, x, y, w, h,
                         float(getattr(tr, "conf", 1.0))])
    return np.asarray(rows, np.float64)


@pytest.mark.slow
def test_aflink_gsi_composed_matches_oracle():
    import jax.numpy as jnp

    from busca_tpu.models.aflink import AFLinkModel, make_score_fn
    from busca_tpu.models.convert import convert_aflink_state_dict
    from busca_tpu.trackers.postprocess import (
        aflink,
        gaussian_smoothed_interpolation,
    )
    from oracle_pipeline import oracle_aflink, oracle_gsi

    torch_model, acc = _train_torch_aflink()
    assert acc > 0.7, f"torch AFLink failed to train (acc {acc})"

    # production converter: torch state dict -> flax params
    flax_params = convert_aflink_state_dict(
        torch_model.reference_state_dict()
    )["params"]
    flax_model = AFLinkModel()

    # converted weights score identically on a probe batch
    from busca_tpu.models.aflink import AFLinkConfig, synthetic_batch
    s1, s2, _ = synthetic_batch(np.random.RandomState(99), 16, AFLinkConfig())
    p_flax = np.asarray(make_score_fn(flax_model, flax_params)(
        jnp.asarray(s1), jnp.asarray(s2)
    ))
    p_torch = torch_model.score(s1, s2)
    np.testing.assert_allclose(p_flax, p_torch, atol=2e-5)

    rows = _fragmenting_rows()
    ids_before = len(np.unique(rows[:, 1]))
    assert ids_before >= 3, (
        f"sequence failed to fragment (only {ids_before} ids)"
    )

    # production chain: AFLink first, then GSI (strong_sort.py order)
    linked = aflink(rows, model=flax_model, params=flax_params)
    smoothed = gaussian_smoothed_interpolation(linked)

    # oracle chain on the SAME tracker output
    o_linked = oracle_aflink(rows, torch_model)
    o_smoothed = oracle_gsi(o_linked)

    # the linker must actually merge the fragmented identity
    assert len(np.unique(linked[:, 1])) < ids_before, "no link fired"
    # the interpolation must actually fill the dropout gap
    assert len(smoothed) > len(linked), "no gap rows interpolated"

    # output-txt equality: same rows, ids, and coordinates
    assert linked.shape == o_linked.shape
    np.testing.assert_array_equal(linked[:, :2], o_linked[:, :2])
    np.testing.assert_allclose(linked[:, 2:6], o_linked[:, 2:6], atol=1e-9)
    assert smoothed.shape == o_smoothed.shape
    np.testing.assert_array_equal(smoothed[:, :2], o_smoothed[:, :2])
    np.testing.assert_allclose(
        smoothed[:, 2:6], o_smoothed[:, 2:6], atol=1e-6,
        err_msg="GSI-smoothed coordinates diverged",
    )


def test_oracle_aflink_mutual_gate_terminates():
    """Two single-frame tracklets in the same frame gate BOTH (i, j) and
    (j, i) (gap 0 passes thrT in each direction).  The oracle's greedy
    linker must union ROOTS and no-op the second link — mirroring the
    production ``parent[find(j)] = find(i)`` semantics — instead of
    recording a direct i<->j cycle that spins resolve() forever."""
    import signal

    from oracle_pipeline import oracle_aflink

    class AlwaysLink:
        def score(self, s1, s2):
            return np.full(len(s1), 0.99)

    rows = np.array([
        [5, 1, 10, 10, 20, 40, 1, -1, -1, -1],
        [5, 2, 14, 12, 20, 40, 1, -1, -1, -1],
    ], np.float64)

    def on_alarm(signum, frame):  # pragma: no cover - only fires on the bug
        raise TimeoutError("oracle_aflink did not terminate (link cycle)")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(30)
    try:
        out = oracle_aflink(rows, AlwaysLink())
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    # both rows merged under one identity
    assert np.unique(out[:, 1]).tolist() == [1.0]


@pytest.mark.slow
def test_aflink_gsi_improve_fragmented_metrics():
    """The postprocess analog of test_trained_rescue: on a deliberately
    fragmented stream (occlusion outliving max_age), the synthetic-trained
    AFLink merges the fragments (IDs down, IDF1 up) and GSI fills the gap
    (FN down, MOTA up) — the end-benefit the reference's chain exists for
    (adapters/StrongSORT/strong_sort.py:29-46)."""
    from busca_tpu.eval.metrics import evaluate_clear
    from busca_tpu.models.aflink import train_aflink_synthetic
    from busca_tpu.trackers.postprocess import (
        aflink,
        gaussian_smoothed_interpolation,
    )

    seq = _fragmenting_seq()
    rows = _fragmenting_rows()
    gt = seq.ground_truth()

    def pred_of(r):
        out = {}
        for f in np.unique(r[:, 0]).astype(int):
            fr = r[r[:, 0] == f]
            out[f] = (fr[:, 2:6].copy(), fr[:, 1].astype(int),
                      fr[:, 6].copy())
        return out

    model, params, acc = train_aflink_synthetic(steps=150, batch=64, seed=0)
    assert acc > 0.8, f"synthetic AFLink failed to learn: acc={acc}"

    linked = aflink(rows, model=model, params=params)
    smoothed = gaussian_smoothed_interpolation(linked)

    m_raw = evaluate_clear(gt, pred_of(rows))
    m_link = evaluate_clear(gt, pred_of(linked))
    m_full = evaluate_clear(gt, pred_of(smoothed))

    # the stream really fragmented, and AFLink really merged it
    assert len(np.unique(rows[:, 1])) > len(np.unique(linked[:, 1]))
    assert m_raw.num_switches >= 1, "scenario produced no identity break"
    assert m_link.num_switches < m_raw.num_switches
    assert m_link.idf1 > m_raw.idf1, (m_link.idf1, m_raw.idf1)

    # GSI fills the occlusion gap: misses drop, MOTA improves end-to-end
    assert m_full.num_misses < m_link.num_misses
    assert m_full.mota > m_raw.mota, (m_full.mota, m_raw.mota)

    print(
        f"raw:  IDF1={m_raw.idf1:.3f} IDs={m_raw.num_switches} "
        f"FN={m_raw.num_misses} MOTA={m_raw.mota:.3f}\n"
        f"link: IDF1={m_link.idf1:.3f} IDs={m_link.num_switches} "
        f"FN={m_link.num_misses} MOTA={m_link.mota:.3f}\n"
        f"gsi:  IDF1={m_full.idf1:.3f} IDs={m_full.num_switches} "
        f"FN={m_full.num_misses} MOTA={m_full.mota:.3f}"
    )
