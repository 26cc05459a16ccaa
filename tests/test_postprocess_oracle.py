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


def _fragmenting_rows():
    """Full StrongSORT run over a sequence whose dropout outlives max_age,
    so one identity fragments into two tracklets (the AFLink scenario).
    Returns MOT rows [frame, id, x, y, w, h, score]."""
    from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence
    from busca_tpu.trackers import StrongSortConfig, StrongSortTracker

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
    seq = SyntheticSequence(objs, num_frames=60, seed=SEED)
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
