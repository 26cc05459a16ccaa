"""Frame-by-frame end-to-end parity vs the independent torch pipeline oracle.

Both pipelines — busca_tpu's ByteTracker+AssociationEngine and the oracle's
from-scratch reimplementation of the reference loop (tests/oracle_pipeline)
— consume the same synthetic detection stream with shared model weights and
must produce identical track IDs and third-round decisions on every frame
(the composed-parity check the per-module oracles can't give:
byte_tracker.py:226-456 ∘ network.py:282-429).
"""

import numpy as np
import pytest

from busca_tpu.assoc.engine import AssociationEngine
from busca_tpu.eval.synthetic import SyntheticObject, SyntheticSequence
from busca_tpu.models.busca import BuscaConfig, BuscaModel
from busca_tpu.models.convert import convert_busca_state_dict, merge_params
from busca_tpu.trackers import ByteTracker, ByteTrackerConfig
from busca_tpu.trackers.base import IdCounter, Track

from oracle_pipeline import OracleByteTracker, TorchBuscaPipeline

SEQ_LEN, C = 5, 3
CROP_HW = (64, 32)
N_FRAMES = 110
FRAME_H, FRAME_W = 128, 192


def _make_sequence():
    objs = [
        SyntheticObject(
            color=np.array([40, 200, 60], np.float64),
            x0=10, y0=20, vx=1.2, vy=0.3, w=18, h=36,
            dropout=(30, 44),
        ),
        SyntheticObject(
            color=np.array([210, 60, 180], np.float64),
            x0=150, y0=70, vx=-1.0, vy=-0.2, w=20, h=40,
            dropout=(50, 58),
        ),
        SyntheticObject(
            color=np.array([90, 120, 230], np.float64),
            x0=60, y0=60, vx=0.8, vy=0.1, w=16, h=34,
            dropout=(70, 86),
        ),
        SyntheticObject(
            color=np.array([200, 200, 40], np.float64),
            x0=110, y0=15, vx=-0.5, vy=0.5, w=18, h=30,
            dropout=(92, 100),
        ),
    ]
    return SyntheticSequence(
        objs, num_frames=N_FRAMES, height=FRAME_H, width=FRAME_W, seed=11
    )


def _make_drift_sequence():
    """The CMC stream: the camera pans (0.8, 0.4) px/frame over a larger
    static world, so consecutive frames are globally shifted views — the
    scenario the reference's ECC compensation handles in its MOT17 configs
    (byte_tracker.py:377-378, 626-650).  Object world-velocities are chosen
    so their *viewport* trajectories match the plain sequence's regime."""
    drift = (0.8, 0.4)
    objs = [
        SyntheticObject(
            color=np.array([40, 200, 60], np.float64),
            x0=10, y0=20, vx=1.2 + drift[0], vy=0.3 + drift[1], w=18, h=36,
            dropout=(30, 44),
        ),
        SyntheticObject(
            color=np.array([210, 60, 180], np.float64),
            x0=150, y0=70, vx=-1.0 + drift[0], vy=-0.2 + drift[1], w=20, h=40,
            dropout=(50, 58),
        ),
        SyntheticObject(
            color=np.array([90, 120, 230], np.float64),
            x0=60, y0=60, vx=0.8 + drift[0], vy=0.1 + drift[1], w=16, h=34,
            dropout=(70, 86),
        ),
        SyntheticObject(
            color=np.array([200, 200, 40], np.float64),
            x0=110, y0=15, vx=-0.5 + drift[0], vy=0.5 + drift[1], w=18, h=30,
            dropout=(92, 100),
        ),
    ]
    return SyntheticSequence(
        objs, num_frames=N_FRAMES, height=FRAME_H, width=FRAME_W, seed=11,
        camera_drift=drift,
    )


def _build_shared_models():
    """One torch oracle model + a JAX engine carrying the SAME weights
    (through the production checkpoint converter)."""
    import jax

    torch_model = TorchBuscaPipeline(
        seq_len=SEQ_LEN, num_candidates=C, crop_hw=CROP_HW, seed=9
    )
    sd = torch_model.reference_state_dict()
    loaded = convert_busca_state_dict(sd, ignore_reid_fc=True)

    cfg = BuscaConfig(
        num_layer=2, reid_layers=(1, 1, 1, 1), reid_num_classes=7,
        dtype="float32",
    )
    model = BuscaModel(cfg)
    h, w = CROP_HW
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, SEQ_LEN, h, w, 3), np.float32),
        np.zeros((1, C, h, w, 3), np.float32),
        np.zeros((1, SEQ_LEN, 4), np.float32),
        np.zeros((1, C, 4), np.float32),
    )
    params = merge_params(variables["params"], loaded["params"])
    engine = AssociationEngine(
        cfg, {"params": params}, seq_len=SEQ_LEN, num_candidates=C,
        crop_hw=CROP_HW,
    )
    return torch_model, engine


TIE_TOL = 0.02  # crop-backend LSB noise bound (measured worst 0.0094)
# select_highest_candidate=False pairs with busca_thresh 0.3 in the
# shipped configs (ByteTrack-MOT20, config_bytetrack_mot20.yml)
BUSCA_THRESH = 0.3


def _record_warp_shifts(oracle_tracker):
    """Wrap the oracle's ECC CMC so tests can assert the compensation was
    genuinely non-trivial on a drifting stream: records the per-track
    position shift each warp application produced."""
    warp_shifts = []
    orig_cmc = oracle_tracker.camera_motion_compensation

    def recorded_cmc(track_pool, current_frame, **kw):
        before = [t.mean[:2].copy() if t.mean is not None
                  else t._tlwh[:2].copy() for t in track_pool]
        cc = orig_cmc(track_pool, current_frame, **kw)
        for t, b in zip(track_pool, before):
            after = t.mean[:2] if t.mean is not None else t._tlwh[:2]
            warp_shifts.append(float(np.linalg.norm(after - b)))
        return cc

    oracle_tracker.camera_motion_compensation = recorded_cmc
    return warp_shifts


def _run_byte_parity(seq, use_cmc=False, tie_tol=TIE_TOL):
    """Both pipelines run the same stream; third-round *probabilities* must
    agree within crop-quantization noise and every non-tie *decision* must
    be identical.  To keep the comparison butterfly-free, the jax
    pipeline's third-round outcome is forced into both trackers (so one
    genuine near-tie — two candidates within ~1e-2 probability, an
    artifact of cv2-vs-XLA crop LSBs — can't fork the track histories and
    mask later comparisons); the oracle's own decision is still computed
    and checked against the jax decision wherever the margin to the decision
    threshold exceeds the noise bound.  ``use_cmc`` runs BOTH pipelines with
    the reference's third-round ECC camera-motion compensation live
    (byte_tracker.py:377-378).  Returns the exercise counters."""
    from busca_tpu.trackers.base import run_third_round

    torch_model, engine = _build_shared_models()

    probs_log_jax = []
    orig_assoc = engine.associate

    def logged(*a, **k):
        out = orig_assoc(*a, **k)
        probs_log_jax[-1] = None if out[0] is None else np.array(out[0])
        return out

    engine.associate = logged

    # select_highest_candidate=False is the shipped ByteTrack-MOT20
    # flavour; it keeps the probabilities continuous so near-ties are
    # detectable (the one-hot flavour's postprocess parity is pinned by
    # tests/test_engine.py at module level)
    cfg_kw = dict(
        track_thresh=0.5, busca_thresh=BUSCA_THRESH, seq_len=SEQ_LEN,
        num_candidates=C, crop_hw=CROP_HW,
        use_camera_motion_compensation=use_cmc,
        select_highest_candidate=False,
    )
    Track.reset_id_counter()
    jax_tracker = ByteTracker(
        ByteTrackerConfig(use_busca=True, **cfg_kw), engine
    )
    oracle_tracker = OracleByteTracker(
        torch_model, track_thresh=0.5, busca_thresh=BUSCA_THRESH, seq_len=SEQ_LEN,
        num_candidates=C, crop_hw=CROP_HW, select_highest_candidate=False,
        use_camera_motion_compensation=use_cmc,
    )

    warp_shifts = _record_warp_shifts(oracle_tracker)

    # force the jax outcome into the oracle tracker (decisions still
    # compared below); forced["jax"] is set per frame before the oracle
    # update runs
    forced = {"jax": None, "oracle": None}
    orig_third = oracle_tracker._third_round

    def forced_third(pool, considered, kalman_cands):
        out = orig_third(pool, considered, kalman_cands)
        forced["oracle"] = out
        return forced["jax"] if forced["jax"] is not None else out

    oracle_tracker._third_round = forced_third

    frames_checked = third_rounds = rescues = decisions_checked = 0
    for t in range(seq.num_frames):
        frame = seq.frame(t)
        boxes, scores = seq.detections(t)

        probs_log_jax.append(None)
        # drive the jax tracker through its deferred generator so the
        # third-round outcome is in hand before the oracle runs
        gen = jax_tracker.update_deferred(boxes.copy(), scores.copy(), 1.0,
                                          frame)
        forced["jax"] = None
        try:
            req = next(gen)
            res = run_third_round(
                req.engine, req.pool, req.considered, req.kalman_cands,
                req.thresh, **req.engine_kwargs
            )
            forced["jax"] = res
            gen.send(res)
            raise AssertionError("tracker yielded twice")
        except StopIteration as e:
            online_jax = e.value
        forced["oracle"] = None
        online_oracle = oracle_tracker.update(boxes.copy(), scores.copy(),
                                              1.0, frame)

        ids_jax = sorted(tr.track_id for tr in online_jax)
        ids_oracle = sorted(tr.track_id for tr in online_oracle)
        assert ids_jax == ids_oracle, (
            f"frame {t + 1}: track IDs diverged {ids_jax} vs {ids_oracle}"
        )
        box_jax = {tr.track_id: tr.tlwh for tr in online_jax}
        box_oracle = {tr.track_id: tr.tlwh for tr in online_oracle}
        for tid in ids_jax:
            np.testing.assert_allclose(
                box_jax[tid], box_oracle[tid], rtol=0, atol=1e-6,
                err_msg=f"frame {t + 1} track {tid}",
            )

        pj = probs_log_jax[-1]
        po = oracle_tracker.probs_log[-1]
        assert (pj is None) == (po is None), (
            f"frame {t + 1}: third-round fired in one pipeline only "
            f"(jax={pj is not None}, oracle={po is not None})"
        )
        if pj is not None:
            third_rounds += 1
            assert pj.shape == po.shape, f"frame {t + 1}"
            np.testing.assert_allclose(
                pj, po, rtol=0, atol=tie_tol,
                err_msg=f"frame {t + 1}: third-round probabilities diverged"
                        " beyond crop-noise tolerance",
            )
            if len(pj):
                # track i's Kalman candidate lives at column D + i
                d = pj.shape[1] - len(pj)
                idx = (np.arange(len(pj)), d + np.arange(len(pj)))
                kal_j, kal_o = pj[idx], po[idx]
                # every decision with margin beyond the noise bound must
                # agree between the two implementations
                clear = np.abs(kal_o - BUSCA_THRESH) > tie_tol
                np.testing.assert_array_equal(
                    (kal_j > BUSCA_THRESH)[clear], (kal_o > BUSCA_THRESH)[clear],
                    err_msg=f"frame {t + 1}: clear-margin third-round "
                            "decisions diverged",
                )
                decisions_checked += int(clear.sum())
                rescues += int((kal_j > BUSCA_THRESH).sum())
        frames_checked += 1

    assert frames_checked == seq.num_frames
    return {
        "third_rounds": third_rounds,
        "decisions_checked": decisions_checked,
        "rescues": rescues,
        "warp_shifts": warp_shifts,
    }


@pytest.mark.slow
def test_byte_pipeline_matches_torch_oracle():
    out = _run_byte_parity(_make_sequence())
    # the sequence must actually exercise the interesting paths
    assert out["third_rounds"] >= 20, (
        f"only {out['third_rounds']} third rounds fired"
    )
    assert out["decisions_checked"] >= 20, "too few clear-margin decisions"
    # dropout windows exist, so at least some Kalman rescues must happen
    assert out["rescues"] >= 1, "no BUSCA rescues occurred — stream too easy"


@pytest.mark.slow
def test_byte_pipeline_matches_torch_oracle_cmc():
    """Composed parity with camera-motion compensation LIVE (the shipped
    MOT17 third-round configuration, byte_tracker.py:377-378): the stream
    pans globally, both pipelines run cv2 ECC + track warping, and
    frame-by-frame IDs / boxes / third-round probabilities must still
    agree.  The recorded warp magnitudes prove the compensation actually
    moved tracks (i.e. the CMC→Kalman→third-round interaction, not a
    trivially-identity warp, is what's being pinned)."""
    seq = _make_drift_sequence()
    out = _run_byte_parity(seq, use_cmc=True)
    assert out["third_rounds"] >= 10, (
        f"only {out['third_rounds']} third rounds fired"
    )
    assert out["decisions_checked"] >= 10, "too few clear-margin decisions"
    assert out["rescues"] >= 1, "no BUSCA rescues occurred — stream too easy"
    shifts = np.asarray(out["warp_shifts"])
    assert len(shifts) >= 10, "CMC never warped a third-round track"
    assert shifts.max() > 0.5, (
        f"ECC warps were near-identity (max shift {shifts.max():.3f} px) — "
        "the drift stream failed to exercise the compensation"
    )


def _object_features(seq, t, rng_feats):
    """Synthetic per-identity ReID features for the objects detected at t,
    in the same order seq.detections(t) emits boxes."""
    feats = []
    for oid, obj in enumerate(seq.objects):
        if not obj.detected_at(t):
            continue
        base = rng_feats[oid]
        f = base + np.random.RandomState(1000 * t + oid).randn(len(base)) * 0.05
        feats.append(f / np.linalg.norm(f))
    return np.asarray(feats) if feats else None


def _run_strongsort_parity(seq):
    """Frame-by-frame drive for the StrongSORT strategy (cascade-off
    woC matching, NSA Kalman, EMA features, MC fusion, third round over
    unmatched confirmed age<=1 tracks — deep_sort/tracker.py:106-198).
    Returns the exercise counters."""
    from busca_tpu.trackers import StrongSortConfig, StrongSortTracker
    from busca_tpu.trackers.base import run_third_round
    from oracle_pipeline import OracleStrongSortTracker

    torch_model, engine = _build_shared_models()

    probs_log_jax = []
    orig_assoc = engine.associate

    def logged(*a, **k):
        out = orig_assoc(*a, **k)
        probs_log_jax[-1] = None if out[0] is None else np.array(out[0])
        return out

    engine.associate = logged

    cfg = StrongSortConfig(
        use_busca=True, busca_thresh=BUSCA_THRESH, seq_len=SEQ_LEN,
        num_candidates=C, crop_hw=CROP_HW, select_highest_candidate=False,
    )
    jax_tracker = StrongSortTracker(cfg, engine)
    oracle_tracker = OracleStrongSortTracker(
        torch_model, busca_thresh=BUSCA_THRESH, seq_len=SEQ_LEN,
        num_candidates=C, crop_hw=CROP_HW, select_highest_candidate=False,
        conf_threshold=jax_tracker.conf_threshold,
    )

    # force the jax third-round outcome into the oracle (see the byte test)
    forced = {"jax": None}
    orig_third = oracle_tracker._third_round

    def forced_third(pool, considered, kalman_cands):
        out = orig_third(pool, considered, kalman_cands)
        return forced["jax"] if forced["jax"] is not None else out

    oracle_tracker._third_round = forced_third

    rng_feats = {
        oid: np.random.RandomState(500 + oid).randn(32)
        for oid in range(len(seq.objects))
    }

    third_rounds = rescues = decisions_checked = 0
    for t in range(seq.num_frames):
        frame = seq.frame(t)
        boxes, scores = seq.detections(t)
        feats = _object_features(seq, t, rng_feats)

        probs_log_jax.append(None)
        jax_tracker.predict()
        gen = jax_tracker.update_deferred(
            boxes.copy(), scores.copy(),
            None if feats is None else feats.copy(), frame,
        )
        forced["jax"] = None
        try:
            req = next(gen)
            res = run_third_round(
                req.engine, req.pool, req.considered, req.kalman_cands,
                req.thresh, **req.engine_kwargs
            )
            forced["jax"] = res
            gen.send(res)
            raise AssertionError("tracker yielded twice")
        except StopIteration as e:
            online_jax = e.value
        oracle_tracker.predict()
        online_oracle = oracle_tracker.update(
            boxes.copy(), scores.copy(),
            None if feats is None else feats.copy(), frame,
        )

        ids_jax = sorted(tr.track_id for tr in online_jax)
        ids_oracle = sorted(tr.track_id for tr in online_oracle)
        assert ids_jax == ids_oracle, (
            f"frame {t + 1}: track IDs diverged {ids_jax} vs {ids_oracle}"
        )
        box_jax = {tr.track_id: tr.tlwh for tr in online_jax}
        box_oracle = {tr.track_id: tr.tlwh for tr in online_oracle}
        for tid in ids_jax:
            np.testing.assert_allclose(
                box_jax[tid], box_oracle[tid], rtol=0, atol=1e-6,
                err_msg=f"frame {t + 1} track {tid}",
            )

        pj = probs_log_jax[-1]
        po = oracle_tracker.probs_log[-1]
        assert (pj is None) == (po is None), (
            f"frame {t + 1}: third round fired in one pipeline only "
            f"(jax={pj is not None}, oracle={po is not None})"
        )
        if pj is not None and po is not None and len(pj):
            third_rounds += 1
            assert pj.shape == po.shape, f"frame {t + 1}"
            np.testing.assert_allclose(
                pj, po, rtol=0, atol=TIE_TOL,
                err_msg=f"frame {t + 1}: probabilities diverged",
            )
            d = pj.shape[1] - len(pj)
            idx = (np.arange(len(pj)), d + np.arange(len(pj)))
            kal_j, kal_o = pj[idx], po[idx]
            clear = np.abs(kal_o - BUSCA_THRESH) > TIE_TOL
            np.testing.assert_array_equal(
                (kal_j > BUSCA_THRESH)[clear],
                (kal_o > BUSCA_THRESH)[clear],
                err_msg=f"frame {t + 1}: clear-margin decisions diverged",
            )
            decisions_checked += int(clear.sum())
            rescues += int((kal_j > BUSCA_THRESH).sum())

    return {
        "third_rounds": third_rounds,
        "decisions_checked": decisions_checked,
        "rescues": rescues,
    }


@pytest.mark.slow
def test_strongsort_pipeline_matches_torch_oracle():
    out = _run_strongsort_parity(_make_sequence())
    # StrongSORT's third round only covers unmatched confirmed age<=1
    # tracks (deep_sort/tracker.py:133-139), so it fires once per dropout
    # onset — a handful of rounds is the expected coverage here; the byte
    # test above exercises the high-duty rescue path.
    assert out["third_rounds"] >= 4, (
        f"only {out['third_rounds']} third rounds fired"
    )
    assert out["decisions_checked"] >= 2, "too few clear-margin decisions"
    # "rescues" is informational only for StrongSORT (see comment above)


def _run_ghost_parity(seq, use_mc=False):
    """Frame-by-frame drive for the GHOST strategy (proxy-feature cosine
    association, linear motion + sum_a IoU combination, inactive patience,
    third round over unmatched positive-area active tracks —
    src/tracker.py:70-567).  ``use_mc`` runs BOTH pipelines with the ECC
    ego-motion compensation of stored positions live (the tracktor recipe,
    base_tracker.py:599-633)."""
    from busca_tpu.trackers import cmc as cmc_mod
    from busca_tpu.trackers import GhostConfig, GhostTracker
    from busca_tpu.trackers.base import run_third_round
    from oracle_pipeline import OracleGhostTracker

    torch_model, engine = _build_shared_models()

    probs_log_jax = []
    orig_assoc = engine.associate

    def logged(*a, **k):
        out = orig_assoc(*a, **k)
        probs_log_jax[-1] = None if out[0] is None else np.array(out[0])
        return out

    engine.associate = logged

    cfg = GhostConfig(
        use_busca=True, busca_thresh=BUSCA_THRESH, seq_len=SEQ_LEN,
        num_candidates=C, crop_hw=CROP_HW, select_highest_candidate=False,
        det_conf=0.5, motion_compensation=use_mc, is_moving=use_mc,
    )
    jax_tracker = GhostTracker(cfg, engine)
    oracle_tracker = OracleGhostTracker(
        torch_model, busca_thresh=BUSCA_THRESH, seq_len=SEQ_LEN,
        num_candidates=C, crop_hw=CROP_HW, select_highest_candidate=False,
        det_conf=0.5, motion_compensation=use_mc, is_moving=use_mc,
    )

    # record the production warps so the MC variant can prove the
    # compensation actually moved positions (not a trivially-identity warp)
    warp_shifts = []
    orig_align = cmc_mod.ecc_align

    def recorded_align(*a, **k):
        cc, warp = orig_align(*a, **k)
        warp_shifts.append(float(np.linalg.norm(warp[:, 2])))
        return cc, warp

    cmc_mod.ecc_align = recorded_align
    try:

        forced = {"jax": None}
        orig_third = oracle_tracker._third_round

        def forced_third(pool, considered, kalman_cands):
            out = orig_third(pool, considered, kalman_cands)
            return forced["jax"] if forced["jax"] is not None else out

        oracle_tracker._third_round = forced_third

        rng_feats = {
            oid: np.random.RandomState(500 + oid).randn(32)
            for oid in range(len(seq.objects))
        }

        third_rounds = decisions_checked = 0
        for t in range(seq.num_frames):
            frame = seq.frame(t)
            boxes, scores = seq.detections(t)
            feats = _object_features(seq, t, rng_feats)
            if feats is None:
                feats = np.zeros((0, 32))

            probs_log_jax.append(None)
            gen = jax_tracker.update_deferred(
                boxes.copy(), scores.copy(), feats.copy(), frame
            )
            forced["jax"] = None
            try:
                req = next(gen)
                res = run_third_round(
                    req.engine, req.pool, req.considered, req.kalman_cands,
                    req.thresh, **req.engine_kwargs
                )
                forced["jax"] = res
                gen.send(res)
                raise AssertionError("tracker yielded twice")
            except StopIteration as e:
                online_jax = e.value
            online_oracle = oracle_tracker.update(
                boxes.copy(), scores.copy(), feats.copy(), frame
            )

            ids_jax = sorted(tr.track_id for tr in online_jax)
            ids_oracle = sorted(tr.track_id for tr in online_oracle)
            assert ids_jax == ids_oracle, (
                f"frame {t + 1}: track IDs diverged {ids_jax} vs {ids_oracle}"
            )
            pos_jax = {tr.track_id: tr.pos for tr in online_jax}
            pos_oracle = {tr.track_id: tr.pos for tr in online_oracle}
            for tid in ids_jax:
                np.testing.assert_allclose(
                    pos_jax[tid], pos_oracle[tid], rtol=0, atol=1e-6,
                    err_msg=f"frame {t + 1} track {tid}",
                )

            pj = probs_log_jax[-1]
            po = oracle_tracker.probs_log[-1]
            assert (pj is None) == (po is None), (
                f"frame {t + 1}: third round fired in one pipeline only "
                f"(jax={pj is not None}, oracle={po is not None})"
            )
            if pj is not None and po is not None and len(pj):
                third_rounds += 1
                assert pj.shape == po.shape, f"frame {t + 1}"
                np.testing.assert_allclose(
                    pj, po, rtol=0, atol=TIE_TOL,
                    err_msg=f"frame {t + 1}: probabilities diverged",
                )
                d = pj.shape[1] - len(pj)
                idx = (np.arange(len(pj)), d + np.arange(len(pj)))
                kal_j, kal_o = pj[idx], po[idx]
                clear = np.abs(kal_o - BUSCA_THRESH) > TIE_TOL
                np.testing.assert_array_equal(
                    (kal_j > BUSCA_THRESH)[clear],
                    (kal_o > BUSCA_THRESH)[clear],
                    err_msg=f"frame {t + 1}: clear-margin decisions diverged",
                )
                decisions_checked += int(clear.sum())

    finally:
        cmc_mod.ecc_align = orig_align
    return {
        "third_rounds": third_rounds,
        "decisions_checked": decisions_checked,
        "warp_shifts": warp_shifts,
    }


@pytest.mark.slow
def test_ghost_pipeline_matches_torch_oracle():
    out = _run_ghost_parity(_make_sequence())
    assert out["third_rounds"] >= 4, (
        f"only {out['third_rounds']} third rounds fired"
    )
    assert out["decisions_checked"] >= 2, "too few clear-margin decisions"


@pytest.mark.slow
def test_ghost_pipeline_matches_torch_oracle_mc():
    """Composed parity with GHOST's ECC ego-motion compensation LIVE
    (base_tracker.py:599-633 + the is_moving gate, tracking_utils.py:209):
    the stream pans globally, both pipelines warp every track's stored
    position history each frame, and IDs / boxes / third-round
    probabilities must still agree frame-by-frame."""
    out = _run_ghost_parity(_make_drift_sequence(), use_mc=True)
    assert out["third_rounds"] >= 3, (
        f"only {out['third_rounds']} third rounds fired"
    )
    shifts = np.asarray(out["warp_shifts"])
    assert len(shifts) >= 10, "ECC never ran in the production tracker"
    assert shifts.max() > 0.5, (
        f"ECC warps were near-identity (max shift {shifts.max():.3f} px) — "
        "the drift stream failed to exercise the compensation"
    )


def test_sort_pipeline_matches_oracle():
    """The SORT alternate (trackers/sort.py, vectorized-predict production
    code) tracks the independent per-track-scalar oracle exactly: IDs per
    frame, boxes to float64 noise, over births, dropouts, and re-matches.
    (mot_evaluator.py:258-379 `evaluate_sort` composed; the tracker itself
    is rebuilt from the published algorithm — submodule empty upstream.)"""
    from busca_tpu.trackers.sort import SortConfig, SortTrack, SortTracker
    from oracle_pipeline import OracleSortTracker

    seq = _make_sequence()
    SortTrack._count = IdCounter(1)  # align ID streams
    ours = SortTracker(SortConfig())
    oracle = OracleSortTracker()

    frames_with_output = 0
    ids_seen = set()
    for t in range(N_FRAMES):
        boxes, scores = seq.detections(t)
        out_a = ours.update(boxes.copy(), scores.copy(), 1.0, None)
        out_b = oracle.update(boxes.copy(), scores.copy(), 1.0, None)
        ids_a = sorted(tr.track_id for tr in out_a)
        ids_b = sorted(tr.track_id for tr in out_b)
        assert ids_a == ids_b, f"frame {t + 1}: {ids_a} vs {ids_b}"
        box_a = {tr.track_id: tr.tlwh for tr in out_a}
        box_b = {tr.track_id: tr.tlwh for tr in out_b}
        for tid in ids_a:
            np.testing.assert_allclose(
                box_a[tid], box_b[tid], rtol=0, atol=1e-6,
                err_msg=f"frame {t + 1} track {tid}",
            )
        ids_seen.update(ids_a)
        frames_with_output += bool(ids_a)

    # the stream must exercise the interesting paths: steady output, all
    # four objects tracked, and dropout-driven lifecycle churn (either a
    # surviving re-match or a rebirth — both must agree, which the per-frame
    # asserts above already pinned)
    assert frames_with_output > N_FRAMES // 2
    assert len(ids_seen) >= 4


def test_motdt_pipeline_matches_oracle():
    """The MOTDT alternate (trackers/motdt.py: pooled+NMS'd candidates,
    motion-gated appearance stage, IoU stage, EMA features) tracks the
    independent oracle exactly — IDs and boxes per frame across dropout
    windows where tracks survive on their own decayed predictions
    (mot_evaluator.py:503-625 composed; algorithm per Chen et al. ICME'18,
    submodule empty upstream)."""
    from busca_tpu.trackers.motdt import MotdtConfig, MotdtTrack, MotdtTracker
    from oracle_pipeline import OracleMotdtTracker

    seq = _make_sequence()
    MotdtTrack._count = IdCounter(1)  # align ID streams
    ours = MotdtTracker(MotdtConfig())
    oracle = OracleMotdtTracker()

    rng_feats = {
        oid: np.random.RandomState(500 + oid).randn(32)
        for oid in range(len(seq.objects))
    }

    frames_with_output = 0
    ids_seen = set()
    for t in range(N_FRAMES):
        boxes, scores = seq.detections(t)
        feats = _object_features(seq, t, rng_feats)
        if feats is None:
            feats = np.zeros((0, 32))
        out_a = ours.update(boxes.copy(), scores.copy(), feats.copy(), None)
        out_b = oracle.update(boxes.copy(), scores.copy(), feats.copy(), None)
        ids_a = sorted(tr.track_id for tr in out_a)
        ids_b = sorted(tr.track_id for tr in out_b)
        assert ids_a == ids_b, f"frame {t + 1}: {ids_a} vs {ids_b}"
        box_a = {tr.track_id: tr.tlwh for tr in out_a}
        box_b = {tr.track_id: tr.tlwh for tr in out_b}
        for tid in ids_a:
            np.testing.assert_allclose(
                box_a[tid], box_b[tid], rtol=0, atol=1e-6,
                err_msg=f"frame {t + 1} track {tid}",
            )
        ids_seen.update(ids_a)
        frames_with_output += bool(ids_a)

    assert frames_with_output > N_FRAMES // 2
    assert len(ids_seen) >= 4


def _run_centertrack_parity(seq, tie_tol=TIE_TOL, use_cmc=False):
    """The CenterTrack adapter (dict-in/dict-out shim over the mot20-style
    BYTE strategy, trackers/centertrack.py mirroring
    adapters/CenterTrack/src/lib/utils/tracker.py:7-74) runs the given
    BUSCA-attached stream as an mot20 torch oracle: identical
    tracking_ids and boxes every frame, third-round probabilities within
    crop noise, clear-margin decisions equal.  Non-pedestrian results
    (class != 1) must be dropped before tracking.  ``use_cmc`` runs both
    pipelines with ECC camera-motion compensation live — the shipped
    CenterTrack-MOT17 config enables it
    (config/CenterTrack/MOT17/config_centertrack_mot17.yml:26).  Returns
    the exercise counters.  ``tie_tol`` overrides the probability noise
    bound: random
    fuzz scenes with several near-equal candidates amplify the crop-LSB
    noise through the batch-stat BN slightly beyond the authored-stream
    calibration (measured worst 0.021 vs TIE_TOL's 0.02)."""
    import busca_tpu.trackers.byte as byte_mod

    from busca_tpu.trackers.centertrack import CenterTrackAdapter

    torch_model, engine = _build_shared_models()

    probs_log_jax = []
    orig_assoc = engine.associate

    def logged(*a, **k):
        out = orig_assoc(*a, **k)
        probs_log_jax[-1] = None if out[0] is None else np.array(out[0])
        return out

    engine.associate = logged

    NEW_THRESH = 0.55
    Track.reset_id_counter()
    adapter = CenterTrackAdapter(
        ByteTrackerConfig(
            use_busca=True, track_thresh=0.5, busca_thresh=BUSCA_THRESH,
            seq_len=SEQ_LEN, num_candidates=C, crop_hw=CROP_HW,
            use_camera_motion_compensation=use_cmc,
            select_highest_candidate=False,
        ),
        engine, new_thresh=NEW_THRESH,
    )
    oracle_tracker = OracleByteTracker(
        torch_model, track_thresh=0.5, busca_thresh=BUSCA_THRESH,
        seq_len=SEQ_LEN, num_candidates=C, crop_hw=CROP_HW,
        select_highest_candidate=False, mot20=True,
        use_camera_motion_compensation=use_cmc,
    )
    oracle_tracker.det_thresh = NEW_THRESH  # tracker.py:11 new_thresh

    warp_shifts = _record_warp_shifts(oracle_tracker)

    # capture the jax third-round outcome as it happens (the adapter's
    # update is self-contained), then force it into the oracle so a
    # crop-LSB near-tie cannot fork the histories (the oracle's own
    # decision is still computed and compared below)
    captured = {"jax": None, "oracle": None}
    orig_run = byte_mod.run_third_round

    def capturing_run(*a, **k):
        out = orig_run(*a, **k)
        captured["jax"] = out
        return out

    orig_third = oracle_tracker._third_round

    def forced_third(pool, considered, kalman_cands):
        out = orig_third(pool, considered, kalman_cands)
        captured["oracle"] = out
        return captured["jax"] if captured["jax"] is not None else out

    oracle_tracker._third_round = forced_third

    third_rounds = rescues = decisions_checked = 0
    byte_mod.run_third_round = capturing_run
    try:
        for t in range(seq.num_frames):
            frame = seq.frame(t)
            boxes, scores = seq.detections(t)
            dicts = [
                {"bbox": b, "score": s, "class": 1}
                for b, s in zip(boxes, scores)
            ]
            # a non-pedestrian result the shim must drop (detector.py:143-156
            # passes every class through; tracker.py:40-74 keeps class 1)
            dicts.append({"bbox": np.array([1.0, 1.0, 9.0, 9.0]),
                          "score": 0.99, "class": 2})

            probs_log_jax.append(None)
            captured["jax"] = None
            out_dicts = adapter.step(dicts, frame)
            captured["oracle"] = None
            online_oracle = oracle_tracker.update(
                boxes.copy(), scores.copy(), 1.0, frame
            )

            ids_jax = sorted(d["tracking_id"] for d in out_dicts)
            ids_oracle = sorted(tr.track_id for tr in online_oracle)
            assert ids_jax == ids_oracle, (
                f"frame {t + 1}: {ids_jax} vs {ids_oracle}"
            )
            box_jax = {d["tracking_id"]: d["bbox"] for d in out_dicts}
            for tr in online_oracle:
                np.testing.assert_allclose(
                    box_jax[tr.track_id], tr.tlbr, rtol=0, atol=1e-6,
                    err_msg=f"frame {t + 1} track {tr.track_id}",
                )
            for d in out_dicts:
                assert d["class"] == 1
                np.testing.assert_allclose(
                    d["ct"],
                    [(d["bbox"][0] + d["bbox"][2]) / 2,
                     (d["bbox"][1] + d["bbox"][3]) / 2],
                )

            pj = probs_log_jax[-1]
            po = oracle_tracker.probs_log[-1]
            assert (pj is None) == (po is None), f"frame {t + 1}"
            if pj is not None:
                third_rounds += 1
                assert pj.shape == po.shape
                np.testing.assert_allclose(
                    pj, po, rtol=0, atol=tie_tol,
                    err_msg=f"frame {t + 1}: probabilities diverged",
                )
                if len(pj):
                    d = pj.shape[1] - len(pj)
                    idx = (np.arange(len(pj)), d + np.arange(len(pj)))
                    kal_j, kal_o = pj[idx], po[idx]
                    clear = np.abs(kal_o - BUSCA_THRESH) > tie_tol
                    np.testing.assert_array_equal(
                        (kal_j > BUSCA_THRESH)[clear],
                        (kal_o > BUSCA_THRESH)[clear],
                        err_msg=f"frame {t + 1}: decisions diverged",
                    )
                    decisions_checked += int(clear.sum())
                    rescues += int((kal_j > BUSCA_THRESH).sum())
    finally:
        byte_mod.run_third_round = orig_run

    return {
        "third_rounds": third_rounds,
        "decisions_checked": decisions_checked,
        "rescues": rescues,
        "warp_shifts": warp_shifts,
    }


@pytest.mark.slow
def test_centertrack_pipeline_matches_torch_oracle():
    out = _run_centertrack_parity(_make_sequence())
    assert out["third_rounds"] >= 15, (
        f"only {out['third_rounds']} third rounds fired"
    )
    assert out["decisions_checked"] >= 15
    assert out["rescues"] >= 1


def _run_transcenter_parity(seq, use_cmc=False):
    """The TransCenter adapter (BYTE strategy + the detector-feedback
    position export, trackers/transcenter.py mirroring
    adapters/TransCenter/tracking/byte_tracker.py:658-692) over the given
    BUSCA-attached stream: byte-identical tracking vs the torch oracle AND
    a per-frame check that the exported query priors equal the oracle's
    tracked+lost box set.  ``use_cmc`` runs both pipelines with ECC live —
    the shipped TransCenter-MOT17 config enables it
    (config/TransCenter/MOT17/config_transcenter_mot17.yml:27).  Returns
    the exercise counters."""
    import busca_tpu.trackers.byte as byte_mod

    from busca_tpu.trackers.transcenter import (
        TransCenterByteTracker,
        boxes_to_center_priors,
    )

    torch_model, engine = _build_shared_models()

    Track.reset_id_counter()
    jax_tracker = TransCenterByteTracker(
        ByteTrackerConfig(
            use_busca=True, track_thresh=0.5, busca_thresh=BUSCA_THRESH,
            seq_len=SEQ_LEN, num_candidates=C, crop_hw=CROP_HW,
            use_camera_motion_compensation=use_cmc,
            select_highest_candidate=False,
        ),
        engine,
    )
    oracle_tracker = OracleByteTracker(
        torch_model, track_thresh=0.5, busca_thresh=BUSCA_THRESH,
        seq_len=SEQ_LEN, num_candidates=C, crop_hw=CROP_HW,
        select_highest_candidate=False,
        use_camera_motion_compensation=use_cmc,
    )

    warp_shifts = _record_warp_shifts(oracle_tracker)

    captured = {"jax": None}
    orig_run = byte_mod.run_third_round

    def capturing_run(*a, **k):
        out = orig_run(*a, **k)
        captured["jax"] = out
        return out

    orig_third = oracle_tracker._third_round

    def forced_third(pool, considered, kalman_cands):
        out = orig_third(pool, considered, kalman_cands)
        return captured["jax"] if captured["jax"] is not None else out

    oracle_tracker._third_round = forced_third

    def sorted_rows(arr):
        arr = np.asarray(arr, np.float64).reshape(-1, 4)
        return arr[np.lexsort(arr.T[::-1])]

    pos_checked = third_rounds = 0
    byte_mod.run_third_round = capturing_run
    try:
        for t in range(seq.num_frames):
            frame = seq.frame(t)
            boxes, scores = seq.detections(t)
            # the export the detector would consume NEXT frame
            # (mot_evaluator.py:158 feeds it before this frame's update;
            # here we validate it against the oracle's post-update state
            # at every frame boundary)
            captured["jax"] = None
            online_jax = jax_tracker.update(boxes.copy(), scores.copy(),
                                            1.0, frame)
            online_oracle = oracle_tracker.update(boxes.copy(),
                                                  scores.copy(), 1.0, frame)
            third_rounds += captured["jax"] is not None
            ids_jax = sorted(tr.track_id for tr in online_jax)
            ids_oracle = sorted(tr.track_id for tr in online_oracle)
            assert ids_jax == ids_oracle, (
                f"frame {t + 1}: {ids_jax} vs {ids_oracle}"
            )

            pos = jax_tracker.get_detector_positions()
            o_tracked = list(oracle_tracker.tracked_stracks)
            seen = {tr.track_id for tr in o_tracked}
            o_pool = o_tracked + [
                tr for tr in oracle_tracker.lost_stracks
                if tr.track_id not in seen
            ]
            if not o_pool:
                assert pos is None
            else:
                expected = np.stack([tr.tlbr for tr in o_pool])
                np.testing.assert_allclose(
                    sorted_rows(pos), sorted_rows(expected),
                    rtol=0, atol=1e-4,
                    err_msg=f"frame {t + 1}: exported priors diverged",
                )
                pos_checked += len(o_pool)
                # variant exports restrict the pool
                # (byte_tracker.py:664-677)
                only_tracked = jax_tracker.get_detector_positions(
                    omit_lost=True
                )
                n_tracked = len(o_tracked)
                assert (only_tracked is None and n_tracked == 0) or len(
                    only_tracked
                ) == n_tracked
                pri = boxes_to_center_priors(pos)
                np.testing.assert_allclose(
                    pri,
                    (np.asarray(pos)[:, :2] + np.asarray(pos)[:, 2:]) / 8.0,
                )
    finally:
        byte_mod.run_third_round = orig_run

    return {"pos_checked": pos_checked, "third_rounds": third_rounds,
            "warp_shifts": warp_shifts}


@pytest.mark.slow
def test_transcenter_pipeline_matches_torch_oracle():
    out = _run_transcenter_parity(_make_sequence())
    assert out["pos_checked"] >= 100, "position export exercised too little"
    assert out["third_rounds"] >= 15, (
        f"only {out['third_rounds']} third rounds fired"
    )
