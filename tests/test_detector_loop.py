"""Detector-in-the-loop eval path: preproc parity, postprocess top-k, full
frame->YOLOX->NMS->tracker loop (reference mot_evaluator.py:131-235)."""

import numpy as np
import jax.numpy as jnp
import pytest

from busca_tpu.eval.detector import (
    DetectorOutput,
    IMAGENET_MEAN_RGB,
    IMAGENET_STD_RGB,
    YoloxDetector,
    init_variables,
    track_frames_with_detector,
)
from busca_tpu.eval.presets import custom_byte_thresholds, golden_diff
from busca_tpu.models.yolox import YoloxConfig
from busca_tpu.ops.nms import yolox_postprocess


TINY = YoloxConfig(depth=0.33, width=0.125, num_classes=1)
TEST_SIZE = (64, 96)


@pytest.fixture(scope="module")
def tiny_detector():
    variables = init_variables(TINY, TEST_SIZE)
    return YoloxDetector(
        TINY, variables, test_size=TEST_SIZE, conf_thresh=0.05,
        nms_thresh=0.7, max_outputs=32,
    )


def _frame(rng, h=50, w=70):
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.slow
def test_detect_output_contract(tiny_detector, rng):
    frame = _frame(rng)
    out = tiny_detector.detect(frame)
    assert isinstance(out, DetectorOutput)
    r = min(TEST_SIZE[0] / 50, TEST_SIZE[1] / 70)
    assert out.scale == pytest.approx(r)
    assert out.image.shape == (TEST_SIZE[0], TEST_SIZE[1], 3)
    assert out.image.dtype == np.uint8
    assert out.boxes_tlbr.shape == (len(out.scores), 4)
    # second call reuses the compiled step (same resolution)
    assert len(tiny_detector._steps) == 1
    tiny_detector.detect(frame)
    assert len(tiny_detector._steps) == 1


@pytest.mark.slow
def test_detector_image_matches_reference_preproc(tiny_detector, rng):
    """The uint8 detector image == the reference preproc's padded canvas
    (exps/transcenterdetr_base.py:284-306) before normalization."""
    import cv2

    frame = _frame(rng)
    out = tiny_detector.detect(frame)

    th, tw = TEST_SIZE
    r = min(th / frame.shape[0], tw / frame.shape[1])
    resized = cv2.resize(
        frame,
        (int(frame.shape[1] * r), int(frame.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    )
    oracle = np.full((th, tw, 3), 114.0, np.float32)
    oracle[: resized.shape[0], : resized.shape[1]] = resized
    oracle = oracle.astype(np.uint8)
    # fused-op resize matches cv2 INTER_LINEAR within rounding
    assert np.abs(out.image.astype(int) - oracle.astype(int)).max() <= 2
    # padding region is bit-exact 114
    assert (out.image[resized.shape[0] :, :] == 114).all()
    assert (out.image[:, resized.shape[1] :] == 114).all()


def test_normalization_roundtrip():
    """De-normalizing the network input must reproduce the detector image —
    the reference rebuilds vot_img that way (mot_evaluator.py:196-204)."""
    canvas = np.random.RandomState(0).randint(0, 256, (8, 8, 3)).astype(np.uint8)
    x = (canvas[..., ::-1] / 255.0 - IMAGENET_MEAN_RGB) / IMAGENET_STD_RGB
    back = (x * IMAGENET_STD_RGB + IMAGENET_MEAN_RGB)[..., ::-1] * 255.0
    assert np.abs(back - canvas).max() < 1e-3


def test_postprocess_topk_equivalence(rng):
    """pre_nms_topk larger than N must not change results."""
    n, nc = 40, 1
    pred = np.zeros((n, 5 + nc), np.float32)
    pred[:, 0] = rng.uniform(20, 80, n)
    pred[:, 1] = rng.uniform(20, 60, n)
    pred[:, 2:4] = rng.uniform(5, 20, (n, 2))
    pred[:, 4] = rng.uniform(0, 1, n)
    pred[:, 5] = rng.uniform(0, 1, n)
    a, va = yolox_postprocess(jnp.asarray(pred), nc, 0.1, 0.5, 16,
                              pre_nms_topk=1024)
    b, vb = yolox_postprocess(jnp.asarray(pred), nc, 0.1, 0.5, 16,
                              pre_nms_topk=20)
    # topk=20 keeps the 20 best-scored rows; with 40 rows the kept set can
    # differ only if >20 survive NMS — assert the common prefix agrees
    na, nb = int(np.asarray(va).sum()), int(np.asarray(vb).sum())
    k = min(na, nb)
    np.testing.assert_allclose(np.asarray(a)[:k], np.asarray(b)[:k], rtol=1e-6)


@pytest.mark.slow
def test_full_detector_tracker_loop(tiny_detector, rng):
    """Raw frames through detector + ByteTracker: the reference's canonical
    call stack with no cached detections."""
    from busca_tpu.trackers import ByteTracker, ByteTrackerConfig

    tracker = ByteTracker(ByteTrackerConfig(track_thresh=0.5))
    frames = [_frame(rng) for _ in range(4)]
    res = track_frames_with_detector(
        tiny_detector, tracker, frames, name="live", min_box_area=0.0
    )
    assert res.num_frames == 4
    assert len(res.results) == 4
    for frame_id, tlwhs, ids, confs in res.results:
        assert len(tlwhs) == len(ids) == len(confs)


class _SerialOnly:
    """Detector proxy hiding the async API — forces the non-pipelined path."""

    def __init__(self, det):
        self._det = det
        self.put_frame = det.put_frame
        self.detect = det.detect


def test_pipelined_loop_matches_serial(tiny_detector, rng):
    """The software-pipelined frame loop (dispatch t+1 before fetching t,
    SURVEY §7.3.4) is an execution-schedule change only: identical outputs
    to the serial loop, frame by frame."""
    from busca_tpu.trackers import ByteTracker, ByteTrackerConfig

    frames = [_frame(rng) for _ in range(6)]
    runs = []
    for det in (tiny_detector, _SerialOnly(tiny_detector)):
        tracker = ByteTracker(ByteTrackerConfig(track_thresh=0.5))
        runs.append(track_frames_with_detector(
            det, tracker, frames, name="pipe", min_box_area=0.0
        ))
    piped, serial = runs
    assert len(piped.results) == len(serial.results)
    for (fa, ta, ia, ca), (fb, tb, ib, cb) in zip(
        piped.results, serial.results
    ):
        assert fa == fb
        assert ia == ib
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


@pytest.mark.slow
def test_det_log_feeds_coco_table(tiny_detector, rng):
    """det_log collects per-frame raw detections in original coordinates and
    feeds the 12-number COCO table (mot_evaluator.py:659-711)."""
    from busca_tpu.eval.detection import coco_eval_full, format_coco_table
    from busca_tpu.trackers import ByteTracker, ByteTrackerConfig

    tracker = ByteTracker(ByteTrackerConfig(track_thresh=0.5))
    frames = [_frame(rng) for _ in range(3)]
    log = []
    track_frames_with_detector(
        tiny_detector, tracker, frames, name="live", min_box_area=0.0,
        det_log=log,
    )
    assert [fid for fid, _, _ in log] == [1, 2, 3]
    h, w = frames[0].shape[:2]
    dets, gts = {}, {}
    for fid, boxes, scores in log:
        assert boxes.shape[1] == 4 and len(boxes) == len(scores)
        # original coordinates: frame-scale, not letterbox-canvas-scale
        # (raw yolox outputs are unclipped, so allow a small overshoot)
        if len(boxes):
            assert boxes[:, 2].max() <= w * 1.3
            assert boxes[:, 3].max() <= h * 1.3
        dets[fid] = (boxes, scores)
        gts[fid] = boxes.copy()  # self-match -> a well-formed perfect table
    stats = coco_eval_full(dets, gts)
    txt = format_coco_table(stats)
    assert len(txt.splitlines()) == 12
    if any(len(b) for b, _ in dets.values()):
        assert stats["ap"] == 1.0


# ------------------------- presets / golden harness -------------------------

def test_custom_byte_thresholds_table():
    # mot_evaluator.py:146-163 spot checks
    assert custom_byte_thresholds("MOT17-05-FRCNN", 0.6) == {
        "track_thresh": 0.6, "track_buffer": 14}
    assert custom_byte_thresholds("MOT17-06-FRCNN", 0.6) == {
        "track_thresh": 0.65, "track_buffer": 14}
    assert custom_byte_thresholds("MOT17-13-FRCNN", 0.6)["track_buffer"] == 25
    assert custom_byte_thresholds("MOT17-14-FRCNN", 0.6) == {
        "track_thresh": 0.67, "track_buffer": 25}
    assert custom_byte_thresholds("MOT20-06", 0.6)["track_thresh"] == 0.3
    assert custom_byte_thresholds("MOT17-02-FRCNN", 0.6) == {
        "track_thresh": 0.6, "track_buffer": 30}
    # bare names also match
    assert custom_byte_thresholds("MOT17-05", 0.6)["track_buffer"] == 14
    # the ignore flag restores defaults (mot_evaluator.py:141-143)
    assert custom_byte_thresholds("MOT17-05-FRCNN", 0.6, ignore=True) == {
        "track_thresh": 0.6, "track_buffer": 30}


def test_golden_diff_report():
    measured = {"mota": 76.795, "hota": 69.0, "idf1": 82.272, "ids": 219}
    rep = golden_diff(measured, "strongsort_busca")
    assert rep["mota"]["diff"] == 0.0
    assert rep["hota"]["diff"] == pytest.approx(-0.392)
    assert rep["ids"]["want"] == 219


@pytest.mark.slow
def test_detect_batch_matches_single(tiny_detector, rng):
    """Batched detection == per-frame detection (same weights, same frames)."""
    frames = [_frame(rng) for _ in range(3)]
    batched = tiny_detector.detect_batch(np.stack(frames))
    for f, db in zip(frames, batched):
        ds = tiny_detector.detect(f)
        assert db.scale == pytest.approx(ds.scale)
        np.testing.assert_allclose(
            np.asarray(db.image), np.asarray(ds.image)
        )
        assert len(db.scores) == len(ds.scores)
        if len(ds.scores):
            np.testing.assert_allclose(db.boxes_tlbr, ds.boxes_tlbr,
                                       rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_lockstep_sequences(tiny_detector, rng):
    """B sequences of different lengths tracked in lockstep produce the same
    per-frame structure as independent runs, with static batch shapes."""
    from busca_tpu.eval.detector import track_sequences_lockstep
    from busca_tpu.trackers import ByteTracker, ByteTrackerConfig

    seq_a = [_frame(rng) for _ in range(4)]
    seq_b = [_frame(rng) for _ in range(2)]  # shorter: padding path
    trackers = [ByteTracker(ByteTrackerConfig(track_thresh=0.5))
                for _ in range(2)]
    res = track_sequences_lockstep(
        tiny_detector, trackers, [iter(seq_a), iter(seq_b)],
        names=["a", "b"], min_box_area=0.0,
    )
    assert res[0].num_frames == 4
    assert res[1].num_frames == 2
    for r in res:
        for frame_id, tlwhs, ids, confs in r.results:
            assert len(tlwhs) == len(ids) == len(confs)


@pytest.mark.slow
@pytest.mark.parametrize("banked", [False, True])
def test_live_detector_with_busca_engine(tiny_detector, rng, banked):
    """Detector-in-the-loop WITH the BUSCA engine attached: crops must come
    off the device-resident detector image and the third round must execute
    (the full reference call stack 3.1 + 3.2 combined, live).  ``banked``
    runs the same loop with the device crop bank (assoc/bank.py): crops are
    admitted at extraction and the scorer gathers slot indices."""
    import jax

    from busca_tpu.assoc.bank import DeviceCropBank
    from busca_tpu.assoc.engine import AssociationEngine
    from busca_tpu.models.busca import BuscaConfig, BuscaModel
    from busca_tpu.trackers import ByteTracker, ByteTrackerConfig

    h, w = 32, 16
    cfg = BuscaConfig(num_layer=1, reid_num_classes=5,
                      reid_layers=(1, 1, 1, 1))
    model = BuscaModel(cfg)
    seq_len, num_can = 3, 2
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, seq_len, h, w, 3), np.float32),
        np.zeros((1, num_can, h, w, 3), np.float32),
        np.zeros((1, seq_len, 4), np.float32),
        np.zeros((1, num_can, 4), np.float32),
    )
    engine = AssociationEngine(
        cfg, {"params": variables["params"]}, seq_len=seq_len,
        num_candidates=num_can, crop_hw=(h, w), buckets=(1, 2, 4),
        bank=DeviceCropBank((h, w), capacity=64) if banked else None,
    )
    tcfg = ByteTrackerConfig(
        track_thresh=0.0, use_busca=True, busca_thresh=0.01,
        seq_len=seq_len, num_candidates=num_can, crop_hw=(h, w),
        use_camera_motion_compensation=False,
    )
    tracker = ByteTracker(tcfg, engine)
    res = track_frames_with_detector(
        tiny_detector, tracker, [_frame(rng) for _ in range(4)],
        min_box_area=0.0,
    )
    assert res.num_frames == 4
    # device-image crops reached the track memories (uint8 host crops)
    mems = [t for t in tracker.tracked + tracker.lost if t.images_mem]
    for t in mems:
        for im in t.images_mem:
            assert im.shape == (h, w, 3) and im.dtype == np.uint8
