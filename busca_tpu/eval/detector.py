"""Live detector-in-the-loop evaluation: frame -> YOLOX -> NMS -> tracker.

Rebuilds the reference's canonical per-frame detector path
(adapters/ByteTrack/yolox/evaluators/mot_evaluator.py:131-235):

1. preproc: aspect-preserving resize, 114-pad to the test size, BGR->RGB,
   ImageNet normalize (exps/transcenterdetr_base.py:284-306 ``preproc``);
2. detector forward + decode;
3. confidence filter + class-aware NMS (yolox/utils/boxes.py postprocess);
4. the de-normalized uint8 BGR detector image handed to the tracker for
   BUSCA crops (mot_evaluator.py:196-204 rebuilds it from the normalized
   tensor; here the padded uint8 canvas *is* that image, kept directly).

TPU-first: steps 1-3 run as ONE jitted device call per frame — the resize is
the fused crop op (exact cv2.INTER_LINEAR semantics, ops/crop.py), the pad +
normalize fuse into the first conv, and the static-shape NMS keeps everything
on device.  Only the final fixed-size (boxes, scores, valid) block and the
uint8 detector image return to host.  Shapes are static per input resolution,
so a sequence compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

# ImageNet RGB statistics — the ValTransform defaults the reference evaluates
# with (exps/transcenterdetr_base.py:327-333; mot_evaluator.py:198-199 reads
# them back off the dataloader to de-normalize).
IMAGENET_MEAN_RGB = (0.485, 0.456, 0.406)
IMAGENET_STD_RGB = (0.229, 0.224, 0.225)
PAD_VALUE = 114.0


@dataclasses.dataclass
class DetectorOutput:
    """One frame's detections, in detector (resized) coordinates.

    ``image`` is intentionally left as a *device* array: the BUSCA crop op
    consumes it on device, and trackers that never touch it (no BUSCA, no
    camera-motion compensation) then never pay the device->host transfer.
    Call ``np.asarray(out.image)`` where host pixels are genuinely needed.
    """

    boxes_tlbr: np.ndarray  # [N, 4] detector coords
    scores: np.ndarray  # [N] obj_conf * cls_conf
    image: "np.ndarray"  # [test_h, test_w, 3] uint8 BGR (device array)
    scale: float  # detector coords = original coords * scale


def rows_to_detector_output(out, valid, image, scale) -> DetectorOutput:
    """Postprocessed step rows -> :class:`DetectorOutput`.

    Single source of the output-row contract (columns 0-3 tlbr boxes,
    tracker input scores = obj_conf * cls_conf, byte_tracker.py:230-234) —
    shared by the live detectors and the AOT artifact detectors
    (serve/detector.py) so the convention cannot silently diverge.
    """
    rows = np.asarray(out)[np.asarray(valid)]
    return DetectorOutput(
        boxes_tlbr=rows[:, :4].astype(np.float64),
        scores=(rows[:, 4] * rows[:, 5]).astype(np.float64),
        image=image,
        scale=scale,
    )


class YoloxDetector:
    """Flax YOLOX wrapped for the per-frame tracking loop.

    Args:
      config: model size/classes (``YoloxConfig.size("x", num_classes=1)``
        for the ByteTrack MOT detector).
      variables: model variables (``{"params", "batch_stats"}``) — from
        ``convert_yolox_state_dict`` on an official checkpoint, or
        ``init_variables`` for random weights.
      test_size: (H, W) detector input, reference MOT17 uses (800, 1440)
        (exps comments; ablation runs (640, 1088)).
      conf_thresh / nms_thresh: postprocess thresholds (exp.test_conf /
        exp.nmsthre).
    """

    def __init__(
        self,
        config,
        variables,
        test_size: Tuple[int, int] = (800, 1440),
        conf_thresh: float = 0.1,
        nms_thresh: float = 0.7,
        max_outputs: int = 256,
        pre_nms_topk: int = 1024,
    ):
        from busca_tpu.models.yolox import YOLOX

        self.config = config
        self.model = YOLOX(config)
        self.variables = variables
        self.test_size = tuple(test_size)
        self.conf_thresh = float(conf_thresh)
        self.nms_thresh = float(nms_thresh)
        self.max_outputs = int(max_outputs)
        self.pre_nms_topk = int(pre_nms_topk)
        self._steps = {}  # (frame_h, frame_w) -> jitted step
        self._mesh = None

    def shard_lockstep(self, mesh) -> "YoloxDetector":
        """Shard the lockstep batch over the mesh's ``dp`` axis.

        The TPU-native scale-out of the reference's DDP eval
        (tools/track.py:305-316): in lockstep mode each concurrently-tracked
        sequence contributes one frame per batch, so sharding the batch axis
        over dp places whole sequences' detector work on separate chips with
        zero steady-state collectives (per-frame compute is sample-
        independent; GSPMD partitions it without communication).  Variables
        are replicated.  Per-sample numerics are unchanged — asserted by
        ``tests/test_sharded_numerics.py`` on a virtual 8-device mesh.

        Returns self (chainable); clears compiled steps so the next call
        recompiles with shardings attached.
        """
        self._mesh = mesh
        self._steps = {}
        return self

    # ------------------------------------------------------------ factory --
    @classmethod
    def build(
        cls,
        size: str = "x",
        ckpt_path: Optional[str] = None,
        num_classes: int = 1,
        **kw,
    ) -> "YoloxDetector":
        """Detector from a size name + optional official torch checkpoint."""
        from busca_tpu.models.yolox import YoloxConfig, convert_yolox_state_dict

        config = YoloxConfig.size(size, num_classes=num_classes)
        if ckpt_path:
            if ckpt_path.endswith(".npz"):
                from busca_tpu.models.checkpoint import load_params_npz

                variables = load_params_npz(ckpt_path)
            else:
                from busca_tpu.models.convert import load_torch_checkpoint

                sd = load_torch_checkpoint(ckpt_path)
                sd = sd.get("model", sd)
                variables = convert_yolox_state_dict(sd, config)
        else:
            variables = init_variables(config, kw.get("test_size", (800, 1440)))
        return cls(config, variables, **kw)

    # ----------------------------------------------------------- step build --
    def _make_step(self, frame_hw: Tuple[int, int]):
        import jax
        import jax.numpy as jnp

        from busca_tpu.ops.crop import crop_resize_normalize
        from busca_tpu.ops.nms import yolox_postprocess

        fh, fw = frame_hw
        th, tw = self.test_size
        r = min(th / fh, tw / fw)
        rh, rw = int(fh * r), int(fw * r)
        mean = jnp.asarray(IMAGENET_MEAN_RGB, jnp.float32)
        std = jnp.asarray(IMAGENET_STD_RGB, jnp.float32)

        @jax.jit
        def step(variables, frame_bgr_u8):
            # cv2.INTER_LINEAR resize of the full frame (uint8 rounding like
            # the reference's cv2.resize-then-float cast)
            box = jnp.asarray([[0.0, 0.0, float(fw), float(fh)]])
            resized = crop_resize_normalize(
                frame_bgr_u8,
                box,
                out_hw=(rh, rw),
                normalize=False,
                bgr_input=True,
                rgb_output=False,
                quantize_uint8=True,
            )[0]
            canvas = jnp.full((th, tw, 3), PAD_VALUE, jnp.float32)
            canvas = canvas.at[:rh, :rw].set(resized)
            det_image_u8 = jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)

            x = (canvas[..., ::-1] / 255.0 - mean) / std  # BGR->RGB, normalize
            pred = self.model.apply(variables, x[None])[0]  # [N, 5+C]
            out, valid = yolox_postprocess(
                pred,
                self.config.num_classes,
                self.conf_thresh,
                self.nms_thresh,
                self.max_outputs,
                pre_nms_topk=self.pre_nms_topk,
            )
            return out, valid, det_image_u8

        return step, r

    def _make_batch_step(self, frame_hw: Tuple[int, int]):
        # NOTE: the returned step is batch-shape-polymorphic under jit (the
        # traced frames set the batch); _steps keys include the padded batch
        # only to keep one closure per dispatch shape.
        import jax
        import jax.numpy as jnp

        from busca_tpu.ops.crop import crop_resize_normalize
        from busca_tpu.ops.nms import yolox_postprocess

        fh, fw = frame_hw
        th, tw = self.test_size
        r = min(th / fh, tw / fw)
        rh, rw = int(fh * r), int(fw * r)
        mean = jnp.asarray(IMAGENET_MEAN_RGB, jnp.float32)
        std = jnp.asarray(IMAGENET_STD_RGB, jnp.float32)

        jit_kw = {}
        if self._mesh is not None:
            # dp-sharded lockstep (see shard_lockstep): batch over dp,
            # variables replicated; outputs stay dp-sharded until fetch
            from busca_tpu.parallel.mesh import batch_sharding, replicated

            jit_kw = dict(
                in_shardings=(
                    replicated(self._mesh, self.variables),
                    batch_sharding(self._mesh, 4),
                ),
            )

        @functools.partial(jax.jit, **jit_kw)
        def step(variables, frames_bgr_u8):  # [B, fh, fw, 3]
            box = jnp.asarray([[0.0, 0.0, float(fw), float(fh)]])

            def one_canvas(f):
                resized = crop_resize_normalize(
                    f, box, out_hw=(rh, rw), normalize=False,
                    bgr_input=True, rgb_output=False, quantize_uint8=True,
                )[0]
                canvas = jnp.full((th, tw, 3), PAD_VALUE, jnp.float32)
                canvas = canvas.at[:rh, :rw].set(resized)
                return jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)

            canvases = jax.vmap(one_canvas)(frames_bgr_u8)
            x = (canvases[..., ::-1].astype(jnp.float32) / 255.0 - mean) / std
            preds = self.model.apply(variables, x)  # [B, N, 5+C]
            outs, valids = jax.vmap(
                lambda p: yolox_postprocess(
                    p, self.config.num_classes, self.conf_thresh,
                    self.nms_thresh, self.max_outputs,
                    pre_nms_topk=self.pre_nms_topk,
                )
            )(preds)
            return outs, valids, canvases

        return step, r

    def detect_batch_async(self, frames_bgr):
        """Dispatch the lockstep batch step (see :meth:`detect_batch`) and
        return a device-resident handle for :meth:`wait_batch` — the batch
        analogue of :meth:`detect_async` for pipelining the lockstep loop."""
        import jax.numpy as jnp

        frames = np.asarray(frames_bgr)
        b = frames.shape[0]
        if self._mesh is not None:
            # the dp axis needs an even split: pad with the last frame and
            # drop the pad lanes' outputs in wait_batch
            dp = self._mesh.shape.get("dp", 1)
            pad = (-b) % dp
            if pad:
                frames = np.concatenate([frames, frames[-1:].repeat(pad, 0)])
        bp = frames.shape[0]
        key = ("batch", int(frames.shape[1]), int(frames.shape[2]), bp)
        if key not in self._steps:
            self._steps[key] = self._make_batch_step(
                (int(frames.shape[1]), int(frames.shape[2]))
            )
        step, r = self._steps[key]
        outs, valids, canvases = step(self.variables, jnp.asarray(frames))
        return outs, valids, canvases, r, b

    def detect_batch(self, frames_bgr) -> list:
        """Run the detector on a BATCH of same-resolution frames (one per
        concurrently-tracked sequence) in one device call — the lockstep
        evaluation mode that keeps the MXU busy where per-frame batch-1
        underutilizes it.  Returns one :class:`DetectorOutput` per frame."""
        return self.wait_batch(self.detect_batch_async(frames_bgr))

    def wait_batch(self, handle) -> list:
        """Fetch a :meth:`detect_batch_async` handle into per-frame
        :class:`DetectorOutput`\\ s (blocks until the device step finished)."""
        outs, valids, canvases, r, b = handle
        outs = np.asarray(outs)
        valids = np.asarray(valids)
        return [
            rows_to_detector_output(outs[i], valids[i], canvases[i], r)
            for i in range(b)
        ]

    # ----------------------------------------------------------------- api --
    def put_frame(self, frame_bgr: np.ndarray):
        """Asynchronously upload a frame (prefetch: overlap the host->device
        transfer of frame t+1 with the compute of frame t, SURVEY §7.3.4).
        The returned device array can be passed straight to ``detect``."""
        import jax

        return jax.device_put(np.ascontiguousarray(frame_bgr))

    def detect_async(self, frame_bgr):
        """Dispatch the detector step for one uint8 BGR frame and return an
        opaque handle of still-on-device results (no host sync).  Pass the
        handle to :meth:`wait` to materialize the :class:`DetectorOutput`.

        This is the software-pipelining half of the frame loop (SURVEY
        §7.3.4): the driver dispatches frame t+1 here *before* fetching
        frame t, so host tracker bookkeeping for t overlaps device compute
        for t+1."""
        import jax.numpy as jnp

        key = (int(frame_bgr.shape[0]), int(frame_bgr.shape[1]))
        if key not in self._steps:
            self._steps[key] = self._make_step(key)
        step, r = self._steps[key]
        out, valid, det_image = step(self.variables, jnp.asarray(frame_bgr))
        return out, valid, det_image, r

    def wait(self, handle) -> DetectorOutput:
        """Fetch a :meth:`detect_async` handle (blocks until the device step
        finished) and build the host-side :class:`DetectorOutput`."""
        out, valid, det_image, r = handle
        # det_image stays device-resident; see DetectorOutput docstring
        return rows_to_detector_output(out, valid, det_image, r)

    def detect(self, frame_bgr) -> DetectorOutput:
        """Run the detector on one uint8 BGR frame (original resolution);
        accepts a host array or a ``put_frame`` device array."""
        return self.wait(self.detect_async(frame_bgr))


class TransCenterDetector:
    """Stateful TransCenter detector for the per-frame tracking loop.

    Mirrors the reference wrapper's statefulness and IO contract
    (adapters/TransCenter/models/transcenter.py:75-203): keeps the previous
    frame (``pre_sample``), consumes the tracker's current positions as
    ``pre_cts`` center priors, per-video ``reset()``
    (tracking/mot_evaluator.py:128-150), and emits score-filtered person
    detections.  The dense forward + decode is one jitted device call.
    """

    uses_feedback = True  # track loop passes tracker.get_detector_positions()

    def __init__(
        self,
        config=None,
        variables=None,
        test_size: Tuple[int, int] = (640, 1088),
        out_thresh: float = 0.1,
        nms_thresh: float = 0.7,
    ):
        from busca_tpu.models.transcenter import (
            TransCenterConfig,
            TransCenterDETR,
        )

        self.config = config or TransCenterConfig.for_dataset("mot17")
        self.model = TransCenterDETR(self.config)
        self.test_size = tuple(test_size)
        self.out_thresh = float(out_thresh)
        self.nms_thresh = float(nms_thresh)
        if variables is None:
            import jax
            import jax.numpy as jnp

            th, tw = self.test_size
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, th, tw, 3), jnp.float32),
                jnp.zeros((1, th, tw, 3), jnp.float32),
                jnp.zeros(
                    (1, th // self.config.down_ratio,
                     tw // self.config.down_ratio, 1),
                    jnp.float32,
                ),
            )
        self.variables = variables
        self._steps = {}
        self.reset()

    def reset(self):
        """Per-video state reset (transcenter.py:197-203)."""
        self._pre_canvas = None

    def state_dict(self) -> dict:
        """Cross-frame detector state as plain numpy — the previous frame's
        prepped canvas (the reference's ``pre_sample``,
        transcenter.py:89-92,194).  Snapshot this alongside the tracker so
        a restored stream is bit-equal to the unbroken one (serve/snapshot):
        a plain ``reset()`` would instead re-prime pre_sample from the first
        post-restore frame, a one-frame deviation."""
        pre = self._pre_canvas
        return {"pre_canvas": None if pre is None else np.asarray(pre)}

    def load_state_dict(self, state: dict):
        import jax.numpy as jnp

        pre = state.get("pre_canvas")
        self._pre_canvas = None if pre is None else jnp.asarray(pre)

    def _make_step(self, frame_hw: Tuple[int, int]):
        import jax
        import jax.numpy as jnp

        from busca_tpu.ops.crop import crop_resize_normalize
        from busca_tpu.ops.nms import nms as nms_op

        fh, fw = frame_hw
        th, tw = self.test_size
        r = min(th / fh, tw / fw)
        rh, rw = int(fh * r), int(fw * r)
        down = self.config.down_ratio
        mean = jnp.asarray(IMAGENET_MEAN_RGB, jnp.float32)
        std = jnp.asarray(IMAGENET_STD_RGB, jnp.float32)

        @jax.jit
        def prep(frame_bgr_u8):
            box = jnp.asarray([[0.0, 0.0, float(fw), float(fh)]])
            resized = crop_resize_normalize(
                frame_bgr_u8, box, out_hw=(rh, rw), normalize=False,
                bgr_input=True, rgb_output=False, quantize_uint8=True,
            )[0]
            canvas = jnp.zeros((th, tw, 3), jnp.float32)
            canvas = canvas.at[:rh, :rw].set(resized)
            return jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)

        @jax.jit
        def step(variables, canvas_u8, pre_canvas_u8, pre_hm):

            def norm(c_u8):
                return (
                    c_u8.astype(jnp.float32)[..., ::-1] / 255.0 - mean
                ) / std

            out = self.model.apply(
                variables, norm(canvas_u8)[None], norm(pre_canvas_u8)[None],
                pre_hm[None],
            )
            # transcenter.py:137-138: hm is not _sigmoid'ed in the net
            out = dict(out)
            out["hm"] = jnp.clip(jax.nn.sigmoid(out["hm"]), 1e-4, 1 - 1e-4)
            from busca_tpu.models.transcenter import generic_decode

            decoded = generic_decode(out, k=self.config.K)
            boxes = decoded["bboxes"][0] * down  # input plane
            scores = decoded["scores"][0]
            # person filter (labels == 1 after +1, transcenter.py:168-172)
            keep = decoded["clses"][0] == 0
            scores = jnp.where(keep & (scores >= self.out_thresh), scores,
                               -jnp.inf)
            if self.config.clip:  # mot20 (transcenter.py:173-176)
                boxes = jnp.stack(
                    [
                        jnp.clip(boxes[:, 0], 0, tw - 1),
                        jnp.clip(boxes[:, 1], 0, th - 1),
                        jnp.clip(boxes[:, 2], 0, tw - 1),
                        jnp.clip(boxes[:, 3], 0, th - 1),
                    ],
                    axis=1,
                )
            # the reference pipes this through the YOLOX postprocess NMS
            # (mot_evaluator.py:160); same here, on device
            idx, valid = nms_op(boxes, scores, self.nms_thresh,
                                self.config.K)
            safe = jnp.clip(idx, 0, boxes.shape[0] - 1)
            return boxes[safe], scores[safe], valid

        return prep, step, r

    def detect(
        self, frame_bgr: np.ndarray, current_pos: Optional[np.ndarray] = None
    ) -> DetectorOutput:
        """One frame; ``current_pos`` = tracker boxes (tlbr, detector coords)
        from ``get_detector_positions`` — the stateful feedback loop
        (mot_evaluator.py:158)."""
        import jax.numpy as jnp

        from busca_tpu.models.transcenter import render_prior_heatmap

        key = (int(frame_bgr.shape[0]), int(frame_bgr.shape[1]))
        if key not in self._steps:
            self._steps[key] = self._make_step(key)
        prep, step, r = self._steps[key]
        th, tw = self.test_size
        down = self.config.down_ratio

        # pre_cts: box centers clamped to the input plane, then /down_ratio
        # (transcenter.py:104-127 with trans=[1, 0, 0] — coords already in
        # the detector plane)
        pre_cts = None
        if current_pos is not None and len(current_pos):
            cts = (current_pos[:, :2] + current_pos[:, 2:4]) / 2.0
            cts[:, 0] = np.clip(cts[:, 0], 0, tw - 1)
            cts[:, 1] = np.clip(cts[:, 1], 0, th - 1)
            pre_cts = cts / down
        pre_hm = render_prior_heatmap(pre_cts, (th // down, tw // down))

        canvas = prep(jnp.asarray(frame_bgr))
        if self._pre_canvas is None:
            # first frame: pre_sample = sample (transcenter.py:95-97)
            self._pre_canvas = canvas
        boxes, scores, valid = step(
            self.variables, canvas, self._pre_canvas, jnp.asarray(pre_hm)
        )
        self._pre_canvas = canvas

        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid) & np.isfinite(scores)
        return DetectorOutput(
            boxes_tlbr=boxes[valid].astype(np.float64),
            scores=scores[valid].astype(np.float64),
            image=np.asarray(canvas),
            scale=r,
        )


# CenterNet/CenterTrack input statistics, applied in BGR channel order like
# the published code (no channel flip after cv2.imread).
CENTERNET_MEAN_BGR = (0.408, 0.447, 0.470)
CENTERNET_STD_BGR = (0.289, 0.274, 0.278)


def gaussian_radius(det_size: Tuple[float, float], min_overlap: float = 0.7):
    """CenterNet's peak radius from box size (the published three-case
    formula used when rendering heatmaps/prior heatmaps)."""
    h, w = det_size
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - np.sqrt(max(b1**2 - 4 * a1 * c1, 0))) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - np.sqrt(max(b2**2 - 4 * a2 * c2, 0))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(max(b3**2 - 4 * a3 * c3, 0))) / 2
    return max(0, min(r1, r2, r3))


class CenterTrackDetector:
    """Stateful CenterTrack detector for the per-frame loop.

    Mirrors adapters/CenterTrack/src/lib/detector.py:90-190: keeps the
    previous frame (``pre_images``), renders the prior heatmap from the
    tracker's current tracks at *input* resolution (``_get_additional_inputs``
    with ``pre_hm: true``), per-video ``reset()``, and returns CenterTrack's
    dict detections for the ByteTrack-based shim
    (utils/tracker.py:40-74 / trackers/centertrack.py).
    """

    def __init__(
        self,
        config=None,
        variables=None,
        test_size: Tuple[int, int] = (544, 960),
        out_thresh: float = 0.1,
    ):
        from busca_tpu.models.centertrack import (
            CenterTrackConfig,
            CenterTrackNet,
        )

        self.config = config or CenterTrackConfig()
        self.model = CenterTrackNet(self.config)
        self.test_size = tuple(test_size)
        self.out_thresh = float(out_thresh)
        if variables is None:
            import jax
            import jax.numpy as jnp

            th, tw = self.test_size
            z = jnp.zeros((1, th, tw, 3), jnp.float32)
            hm = jnp.zeros((1, th, tw, 1), jnp.float32)
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), z, z, hm
            )
        self.variables = variables
        self._steps = {}
        self.reset()

    def reset(self):
        """Per-video reset (detector.py:90-104 'Initialize tracking!')."""
        self._pre_canvas = None

    def state_dict(self) -> dict:
        """Cross-frame state (the previous frame's canvas — the reference's
        ``pre_images``, detector.py:100-104) as plain numpy, for
        serve/snapshot's bit-equal stream resume."""
        pre = self._pre_canvas
        return {"pre_canvas": None if pre is None else np.asarray(pre)}

    def load_state_dict(self, state: dict):
        import jax.numpy as jnp

        pre = state.get("pre_canvas")
        self._pre_canvas = None if pre is None else jnp.asarray(pre)

    # ------------------------------------------------------------ internals --
    def _make_step(self, frame_hw: Tuple[int, int]):
        import jax
        import jax.numpy as jnp

        from busca_tpu.models.transcenter import generic_decode
        from busca_tpu.ops.crop import crop_resize_normalize

        fh, fw = frame_hw
        th, tw = self.test_size
        r = min(th / fh, tw / fw)
        rh, rw = int(fh * r), int(fw * r)
        mean = jnp.asarray(CENTERNET_MEAN_BGR, jnp.float32)
        std = jnp.asarray(CENTERNET_STD_BGR, jnp.float32)

        @jax.jit
        def prep(frame_bgr_u8):
            box = jnp.asarray([[0.0, 0.0, float(fw), float(fh)]])
            resized = crop_resize_normalize(
                frame_bgr_u8, box, out_hw=(rh, rw), normalize=False,
                bgr_input=True, rgb_output=False, quantize_uint8=True,
            )[0]
            canvas = jnp.zeros((th, tw, 3), jnp.float32)
            canvas = canvas.at[:rh, :rw].set(resized)
            return jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8)

        @jax.jit
        def step(variables, canvas_u8, pre_canvas_u8, pre_hm):
            def norm(c):
                return (c.astype(jnp.float32) / 255.0 - mean) / std  # BGR

            out = self.model.apply(
                variables, norm(canvas_u8)[None], norm(pre_canvas_u8)[None],
                pre_hm[None],
            )
            out = dict(out)
            out["hm"] = jnp.clip(jax.nn.sigmoid(out["hm"]), 1e-4, 1 - 1e-4)
            decoded = generic_decode(out, k=self.config.K)
            down = self.config.down_ratio
            return (
                decoded["bboxes"][0] * down,
                decoded["scores"][0],
                decoded["clses"][0],
                decoded["tracking"][0] * down,
            )

        return prep, step, r

    def _render_pre_hm(self, tracks, r: float) -> np.ndarray:
        """Prior heatmap at input resolution from tracker dicts
        (detector.py:109-110 _get_additional_inputs): one CenterNet-radius
        Gaussian per active track."""
        th, tw = self.test_size
        out = np.zeros((th, tw, 1), np.float32)
        for t in tracks or []:
            x1, y1, x2, y2 = np.asarray(t["bbox"], np.float64) * r
            w, h = x2 - x1, y2 - y1
            if w <= 0 or h <= 0:
                continue
            radius = max(int(gaussian_radius((np.ceil(h), np.ceil(w)))), 0)
            sigma = max((2 * radius + 1) / 6.0, 0.5)
            cx = np.clip((x1 + x2) / 2.0, 0, tw - 1)
            cy = np.clip((y1 + y2) / 2.0, 0, th - 1)
            y0, y1_ = int(max(cy - 2 * radius, 0)), int(
                min(cy + 2 * radius + 1, th)
            )
            x0, x1_ = int(max(cx - 2 * radius, 0)), int(
                min(cx + 2 * radius + 1, tw)
            )
            if y0 >= y1_ or x0 >= x1_:
                continue
            ys, xs = np.mgrid[y0:y1_, x0:x1_]
            g = np.exp(
                -((xs - cx) ** 2 + (ys - cy) ** 2) / (2.0 * sigma**2)
            ).astype(np.float32)
            out[y0:y1_, x0:x1_, 0] = np.maximum(out[y0:y1_, x0:x1_, 0], g)
        return out

    # ----------------------------------------------------------------- api --
    def detect(self, frame_bgr: np.ndarray, tracks=None):
        """One frame -> CenterTrack dict detections (original coordinates).

        ``tracks``: the adapter's current dict tracks (``adapter.tracks``),
        used for the prior heatmap.  Returns (results, det_image, scale).
        """
        import jax.numpy as jnp

        key = (int(frame_bgr.shape[0]), int(frame_bgr.shape[1]))
        if key not in self._steps:
            self._steps[key] = self._make_step(key)
        prep, step, r = self._steps[key]

        canvas = prep(jnp.asarray(frame_bgr))
        if self._pre_canvas is None:
            self._pre_canvas = canvas
        pre_hm = self._render_pre_hm(tracks, r)
        boxes, scores, clses, tracking = step(
            self.variables, canvas, self._pre_canvas, jnp.asarray(pre_hm)
        )
        self._pre_canvas = canvas

        boxes = np.asarray(boxes) / r  # back to original coordinates
        scores = np.asarray(scores)
        clses = np.asarray(clses)
        tracking = np.asarray(tracking) / r
        results = []
        for b, s, c, tr in zip(boxes, scores, clses, tracking):
            if s < self.out_thresh:
                continue
            results.append(
                {
                    "bbox": b.astype(np.float64),
                    "score": float(s),
                    "class": int(c) + 1,
                    "tracking": tr.astype(np.float64),
                    "ct": [(b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0],
                }
            )
        return results, np.asarray(canvas), r


def build_transcenter_detector(dataset="mot17", ckpt=None,
                               test_size=(640, 1088), out_thresh=0.1,
                               nms_thresh=0.7) -> "TransCenterDetector":
    """Shared TransCenter detector construction for the eval and serve CLIs.

    ``ckpt``: busca_tpu-trained ``.npz`` weights only — upstream ``.pth``
    cannot be converted (the reference's TransCenter submodule is empty;
    PARITY.md).  Raises ``ValueError`` on a non-npz path.
    """
    from busca_tpu.models.transcenter import TransCenterConfig

    variables = None
    if ckpt:
        if not ckpt.endswith(".npz"):
            raise ValueError(
                "transcenter takes busca_tpu-trained .npz weights; "
                "upstream .pth cannot be converted (the reference's "
                "TransCenter submodule is empty — see PARITY.md)")
        from busca_tpu.models.checkpoint import load_params_npz

        variables = load_params_npz(ckpt)
    return TransCenterDetector(
        TransCenterConfig.for_dataset(dataset), variables=variables,
        test_size=test_size, out_thresh=out_thresh, nms_thresh=nms_thresh,
    )


def build_centertrack_detector(arch="dla34", sampling="deformable",
                               ckpt=None, test_size=(544, 960),
                               out_thresh=0.1) -> "CenterTrackDetector":
    """Shared CenterTrack detector construction for the eval and serve CLIs.

    ``ckpt``: busca_tpu ``.npz`` weights (either sampling mode), or a
    published DLA-34 ``.pth`` converted on the fly
    (models/convert.convert_centertrack_state_dict) — the latter requires
    the exact ``deformable`` sampling (free-form DCN offsets).
    Raises ``ValueError`` on invalid combinations (CLIs map it to
    ``parser.error``).
    """
    from busca_tpu.models.centertrack import CenterTrackConfig

    variables = None
    if ckpt:
        if ckpt.endswith(".npz"):
            from busca_tpu.models.checkpoint import load_params_npz

            variables = load_params_npz(ckpt)
        else:
            if sampling == "local":
                raise ValueError(
                    "converted CenterTrack .pth checkpoints carry "
                    "free-form DCN offsets; use sampling 'deformable' "
                    "(exact) or 'windowed' (gather-free, exact within "
                    "the +-dcn_window clamp)")
            from busca_tpu.models.convert import (
                convert_centertrack_state_dict,
                load_torch_checkpoint,
            )

            variables = convert_centertrack_state_dict(
                load_torch_checkpoint(ckpt))
    if arch == "tiny":
        cfg = CenterTrackConfig.tiny(sampling=sampling)
    elif arch == "mobilenet":
        cfg = CenterTrackConfig(backbone="mobilenet", sampling=sampling)
    else:
        cfg = CenterTrackConfig(sampling=sampling)
    return CenterTrackDetector(cfg, variables=variables,
                               test_size=test_size, out_thresh=out_thresh)


class CenterTrackRunnerDetector:
    """:class:`DetectorOutput`-protocol view of the dict-IO CenterTrack
    detector for the serving loop: the tracker's current dict tracks
    (``CenterTrackShim.get_detector_positions``) render the prior heatmap,
    and dict detections flatten to arrays — lossless for the adapter,
    which consumes only bbox/score/class (the reference shim,
    utils/tracker.py:40-74, drops the rest the same way)."""

    uses_feedback = True

    def __init__(self, det: "CenterTrackDetector"):
        self.det = det

    def reset(self):
        self.det.reset()

    def state_dict(self) -> dict:
        return self.det.state_dict()

    def load_state_dict(self, state: dict):
        self.det.load_state_dict(state)

    def detect(self, frame_bgr: np.ndarray,
               current_pos=None) -> DetectorOutput:
        from busca_tpu.trackers.centertrack import dicts_to_arrays

        results, det_image, r = self.det.detect(
            frame_bgr, tracks=current_pos or [])
        boxes, scores = dicts_to_arrays(results)
        # dict bboxes are original coords; the protocol carries detector
        # coords (the caller divides by scale)
        return DetectorOutput(boxes_tlbr=boxes * r, scores=scores,
                              image=det_image, scale=r)


def track_frames_centertrack(
    detector: CenterTrackDetector, adapter, frames, name: str = "seq",
    viz_dir: Optional[str] = None,
):
    """CenterTrack's per-frame loop: detector dicts -> adapter.step with the
    raw frame for BUSCA crops (detector.py:143-156), prior heatmap from the
    adapter's current tracks."""
    import time

    from busca_tpu.eval.runner import SequenceResult

    results = []
    t0 = time.perf_counter()
    for idx, frame in enumerate(frames):
        dets, det_image, r = detector.detect(frame, tracks=adapter.tracks)
        online = adapter.step(dets, det_image, scale=r)
        tlwhs, ids, confs = [], [], []
        for d in online:
            b = d["bbox"]
            tlwhs.append(np.array([b[0], b[1], b[2] - b[0], b[3] - b[1]]))
            ids.append(d["tracking_id"])
            confs.append(d["score"])
        results.append((idx + 1, tlwhs, ids, confs))
        if viz_dir is not None:
            from busca_tpu.eval.runner import write_viz_frame

            write_viz_frame(viz_dir, idx + 1, frame, tlwhs, ids)
    dt = time.perf_counter() - t0
    return SequenceResult(name, len(results), results, dt)


def track_sequences_lockstep(
    detector: YoloxDetector,
    trackers,
    frame_iters,
    names=None,
    min_box_area: float = 100.0,
    vertical_thresh: Optional[float] = 1.6,
):
    """Track B sequences in lockstep, batching the detector across them.

    Online tracking is causally batch-1 per sequence, but *across* sequences
    the detector batches freely — the TPU-native throughput mode for offline
    evaluation (one frame from each sequence per device call; SURVEY §2.5:
    "shard sequences across hosts/chips and batch across tracks within a
    chip").  Sequences may have different lengths; finished sequences are
    padded with their last frame and their outputs discarded.  All sequences
    must share one resolution (MOT17 sequences per-resolution group).

    Returns one :class:`~busca_tpu.eval.runner.SequenceResult` per sequence.
    """
    import time

    from busca_tpu.eval.runner import SequenceResult, filter_output_tracks
    from busca_tpu.trackers.base import service_deferred_updates

    iters = [iter(f) for f in frame_iters]
    b = len(iters)
    names = names or [f"seq{i}" for i in range(b)]
    current = [next(it, None) for it in iters]
    if any(f is None for f in current):
        raise ValueError("every sequence needs at least one frame")
    active = [True] * b
    results = [[] for _ in range(b)]
    frame_ids = [0] * b
    # pipelined double-buffer (SURVEY §7.3.4): the batch for lockstep frame
    # t+1 is dispatched before frame t's results are fetched, overlapping all
    # host-side tracker bookkeeping with device compute
    dispatch = getattr(detector, "detect_batch_async", None)
    if dispatch is None:
        dispatch = lambda f: ("sync", detector.detect_batch(f))  # noqa: E731
        wait = lambda h: h[1]  # noqa: E731
    else:
        wait = detector.wait_batch
    t0 = time.perf_counter()
    inflight = (dispatch(np.stack(current)), list(active))
    while inflight is not None:
        handle, active = inflight
        # advance iterators and enqueue the next batch BEFORE blocking on
        # this one; finished sequences keep feeding their last frame so the
        # batch shape stays static (their outputs are skipped below)
        nxt_active = list(active)
        for i in range(b):
            if not nxt_active[i]:
                continue
            nf = next(iters[i], None)
            if nf is None:
                nxt_active[i] = False
            else:
                current[i] = nf
        if any(nxt_active):
            inflight = (dispatch(np.stack(current)), nxt_active)
        else:
            inflight = None
        dets = wait(handle)
        # phase 0: kick off every CMC-enabled sequence's ECC alignment on
        # the shared thread pool — the ~148 ms/pair cv2 solves (MOT17
        # configs) run concurrently with each other and with the already-
        # dispatched next device batch, instead of serially inside each
        # tracker's update (the reference's schedule, byte_tracker.py:377)
        for i in range(b):
            trk = trackers[i]
            if active[i] and hasattr(trk, "cmc_prefetch"):
                # the tracker submits with its OWN recipe/frame pair and
                # stores the warp hint; no-op when the update won't align
                trk.cmc_prefetch(dets[i].image)
        # phase 1: run every tracker's update up to its (optional) BUSCA
        # third round; collect the suspended requests
        onlines = [None] * b
        pending = []  # (i, generator, ThirdRoundRequest)
        for i in range(b):
            if not active[i]:
                continue
            d = dets[i]
            frame_ids[i] += 1
            args = (d.boxes_tlbr / d.scale, d.scores, d.scale, d.image)
            if hasattr(trackers[i], "update_deferred"):
                gen = trackers[i].update_deferred(*args)
                try:
                    req = next(gen)
                    pending.append((i, gen, req))
                except StopIteration as e:
                    onlines[i] = e.value
            else:
                onlines[i] = trackers[i].update(*args)
        # phase 2: ONE batched association serves every sequence's third
        # round (engine.associate_many, per-request BN groups keep each
        # sequence's numerics identical to a standalone call)
        if pending:
            for i, out in service_deferred_updates(pending).items():
                onlines[i] = out
        for i in range(b):
            if not active[i]:
                continue
            tlwhs, ids, confs = filter_output_tracks(
                onlines[i], min_box_area, vertical_thresh
            )
            results[i].append((frame_ids[i], tlwhs, ids, confs))
    dt = time.perf_counter() - t0
    # sequences ran concurrently: stamp each with its proportional share of
    # the wall time, so res.fps reports the combined lockstep pipeline rate
    # (total frames / wall) instead of understating per-sequence speed by B
    total = max(sum(len(r) for r in results), 1)
    return [
        SequenceResult(names[i], len(results[i]), results[i],
                       dt * len(results[i]) / total)
        for i in range(b)
    ]


def init_variables(config, test_size=(800, 1440)):
    """Random-weight variables (shape-correct) for tests/integration runs."""
    import jax
    import jax.numpy as jnp

    from busca_tpu.models.yolox import YOLOX

    model = YOLOX(config)
    th, tw = test_size
    return jax.jit(functools.partial(model.init, decode=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, th, tw, 3), jnp.float32)
    )


def track_frames_with_detector(
    detector: YoloxDetector,
    tracker,
    frames,
    name: str = "seq",
    min_box_area: float = 100.0,
    vertical_thresh: Optional[float] = 1.6,
    viz_dir: Optional[str] = None,
    det_log: Optional[list] = None,
):
    """Drive detector + tracker over raw frames (the reference's canonical
    eval loop, mot_evaluator.py:131-235).

    ``det_log``, when given, collects ``(frame_id, boxes_tlbr_orig, scores)``
    per frame — the raw detector output in original coordinates, feeding the
    COCO detection-AP table (mot_evaluator.py:659-711).

    The tracker gets detections mapped back to original coordinates plus the
    detector-resolution image for BUSCA crops — exactly the reference's
    ``bboxes /= scale`` + crops-at-``bboxes*scale``-from-``vot_img`` scheme
    (byte_tracker.py:240-287).

    Detectors with ``uses_feedback`` (TransCenter) get the tracker's current
    positions each frame — the stateful detector<->tracker loop
    (TransCenter mot_evaluator.py:158).
    """
    import time

    from busca_tpu.eval.runner import (
        SequenceResult,
        filter_output_tracks,
        write_viz_frame,
    )

    feedback = getattr(detector, "uses_feedback", False) and hasattr(
        tracker, "get_detector_positions"
    )
    can_prefetch = hasattr(detector, "put_frame")
    # Software pipelining (SURVEY §7.3.4): dispatch the device step for frame
    # t+1 BEFORE fetching frame t, so host tracker bookkeeping for t runs
    # while the device computes t+1 — steady-state frame period becomes
    # max(device, host) instead of device + host.  Feedback detectors
    # (TransCenter) cannot pipeline: their t+1 input depends on the tracker
    # state after update(t).
    can_pipeline = hasattr(detector, "detect_async") and not feedback
    results = []
    det_s = trk_s = 0.0
    t0 = time.perf_counter()
    it = iter(frames)
    pending = next(it, None)
    if pending is not None and can_prefetch:
        pending = detector.put_frame(pending)
    if pending is not None and can_pipeline:
        pending = detector.detect_async(pending)
    idx = -1
    while pending is not None:
        idx += 1
        frame = pending
        # prefetch the next frame's upload behind this frame's compute
        pending = next(it, None)
        if pending is not None and can_prefetch:
            pending = detector.put_frame(pending)
        if pending is not None and can_pipeline:
            # enqueue t+1 on the device before we block on t's results
            pending = detector.detect_async(pending)
        t_det = time.perf_counter()
        if can_pipeline:
            det = detector.wait(frame)
        elif feedback:
            det = detector.detect(
                frame, current_pos=tracker.get_detector_positions()
            )
        else:
            det = detector.detect(frame)
        t_trk = time.perf_counter()
        det_s += t_trk - t_det
        if det_log is not None:
            det_log.append((
                idx + 1,
                np.asarray(det.boxes_tlbr / det.scale),
                np.asarray(det.scores),
            ))
        online = tracker.update(
            det.boxes_tlbr / det.scale, det.scores, det.scale, det.image
        )
        trk_s += time.perf_counter() - t_trk
        tlwhs, ids, confs = filter_output_tracks(
            online, min_box_area, vertical_thresh
        )
        results.append((idx + 1, tlwhs, ids, confs))
        if viz_dir is not None:
            # the detector-resolution canvas is the frame we still have;
            # tlwh are original coords -> scale up
            write_viz_frame(viz_dir, idx + 1, np.asarray(det.image),
                            tlwhs, ids, scale=det.scale)
    dt = time.perf_counter() - t0
    return SequenceResult(
        name, len(results), results, dt,
        stage_times={"detector_s": det_s, "tracker_s": trk_s},
    )
