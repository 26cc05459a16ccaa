"""Frame-loop detector backed by an exported AOT artifact.

The serving half of the TRT role: the reference converts the detector once
with torch2trt and the eval loop loads the engine file instead of building
the torch model (adapters/ByteTrack/tools/track.py:83,215-224).  Here the
eval loop (`--detector-artifact`) loads a `serve.export` directory and runs
the deserialized StableHLO step — no Flax module construction or weight
conversion at serve time.  Duck-type compatible with
:class:`busca_tpu.eval.detector.YoloxDetector` for the software-pipelined
frame loop (put_frame / detect_async / wait / detect).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ArtifactDetector:
    """Runs an exported ``yolox_detector_step`` artifact per frame.

    The artifact is compiled for ONE frame geometry (``manifest.frame_hw``);
    frames of any other size are a hard error — resize upstream or export a
    second artifact (the TRT engine file has the same contract).
    """

    def __init__(self, artifact_or_dir, variables: Optional[dict] = None):
        from busca_tpu.serve.export import ExportedArtifact, load_artifact

        art = (
            artifact_or_dir
            if isinstance(artifact_or_dir, ExportedArtifact)
            else load_artifact(str(artifact_or_dir))
        )
        m = art.manifest
        if m.get("kind") != "yolox_detector_step":
            raise ValueError(
                f"not a detector artifact: kind={m.get('kind')!r}"
            )
        if not m.get("bake_weights", True) and variables is None:
            raise ValueError(
                "artifact was exported without baked weights; pass the "
                "`variables` pytree"
            )
        self._art = art
        self._variables = variables
        self.frame_hw = tuple(m["frame_hw"])
        self.scale = float(m["scale"])
        self.test_size = tuple(m["test_size"])
        self.conf_thresh = float(m.get("conf_thresh", 0.0))

    # ------------------------------------------------------- frame-loop API --
    def put_frame(self, frame_bgr: np.ndarray):
        import jax

        return jax.device_put(np.ascontiguousarray(frame_bgr))

    def detect_async(self, frame_bgr):
        hw = (int(frame_bgr.shape[0]), int(frame_bgr.shape[1]))
        if hw != self.frame_hw:
            raise ValueError(
                f"artifact compiled for frame_hw={self.frame_hw}, got {hw}"
            )
        import jax.numpy as jnp

        frame = jnp.asarray(frame_bgr)
        if self._variables is None:
            out, valid, det_image = self._art.call(frame)
        else:
            out, valid, det_image = self._art.call(self._variables, frame)
        return out, valid, det_image, self.scale

    def wait(self, handle):
        from busca_tpu.eval.detector import rows_to_detector_output

        out, valid, det_image, r = handle
        return rows_to_detector_output(out, valid, det_image, r)

    def detect(self, frame_bgr):
        return self.wait(self.detect_async(frame_bgr))


class ArtifactBatchDetector:
    """Runs an exported ``yolox_detector_batch_steps`` artifact family.

    Provides the ``detect_batch`` API the lockstep paths need (the eval
    ``track_sequences_lockstep`` loop and serve/lockstep.py's scheduler):
    each call pads the batch with its last frame up to the nearest exported
    bucket and discards the pad lanes' outputs.  Batches beyond the largest
    exported bucket are a hard error — export a bigger family.
    """

    def __init__(self, artifact_dir: str, variables: Optional[dict] = None):
        from busca_tpu.serve.export import load_batch_artifacts

        manifest, steps = load_batch_artifacts(artifact_dir)
        if not manifest.get("bake_weights", True) and variables is None:
            raise ValueError(
                "artifact family was exported without baked weights; pass "
                "the `variables` pytree"
            )
        self.manifest = manifest
        self._steps = steps
        self._variables = variables
        self.frame_hw = tuple(manifest["frame_hw"])
        self.scale = float(manifest["scale"])
        self.test_size = tuple(manifest["test_size"])
        self.conf_thresh = float(manifest.get("conf_thresh", 0.0))
        self.batches = sorted(steps)

    def _bucket(self, n: int) -> int:
        for b in self.batches:
            if n <= b:
                return b
        raise ValueError(
            f"batch {n} exceeds the largest exported bucket "
            f"{self.batches[-1]} — re-export with a bigger family"
        )

    def detect_batch(self, frames_bgr) -> list:
        from busca_tpu.eval.detector import rows_to_detector_output

        frames = np.asarray(frames_bgr)
        n = frames.shape[0]
        hw = (int(frames.shape[1]), int(frames.shape[2]))
        if hw != self.frame_hw:
            raise ValueError(
                f"artifact compiled for frame_hw={self.frame_hw}, got {hw}"
            )
        bp = self._bucket(n)
        if bp > n:
            frames = np.concatenate([frames, frames[-1:].repeat(bp - n, 0)])
        import jax.numpy as jnp

        step = self._steps[bp]
        if self._variables is None:
            outs, valids, canvases = step.call(jnp.asarray(frames))
        else:
            outs, valids, canvases = step.call(
                self._variables, jnp.asarray(frames)
            )
        outs = np.asarray(outs)
        valids = np.asarray(valids)
        return [
            rows_to_detector_output(outs[i], valids[i], canvases[i],
                                    self.scale)
            for i in range(n)
        ]

    def detect(self, frame_bgr):
        return self.detect_batch(np.asarray(frame_bgr)[None])[0]
