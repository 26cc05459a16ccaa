"""Ahead-of-time export of compiled steps to serialized StableHLO artifacts.

The reference ships an optional TensorRT deployment path: the YOLOX detector
is converted once with torch2trt and the resulting engine file is loaded at
eval time (`adapters/ByteTrack/tools/track.py:83,215-224`, `Dockerfile:88-95`).
The TPU-native equivalent is `jax.export`: the already-jitted hot callables
(detector step, association scorer) are lowered ONCE to StableHLO — optionally
with the weights baked in as constants, making the artifact self-contained
like a TRT engine — serialized, and written to disk next to a JSON manifest.

A serving process then `load_artifact()`s the directory and calls the step
without any model-building Python on the critical path: no Flax module
construction, no config parsing, no weight conversion — and the artifact pins
the exact traced computation (StableHLO is versioned and stable across JAX
releases).  Because `jax.export` supports cross-platform lowering, artifacts
for TPU can be produced on a CPU-only build host (``platforms=("tpu",)``).

Layout of an artifact directory::

    <dir>/fn.stablehlo   serialized jax.export.Exported bytes
    <dir>/manifest.json  {"kind", "arg_specs", "platforms", ...}

Batch-step families (export_detector_batch_steps) write one
``fn_b{N}.stablehlo`` per batch bucket instead, under the same manifest.

Numerical contract: with weights passed as call-time arguments the
deserialized function is bit-identical to the live jitted call (same trace);
with ``bake_weights`` the weights become StableHLO constants, which lets XLA
fold/fuse in a different order — reassociation-level noise (~1e-7) only.
Both asserted by tests/test_export.py.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FN_FILE = "fn.stablehlo"
_MANIFEST_FILE = "manifest.json"


def _spec(x) -> dict:
    # x is a concrete array or a jax.ShapeDtypeStruct — both carry
    # shape/dtype without materialization
    dtype = getattr(x, "dtype", None) or jnp.asarray(x).dtype
    return {"shape": list(np.shape(x)), "dtype": str(dtype)}


def _write(out_dir: str, exported, manifest: dict) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    data = exported.serialize()
    with open(os.path.join(out_dir, _FN_FILE), "wb") as f:
        f.write(data)
    manifest = dict(
        manifest,
        jax_version=jax.__version__,
        size_bytes=len(data),
        platforms=list(exported.platforms),
    )
    with open(os.path.join(out_dir, _MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def export_jitted(
    fn,
    example_args: Sequence,
    out_dir: str,
    *,
    platforms: Optional[Sequence[str]] = None,
    manifest: Optional[dict] = None,
    **static_kwargs,
) -> dict:
    """Export an already-jitted callable at the example args' shapes.

    ``fn`` must be a ``jax.jit`` result; ``example_args`` may be concrete
    arrays or ``jax.ShapeDtypeStruct``s.  ``static_kwargs`` are baked into
    the trace (they must be the jit's static argnames).  Returns the written
    manifest.
    """
    from jax import export as jexport

    exported = jexport.export(fn, platforms=platforms)(
        *example_args, **static_kwargs
    )
    m = dict(manifest or {})
    m.setdefault("kind", "jitted")
    m["arg_specs"] = [jax.tree.map(_spec, a) for a in example_args]
    m["static_kwargs"] = {k: repr(v) for k, v in static_kwargs.items()}
    return _write(out_dir, exported, m)


class ExportedArtifact:
    """A deserialized artifact: ``call(*args)`` runs the compiled step."""

    def __init__(self, exported, manifest: dict):
        self._exported = exported
        self.manifest = manifest

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self._exported.platforms)

    def call(self, *args):
        return self._exported.call(*args)

    __call__ = call


def load_artifact(out_dir: str) -> ExportedArtifact:
    """Load an artifact directory written by any of the export functions."""
    from jax import export as jexport

    with open(os.path.join(out_dir, _FN_FILE), "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    with open(os.path.join(out_dir, _MANIFEST_FILE)) as f:
        manifest = json.load(f)
    return ExportedArtifact(exported, manifest)


# ---------------------------------------------------------------- detector --
def export_detector_step(
    detector,
    frame_hw: Tuple[int, int],
    out_dir: str,
    *,
    platforms: Optional[Sequence[str]] = None,
    bake_weights: bool = True,
) -> dict:
    """Export a :class:`~busca_tpu.eval.detector.YoloxDetector` frame step.

    The exported function maps a ``[fh, fw, 3]`` uint8 BGR frame to the
    ``(out, valid, det_image_u8)`` triple of the live step (same trace the
    tracking loop runs; tools/track.py:215-224 is the torch2trt analogue).
    With ``bake_weights`` (default) the variables are serialized into the
    artifact as constants — self-contained like a TRT engine file; otherwise
    the artifact takes ``(variables, frame)`` and weights are supplied at
    call time.
    """
    key = (int(frame_hw[0]), int(frame_hw[1]))
    if key not in detector._steps:
        detector._steps[key] = detector._make_step(key)
    step, r = detector._steps[key]
    frame_spec = jax.ShapeDtypeStruct((key[0], key[1], 3), jnp.uint8)
    manifest = {
        "kind": "yolox_detector_step",
        "frame_hw": list(key),
        "test_size": list(detector.test_size),
        "scale": r,
        "conf_thresh": detector.conf_thresh,
        "nms_thresh": detector.nms_thresh,
        "max_outputs": detector.max_outputs,
        "bake_weights": bool(bake_weights),
    }
    if bake_weights:
        variables = detector.variables

        baked = jax.jit(lambda frame: step(variables, frame))
        return export_jitted(
            baked, [frame_spec], out_dir,
            platforms=platforms, manifest=manifest,
        )
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        detector.variables,
    )
    return export_jitted(
        step, [var_spec, frame_spec], out_dir,
        platforms=platforms, manifest=manifest,
    )


def export_detector_batch_steps(
    detector,
    frame_hw: Tuple[int, int],
    batches: Sequence[int],
    out_dir: str,
    *,
    platforms: Optional[Sequence[str]] = None,
    bake_weights: bool = True,
) -> dict:
    """Export the detector's lockstep batch step at several batch sizes.

    One serialized function per bucket (``fn_b{N}.stablehlo``), one shared
    manifest — the artifact family a lockstep server needs: it pads each
    tick to the nearest bucket and calls that step (serve/lockstep.py pads
    to powers of two, so ``batches=(1, 2, 4, 8)`` covers up to 8 streams).
    Weights are baked once per step (self-contained, TRT-engine style)
    unless ``bake_weights=False``.
    """
    from jax import export as jexport

    key = (int(frame_hw[0]), int(frame_hw[1]))
    os.makedirs(out_dir, exist_ok=True)
    sizes = {}
    r = None
    for b in sorted(set(int(b) for b in batches)):
        skey = ("batch", key[0], key[1], b)
        if skey not in detector._steps:
            detector._steps[skey] = detector._make_batch_step(key)
        step, r = detector._steps[skey]
        frames_spec = jax.ShapeDtypeStruct((b, key[0], key[1], 3), jnp.uint8)
        if bake_weights:
            variables = detector.variables
            fn = jax.jit(lambda frames, _s=step: _s(variables, frames))
            exported = jexport.export(fn, platforms=platforms)(frames_spec)
        else:
            var_spec = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.asarray(x).dtype
                ),
                detector.variables,
            )
            exported = jexport.export(step, platforms=platforms)(
                var_spec, frames_spec
            )
        data = exported.serialize()
        with open(os.path.join(out_dir, f"fn_b{b}.stablehlo"), "wb") as f:
            f.write(data)
        sizes[str(b)] = len(data)
    manifest = {
        "kind": "yolox_detector_batch_steps",
        "frame_hw": list(key),
        "test_size": list(detector.test_size),
        "scale": r,
        "conf_thresh": detector.conf_thresh,
        "nms_thresh": detector.nms_thresh,
        "max_outputs": detector.max_outputs,
        "bake_weights": bool(bake_weights),
        "batches": sorted(int(b) for b in sizes),
        "size_bytes": sizes,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_batch_artifacts(out_dir: str):
    """Load a batch-steps artifact directory -> (manifest, {batch: Exported})."""
    from jax import export as jexport

    with open(os.path.join(out_dir, _MANIFEST_FILE)) as f:
        manifest = json.load(f)
    if manifest.get("kind") != "yolox_detector_batch_steps":
        raise ValueError(
            f"not a batch-steps artifact: kind={manifest.get('kind')!r}"
        )
    steps = {}
    for b in manifest["batches"]:
        with open(os.path.join(out_dir, f"fn_b{b}.stablehlo"), "rb") as f:
            steps[int(b)] = jexport.deserialize(bytearray(f.read()))
    return manifest, steps


# --------------------------------------------------------------- associate --
def export_associate_scorer(
    engine,
    bucket: int,
    u_pad: int,
    out_dir: str,
    *,
    platforms: Optional[Sequence[str]] = None,
    bake_weights: bool = True,
    normalize_ims: bool = True,
) -> dict:
    """Export the engine's dedup scorer at one (bucket, u_pad) shape.

    Exports the jitted ``_score_unique`` dispatch (`assoc/engine.py`; the
    reference's hot loop is busca/network.py:176-244): memory crops
    ``[B, L, H, W, 3]`` uint8 + ``[u_pad]`` unique candidate crops with
    occurrence weights and a ``[B, C]`` gather map → ``[B, num_choices]``
    probabilities.  NOTE: this is the pixel-shipping single-request variant
    — a standalone scoring artifact for external/embedded consumers.  The
    in-repo servers build the LIVE engine, whose production dispatches are
    the grouped/banked variants (``_score_unique_grouped[_banked]``) with
    state (the crop bank) that cannot live in an AOT artifact; their
    recompile cost is covered by the persistent compilation cache instead
    (utils/cache.py).
    """
    h, w = engine.crop_hw
    b, l, c = int(bucket), engine.seq_len, engine.num_candidates
    u8 = jnp.uint8
    f32 = jnp.float32
    args = [
        jax.ShapeDtypeStruct((b, l, h, w, 3), u8),   # mem_crops
        jax.ShapeDtypeStruct((u_pad, h, w, 3), u8),  # uniq_can_crops
        jax.ShapeDtypeStruct((u_pad,), f32),         # can_weights
        jax.ShapeDtypeStruct((b, c), jnp.int32),     # can_gather
        jax.ShapeDtypeStruct((b, l, 4), f32),        # mem_boxes
        jax.ShapeDtypeStruct((b, c, 4), f32),        # can_boxes
        jax.ShapeDtypeStruct((b,), f32),             # mask
    ]
    manifest = {
        "kind": "associate_score_unique",
        "bucket": b,
        "u_pad": int(u_pad),
        "seq_len": l,
        "num_candidates": c,
        "crop_hw": [h, w],
        "normalize_ims": bool(normalize_ims),
        "bake_weights": bool(bake_weights),
    }
    if bake_weights:
        variables = engine.variables
        score = engine._score_unique

        baked = jax.jit(
            lambda *a: score(variables, *a, normalize_ims=normalize_ims)
        )
        return export_jitted(
            baked, args, out_dir, platforms=platforms, manifest=manifest,
        )
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        engine.variables,
    )
    return export_jitted(
        engine._score_unique, [var_spec] + args, out_dir,
        platforms=platforms, manifest=manifest,
        normalize_ims=normalize_ims,
    )


# --------------------------------------------------------------------- CLI --
def main(argv: Optional[Sequence[str]] = None):
    """``python -m busca_tpu.serve.export`` — build detector artifacts.

    Mirrors the reference's one-time TRT conversion step
    (tools/track.py:215-224): convert once, load at serve time.
    """
    import argparse

    from busca_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--size", default="x", help="YOLOX size (tiny/s/m/l/x)")
    p.add_argument("--ckpt", default=None, help=".pth or .npz checkpoint")
    p.add_argument("--frame-hw", type=int, nargs=2, default=(1080, 1920))
    p.add_argument("--test-size", type=int, nargs=2, default=(800, 1440))
    p.add_argument(
        "--platforms", nargs="*", default=None,
        help="target platforms, e.g. 'tpu' (default: current backend)",
    )
    p.add_argument("--no-bake-weights", action="store_true")
    p.add_argument(
        "--batches", type=int, nargs="*", default=None,
        help="export a lockstep batch-step family at these batch sizes "
             "(e.g. --batches 1 2 4 8) instead of the single-frame step",
    )
    args = p.parse_args(argv)

    from busca_tpu.eval.detector import YoloxDetector

    det = YoloxDetector.build(
        size=args.size, ckpt_path=args.ckpt, test_size=tuple(args.test_size)
    )
    if args.batches:
        m = export_detector_batch_steps(
            det, tuple(args.frame_hw), args.batches, args.out,
            platforms=args.platforms, bake_weights=not args.no_bake_weights,
        )
    else:
        m = export_detector_step(
            det, tuple(args.frame_hw), args.out,
            platforms=args.platforms, bake_weights=not args.no_bake_weights,
        )
    print(json.dumps(m))


if __name__ == "__main__":
    main()
