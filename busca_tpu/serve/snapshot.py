"""Tracker-state snapshot / restore — elastic recovery for long streams.

The reference has no recovery story: tracker state lives and dies with the
process (SURVEY §5.3 — the only lifecycle primitive is the per-video reset,
mot_evaluator.py:166-173), so a serving crash loses every live track, its
Kalman posterior and its appearance memory.  busca_tpu keeps ALL tracking
state in host numpy/python objects by design (ARCHITECTURE.md host/device
choreography): the device holds stateless jitted programs plus speed-only
caches (crop bank, frozen-mode feature bank) whose contents never affect
results.  A snapshot is therefore a plain serialization of the tracker with
the device handles detached; restore re-attaches live handles and the
stream continues exactly where it left off (device caches rebuild cold —
crop mirrors lose their bank uids on unpickle and re-upload on first use,
a speed effect only, pinned by tests/test_bank.py's capacity invariance).

What is captured: the full wrapper chain (``FeatureShim`` →
``CenterTrackAdapter`` → tracker), every track store (tracked/lost/removed,
galleries, inactive dicts), per-track Kalman state, appearance memories
(crop mirrors as plain uint8), the CMC reference frame, per-tracker id
cursors, and the process-wide track-id counters (``Track._count`` etc.) so
restored and new ids never collide.

What is NOT captured (and why): the association engine / feature extractor
(device programs — re-attached on restore, from an explicit argument or a
``donor`` built by the same factory that built the original), one-shot ECC
warp-prefetch hints (recomputed next frame), and detector state — a
feedback detector's previous-frame priors re-prime from the restored
tracker's exported positions (TransCenter) or from a one-frame reset
transient (CenterTrack's ``pre_img``); the server calls ``detector.reset()``
on restore.

Snapshots must be taken between ``update()`` calls (the server does this
naturally: one frame = one request).  Restore uses a restricted unpickler
that only resolves ``busca_tpu.*`` / numpy / stdlib-container classes, so a
snapshot blob cannot smuggle arbitrary constructors; still treat blobs as
operator-trusted state, like any checkpoint.
"""

from __future__ import annotations

import io
import itertools
import pickle
from typing import Optional

FORMAT_VERSION = 1

# attributes that hold live device handles or one-shot callables — detached
# before pickling, re-attached (or recomputed) on restore
_DETACH_ATTRS = ("engine", "feature_extractor", "feat_fn", "_warp_hint")
# attributes through which one tracker object wraps another
# (FeatureShim.trk, CenterTrackAdapter.tracker)
_WRAPPER_ATTRS = ("tracker", "trk")


def _chain(tracker):
    """The wrapper chain outermost-first (cycle-safe)."""
    out, obj = [], tracker
    while obj is not None and not any(obj is o for o in out):
        out.append(obj)
        obj = next(
            (getattr(obj, a) for a in _WRAPPER_ATTRS
             if getattr(obj, a, None) is not None),
            None,
        )
    return out


def _peek_counter(cls) -> int:
    """Read an ``itertools.count`` class counter without consuming a value."""
    v = next(cls._count)
    cls._count = itertools.count(v)
    return v


def _advance_counter(cls, at_least: int):
    cur = _peek_counter(cls)
    if at_least > cur:
        cls._count = itertools.count(at_least)


def _counter_classes():
    from busca_tpu.trackers.base import Track
    from busca_tpu.trackers.motdt import MotdtTrack
    from busca_tpu.trackers.sort import SortTrack

    return {"base.Track": Track, "sort.SortTrack": SortTrack,
            "motdt.MotdtTrack": MotdtTrack}


def snapshot_bytes(tracker) -> bytes:
    """Serialize a tracker (or wrapper chain) to a snapshot blob.

    Call between ``update()`` calls only.  The live tracker is returned to
    its exact prior state (detached handles are re-attached) before this
    function returns.
    """
    chain = _chain(tracker)
    stash = []
    try:
        for obj in chain:
            for name in _DETACH_ATTRS:
                if name in getattr(obj, "__dict__", {}):
                    stash.append((obj, name, obj.__dict__[name]))
                    obj.__dict__[name] = None
        payload = {
            "version": FORMAT_VERSION,
            "counters": {k: _peek_counter(c)
                         for k, c in _counter_classes().items()},
            "tracker": tracker,
        }
        return pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    finally:
        for obj, name, val in stash:
            obj.__dict__[name] = val


_SAFE_MODULE_PREFIXES = ("busca_tpu.", "numpy.", "numpy")
_SAFE_MODULES = {"collections", "copyreg", "builtins"}
_SAFE_BUILTINS = {
    "set", "frozenset", "slice", "range", "bytearray", "complex", "object",
}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "builtins":
            if name in _SAFE_BUILTINS:
                return super().find_class(module, name)
            raise pickle.UnpicklingError(
                f"snapshot blob references forbidden builtins.{name}"
            )
        if (module in _SAFE_MODULES
                or module.startswith(_SAFE_MODULE_PREFIXES)):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"snapshot blob references forbidden {module}.{name}"
        )


def restore_bytes(blob: bytes, engine=None, feature_extractor=None,
                  donor=None):
    """Rebuild a tracker from a snapshot blob and re-attach live handles.

    Args:
      blob: bytes from :func:`snapshot_bytes`.
      engine: association engine to re-attach wherever the chain holds one
        (``ByteTracker.engine`` & co.).
      feature_extractor: ReID feature callable for ``GhostTracker
        .feature_extractor`` / ``FeatureShim.feat_fn``.
      donor: alternatively, a freshly-built tracker from the SAME factory
        that built the snapshotted one — its live handles are pulled from
        the matching positions of its wrapper chain (the server's restore
        path: the factory is the authoritative source of handles).

    Raises:
      ValueError: if the restored tracker expects a BUSCA engine
        (``use_busca=True``) and none was provided — a silent downgrade to
        base tracking would be a behavior change, so it fails loudly.
    """
    payload = _RestrictedUnpickler(io.BytesIO(blob)).load()
    if not isinstance(payload, dict) or "tracker" not in payload:
        raise ValueError("not a tracker snapshot blob")
    version = payload.get("version")
    if version != FORMAT_VERSION:
        raise ValueError(
            f"snapshot format {version!r} != supported {FORMAT_VERSION}"
        )
    tracker = payload["tracker"]
    chain = _chain(tracker)

    if donor is not None:
        donor_chain = _chain(donor)
        if [type(o).__name__ for o in donor_chain] != \
                [type(o).__name__ for o in chain]:
            raise ValueError(
                f"donor chain {[type(o).__name__ for o in donor_chain]} "
                f"does not match snapshot chain "
                f"{[type(o).__name__ for o in chain]}"
            )
        for obj, src in zip(chain, donor_chain):
            for name in ("engine", "feature_extractor", "feat_fn"):
                if name in getattr(obj, "__dict__", {}):
                    live = getattr(src, name, None)
                    if live is not None:
                        obj.__dict__[name] = live
    else:
        for obj in chain:
            d = getattr(obj, "__dict__", {})
            if engine is not None and "engine" in d:
                obj.__dict__["engine"] = engine
            if feature_extractor is not None:
                if "feature_extractor" in d:
                    obj.__dict__["feature_extractor"] = feature_extractor
                if "feat_fn" in d:
                    obj.__dict__["feat_fn"] = feature_extractor

    for obj in chain:
        if getattr(obj, "use_busca", False) and \
                getattr(obj, "engine", None) is None:
            raise ValueError(
                f"snapshot of {type(obj).__name__} was taken with BUSCA "
                f"attached (use_busca=True); pass engine=/donor= to "
                f"restore_bytes — restoring without one would silently "
                f"change tracking behavior"
            )

    # never regress the process-wide id counters: ids minted after restore
    # must not collide with ids carried by the restored tracks
    for key, cls in _counter_classes().items():
        saved = payload.get("counters", {}).get(key)
        if saved is not None:
            _advance_counter(cls, int(saved))
    return tracker


def save(tracker, path: str):
    with open(path, "wb") as f:
        f.write(snapshot_bytes(tracker))


def load(path: str, engine=None, feature_extractor=None, donor=None):
    with open(path, "rb") as f:
        return restore_bytes(f.read(), engine=engine,
                             feature_extractor=feature_extractor,
                             donor=donor)
