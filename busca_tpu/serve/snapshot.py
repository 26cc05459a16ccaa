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
cursors, the process-wide track-id counters (``Track._count`` etc.) so
restored and new ids never collide, and an optional ``meta`` dict the
caller round-trips (the server stores the stream position and the stateful
detector's previous-frame canvas there — TransCenter ``pre_sample`` /
CenterTrack ``pre_img`` analog, transcenter.py:89-92).

What is NOT captured (and why): the association engine / feature extractor
(device programs — re-attached on restore, from an explicit argument or a
``donor`` built by the same factory that built the original) and one-shot
ECC warp-prefetch hints (recomputed next frame).

Snapshots must be taken between ``update()`` calls (the server does this
naturally: one frame = one request).

Security model (two independent layers):

1. Restore uses a restricted unpickler with an **exact (module, name)
   allowlist** — only the concrete tracker / track / config classes plus
   numpy's array-reconstruction primitives resolve; any other global (any
   function, any other class, anything executable) is refused before
   construction.  A module-prefix allowlist is NOT enough: whole-namespace
   trust admits call gadgets (e.g. numpy's private test helpers, or any
   package function as an arbitrary-file-write primitive).
2. Optionally, blobs are **HMAC-SHA256 signed** (``key=`` on both sides,
   ``--snapshot-key-file`` on the server): with a key configured, restore
   refuses any blob whose tag does not verify, so a wire client cannot
   feed crafted pickles at all.  Without a key, layer 1 still confines the
   blob to known-state classes — but treat unsigned blobs as
   operator-trusted state, like any checkpoint.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import io
import pickle
import threading
from typing import Optional, Tuple

FORMAT_VERSION = 2
# version-1 blobs (r4: same counters-as-ints + tracker payload, no "meta"
# key) restore unchanged — meta just defaults to {}.  Class-level counters
# are not part of instance pickles, so the IdCounter migration does not
# affect blob compatibility.
_READABLE_VERSIONS = (1, 2)

# signed container layout: MAGIC + 32-byte HMAC-SHA256(key, payload) + payload
_SIGNED_MAGIC = b"BSNPSIG1"
_TAG_LEN = 32

# attributes that hold live device handles or one-shot callables — detached
# before pickling, re-attached (or recomputed) on restore
_DETACH_ATTRS = ("engine", "feature_extractor", "feat_fn", "_warp_hint")
# attributes through which one tracker object wraps another
# (FeatureShim.trk, CenterTrackAdapter.tracker)
_WRAPPER_ATTRS = ("tracker", "trk")

# guards the read-advance of the process-wide id counters against each other
# (the counters themselves are individually thread-safe IdCounters)
_COUNTER_LOCK = threading.Lock()


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


def _counter_classes():
    from busca_tpu.trackers.base import Track
    from busca_tpu.trackers.motdt import MotdtTrack
    from busca_tpu.trackers.sort import SortTrack

    return {"base.Track": Track, "sort.SortTrack": SortTrack,
            "motdt.MotdtTrack": MotdtTrack}


def sign_blob(payload: bytes, key: bytes) -> bytes:
    return (_SIGNED_MAGIC
            + _hmac.new(key, payload, hashlib.sha256).digest()
            + payload)


def verify_blob(blob: bytes, key: Optional[bytes]) -> bytes:
    """Strip/verify the signature envelope; returns the raw payload.

    With a key: the blob MUST be signed and the tag MUST verify.  Without
    one: a signed blob's payload is extracted unverified (the restricted
    unpickler is still in force) — configure the same key on both sides to
    get authenticity.
    """
    signed = blob.startswith(_SIGNED_MAGIC)
    if key is not None:
        if not signed:
            raise ValueError(
                "snapshot restore requires an HMAC-signed blob (a key is "
                "configured) but the blob is unsigned"
            )
        tag = blob[len(_SIGNED_MAGIC):len(_SIGNED_MAGIC) + _TAG_LEN]
        payload = blob[len(_SIGNED_MAGIC) + _TAG_LEN:]
        want = _hmac.new(key, payload, hashlib.sha256).digest()
        if not _hmac.compare_digest(tag, want):
            raise ValueError("snapshot HMAC verification failed")
        return payload
    if signed:
        return blob[len(_SIGNED_MAGIC) + _TAG_LEN:]
    return blob


def snapshot_bytes(tracker, meta: Optional[dict] = None,
                   key: Optional[bytes] = None) -> bytes:
    """Serialize a tracker (or wrapper chain) to a snapshot blob.

    Call between ``update()`` calls only.  The live tracker is returned to
    its exact prior state (detached handles are re-attached) before this
    function returns.

    Args:
      meta: optional picklable dict round-tripped verbatim (read back via
        :func:`restore_with_meta`) — stream position, detector state, etc.
        Its contents must satisfy the restore allowlist (plain
        containers / numpy arrays / allowlisted classes).
      key: optional HMAC key; when given the blob is signed (see
        :func:`verify_blob`).
    """
    chain = _chain(tracker)
    stash = []
    try:
        for obj in chain:
            for name in _DETACH_ATTRS:
                if name in getattr(obj, "__dict__", {}):
                    stash.append((obj, name, obj.__dict__[name]))
                    obj.__dict__[name] = None
        with _COUNTER_LOCK:
            counters = {k: c._count.peek()
                        for k, c in _counter_classes().items()}
        payload = {
            "version": FORMAT_VERSION,
            "counters": counters,
            "meta": dict(meta) if meta else {},
            "tracker": tracker,
        }
        raw = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
        return sign_blob(raw, key) if key is not None else raw
    finally:
        for obj, name, val in stash:
            obj.__dict__[name] = val


# Exact (module, name) allowlist.  Everything a tracker snapshot legitimately
# contains, enumerated empirically over every tracker flavor
# (tests/test_snapshot.py::test_allowlist_covers_every_tracker_flavor keeps
# this list honest — a new pickled class fails that test, not production).
# Nothing here is callable-as-code: numpy's reconstruction primitives build
# arrays from bytes, and every busca_tpu entry is a plain state class whose
# construction has no side effects.
_ALLOWED = {
    "builtins": {
        "set", "frozenset", "slice", "range", "bytearray", "complex",
    },
    "collections": {"OrderedDict", "deque"},
    "numpy": {"ndarray", "dtype"},
    "numpy._core.multiarray": {"_reconstruct", "scalar"},
    "numpy._core.numeric": {"_frombuffer"},
    # legacy numpy<2 module paths (same objects, older pickles)
    "numpy.core.multiarray": {"_reconstruct", "scalar"},
    "numpy.core.numeric": {"_frombuffer"},
    "busca_tpu.assoc.bank": {"BankedCrop"},
    "busca_tpu.core.hostmath": {"HostKalman"},
    "busca_tpu.eval.run": {"CenterTrackShim", "FeatureShim"},
    "busca_tpu.trackers.base": {"Track"},
    "busca_tpu.trackers.byte": {"ByteTracker", "ByteTrackerConfig"},
    "busca_tpu.trackers.centertrack": {"CenterTrackAdapter"},
    "busca_tpu.trackers.ghost": {"GhostConfig", "GhostTrack", "GhostTracker"},
    "busca_tpu.trackers.motdt": {"MotdtConfig", "MotdtTrack", "MotdtTracker"},
    "busca_tpu.trackers.sort": {"SortConfig", "SortTrack", "SortTracker"},
    "busca_tpu.trackers.strongsort": {
        "NearestNeighborMetric", "SSTrack", "StrongSortConfig",
        "StrongSortTracker",
    },
    "busca_tpu.trackers.transcenter": {"TransCenterByteTracker"},
}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name in _ALLOWED.get(module, ()):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"snapshot blob references forbidden {module}.{name}"
        )


def restore_with_meta(blob: bytes, engine=None, feature_extractor=None,
                      donor=None, key: Optional[bytes] = None
                      ) -> Tuple[object, dict]:
    """Rebuild a tracker from a snapshot blob and re-attach live handles.

    Args:
      blob: bytes from :func:`snapshot_bytes` (signed or raw).
      engine: association engine to re-attach wherever the chain holds one
        (``ByteTracker.engine`` & co.).
      feature_extractor: ReID feature callable for ``GhostTracker
        .feature_extractor`` / ``FeatureShim.feat_fn``.
      donor: alternatively, a freshly-built tracker from the SAME factory
        that built the snapshotted one — its live handles are pulled from
        the matching positions of its wrapper chain (the server's restore
        path: the factory is the authoritative source of handles).
      key: optional HMAC key; when given the blob must be signed and verify
        (see :func:`verify_blob`).

    Returns:
      ``(tracker, meta)`` — the restored tracker plus the ``meta`` dict the
      snapshot was taken with (``{}`` if none).

    Raises:
      ValueError: bad signature / format, or if the restored tracker
        expects a BUSCA engine (``use_busca=True``) and none was provided —
        a silent downgrade to base tracking would be a behavior change, so
        it fails loudly.
    """
    raw = verify_blob(blob, key)
    payload = _RestrictedUnpickler(io.BytesIO(raw)).load()
    if not isinstance(payload, dict) or "tracker" not in payload:
        raise ValueError("not a tracker snapshot blob")
    version = payload.get("version")
    if version not in _READABLE_VERSIONS:
        raise ValueError(
            f"snapshot format {version!r} not in supported "
            f"{_READABLE_VERSIONS}"
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
    with _COUNTER_LOCK:
        for key_, cls in _counter_classes().items():
            saved = payload.get("counters", {}).get(key_)
            if saved is not None:
                cls._count.advance_to(int(saved))
    meta = payload.get("meta") or {}
    return tracker, meta


def restore_bytes(blob: bytes, engine=None, feature_extractor=None,
                  donor=None, key: Optional[bytes] = None):
    """:func:`restore_with_meta` returning only the tracker."""
    return restore_with_meta(blob, engine=engine,
                             feature_extractor=feature_extractor,
                             donor=donor, key=key)[0]


def save(tracker, path: str, meta: Optional[dict] = None,
         key: Optional[bytes] = None):
    with open(path, "wb") as f:
        f.write(snapshot_bytes(tracker, meta=meta, key=key))


def load(path: str, engine=None, feature_extractor=None, donor=None,
         key: Optional[bytes] = None):
    with open(path, "rb") as f:
        return restore_bytes(f.read(), engine=engine,
                             feature_extractor=feature_extractor,
                             donor=donor, key=key)
