"""Per-sequence tracker presets + published golden numbers, as data.

The reference hard-codes per-video BYTE thresholds inside its eval loop
(adapters/ByteTrack/yolox/evaluators/mot_evaluator.py:141-164) and publishes
the MOT17-val StrongSORT(+BUSCA) golden table in README.md:126-131.  Both are
encoded here as data so the eval harness and the golden-number regression can
consume them.
"""

from __future__ import annotations

from typing import Dict, Optional

# mot_evaluator.py:146-150 — per-video track_buffer overrides
_CUSTOM_TRACK_BUFFER = {
    "MOT17-05-FRCNN": 14,
    "MOT17-06-FRCNN": 14,
    "MOT17-13-FRCNN": 25,
    "MOT17-14-FRCNN": 25,
}

# mot_evaluator.py:152-163 — per-video track_thresh overrides
_CUSTOM_TRACK_THRESH = {
    "MOT17-01-FRCNN": 0.65,
    "MOT17-06-FRCNN": 0.65,
    "MOT17-12-FRCNN": 0.7,
    "MOT17-14-FRCNN": 0.67,
    "MOT20-06": 0.3,
    "MOT20-08": 0.3,
}


def ghost_is_moving(seq_name: str) -> bool:
    """Whether a sequence's camera moves (GHOST's per-sequence ego-motion
    gate, adapters/GHOST/src/tracking_utils.py:209-221): MOT17/MOT20
    sequences 13/11/10/05/14/12/07/06 are moving, 09/04/02/08/03/01 static,
    DanceTrack static, everything else (unknown datasets) moving."""
    name = seq_name.lower()
    if "mot" not in name and "dance" not in name:
        return True
    if "dance" in name:
        return False
    parts = seq_name.split("-")
    if len(parts) >= 2:
        num = parts[1]
        if num in ("13", "11", "10", "05", "14", "12", "07", "06"):
            return True
        if num in ("09", "04", "02", "08", "03", "01"):
            return False
    return True


def custom_byte_thresholds(
    video_name: str,
    base_track_thresh: float,
    base_track_buffer: int = 30,
    ignore: bool = False,
) -> Dict[str, float]:
    """The reference's per-sequence BYTE threshold table.

    Matches mot_evaluator.py:141-164: sequences not in the table (and all
    sequences when ``ignore`` is set, the ``ignore_custom_byte_thresholds``
    flag) use the base values.  Video names follow MOTChallenge directory
    naming (e.g. ``MOT17-05-FRCNN``); bare ``MOT17-05`` also matches.
    """
    if ignore:
        return {"track_thresh": base_track_thresh, "track_buffer": 30}
    names = [video_name]
    if video_name.startswith("MOT17") and not video_name.endswith("-FRCNN"):
        names.append(video_name + "-FRCNN")
    buf = base_track_buffer if base_track_buffer != 30 else 30
    thresh = base_track_thresh
    for n in names:
        if n in _CUSTOM_TRACK_BUFFER:
            buf = _CUSTOM_TRACK_BUFFER[n]
        if n in _CUSTOM_TRACK_THRESH:
            thresh = _CUSTOM_TRACK_THRESH[n]
    return {"track_thresh": thresh, "track_buffer": buf}


# ---------------------------------------------------------------------------
# dataset splits (adapters/GHOST/data/splits.py) — encoded as data; the
# BDD100k/DanceTrack entries are directory listings there, so they take a
# root path here instead of hard-coding paths
# ---------------------------------------------------------------------------

_MOT17_TRAIN = (2, 4, 5, 9, 10, 11, 13)
_MOT17_TEST = (1, 3, 6, 7, 8, 12, 14)
_MOT20_TRAIN = (1, 2, 3, 5)
_MOT20_TEST = (4, 6, 7, 8)

DATASET_SPLITS = {
    "mot17_train": {"seq": [f"MOT17-{n:02}" for n in _MOT17_TRAIN],
                    "dir": "train"},
    "mot17_test": {"seq": [f"MOT17-{n:02}" for n in _MOT17_TEST],
                   "dir": "test"},
    "mot20_train": {"seq": [f"MOT20-{n:02}" for n in _MOT20_TRAIN],
                    "dir": "train"},
    "mot20_test": {"seq": [f"MOT20-{n:02}" for n in _MOT20_TEST],
                   "dir": "test"},
    # GHOST's cross-validation splits (splits.py:17-26)
    "mot17_split_1": {"train": (2, 5, 9, 10, 13), "test": (4, 11)},
    "mot17_split_2": {"train": (2, 4, 11, 10, 13), "test": (5, 9)},
    "mot17_split_3": {"train": (4, 5, 9, 11), "test": (2, 10, 13)},
}


def listdir_split(root: str, subdir: str) -> Dict[str, object]:
    """BDD100k / DanceTrack style split: every sequence directory under
    ``root/subdir`` (splits.py:48-68), empty when the dataset is absent."""
    import os

    path = os.path.join(root, subdir)
    try:
        seqs = sorted(os.listdir(path))
    except FileNotFoundError:
        seqs = []
    return {"seq": seqs, "dir": subdir}


# README.md:126-131 — the published MOT17-val StrongSORT golden table
# (BoT + ECC + NSA + EMA + MC + woC, seq_len 11, 5 candidates, thresh 0.5).
GOLDEN_MOT17_VAL = {
    "strongsort": {"mota": 76.174, "hota": 69.289, "idf1": 81.864, "ids": 234},
    "strongsort_busca": {
        "mota": 76.795,
        "hota": 69.392,
        "idf1": 82.272,
        "ids": 219,
    },
}


def golden_diff(
    measured: Dict[str, float],
    variant: str = "strongsort_busca",
    table: Optional[Dict[str, Dict[str, float]]] = None,
) -> Dict[str, Dict[str, float]]:
    """Measured metrics vs the golden table -> {metric: {want, got, diff}}.

    ``measured`` uses the same keys (mota/hota/idf1 as percentages, ids as a
    count).  The report is data; callers decide tolerances.
    """
    table = table or GOLDEN_MOT17_VAL
    want = table[variant]
    report = {}
    for k, v in want.items():
        got = measured.get(k)
        report[k] = {
            "want": v,
            "got": got,
            "diff": None if got is None else round(got - v, 3),
        }
    return report


# ---------------------------------------------------------------------------
# TransCenter experiment presets (adapters/TransCenter/exps/*.py) — the Exp
# classes are dataset/threshold settings over a shared base; encoded as data.
# The commented-out full sizes in the reference files are kept under
# ``full_size`` (ablation runs the half-resolution setting).
# ---------------------------------------------------------------------------

TRANSCENTER_EXPS = {
    # exps/transcenterdetr_ablation.py:13-32 (MOT17 val_half)
    "ablation": {
        "dataset": "MOT17",
        "val_ann": "val_half.json",
        "test_size": (640, 1088),
        "full_size": (800, 1440),
        "random_size": (18, 32),
        "test_conf": 0.1,
        "nmsthre": 0.7,
        "track_thresh": 0.4,
    },
    # exps/transcenterdetr_mot20.py (MOT20 test)
    "mot20": {
        "dataset": "MOT20",
        "val_ann": "test.json",
        "test_size": (640, 1088),
        "full_size": (896, 1600),
        "random_size": (20, 36),
        "test_conf": 0.001,
        "nmsthre": 0.7,
        "track_thresh": 0.4,
    },
    # exps/transcenterdetr_mix_det.py (MOT17 test, mixed detection train set)
    "mix_det": {
        "dataset": "MOT17",
        "val_ann": "test.json",
        "test_size": (640, 1088),
        "full_size": (800, 1440),
        "random_size": (18, 32),
        "test_conf": 0.001,
        "nmsthre": 0.7,
        "track_thresh": 0.4,
    },
}


def transcenter_exp(name: str) -> Dict[str, object]:
    """Experiment preset by name ('ablation', 'mot20', 'mix_det')."""
    if name not in TRANSCENTER_EXPS:
        raise KeyError(
            f"unknown TransCenter exp {name!r}; have {sorted(TRANSCENTER_EXPS)}"
        )
    return dict(TRANSCENTER_EXPS[name])
