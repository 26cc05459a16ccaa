"""Independent torch/numpy oracle of the full BUSCA pipeline.

A from-scratch reimplementation of the *reference's* composed behavior —
BYTE tracker loop (rounds 1/2 + Step 3b) + ``associate_embeddings`` + the
torch decision model — written directly from the reference sources
(adapters/ByteTrack/yolox/tracker/byte_tracker.py:226-532,
busca/network.py:176-429, busca/tracking.py:62-113), sharing NO code with
busca_tpu.  tests/test_pipeline_oracle.py drives this oracle and the
busca_tpu pipeline over the same synthetic sequence with shared weights and
asserts frame-by-frame probs-matrix and track-ID equality (the next-best
stand-in for golden-number parity while real weights/data are external).

Deliberate differences from busca_tpu (none behavioral):
- crops via cv2 (the reference's exact floor/ceil + clip + mean-pad +
  INTER_LINEAR recipe) instead of the XLA gather kernel;
- LAP via scipy: the cost-limit augmentation for ByteTrack's lapjv role,
  and deep_sort's clamp-assign-filter min_cost_matching for StrongSORT —
  instead of the C++ lapjv;
- Kalman as per-track numpy instead of the batched XLA/numpy mirror.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import scipy.linalg
import torch
import torch.nn as tnn

from torch_oracles import (
    TorchGhostResNet50,
    TorchPostLNLayer,
    oracle_pe3d,
    oracle_spatial_buckets,
)

# ---------------------------------------------------------------------------
# Kalman filter (mot_online/kalman_filter.py formulas)
# ---------------------------------------------------------------------------


class OracleKalman:
    """ByteTrack 8-state constant-velocity filter over (x, y, a, h)."""

    def __init__(self):
        ndim, dt = 4, 1.0
        self._motion_mat = np.eye(2 * ndim)
        for i in range(ndim):
            self._motion_mat[i, ndim + i] = dt
        self._update_mat = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement):
        mean_pos = measurement
        mean_vel = np.zeros_like(mean_pos)
        mean = np.r_[mean_pos, mean_vel]
        wp, wv = self._std_weight_position, self._std_weight_velocity
        h = measurement[3]
        std = [
            2 * wp * h, 2 * wp * h, 1e-2, 2 * wp * h,
            10 * wv * h, 10 * wv * h, 1e-5, 10 * wv * h,
        ]
        return mean, np.diag(np.square(std))

    def predict(self, mean, covariance):
        wp, wv = self._std_weight_position, self._std_weight_velocity
        h = mean[3]
        std_pos = [wp * h, wp * h, 1e-2, wp * h]
        std_vel = [wv * h, wv * h, 1e-5, wv * h]
        motion_cov = np.diag(np.square(np.r_[std_pos, std_vel]))
        mean = self._motion_mat @ mean
        covariance = (
            self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        )
        return mean, covariance

    def project(self, mean, covariance):
        wp = self._std_weight_position
        h = mean[3]
        std = [wp * h, wp * h, 1e-1, wp * h]
        innovation_cov = np.diag(np.square(std))
        mean = self._update_mat @ mean
        covariance = self._update_mat @ covariance @ self._update_mat.T
        return mean, covariance + innovation_cov

    def update(self, mean, covariance, measurement):
        proj_mean, proj_cov = self.project(mean, covariance)
        chol, lower = scipy.linalg.cho_factor(
            proj_cov, lower=True, check_finite=False
        )
        kalman_gain = scipy.linalg.cho_solve(
            (chol, lower),
            (covariance @ self._update_mat.T).T,
            check_finite=False,
        ).T
        innovation = measurement - proj_mean
        new_mean = mean + kalman_gain @ innovation
        new_cov = covariance - kalman_gain @ proj_cov @ kalman_gain.T
        return new_mean, new_cov


# ---------------------------------------------------------------------------
# matching (matching.py:39-186 semantics)
# ---------------------------------------------------------------------------


def bbox_ious_plus1(a, b):
    """cython_bbox convention: widths/heights counted +1."""
    out = np.zeros((len(a), len(b)))
    for i, boxa in enumerate(a):
        area_a = (boxa[2] - boxa[0] + 1) * (boxa[3] - boxa[1] + 1)
        for j, boxb in enumerate(b):
            iw = min(boxa[2], boxb[2]) - max(boxa[0], boxb[0]) + 1
            if iw <= 0:
                continue
            ih = min(boxa[3], boxb[3]) - max(boxa[1], boxb[1]) + 1
            if ih <= 0:
                continue
            area_b = (boxb[2] - boxb[0] + 1) * (boxb[3] - boxb[1] + 1)
            out[i, j] = iw * ih / (area_a + area_b - iw * ih)
    return out


def iou_distance(atracks, btracks):
    a = [t.tlbr for t in atracks]
    b = [t.tlbr for t in btracks]
    if not a or not b:
        return np.zeros((len(a), len(b)))
    return 1.0 - bbox_ious_plus1(a, b)


def fuse_score(cost_matrix, detections):
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1 - cost_matrix
    det_scores = np.array([d.score for d in detections])
    fuse_sim = iou_sim * det_scores[None, :]
    return 1 - fuse_sim


def linear_assignment(cost_matrix, thresh):
    """lap.lapjv(extend_cost, cost_limit=thresh) semantics via scipy:
    the square augmentation with per-row/col dummy arcs at thresh/2 —
    pairs costlier than ``thresh`` end up unmatched."""
    from scipy.optimize import linear_sum_assignment

    if cost_matrix.size == 0:
        return (
            np.empty((0, 2), dtype=int),
            tuple(range(cost_matrix.shape[0])),
            tuple(range(cost_matrix.shape[1])),
        )
    n, m = cost_matrix.shape
    big = np.full((n + m, n + m), thresh / 2.0)
    big[:n, :m] = cost_matrix
    big[n:, m:] = 0.0
    rows, cols = linear_sum_assignment(big)
    matches, matched_a, matched_b = [], set(), set()
    for r, c in zip(rows, cols):
        if r < n and c < m and cost_matrix[r, c] <= thresh:
            matches.append([r, c])
            matched_a.add(r)
            matched_b.add(c)
    unmatched_a = np.array(
        [i for i in range(n) if i not in matched_a], dtype=int
    )
    unmatched_b = np.array(
        [j for j in range(m) if j not in matched_b], dtype=int
    )
    return np.asarray(matches), unmatched_a, unmatched_b


def center_distance(atracks, btracks):
    a = np.array([t.tlbr for t in atracks])
    b = np.array([t.tlbr for t in btracks])
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(atracks), len(btracks)))
    ac = (a[:, :2] + a[:, 2:]) / 2.0
    bc = (b[:, :2] + b[:, 2:]) / 2.0
    return np.sqrt(((ac[:, None] - bc[None]) ** 2).sum(-1))


# ---------------------------------------------------------------------------
# crops (busca/tracking.py:62-113, cv2 path)
# ---------------------------------------------------------------------------


def cutout_with_pad(im, bbox):
    import cv2  # noqa: F401  (cv2 presence checked by caller)

    x1, y1, x2, y2 = bbox
    x1, y1 = int(math.floor(x1)), int(math.floor(y1))
    x2, y2 = int(math.ceil(x2)), int(math.ceil(y2))
    box = np.array([y1, y2, x1, x2])
    lim = np.array([im.shape[0], im.shape[0], im.shape[1], im.shape[1]])
    clipped = np.clip(box, 0, lim)
    crop = im[clipped[0]:clipped[1], clipped[2]:clipped[3]]
    pad = np.abs(clipped - box).astype(np.int32)
    pad = np.array([[pad[0], pad[1]], [pad[2], pad[3]], [0, 0]])
    crop = np.pad(crop, pad, mode="constant",
                  constant_values=np.mean(crop) if crop.size else 0)
    if crop.shape[0] == 0 or crop.shape[1] == 0:
        crop = np.zeros((1, 1, 3), dtype=crop.dtype)
    return crop


def get_bbox_crop(im, bbox_ltrb, output_size):
    """output_size = (W, H) like cv2.resize."""
    import cv2

    cutout = cutout_with_pad(im, bbox_ltrb)
    return cv2.resize(cutout, output_size, interpolation=cv2.INTER_LINEAR)


def get_image_crops(image, bboxes_ltrb, crop_hw):
    h, w = crop_hw
    return [get_bbox_crop(image, b, (w, h)) for b in bboxes_ltrb]


MISSING_LTWH = np.array([
    np.finfo(np.float32).min, np.finfo(np.float32).min,
    -np.finfo(np.float32).min / 100.0, -np.finfo(np.float32).min / 100.0,
])


# ---------------------------------------------------------------------------
# torch decision model (network.py:45-244 composition)
# ---------------------------------------------------------------------------


class TorchBuscaPipeline(tnn.Module):
    """Parameterized MEM-SEP-CAN-BAD decision model with the reference's
    checkpoint key layout (so convert_busca_state_dict shares its weights
    with the JAX engine)."""

    def __init__(self, seq_len, num_candidates, crop_hw, num_layers=2,
                 d=512, nhead=4, ff=1024, reid_classes=7,
                 reid_layers=(1, 1, 1, 1), seed=7):
        super().__init__()
        torch.manual_seed(seed)
        self.seq_len = seq_len
        self.c = num_candidates
        self.crop_hw = crop_hw
        self.d = d
        self.reid = TorchGhostResNet50(
            num_classes=reid_classes, layers_cfg=reid_layers
        )
        self.encoder = tnn.Linear(d, d)
        self.layers = tnn.ModuleList(
            [TorchPostLNLayer(d, nhead, ff) for _ in range(num_layers)]
        )
        self.dec_norm = tnn.LayerNorm(d)
        self.dec_lin = tnn.Linear(d, 1)
        self.sep_token = tnn.Parameter(torch.randn(d))
        self.non_token = tnn.Parameter(torch.randn(d))
        self.bad_token = tnn.Parameter(torch.randn(d))

    def reference_state_dict(self):
        sd = dict(self.reid.reference_state_dict())
        for k, v in self.encoder.state_dict().items():
            sd[f"encoder.{k}"] = v.numpy()
        for i, layer in enumerate(self.layers):
            for k, v in layer.state_dict().items():
                sd[f"transformer_encoder.layers.{i}.{k}"] = v.numpy()
        sd["decoder.0.weight"] = self.dec_norm.weight.detach().numpy()
        sd["decoder.0.bias"] = self.dec_norm.bias.detach().numpy()
        sd["decoder.1.weight"] = self.dec_lin.weight.detach().numpy()
        sd["decoder.1.bias"] = self.dec_lin.bias.detach().numpy()
        sd["sep_token"] = self.sep_token.detach().numpy()
        sd["non_token"] = self.non_token.detach().numpy()
        sd["bad_token"] = self.bad_token.detach().numpy()
        return sd

    @torch.no_grad()
    def forward(self, mem_crops, can_crops, mem_boxes, can_boxes):
        """mem_crops [B, L, H, W, 3] RGB normalized f32, boxes ltrb f32.
        Returns logits [B, C + 2]."""
        self.reid.train()  # batch-stat BN (network.py:554-556)
        b = mem_crops.shape[0]
        h, w = self.crop_hw
        d = self.d

        def feats(crops):
            bb, ll = crops.shape[:2]
            flat = torch.from_numpy(
                np.ascontiguousarray(
                    crops.reshape(bb * ll, h, w, 3).transpose(0, 3, 1, 2)
                )
            ).float()
            _, f = self.reid(flat)
            return f.reshape(bb, ll, -1)

        mem = self.encoder(feats(mem_crops)) * np.sqrt(d)
        can = self.encoder(feats(can_crops)) * np.sqrt(d)

        sep = self.sep_token.expand(b, 1, d)
        groups = [can[:, i:i + 1] for i in range(self.c)]
        groups += [self.non_token.expand(b, 1, d),
                   self.bad_token.expand(b, 1, d)]
        seq = [mem]
        for g in groups:
            seq += [sep, g]
        x = torch.cat(seq, dim=1)

        # positional encodings (encodings.py semantics via numpy oracle)
        L = self.seq_len
        ref = mem_boxes[:, -1:, :]
        mem_xy, mem_sz = oracle_spatial_buckets(mem_boxes, ref)
        mem_t = np.tile(
            np.clip(np.arange(-L + 1, 1) * 2, -30, 30) + 30, (b, 1)
        )
        fake = MISSING_LTWH.copy()  # ltwh sentinel used verbatim for BAD
        tok_boxes = []
        for i in range(self.c):
            tok_boxes += [ref[:, 0], can_boxes[:, i]]
        tok_boxes += [ref[:, 0], ref[:, 0],
                      np.tile(fake, (b, 1)), np.tile(fake, (b, 1))]
        tok_boxes = np.stack(tok_boxes, axis=1)
        can_xy, can_sz = oracle_spatial_buckets(tok_boxes, ref)
        can_t = np.tile(np.tile([32, 34], self.c + 2), (b, 1))

        pe_mem = oracle_pe3d(mem_xy, mem_sz, mem_t, d).astype(np.float16)
        pe_can = oracle_pe3d(can_xy, can_sz, can_t, d).astype(np.float16)
        pe = np.concatenate([pe_mem, pe_can], axis=1).astype(np.float32)
        x = x + torch.from_numpy(pe)

        for layer in self.layers:
            x, _ = layer(x)

        pos = [L + i for i in range(1, (self.c + 2) * 2 + 1, 2)]
        out = x[:, pos]
        return self.dec_lin(self.dec_norm(out))[..., 0]


# ---------------------------------------------------------------------------
# associate_embeddings (network.py:247-429)
# ---------------------------------------------------------------------------

MEAN_BGR = np.array([0.406, 0.456, 0.485])
STD_BGR = np.array([0.225, 0.224, 0.299])


def normalize_batch(x):
    x = x.astype(np.float32) / 255.0
    x -= MEAN_BGR
    x /= STD_BGR
    return x


def get_track_mem(track, seq_len, use_broader_memory):
    full = track.images_mem
    if use_broader_memory and not (seq_len == 1 and len(full) >= 1) \
            and len(full) >= seq_len:
        sep = float(len(full) - 1) / float(seq_len - 1)
        mem = [full[int(i * sep)] for i in range(seq_len)]
        boxes = [track.tlwh_mem[int(i * sep)] for i in range(seq_len)]
    else:
        mem = full[-seq_len:]
        boxes = track.tlwh_mem[-seq_len:]
    return mem, np.array(boxes) * track.scale


def ltwh_to_ltrb(x):
    out = x.copy()
    out[..., 2:] += out[..., :2]
    return out


def associate_embeddings(model, tracks, dets, dists_matrix, seq_len,
                         num_candidates, use_broader_memory,
                         select_highest_candidate,
                         highest_candidate_minimum_thresh=None,
                         keep_highest_value=False,
                         extra_kalman_candidates=()):
    h, w = model.crop_hw
    if len(tracks) == 0:
        return None, None
    if len(dets) == 0 and len(extra_kalman_candidates) == 0:
        return None, None

    complete, mems, mem_boxes = [], [], []
    for track in tracks:
        m, bx = get_track_mem(track, seq_len, use_broader_memory)
        if len(m) == seq_len:
            complete.append(True)
            mems.append(np.stack(m))
            mem_boxes.append(bx)
        else:
            complete.append(False)
            mems.append(np.zeros((seq_len, h, w, 3), np.uint8))
            mem_boxes.append(
                np.zeros((seq_len, 4)) + np.array([250.0, 250, 500, 500])
            )
    mems = normalize_batch(np.stack(mems).astype(np.uint8))
    mem_boxes = np.stack(mem_boxes)

    det_inds, cans, can_boxes = [], [], []
    num_available = min(len(dets), num_candidates)
    for ti in range(len(tracks)):
        order = np.argsort(dists_matrix[ti])[:num_candidates].tolist()
        order += [None] * (num_candidates - len(order))
        det_inds.append(order)
        t_crops, t_boxes = [], []
        for di in order:
            if di is not None:
                t_crops.append(dets[di].images_mem[-1])
                t_boxes.append(dets[di].tlwh_mem[-1] * dets[di].scale)
            else:
                t_crops.append(np.zeros((h, w, 3), np.uint8))
                t_boxes.append(MISSING_LTWH.copy())
        cans.append(t_crops)
        can_boxes.append(t_boxes)

    if len(extra_kalman_candidates) > 0:
        num_available = min(len(dets) + 1, num_candidates)
        k_slot = min(len(dets), num_candidates - 1)
        for ti, kdet in enumerate(extra_kalman_candidates):
            det_inds[ti][k_slot] = len(dets) + ti
            can_boxes[ti][k_slot] = kdet.tlwh * kdet.scale
            cans[ti][k_slot] = kdet.images_mem[-1]

    cans = normalize_batch(
        np.stack([np.stack(c) for c in cans]).astype(np.uint8)
    )
    can_boxes = np.stack(
        [np.stack(bs) for bs in can_boxes]
    )

    mem_boxes = ltwh_to_ltrb(mem_boxes).astype(np.float32)
    can_boxes = ltwh_to_ltrb(can_boxes).astype(np.float32)

    # BGR -> RGB (HWC kept; the torch model transposes internally)
    mems_rgb = mems[..., ::-1].astype(np.float32)
    cans_rgb = cans[..., ::-1].astype(np.float32)

    logits = model(mems_rgb, cans_rgb, mem_boxes, can_boxes)
    probs = torch.softmax(logits, dim=-1).numpy()

    num_dets = len(dets) + (
        len(extra_kalman_candidates) if extra_kalman_candidates else 0
    )
    probs_matrix = np.zeros((len(tracks), num_dets))
    for ti in range(len(tracks)):
        track_probs = probs[ti]
        if select_highest_candidate:
            new = np.zeros_like(track_probs)
            mt = highest_candidate_minimum_thresh
            if mt is None or mt == 0 or track_probs.max() >= mt:
                new[track_probs.argmax()] = (
                    track_probs.max() if keep_highest_value else 1.0
                )
            track_probs = new
        inds = det_inds[ti][:num_available]
        probs_matrix[ti, inds] = track_probs[:num_available]
    return probs_matrix, np.asarray(complete)


# ---------------------------------------------------------------------------
# STrack + BYTE loop (byte_tracker.py:23-532)
# ---------------------------------------------------------------------------

TRACKED, LOST, REMOVED = 1, 2, 3


class OracleSTrack:
    shared_kalman = OracleKalman()
    _count = 0

    def __init__(self, tlwh, score, image=None, scale=None):
        self._tlwh = np.asarray(tlwh, dtype=np.float64)
        self.kalman_filter = None
        self.mean = self.covariance = None
        self.is_activated = False
        self.score = score
        self.scale = scale
        self.tracklet_len = 0
        self.state = 0  # New
        self.track_id = 0
        self.frame_id = 0
        self.start_frame = 0
        self.tlwh_mem = [self._tlwh.copy()]
        self.images_mem = [] if image is None else [image]

    @classmethod
    def next_id(cls):
        cls._count += 1
        return cls._count

    @classmethod
    def reset_ids(cls):
        cls._count = 0

    @property
    def end_frame(self):
        return self.frame_id

    @property
    def tlwh(self):
        if self.mean is None:
            return self._tlwh.copy()
        ret = self.mean[:4].copy()
        ret[2] *= ret[3]
        ret[:2] -= ret[2:] / 2
        return ret

    @property
    def tlbr(self):
        ret = self.tlwh
        ret = ret.copy()
        ret[2:] += ret[:2]
        return ret

    @staticmethod
    def tlwh_to_xyah(tlwh):
        ret = np.asarray(tlwh, np.float64).copy()
        ret[:2] += ret[2:] / 2
        ret[2] /= ret[3]
        return ret

    @staticmethod
    def multi_predict(stracks):
        for st in stracks:
            mean = st.mean.copy()
            if st.state != TRACKED:
                mean[7] = 0
            st.mean, st.covariance = OracleSTrack.shared_kalman.predict(
                mean, st.covariance
            )

    def activate(self, kalman_filter, frame_id):
        self.kalman_filter = kalman_filter
        self.track_id = self.next_id()
        self.mean, self.covariance = kalman_filter.initiate(
            self.tlwh_to_xyah(self._tlwh)
        )
        self.tracklet_len = 0
        self.state = TRACKED
        if frame_id == 1:
            self.is_activated = True
        self.frame_id = frame_id
        self.start_frame = frame_id

    def re_activate(self, new_track, frame_id, new_id=False,
                    update_mems=True):
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xyah(new_track.tlwh)
        )
        self.tracklet_len = 0
        self.state = TRACKED
        self.is_activated = True
        self.frame_id = frame_id
        if new_id:
            self.track_id = self.next_id()
        self.score = new_track.score
        self.scale = new_track.scale
        if update_mems:
            if new_track.tlwh_mem:
                self.tlwh_mem.extend(new_track.tlwh_mem)
            if new_track.images_mem:
                self.images_mem.extend(new_track.images_mem)

    def update(self, new_track, frame_id, update_mems=True):
        self.frame_id = frame_id
        self.tracklet_len += 1
        self.mean, self.covariance = self.kalman_filter.update(
            self.mean, self.covariance, self.tlwh_to_xyah(new_track.tlwh)
        )
        self.state = TRACKED
        self.is_activated = True
        self.score = new_track.score
        self.scale = new_track.scale
        if update_mems:
            if new_track.tlwh_mem:
                self.tlwh_mem.extend(new_track.tlwh_mem)
            if new_track.images_mem:
                self.images_mem.extend(new_track.images_mem)

    def mark_lost(self):
        self.state = LOST

    def mark_removed(self):
        self.state = REMOVED

    def apply_camera_motion(self, warp_matrix):
        """byte_tracker.py:123-138: warp the (center) position by the 2x3
        camera-motion matrix, in frame coordinates (scale applied/removed)."""
        if self.mean is None:
            pos = self._tlwh[:2].copy()
        else:
            pos = self.mean[:2].copy()
        pos = pos * self.scale
        p = warp_matrix @ np.array([pos[0], pos[1], 1.0])
        new_pos = p[:2] / self.scale
        if self.mean is None:
            self._tlwh[:2] = new_pos
        else:
            self.mean[:2] = new_pos


def joint_stracks(a, b):
    seen, res = set(), []
    for t in a:
        seen.add(t.track_id)
        res.append(t)
    for t in b:
        if t.track_id not in seen:
            seen.add(t.track_id)
            res.append(t)
    return res


def sub_stracks(a, b):
    d = {t.track_id: t for t in a}
    for t in b:
        d.pop(t.track_id, None)
    return list(d.values())


def remove_duplicate_stracks(sa, sb):
    pdist = iou_distance(sa, sb)
    pairs = np.where(pdist < 0.15)
    dupa, dupb = [], []
    for p, q in zip(*pairs):
        timep = sa[p].frame_id - sa[p].start_frame
        timeq = sb[q].frame_id - sb[q].start_frame
        if timep > timeq:
            dupb.append(q)
        else:
            dupa.append(p)
    return (
        [t for i, t in enumerate(sa) if i not in dupa],
        [t for i, t in enumerate(sb) if i not in dupb],
    )


class OracleByteTracker:
    """The reference BYTE+BUSCA update loop (byte_tracker.py:226-456).
    Reliable-gate off; ECC camera-motion compensation optional
    (``use_camera_motion_compensation``, the shipped MOT17 configuration's
    third-round warp, byte_tracker.py:377-378 + :626-650)."""

    def __init__(self, model, track_thresh=0.5, track_buffer=30,
                 match_thresh=0.9, busca_thresh=0.5, seq_len=5,
                 num_candidates=3, use_broader_memory=True,
                 select_highest_candidate=True,
                 transformer_update_mems_only_first_round=True,
                 crop_hw=(64, 32), frame_rate=30, mot20=False,
                 use_camera_motion_compensation=False):
        OracleSTrack.reset_ids()
        self.model = model
        self.tracked_stracks: List[OracleSTrack] = []
        self.lost_stracks: List[OracleSTrack] = []
        self.removed_stracks: List[OracleSTrack] = []
        self.frame_id = 0
        self.track_thresh = track_thresh
        self.det_thresh = track_thresh + 0.1
        self.match_thresh = match_thresh
        self.busca_thresh = busca_thresh
        self.seq_len = seq_len
        self.num_candidates = num_candidates
        self.use_broader_memory = use_broader_memory
        self.select_highest_candidate = select_highest_candidate
        self.mems_first_only = transformer_update_mems_only_first_round
        self.crop_hw = crop_hw
        self.mot20 = mot20
        self.max_time_lost = int(frame_rate / 30.0 * track_buffer)
        self.kalman_filter = OracleKalman()
        self.probs_log: List[Optional[np.ndarray]] = []
        self.use_cmc = use_camera_motion_compensation
        self.last_image = None

    def camera_motion_compensation(self, track_pool, current_frame,
                                   number_of_iterations=100,
                                   termination_eps=1e-5):
        """ECC alignment of the previous frame onto the current one, then
        warp every pool track — tracktor's recipe as the reference runs it
        (byte_tracker.py:626-650, MOTION_EUCLIDEAN, 100 iters, eps 1e-5)."""
        import cv2

        if self.frame_id <= 1:
            return 1.0
        g1 = cv2.cvtColor(self.last_image, cv2.COLOR_BGR2GRAY)
        g2 = cv2.cvtColor(current_frame, cv2.COLOR_BGR2GRAY)
        warp = np.eye(2, 3, dtype=np.float32)
        criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                    number_of_iterations, termination_eps)
        cc, warp = cv2.findTransformECC(
            templateImage=g1, inputImage=g2, warpMatrix=warp,
            motionType=cv2.MOTION_EUCLIDEAN, criteria=criteria,
        )
        for t in track_pool:
            t.apply_camera_motion(warp)
        return float(cc)

    def update(self, bboxes_tlbr, scores, scale, frame):
        self.frame_id += 1
        activated, refind, lost, removed = [], [], [], []
        bboxes = np.asarray(bboxes_tlbr, np.float64).reshape(-1, 4)
        scores = np.asarray(scores, np.float64).reshape(-1)

        remain = scores > self.track_thresh
        second = (scores > 0.1) & (scores < self.track_thresh)
        considered = remain | second
        dets = bboxes[remain]
        scores_keep = scores[remain]
        dets_second = bboxes[second]
        scores_second = scores[second]
        bboxes_considered = bboxes[considered]
        scores_considered = scores[considered]

        def tlbr_to_tlwh(tlbr):
            out = tlbr.copy()
            out[2:] -= out[:2]
            return out

        crops_first = get_image_crops(frame, dets * scale, self.crop_hw)
        crops_second = get_image_crops(
            frame, dets_second * scale, self.crop_hw
        )
        crops_considered = get_image_crops(
            frame, bboxes_considered * scale, self.crop_hw
        )

        detections = [
            OracleSTrack(tlbr_to_tlwh(t), s, im, scale)
            for t, s, im in zip(dets, scores_keep, crops_first)
        ]
        all_considered = [
            OracleSTrack(tlbr_to_tlwh(t), s, im, scale)
            for t, s, im in zip(
                bboxes_considered, scores_considered, crops_considered
            )
        ]

        unconfirmed = [
            t for t in self.tracked_stracks if not t.is_activated
        ]
        tracked = [t for t in self.tracked_stracks if t.is_activated]

        # round 1
        strack_pool = joint_stracks(tracked, self.lost_stracks)
        OracleSTrack.multi_predict(strack_pool)
        dists = iou_distance(strack_pool, detections)
        if not self.mot20:
            dists = fuse_score(dists, detections)
        matches, u_track, u_det = linear_assignment(
            dists, self.match_thresh
        )
        for it, idet in matches:
            track, det = strack_pool[it], detections[idet]
            update_mems = det.score >= self.det_thresh
            if track.state == TRACKED:
                track.update(det, self.frame_id, update_mems)
                activated.append(track)
            else:
                track.re_activate(det, self.frame_id, False, update_mems)
                refind.append(track)

        # round 2 (low-score)
        detections_second = [
            OracleSTrack(tlbr_to_tlwh(t), s, im, scale)
            for t, s, im in zip(dets_second, scores_second, crops_second)
        ]
        r_tracked = [
            strack_pool[i] for i in u_track
            if strack_pool[i].state == TRACKED
        ]
        r_lost = [
            strack_pool[i] for i in u_track
            if strack_pool[i].state != TRACKED
        ]
        dists = iou_distance(r_tracked, detections_second)
        matches, u_track, _ = linear_assignment(dists, 0.5)
        for it, idet in matches:
            track, det = r_tracked[it], detections_second[idet]
            track.update(det, self.frame_id, not self.mems_first_only)
            activated.append(track)

        unassigned = joint_stracks([r_tracked[i] for i in u_track], r_lost)
        u_track = list(range(len(unassigned)))

        # Step 3b
        self.probs_log.append(None)
        if self.busca_thresh > 0:
            third_pool = unassigned
            if self.use_cmc:
                self.camera_motion_compensation(third_pool, frame)
            kalman_cands = []
            for track in third_pool:
                crop = get_image_crops(
                    frame, [track.tlbr * track.scale], self.crop_hw
                )[0]
                kalman_cands.append(OracleSTrack(
                    track.tlwh, np.float32(0.10000001), crop, track.scale
                ))
            matches3, u3 = self._third_round(
                third_pool, all_considered, kalman_cands
            )
            for it, _prob in matches3:
                track = third_pool[it]
                det = kalman_cands[it]
                if track.state == TRACKED:
                    track.update(det, self.frame_id, update_mems=False)
                    activated.append(track)
            u_track = u3

        for it in u_track:
            track = unassigned[it]
            if track.state != LOST:
                track.mark_lost()
                lost.append(track)

        # unconfirmed
        detections = [detections[i] for i in u_det]
        dists = iou_distance(unconfirmed, detections)
        if not self.mot20:
            dists = fuse_score(dists, detections)
        matches, u_unconfirmed, u_det = linear_assignment(dists, 0.7)
        for it, idet in matches:
            unconfirmed[it].update(detections[idet], self.frame_id, True)
            activated.append(unconfirmed[it])
        for it in u_unconfirmed:
            track = unconfirmed[it]
            track.mark_removed()
            removed.append(track)

        # init
        for inew in u_det:
            track = detections[inew]
            if track.score < self.det_thresh:
                continue
            track.activate(self.kalman_filter, self.frame_id)
            activated.append(track)
        # prune
        for track in self.lost_stracks:
            if self.frame_id - track.end_frame > self.max_time_lost:
                track.mark_removed()
                removed.append(track)

        self.tracked_stracks = [
            t for t in self.tracked_stracks if t.state == TRACKED
        ]
        self.tracked_stracks = joint_stracks(self.tracked_stracks, activated)
        self.tracked_stracks = joint_stracks(self.tracked_stracks, refind)
        self.lost_stracks = sub_stracks(
            self.lost_stracks, self.tracked_stracks
        )
        self.lost_stracks.extend(lost)
        self.lost_stracks = sub_stracks(
            self.lost_stracks, self.removed_stracks
        )
        self.removed_stracks.extend(removed)
        self.removed_stracks = [
            t for t in self.removed_stracks
            if self.frame_id - t.end_frame < 10 * self.max_time_lost
        ]
        self.tracked_stracks, self.lost_stracks = remove_duplicate_stracks(
            self.tracked_stracks, self.lost_stracks
        )
        if self.use_cmc:
            self.last_image = np.asarray(frame).copy()
        return [t for t in self.tracked_stracks if t.is_activated]

    def _third_round(self, pool, considered, kalman_cands):
        if self.busca_thresh <= 0.0 or not pool:
            return [], list(range(len(pool)))
        dists = center_distance(pool, considered)
        probs, reliable = associate_embeddings(
            self.model, pool, considered, dists, self.seq_len,
            self.num_candidates, self.use_broader_memory,
            self.select_highest_candidate,
            extra_kalman_candidates=kalman_cands,
        )
        self.probs_log[-1] = probs
        if probs is None:
            return [], list(range(len(pool)))
        matches, u_track = [], []
        num_dets = len(considered)
        for i in range(len(pool)):
            p = probs[i, num_dets + i]
            if reliable[i] and p > self.busca_thresh:
                matches.append([i, p])
            else:
                u_track.append(i)
        return matches, u_track


# ---------------------------------------------------------------------------
# StrongSORT oracle (deep_sort/tracker.py + track.py + linear_assignment.py)
# ---------------------------------------------------------------------------

INFTY_COST = 1e5
CHI2INV95_4 = 9.4877


class OracleSSKalman(OracleKalman):
    """DeepSORT filter + NSA: measurement noise scaled by (1 - confidence)
    (StrongSORT paper eq. 2; deep_sort/track.py:242 passes the confidence)."""

    def update(self, mean, covariance, measurement, confidence=None):
        wp = self._std_weight_position
        h = mean[3]
        std = np.array([wp * h, wp * h, 1e-1, wp * h])
        if confidence is not None:
            std = std * (1.0 - confidence)
        innovation_cov = np.diag(np.square(std))
        proj_mean = self._update_mat @ mean
        proj_cov = (
            self._update_mat @ covariance @ self._update_mat.T
            + innovation_cov
        )
        chol, lower = scipy.linalg.cho_factor(
            proj_cov, lower=True, check_finite=False
        )
        kalman_gain = scipy.linalg.cho_solve(
            (chol, lower),
            (covariance @ self._update_mat.T).T,
            check_finite=False,
        ).T
        innovation = measurement - proj_mean
        return (
            mean + kalman_gain @ innovation,
            covariance - kalman_gain @ proj_cov @ kalman_gain.T,
        )

    def gating_distance(self, mean, covariance, measurements):
        wp = self._std_weight_position
        h = mean[3]
        std = [wp * h, wp * h, 1e-1, wp * h]
        proj_mean = self._update_mat @ mean
        proj_cov = (
            self._update_mat @ covariance @ self._update_mat.T
            + np.diag(np.square(std))
        )
        chol = np.linalg.cholesky(proj_cov)
        d = measurements - proj_mean
        z = scipy.linalg.solve_triangular(
            chol, d.T, lower=True, check_finite=False, overwrite_b=True
        )
        return np.sum(z * z, axis=0)


SS_TENTATIVE, SS_CONFIRMED, SS_DELETED = 1, 2, 3


class OracleSSTrack:
    conf_thres = 1.0  # Track._conf_thres (set_busca_conf_threshold)

    def __init__(self, xyah, track_id, n_init, max_age, feature=None,
                 score=None, scale=1.0, image=None, ema_alpha=0.9):
        self.track_id = track_id
        self.hits = 1
        self.age = 1
        self.time_since_update = 0
        self.state = SS_TENTATIVE
        self.features = []
        if feature is not None:
            f = np.asarray(feature, np.float64)
            f = f / np.linalg.norm(f)
            self.features.append(f)
        self.score = score
        self._n_init = n_init
        self._max_age = max_age
        self.ema_alpha = ema_alpha
        self.kf = OracleSSKalman()
        self.mean, self.covariance = self.kf.initiate(np.asarray(xyah))
        self.scale = scale
        self._tlwh_mem = [self.to_tlwh()]
        self.image = image
        self._images_mem = [] if image is None else [image]
        self.conf_mem = [score]

    def to_tlwh(self):
        ret = self.mean[:4].copy()
        ret[2] *= ret[3]
        ret[:2] -= ret[2:] / 2
        return ret

    @property
    def tlwh(self):
        return self.to_tlwh()

    @property
    def tlbr(self):
        ret = self.to_tlwh()
        ret[2:] = ret[:2] + ret[2:]
        return ret

    @property
    def xyah(self):
        ret = self.to_tlwh()
        ret[:2] += ret[2:] / 2
        ret[2] /= ret[3]
        return ret

    @property
    def tlwh_mem(self):
        return [
            b for b, c in zip(self._tlwh_mem, self.conf_mem)
            if c >= OracleSSTrack.conf_thres
        ]

    @property
    def images_mem(self):
        return [
            im for im, c in zip(self._images_mem, self.conf_mem)
            if c >= OracleSSTrack.conf_thres
        ]

    def predict(self):
        self.mean, self.covariance = self.kf.predict(
            self.mean, self.covariance
        )
        self.age += 1
        self.time_since_update += 1

    def update(self, xyah, confidence, feature, image, save_memory=False,
               nsa=True):
        self.mean, self.covariance = self.kf.update(
            self.mean, self.covariance, np.asarray(xyah),
            confidence=confidence if nsa else None,
        )
        if feature is not None:
            f = np.asarray(feature, np.float64)
            f = f / np.linalg.norm(f)
            if self.features:
                smooth = (
                    self.ema_alpha * self.features[-1]
                    + (1 - self.ema_alpha) * f
                )
                smooth /= np.linalg.norm(smooth)
                self.features = [smooth]
            else:
                self.features = [f]
        self.hits += 1
        self.time_since_update = 0
        self.score = confidence
        if self.state == SS_TENTATIVE and self.hits >= self._n_init:
            self.state = SS_CONFIRMED
        tlwh = np.asarray(xyah, np.float64).copy()
        tlwh[2] *= tlwh[3]
        tlwh[:2] -= tlwh[2:] / 2
        self._tlwh_mem.append(tlwh)
        self.conf_mem.append(confidence)
        if image is not None:
            if save_memory and confidence < OracleSSTrack.conf_thres:
                self._images_mem.append(None)
            else:
                self._images_mem.append(image)
            self.image = image
        else:
            self._images_mem.append(None)

    def mark_missed(self):
        if self.state == SS_TENTATIVE:
            self.state = SS_DELETED
        elif self.time_since_update > self._max_age:
            self.state = SS_DELETED

    def is_confirmed(self):
        return self.state == SS_CONFIRMED

    def is_deleted(self):
        return self.state == SS_DELETED


def ss_min_cost_matching(cost_matrix, max_distance, track_indices,
                         det_indices):
    """deep_sort min_cost_matching: clamp > max to max+1e-5, FULL scipy
    assignment, then discard pairs above max (linear_assignment.py:52-86 —
    note: NOT a cost-limit LAP; clamped pairs participate in the
    optimization and are dropped afterwards)."""
    from scipy.optimize import linear_sum_assignment

    if len(track_indices) == 0 or len(det_indices) == 0:
        return [], list(track_indices), list(det_indices)
    cost = cost_matrix.copy()
    cost[cost > max_distance] = max_distance + 1e-5
    rows, cols = linear_sum_assignment(cost)
    matches, u_tracks, u_dets = [], [], []
    for col, di in enumerate(det_indices):
        if col not in cols:
            u_dets.append(di)
    for row, ti in enumerate(track_indices):
        if row not in rows:
            u_tracks.append(ti)
    for row, col in zip(rows, cols):
        ti, di = track_indices[row], det_indices[col]
        if cost[row, col] > max_distance:
            u_tracks.append(ti)
            u_dets.append(di)
        else:
            matches.append((ti, di))
    return matches, u_tracks, u_dets


class OracleNNMetric:
    """nn_matching.NearestNeighborDistanceMetric('cosine') with budget."""

    def __init__(self, matching_threshold, budget):
        self.matching_threshold = matching_threshold
        self.budget = budget
        self.samples = {}

    def partial_fit(self, features, targets, active_targets):
        for f, t in zip(features, targets):
            self.samples.setdefault(t, []).append(f)
            if self.budget is not None:
                self.samples[t] = self.samples[t][-self.budget:]
        self.samples = {
            k: self.samples[k] for k in active_targets if k in self.samples
        }

    def distance(self, features, targets):
        cost = np.zeros((len(targets), len(features)))
        for i, t in enumerate(targets):
            gallery = np.asarray(self.samples.get(t, []))
            if gallery.size == 0 or len(features) == 0:
                cost[i, :] = INFTY_COST
                continue
            cost[i, :] = (1.0 - gallery @ np.asarray(features).T).min(axis=0)
        return cost


def ss_iou(a_tlbr, b_tlbr):
    """deep_sort iou_matching.iou — NO +1 convention."""
    out = np.zeros((len(a_tlbr), len(b_tlbr)))
    for i, a in enumerate(a_tlbr):
        area_a = (a[2] - a[0]) * (a[3] - a[1])
        for j, b in enumerate(b_tlbr):
            iw = min(a[2], b[2]) - max(a[0], b[0])
            ih = min(a[3], b[3]) - max(a[1], b[1])
            if iw <= 0 or ih <= 0:
                continue
            area_b = (b[2] - b[0]) * (b[3] - b[1])
            out[i, j] = iw * ih / (area_a + area_b - iw * ih)
    return out


class OracleStrongSortTracker:
    """deep_sort/tracker.py with BUSCA third round, woC (vanilla matching),
    NSA + EMA + MC on (the run_strongsort.sh flag set), CMC off."""

    def __init__(self, model, max_iou_distance=0.7, max_age=30, n_init=3,
                 max_cosine_distance=0.45, nn_budget=1, mc_lambda=0.98,
                 busca_thresh=0.5, seq_len=5, num_candidates=3,
                 use_broader_memory=True, select_highest_candidate=True,
                 conf_threshold=0.8, crop_hw=(64, 32), ema_alpha=0.9,
                 mems_first_only=True):
        self.model = model
        self.max_iou_distance = max_iou_distance
        self.max_age = max_age
        self.n_init = n_init
        self.metric = OracleNNMetric(max_cosine_distance, nn_budget)
        self.mc_lambda = mc_lambda
        self.busca_thresh = busca_thresh
        self.seq_len = seq_len
        self.num_candidates = num_candidates
        self.use_broader_memory = use_broader_memory
        self.select_highest_candidate = select_highest_candidate
        self.crop_hw = crop_hw
        self.ema_alpha = ema_alpha
        self.mems_first_only = mems_first_only
        OracleSSTrack.conf_thres = conf_threshold
        self.tracks = []
        self._next_id = 1
        self.probs_log = []

    def predict(self):
        for t in self.tracks:
            t.predict()

    def update(self, boxes_tlbr, scores, features, frame):
        boxes_tlbr = np.asarray(boxes_tlbr, np.float64).reshape(-1, 4)
        scores = np.asarray(scores, np.float64).reshape(-1)
        tlwh = boxes_tlbr.copy()
        tlwh[:, 2:] -= tlwh[:, :2]
        xyah = tlwh.copy()
        xyah[:, :2] += xyah[:, 2:] / 2
        xyah[:, 2] /= xyah[:, 3]

        matches, unmatched_tracks, unmatched_dets = self._match(
            xyah, tlwh, scores, features
        )

        det_images = get_image_crops(frame, boxes_tlbr, self.crop_hw)

        # third round over unmatched confirmed age<=1 tracks
        # (deep_sort/tracker.py:129-189)
        self.probs_log.append(None)
        third_idx = [
            i for i in unmatched_tracks
            if self.tracks[i].is_confirmed()
            and self.tracks[i].time_since_update <= 1
        ]
        third_pool = [self.tracks[i] for i in third_idx]
        if self.busca_thresh > 0 and third_pool:
            kalman_cands = []
            for t in third_pool:
                crop = get_image_crops(frame, [t.tlbr], self.crop_hw)[0]
                kalman_cands.append(OracleSSTrack(
                    t.xyah, -1, self.n_init, self.max_age, None,
                    np.float32(OracleSSTrack.conf_thres), 1.0, crop,
                ))
            considered = []
            for i in range(len(tlwh)):
                conf = scores[i]
                if self.mems_first_only:
                    conf = max(conf, OracleSSTrack.conf_thres)
                considered.append(OracleSSTrack(
                    xyah[i], -1, self.n_init, self.max_age,
                    features[i] if features is not None else None,
                    conf, 1.0, det_images[i],
                ))
            matches3, u3 = self._third_round(
                third_pool, considered, kalman_cands
            )
            for it, _prob in matches3:
                track = third_pool[it]
                det = kalman_cands[it]
                if self.mems_first_only:
                    new_feat = (
                        track.features[-1] if track.features else None
                    )
                    new_img = (
                        track._images_mem[-1] if track._images_mem else None
                    )
                    new_conf = 0.10000001
                else:
                    new_feat = det.features[-1] if det.features else None
                    new_img = det.image
                    new_conf = det.score
                track.update(det.xyah, new_conf, new_feat, new_img)
                unmatched_tracks.remove(third_idx[it])

        for ti, di in matches:
            self.tracks[ti].update(
                xyah[di], scores[di],
                features[di] if features is not None else None,
                det_images[di],
            )
        for ti in unmatched_tracks:
            self.tracks[ti].mark_missed()
        for di in unmatched_dets:
            self.tracks.append(OracleSSTrack(
                xyah[di], self._next_id, self.n_init, self.max_age,
                features[di] if features is not None else None,
                scores[di], 1.0, det_images[di],
                ema_alpha=self.ema_alpha,
            ))
            self._next_id += 1
        self.tracks = [t for t in self.tracks if not t.is_deleted()]

        active = [t.track_id for t in self.tracks if t.is_confirmed()]
        feats, targets = [], []
        for t in self.tracks:
            if not t.is_confirmed():
                continue
            feats += t.features
            targets += [t.track_id] * len(t.features)
        if feats:
            self.metric.partial_fit(np.asarray(feats), targets, active)
        return [
            t for t in self.tracks
            if t.is_confirmed() and t.time_since_update <= 1
        ]

    def _match(self, xyah, tlwh, scores, features):
        confirmed = [
            i for i, t in enumerate(self.tracks) if t.is_confirmed()
        ]
        unconfirmed = [
            i for i, t in enumerate(self.tracks) if not t.is_confirmed()
        ]
        det_indices = list(range(len(xyah)))

        if features is not None and confirmed:
            targets = [self.tracks[i].track_id for i in confirmed]
            cost = self.metric.distance(
                np.asarray([features[d] for d in det_indices]), targets
            )
            z = np.asarray([xyah[d] for d in det_indices])
            for row, ti in enumerate(confirmed):
                t = self.tracks[ti]
                gd = t.kf.gating_distance(t.mean, t.covariance, z)
                cost[row, gd > CHI2INV95_4] = INFTY_COST
                cost[row] = (
                    self.mc_lambda * cost[row] + (1 - self.mc_lambda) * gd
                )
            matches_a, unmatched_a, unmatched_d = ss_min_cost_matching(
                cost, self.metric.matching_threshold, confirmed, det_indices
            )
        else:
            matches_a, unmatched_a, unmatched_d = (
                [], list(confirmed), det_indices
            )

        iou_candidates = unconfirmed + [
            i for i in unmatched_a if self.tracks[i].time_since_update == 1
        ]
        unmatched_a = [
            i for i in unmatched_a if self.tracks[i].time_since_update != 1
        ]
        if iou_candidates and unmatched_d:
            t_tlbr = [self.tracks[i].tlbr for i in iou_candidates]
            d_tlbr = []
            for d in unmatched_d:
                b = tlwh[d].copy()
                b[2:] += b[:2]
                d_tlbr.append(b)
            cost = 1.0 - ss_iou(t_tlbr, d_tlbr)
            for row, ti in enumerate(iou_candidates):
                if self.tracks[ti].time_since_update > 1:
                    cost[row, :] = INFTY_COST
            matches_b, unmatched_b, unmatched_d = ss_min_cost_matching(
                cost, self.max_iou_distance, iou_candidates, unmatched_d
            )
        else:
            matches_b, unmatched_b = [], list(iou_candidates)
        return (
            matches_a + matches_b,
            list(set(unmatched_a + unmatched_b)),
            list(unmatched_d),
        )

    def _third_round(self, pool, considered, kalman_cands):
        dists = center_distance(pool, considered)
        probs, reliable = associate_embeddings(
            self.model, pool, considered, dists, self.seq_len,
            self.num_candidates, self.use_broader_memory,
            self.select_highest_candidate,
            extra_kalman_candidates=kalman_cands,
        )
        self.probs_log[-1] = probs
        if probs is None:
            return [], list(range(len(pool)))
        matches, u_track = [], []
        num_dets = len(considered)
        for i in range(len(pool)):
            p = probs[i, num_dets + i]
            if reliable[i] and p > self.busca_thresh:
                matches.append([i, p])
            else:
                u_track.append(i)
        return matches, u_track


# ---------------------------------------------------------------------------
# GHOST oracle (adapters/GHOST/src/{tracker,base_tracker,tracking_utils}.py)
# ---------------------------------------------------------------------------

GHOST_PROXY_REDUCERS = {
    "min": lambda d: d.min(axis=1),
    "mean": lambda d: d.mean(axis=1),
    "max": lambda d: d.max(axis=1),
    "meanminmax": lambda d: (d.max(axis=1) + d.min(axis=1)) / 2,
    "median": lambda d: np.median(d, axis=1),
}


class OracleGhostTrack:
    def __init__(self, track_id, pos_tlbr, feats, conf, frame, image=None,
                 conf_threshold=0.0, max_feats=100):
        self.track_id = track_id
        self.pos = np.asarray(pos_tlbr, np.float64)
        self.feats = np.asarray(feats, np.float64)
        self.past_feats = [self.feats]
        self.last_pos = [self.pos.copy()]
        self.past_frames = [frame]
        self.last_v = np.zeros(4)
        self.inactive_count = 0
        self.conf = conf
        self.conf_threshold = conf_threshold
        self.max_feats = max_feats
        self.scale = 1.0
        self._tlwh_mem = [self.tlwh.copy()]
        self._images_mem = [image]
        self.conf_mem = [conf]
        self.image = image

    def __len__(self):
        return len(self.past_frames)

    @property
    def tlwh(self):
        p = self.pos
        return np.array([p[0], p[1], p[2] - p[0], p[3] - p[1]])

    @property
    def tlbr(self):
        return self.pos.copy()

    @property
    def tlwh_mem(self):
        return [b for b, c in zip(self._tlwh_mem, self.conf_mem)
                if c >= self.conf_threshold]

    @property
    def images_mem(self):
        return [im for im, c in zip(self._images_mem, self.conf_mem)
                if c >= self.conf_threshold and im is not None]

    def add_detection(self, pos, feats, conf, frame, image=None,
                      save_memory=False):
        self.pos = np.asarray(pos, np.float64)
        self.feats = np.asarray(feats, np.float64)
        self.past_feats.append(self.feats)
        self.past_feats = self.past_feats[-self.max_feats:]
        self.last_pos.append(self.pos.copy())
        self.past_frames.append(frame)
        self.conf = conf
        self._tlwh_mem.append(self.tlwh.copy())
        self.conf_mem.append(conf)
        if save_memory and conf < self.conf_threshold:
            self._images_mem.append(None)
        else:
            self._images_mem.append(image)
        self.image = image

    def update_velocity(self, last_n):
        if len(self.last_pos) < 2:
            return
        pos = np.asarray(self.last_pos[-last_n:])
        frames = np.asarray(self.past_frames[-last_n:], np.float64)
        dt = np.maximum(frames[1:] - frames[:-1], 1.0)[:, None]
        self.last_v = ((pos[1:] - pos[:-1]) / dt).mean(axis=0)

    def motion_step(self):
        self.pos = self.pos + self.last_v


def ghost_solve_dense(cost):
    """lapsolver.solve_dense semantics: NaN entries are forbidden edges."""
    from scipy.optimize import linear_sum_assignment

    big = 1e9
    c = np.where(np.isnan(cost), big, cost)
    rows, cols = linear_sum_assignment(c)
    keep = c[rows, cols] < big
    return rows[keep], cols[keep]


def ghost_iou(a_tlbr, b_tlbr):
    """cython_bbox +1 convention (tracking_utils.py:495-511)."""
    return bbox_ious_plus1(list(a_tlbr), list(b_tlbr))


class OracleGhostTracker:
    """GHOST association loop + BUSCA third round (src/tracker.py:70-567),
    static ReID thresholds, sum_a motion combination; optional ECC
    ego-motion compensation of stored positions (the tracktor recipe with
    the flipped template, base_tracker.py:599-633)."""

    def __init__(self, model, act_reid_thresh=0.7, inact_reid_thresh=0.7,
                 inact_patience=50, proxy_act="last",
                 proxy_inact="meanminmax", apply_motion_model=True,
                 last_n_frames=5, combi_alpha=0.3, det_conf=0.5,
                 busca_thresh=0.5, seq_len=5, num_candidates=3,
                 use_broader_memory=True, select_highest_candidate=True,
                 minimum_conf_modifier=0.20, crop_hw=(64, 32),
                 motion_compensation=False, is_moving=True):
        self.motion_compensation = motion_compensation
        self.is_moving = is_moving
        self.last_mc_frame = None
        self.model = model
        self.act_thresh = act_reid_thresh
        self.inact_thresh = inact_reid_thresh
        self.inact_patience = inact_patience
        self.proxy_act = proxy_act
        self.proxy_inact = proxy_inact
        self.apply_motion_model = apply_motion_model
        self.last_n_frames = last_n_frames
        self.combi_alpha = combi_alpha
        self.busca_thresh = busca_thresh
        self.seq_len = seq_len
        self.num_candidates = num_candidates
        self.use_broader_memory = use_broader_memory
        self.select_highest_candidate = select_highest_candidate
        self.conf_threshold = det_conf + minimum_conf_modifier
        self.crop_hw = crop_hw
        self.tracks = {}
        self.inactive_tracks = {}
        self._next_id = 1
        self.frame_id = 0
        self.probs_log = []

    @staticmethod
    def _cosine(x, y):
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        yn = y / np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-12)
        return 1.0 - xn @ yn.T

    def _proxy(self, track, det_feats, mode):
        if len(det_feats) == 0:
            return np.zeros(0)
        if mode == "last" or len(track.past_feats) == 1:
            return self._cosine(det_feats, track.feats[None])[:, 0]
        d = self._cosine(det_feats, np.stack(track.past_feats))
        return GHOST_PROXY_REDUCERS[mode](d)

    def update(self, boxes_tlbr, scores, features, frame):
        self.frame_id += 1
        boxes = np.asarray(boxes_tlbr, np.float64).reshape(-1, 4)
        scores = np.asarray(scores, np.float64).reshape(-1)
        n = len(boxes)
        feats = (np.asarray(features, np.float64).reshape(n, -1)
                 if n else np.zeros((0, 1)))
        det_images = (get_image_crops(frame, boxes, self.crop_hw)
                      if n else [])

        # ECC ego-motion compensation BEFORE association
        # (base_tracker.py:599-633: template = CURRENT frame, input = last
        # frame, gaussFiltSize 15; warps the last_pos history — not pos —
        # of every active and inactive track when the camera moves)
        if self.motion_compensation and frame is not None:
            if self.last_mc_frame is not None:
                import cv2

                g1 = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                g2 = cv2.cvtColor(self.last_mc_frame, cv2.COLOR_BGR2GRAY)
                warp = np.eye(2, 3, dtype=np.float32)
                criteria = (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                            100, 1e-5)
                try:
                    _, warp = cv2.findTransformECC(
                        g1, g2, warp, cv2.MOTION_EUCLIDEAN, criteria,
                        None, 15)
                except cv2.error:
                    warp = np.eye(2, 3, dtype=np.float32)
                if self.is_moving:
                    w = warp.astype(np.float64)
                    for group in (self.tracks, self.inactive_tracks):
                        for tr in group.values():
                            for i, p in enumerate(tr.last_pos):
                                p1 = w @ np.array([p[0], p[1], 1.0])
                                p2 = w @ np.array([p[2], p[3], 1.0])
                                tr.last_pos[i] = np.array(
                                    [p1[0], p1[1], p2[0], p2[1]])
            self.last_mc_frame = np.asarray(frame)

        self.probs_log.append(None)
        curr_inactive = {
            k: t for k, t in self.inactive_tracks.items()
            if t.inactive_count <= self.inact_patience
        }

        if not self.tracks and not curr_inactive:
            for i in range(n):
                self._new(boxes[i], feats[i], scores[i], det_images[i])
            self._age_inactive()
            return list(self.tracks.values())

        act_ids = list(self.tracks.keys())
        inact_ids = list(curr_inactive.keys())
        num_active = len(act_ids)

        cols = [self._proxy(self.tracks[t], feats, self.proxy_act)
                for t in act_ids]
        cols += [self._proxy(curr_inactive[t], feats, self.proxy_inact)
                 for t in inact_ids]
        dist = (np.stack(cols, axis=1) if cols and n
                else np.zeros((n, len(cols))))

        if self.apply_motion_model and n:
            for t in self.tracks.values():
                t.update_velocity(self.last_n_frames)
                t.motion_step()
            for t in curr_inactive.values():
                if len(t.last_pos) > 1:
                    t.motion_step()
            all_pos = np.array(
                [self.tracks[k].pos for k in act_ids]
                + [curr_inactive[k].pos for k in inact_ids]
            ).reshape(-1, 4)
            iou_dist = 1 - ghost_iou(boxes, all_pos)
            a = self.combi_alpha
            dist = (1 - a) * dist + a * iou_dist

        if dist.size:
            work = dist.copy()
            work[:, :num_active] = np.where(
                work[:, :num_active] <= self.act_thresh,
                work[:, :num_active], np.nan)
            work[:, num_active:] = np.where(
                work[:, num_active:] <= self.inact_thresh,
                work[:, num_active:], np.nan)
            rows, assign_cols = ghost_solve_dense(work)
        else:
            rows, assign_cols = np.zeros(0, int), np.zeros(0, int)

        all_ids = act_ids + inact_ids
        active_now, assigned = [], set()
        for r, c in zip(rows, assign_cols):
            tid = all_ids[c]
            conf = max(scores[r], self.conf_threshold)
            if c >= num_active:
                track = self.inactive_tracks.pop(tid)
                track.inactive_count = 0
                self.tracks[tid] = track
            self.tracks[tid].add_detection(
                boxes[r], feats[r], conf, self.frame_id, det_images[r])
            active_now.append(tid)
            assigned.add(r)

        # BUSCA third round over unmatched active tracks with positive area
        if self.busca_thresh > 0:
            third_ids, third_pool = [], []
            for k in list(self.tracks.keys()):
                if k in active_now:
                    continue
                t = self.tracks[k]
                if t.tlwh[2] * t.tlwh[3] <= 0:
                    continue
                third_ids.append(k)
                third_pool.append(t)
            if third_pool:
                kalman_cands = []
                for t in third_pool:
                    crop = get_image_crops(frame, [t.pos], self.crop_hw)[0]
                    kalman_cands.append(OracleGhostTrack(
                        -1, t.pos, t.feats, self.conf_threshold,
                        self.frame_id, image=crop,
                    ))
                considered = []
                for i in range(n):
                    considered.append(OracleGhostTrack(
                        -1, boxes[i], feats[i],
                        max(scores[i], self.conf_threshold), self.frame_id,
                        image=det_images[i],
                    ))
                matches3, _ = self._third_round(
                    third_pool, considered, kalman_cands)
                for it, _prob in matches3:
                    track = third_pool[it]
                    det = kalman_cands[it]
                    track.add_detection(
                        det.pos, track.feats, 0.10000001, self.frame_id,
                        track._images_mem[-1] if track._images_mem else None,
                    )
                    active_now.append(third_ids[it])

        for k in list(self.tracks.keys()):
            if k not in active_now:
                self.inactive_tracks[k] = self.tracks[k]
                self.inactive_tracks[k].inactive_count = 0
                del self.tracks[k]
        self._age_inactive()

        for i in range(n):
            if i not in assigned:
                self._new(boxes[i], feats[i],
                          max(scores[i], self.conf_threshold), det_images[i])
        return list(self.tracks.values())

    def _new(self, pos, feats, conf, image):
        self.tracks[self._next_id] = OracleGhostTrack(
            self._next_id, pos, feats, conf, self.frame_id, image=image,
            conf_threshold=self.conf_threshold,
        )
        self._next_id += 1

    def _age_inactive(self):
        dead = []
        for k, t in self.inactive_tracks.items():
            t.inactive_count += 1
            if t.inactive_count > self.inact_patience:
                dead.append(k)
        for k in dead:
            del self.inactive_tracks[k]

    def _third_round(self, pool, considered, kalman_cands):
        dists = center_distance(pool, considered)
        probs, reliable = associate_embeddings(
            self.model, pool, considered, dists, self.seq_len,
            self.num_candidates, self.use_broader_memory,
            self.select_highest_candidate,
            extra_kalman_candidates=kalman_cands,
        )
        self.probs_log[-1] = probs
        if probs is None:
            return [], list(range(len(pool)))
        matches, u_track = [], []
        num_dets = len(considered)
        for i in range(len(pool)):
            p = probs[i, num_dets + i]
            if reliable[i] and p > self.busca_thresh:
                matches.append([i, p])
            else:
                u_track.append(i)
        return matches, u_track


# ---------------------------------------------------------------------------
# SORT pipeline oracle (published Bewley et al. algorithm; independent
# per-track scalar Kalman + scipy Hungarian — diffed frame-by-frame against
# busca_tpu/trackers/sort.py, whose contract is documented in its docstring:
# mot_evaluator.py:17,258-379 drives `Sort(track_thresh)` per video)
# ---------------------------------------------------------------------------

_SORT_F = np.eye(7)
_SORT_F[0, 4] = _SORT_F[1, 5] = _SORT_F[2, 6] = 1.0
_SORT_H = np.eye(4, 7)
_SORT_R = np.diag([1.0, 1.0, 10.0, 10.0])
_SORT_P0 = np.diag([10.0, 10.0, 10.0, 10.0, 1e4, 1e4, 1e4])
_SORT_Q = np.diag([1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 1e-4])


def _sort_iou_single(a, b):
    """Standard IoU of two tlbr boxes (no +1), scalar arithmetic."""
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


class OracleSortTrack:
    """Per-track 7-state [cx,cy,s,r,+vel] Kalman, sequential ops."""

    def __init__(self, tlbr, score, track_id):
        w = tlbr[2] - tlbr[0]
        h = tlbr[3] - tlbr[1]
        self.x = np.zeros(7)
        self.x[:4] = [tlbr[0] + w / 2.0, tlbr[1] + h / 2.0, w * h,
                      w / h if h != 0 else 0.0]
        self.P = _SORT_P0.copy()
        self.score = float(score)
        self.track_id = track_id
        self.time_since_update = 0
        self.hit_streak = 0
        self.age = 0

    def predict(self):
        if self.x[6] + self.x[2] <= 0:  # published area-velocity guard
            self.x[6] = 0.0
        self.x = _SORT_F @ self.x
        self.P = _SORT_F @ self.P @ _SORT_F.T + _SORT_Q
        self.age += 1
        if self.time_since_update > 0:
            self.hit_streak = 0
        self.time_since_update += 1

    def update(self, tlbr, score):
        w = tlbr[2] - tlbr[0]
        h = tlbr[3] - tlbr[1]
        z = np.array([tlbr[0] + w / 2.0, tlbr[1] + h / 2.0, w * h,
                      w / h if h != 0 else 0.0])
        S = _SORT_H @ self.P @ _SORT_H.T + _SORT_R
        # gain via solve (not inv) — same math, independent numerics
        K = np.linalg.solve(S.T, (self.P @ _SORT_H.T).T).T
        self.x = self.x + K @ (z - _SORT_H @ self.x)
        self.P = (np.eye(7) - K @ _SORT_H) @ self.P
        self.score = float(score)
        self.time_since_update = 0
        self.hit_streak += 1

    @property
    def tlbr(self):
        s = max(self.x[2], 0.0)
        r = max(self.x[3], 1e-12)
        w = math.sqrt(s * r)
        h = s / w if w > 0 else 0.0
        return np.array([self.x[0] - w / 2.0, self.x[1] - h / 2.0,
                         self.x[0] + w / 2.0, self.x[1] + h / 2.0])

    @property
    def tlwh(self):
        b = self.tlbr
        return np.array([b[0], b[1], b[2] - b[0], b[3] - b[1]])


class OracleSortTracker:
    """Published SORT loop: det_thresh filter -> predict -> IoU-optimal
    Hungarian (threshold filter AFTER the optimum) -> births/deaths."""

    def __init__(self, det_thresh=0.6, max_age=30, min_hits=3,
                 iou_threshold=0.3):
        self.det_thresh = det_thresh
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.tracks: List[OracleSortTrack] = []
        self.frame_count = 0
        self._next_id = 1

    def update(self, boxes_tlbr, scores, scale=1.0, frame=None):
        import scipy.optimize

        self.frame_count += 1
        dets = np.asarray(boxes_tlbr, np.float64).reshape(-1, 4) / scale
        scores = np.asarray(scores, np.float64).reshape(-1)
        keep = scores > self.det_thresh
        dets, scores = dets[keep], scores[keep]

        for tr in self.tracks:
            tr.predict()

        matched_det = np.full(len(dets), -1, dtype=int)
        if len(dets) and len(self.tracks):
            iou = np.zeros((len(dets), len(self.tracks)))
            for i, d in enumerate(dets):
                for j, tr in enumerate(self.tracks):
                    iou[i, j] = _sort_iou_single(d, tr.tlbr)
            rows, cols = scipy.optimize.linear_sum_assignment(-iou)
            for i, j in zip(rows, cols):
                if iou[i, j] >= self.iou_threshold:
                    matched_det[i] = j

        for i, j in enumerate(matched_det):
            if j >= 0:
                self.tracks[j].update(dets[i], scores[i])
        for i in np.where(matched_det < 0)[0]:
            self.tracks.append(
                OracleSortTrack(dets[i], scores[i], self._next_id)
            )
            self._next_id += 1

        out = [
            tr for tr in self.tracks
            if tr.time_since_update < 1
            and (tr.hit_streak >= self.min_hits
                 or self.frame_count <= self.min_hits)
        ]
        self.tracks = [
            tr for tr in self.tracks if tr.time_since_update <= self.max_age
        ]
        return out


# ---------------------------------------------------------------------------
# MOTDT pipeline oracle (published Chen et al. ICME'18 loop as documented in
# busca_tpu/trackers/motdt.py: pooled+NMS'd candidates, motion-gated
# appearance stage then IoU stage, EMA features, decayed prediction scores;
# mot_evaluator.py:503-625 drives it — tracker module empty upstream)
# ---------------------------------------------------------------------------

_MOTDT_CHI2_4 = 9.4877


def _motdt_xyah(tlbr):
    w = tlbr[2] - tlbr[0]
    h = tlbr[3] - tlbr[1]
    return np.array([tlbr[0] + w / 2.0, tlbr[1] + h / 2.0,
                     w / h if h != 0 else 0.0, h])


class OracleMotdtTrack:
    def __init__(self, tlbr, score, feature, track_id):
        self.kf = OracleKalman()
        self.mean, self.cov = self.kf.initiate(_motdt_xyah(tlbr))
        self.score = float(score)
        f = np.asarray(feature, np.float64)
        self.smooth_feat = f
        self.track_id = track_id
        self.time_since_update = 0
        self.is_lost = False

    @property
    def tlbr(self):
        cx, cy, a, h = self.mean[:4]
        w = a * h
        return np.array([cx - w / 2.0, cy - h / 2.0, cx + w / 2.0,
                         cy + h / 2.0])

    @property
    def tlwh(self):
        b = self.tlbr
        return np.array([b[0], b[1], b[2] - b[0], b[3] - b[1]])

    def predict(self):
        self.mean, self.cov = self.kf.predict(self.mean, self.cov)
        self.time_since_update += 1

    def correct(self, tlbr, score, feature, alpha):
        self.mean, self.cov = self.kf.update(
            self.mean, self.cov, _motdt_xyah(tlbr)
        )
        self.score = float(score)
        self.time_since_update = 0
        self.is_lost = False
        if feature is not None:
            f = alpha * self.smooth_feat + (1 - alpha) * np.asarray(
                feature, np.float64
            )
            n = np.linalg.norm(f)
            self.smooth_feat = f / n if n > 0 else f

    def gating_distance(self, xyah):
        pm, pc = self.kf.project(self.mean, self.cov)
        d = xyah - pm
        L = scipy.linalg.cholesky(pc, lower=True)
        y = scipy.linalg.solve_triangular(L, d, lower=True)
        return float(y @ y)


class OracleMotdtTracker:
    def __init__(self, min_cls_score=0.4, min_det_score=0.45,
                 min_ap_dist=0.64, iou_thresh=0.3, nms_thresh=0.3,
                 max_time_lost=30, track_decay=0.9, ema_alpha=0.9):
        self.min_cls_score = min_cls_score
        self.min_det_score = min_det_score
        self.min_ap_dist = min_ap_dist
        self.iou_thresh = iou_thresh
        self.nms_thresh = nms_thresh
        self.max_time_lost = max_time_lost
        self.track_decay = track_decay
        self.ema_alpha = ema_alpha
        self.tracks: List[OracleMotdtTrack] = []
        self.frame_id = 0
        self._next_id = 1

    def update(self, boxes_tlbr, scores, features, frame=None):
        self.frame_id += 1
        boxes = np.asarray(boxes_tlbr, np.float64).reshape(-1, 4)
        scores = np.asarray(scores, np.float64).reshape(-1)
        features = np.asarray(features, np.float64).reshape(len(boxes), -1)

        for tr in self.tracks:
            tr.predict()

        # candidate pool: kept detections, then decayed track predictions
        cands = []  # (box, score, feat, is_det)
        for i in range(len(boxes)):
            if scores[i] >= self.min_cls_score:
                cands.append((boxes[i], scores[i], features[i], True))
        for tr in self.tracks:
            s = tr.score * self.track_decay ** tr.time_since_update
            if s >= self.min_cls_score:
                cands.append((tr.tlbr, s, tr.smooth_feat, False))

        # greedy NMS by descending score (stable sort; production uses
        # argsort — continuous scores make ties measure-zero)
        order = sorted(range(len(cands)), key=lambda i: -cands[i][1])
        kept = []
        for i in order:
            if all(
                _sort_iou_single(cands[i][0], cands[j][0]) <= self.nms_thresh
                for j in kept
            ):
                kept.append(i)
        # production fancy-indexes with the greedy keep order, so the pool
        # comes out score-descending — mirror that, don't restore pool order
        cands = [cands[i] for i in kept]

        matched_tracks, matched_cands = set(), set()
        if self.tracks and cands:
            # stage 1: motion-gated appearance
            ap = np.zeros((len(self.tracks), len(cands)))
            for ti, tr in enumerate(self.tracks):
                tf = tr.smooth_feat / max(np.linalg.norm(tr.smooth_feat),
                                          1e-12)
                for ci, (cb, _, cf, _d) in enumerate(cands):
                    cfn = cf / max(np.linalg.norm(cf), 1e-12)
                    ap[ti, ci] = max(0.0, 1.0 - float(tf @ cfn))
                    if tr.gating_distance(_motdt_xyah(cb)) > _MOTDT_CHI2_4:
                        ap[ti, ci] = 1e5
            matches, _, _ = linear_assignment(ap, self.min_ap_dist)
            for ti, ci in matches:
                cb, cs, cf, _d = cands[ci]
                self.tracks[ti].correct(cb, cs, cf, self.ema_alpha)
                matched_tracks.add(ti)
                matched_cands.add(ci)

            # stage 2: IoU on the remainder
            rt = [i for i in range(len(self.tracks))
                  if i not in matched_tracks]
            rc = [i for i in range(len(cands)) if i not in matched_cands]
            if rt and rc:
                cost = np.array([
                    [1.0 - _sort_iou_single(self.tracks[i].tlbr, cands[j][0])
                     for j in rc]
                    for i in rt
                ])
                matches, _, _ = linear_assignment(cost, 1.0 - self.iou_thresh)
                for a, b in matches:
                    ti, ci = rt[a], rc[b]
                    cb, cs, cf, _d = cands[ci]
                    self.tracks[ti].correct(cb, cs, cf, self.ema_alpha)
                    matched_tracks.add(ti)
                    matched_cands.add(ci)

        for i, tr in enumerate(self.tracks):
            if i not in matched_tracks:
                tr.is_lost = True
        self.tracks = [
            tr for tr in self.tracks
            if tr.time_since_update <= self.max_time_lost
        ]
        for ci, (cb, cs, cf, is_det) in enumerate(cands):
            if ci not in matched_cands and is_det and cs >= self.min_det_score:
                self.tracks.append(
                    OracleMotdtTrack(cb, cs, cf, self._next_id)
                )
                self._next_id += 1

        return [tr for tr in self.tracks if not tr.is_lost]


# ---------------------------------------------------------------------------
# AFLink + GSI post-processing oracle (strong_sort.py:29-46 roles)
# ---------------------------------------------------------------------------


class TorchAFLink(tnn.Module):
    """Torch twin of the AFLink link model (models/aflink.py AFLinkModel —
    the StrongSORT ``PostLinker`` role; the upstream module lives in an
    empty submodule, so the published design's canonical layout is defined
    by this framework and this class is its torch-source oracle).

    Layout matches ``convert_aflink_state_dict``:
    ``temporal.{i}.conv/norm``, ``fusion``, ``fc1``/``fc2``.
    """

    def __init__(self, widths=(32, 64, 128, 256), seed=0):
        super().__init__()
        torch.manual_seed(seed)
        self.widths = widths
        temporal = []
        in_c = 1
        for w in widths:
            blk = tnn.Module()
            blk.conv = tnn.Conv2d(in_c, w, (7, 1), bias=False)
            # flax nn.LayerNorm default epsilon
            blk.norm = tnn.LayerNorm(w, eps=1e-6)
            temporal.append(blk)
            in_c = w
        self.temporal = tnn.ModuleList(temporal)
        self.fusion = tnn.Conv2d(widths[-1], widths[-1], (1, 3))
        self.fc1 = tnn.Linear(2 * widths[-1], widths[-1])
        self.fc2 = tnn.Linear(widths[-1], 2)

    def reference_state_dict(self):
        sd = {}
        for i, blk in enumerate(self.temporal):
            sd[f"temporal.{i}.conv.weight"] = blk.conv.weight.detach().numpy()
            sd[f"temporal.{i}.norm.weight"] = blk.norm.weight.detach().numpy()
            sd[f"temporal.{i}.norm.bias"] = blk.norm.bias.detach().numpy()
        sd["fusion.weight"] = self.fusion.weight.detach().numpy()
        sd["fusion.bias"] = self.fusion.bias.detach().numpy()
        sd["fc1.weight"] = self.fc1.weight.detach().numpy()
        sd["fc1.bias"] = self.fc1.bias.detach().numpy()
        sd["fc2.weight"] = self.fc2.weight.detach().numpy()
        sd["fc2.bias"] = self.fc2.bias.detach().numpy()
        return sd

    def _branch(self, seg):
        x = seg.unsqueeze(1)  # [B, 1, T, 3]
        for blk in self.temporal:
            x = blk.conv(x)  # [B, C, T', 3]
            x = x.permute(0, 2, 3, 1)  # [B, T', 3, C]
            x = torch.relu(blk.norm(x))
            x = x.permute(0, 3, 1, 2)
        x = torch.relu(self.fusion(x))  # [B, C, T', 1]
        return x.mean(dim=(2, 3))

    def forward(self, seg1, seg2):
        e1, e2 = self._branch(seg1), self._branch(seg2)
        h = torch.relu(self.fc1(torch.cat([e1, e2], dim=-1)))
        return self.fc2(h)

    @torch.no_grad()
    def score(self, seg1, seg2):
        """P(same identity) per pair."""
        logits = self(torch.from_numpy(np.asarray(seg1, np.float32)),
                      torch.from_numpy(np.asarray(seg2, np.float32)))
        return torch.softmax(logits, dim=-1)[:, 1].numpy()


AFLINK_SEG_LEN = 30
AFLINK_FRAME_SCALE = 30.0
AFLINK_POS_SCALE = 1000.0


def _aflink_segment(rows, ref_frame, tail):
    """MOT rows -> normalized [30, 3] (frame, cx, cy) window (tail/head)."""
    rows = rows[-AFLINK_SEG_LEN:] if tail else rows[:AFLINK_SEG_LEN]
    seg = np.zeros((AFLINK_SEG_LEN, 3), np.float32)
    cx = rows[:, 2] + rows[:, 4] / 2.0
    cy = rows[:, 3] + rows[:, 5] / 2.0
    ref_x, ref_y = (cx[-1], cy[-1]) if tail else (cx[0], cy[0])
    feats = np.stack([
        (rows[:, 0] - ref_frame) / AFLINK_FRAME_SCALE,
        (cx - ref_x) / AFLINK_POS_SCALE,
        (cy - ref_y) / AFLINK_POS_SCALE,
    ], axis=1).astype(np.float32)
    if tail:
        seg[-len(rows):] = feats
    else:
        seg[:len(rows)] = feats
    return seg


def oracle_aflink(rows, model, thrT=(0, 30), thrS=75.0, thrP=0.05):
    """The AFLink linker over MOT rows (strong_sort.py:29-38 defaults):
    gate candidate (end, start) tracklet pairs temporally/spatially, score
    with the link model, greedily merge by descending probability (one
    forward + one backward link per tracklet), rewrite ids transitively."""
    rows = np.asarray(rows, np.float64)
    by_id = {}
    for tid in np.unique(rows[:, 1]).astype(int):
        r = rows[rows[:, 1] == tid]
        by_id[tid] = r[np.argsort(r[:, 0])]
    ids = sorted(by_id)
    pairs, s1, s2 = [], [], []
    for i in ids:
        ri = by_id[i]
        for j in ids:
            if i == j:
                continue
            rj = by_id[j]
            gap = rj[0, 0] - ri[-1, 0]
            if not (thrT[0] <= gap < thrT[1]):
                continue
            ci = ri[-1, 2:4] + ri[-1, 4:6] / 2.0
            cj = rj[0, 2:4] + rj[0, 4:6] / 2.0
            if float(np.hypot(ci[0] - cj[0], ci[1] - cj[1])) >= thrS:
                continue
            pairs.append((i, j))
            ref = ri[-1, 0] + 1
            s1.append(_aflink_segment(ri, ref, tail=True))
            s2.append(_aflink_segment(rj, ref, tail=False))
    if not pairs:
        return rows
    probs = model.score(np.stack(s1), np.stack(s2))

    link_to = {}  # root id -> merged-into root id

    def resolve(x):
        while x in link_to:
            x = link_to[x]
        return x

    used_src, used_dst = set(), set()
    for k in np.argsort(-probs):
        if probs[k] < thrP:
            break
        i, j = pairs[k]
        if i in used_src or j in used_dst:
            continue
        used_src.add(i)
        used_dst.add(j)
        # link ROOTS and no-op same-set pairs (union semantics): two
        # same-frame tracklets can gate both (i, j) and (j, i) — a direct
        # j->i map would then form a cycle and resolve() would never
        # terminate; the production linker's parent[find(j)] = find(i)
        # no-ops the second link the same way
        ri, rj = resolve(i), resolve(j)
        if ri != rj:
            link_to[rj] = ri

    out = rows.copy()
    for tid in ids:
        root = resolve(tid)
        if root != tid:
            out[out[:, 1] == tid, 1] = root
    order = np.lexsort((out[:, 1], out[:, 0]))
    return out[order]


def oracle_gsi(rows, interval=20, tau=10.0):
    """Gaussian-smoothed interpolation over MOT rows (the GSI role,
    strong_sort.py:40-46): per-track linear gap filling (gaps <= interval)
    then RBF Gaussian-process smoothing of x/y/w/h (noise 1e-2, adaptive
    length scale min(tau, max(1, len/10 * tau))) — torch linear algebra."""
    rows = np.asarray(rows, np.float64)
    if len(rows) == 0:
        return rows
    # linear interpolation
    filled = [rows]
    for tid in np.unique(rows[:, 1]).astype(int):
        r = rows[rows[:, 1] == tid]
        r = r[np.argsort(r[:, 0])]
        f = r[:, 0].astype(int)
        for i in range(1, len(f)):
            gap = f[i] - f[i - 1]
            if 1 < gap <= interval:
                for k in range(1, gap):
                    a = k / gap
                    row = r[i - 1] * (1 - a) + r[i] * a
                    row[0] = f[i - 1] + k
                    row[1] = tid
                    filled.append(row[None])
    merged = np.concatenate(filled, axis=0)
    merged = merged[np.lexsort((merged[:, 1], merged[:, 0]))]
    # GP smoothing
    out = []
    for tid in np.unique(merged[:, 1]).astype(int):
        r = merged[merged[:, 1] == tid].copy()
        r = r[np.argsort(r[:, 0])]
        if len(r) >= 2:
            t = torch.from_numpy(r[:, 0]).double()[:, None]
            tau_eff = min(tau, max(1.0, len(r) / 10.0 * tau))
            k = torch.exp(-(t - t.T) ** 2 / (2.0 * tau_eff * tau_eff))
            a = k + 1e-2 * torch.eye(len(r), dtype=torch.float64)
            y = torch.from_numpy(r[:, 2:6]).double()
            r[:, 2:6] = (k @ torch.linalg.solve(a, y)).numpy()
        out.append(r)
    merged = np.concatenate(out, axis=0)
    return merged[np.lexsort((merged[:, 1], merged[:, 0]))]
