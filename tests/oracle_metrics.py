"""Brute-force metric oracles for differential fuzzing of eval/metrics.py and
eval/detection.py.

Every acceptance number the framework reports (MOTA/IDF1/HOTA/COCO-AP — the
roles of motmetrics / TrackEval / COCOeval in the reference,
adapters/ByteTrack/tools/track.py:236-288 and
adapters/GHOST/src/eval_track_eval.py:36-119) flows through the from-scratch
implementations in busca_tpu.eval.  None of the canonical packages are
installed here, so these oracles cross-check them instead: independent
implementations of the same published specs, written for tiny scenes where
EXHAUSTIVE ENUMERATION replaces every assignment solver —

- CLEAR: all injective per-frame matchings enumerated; max cardinality, then
  min total (1 - IoU) cost (the cost-limit LAPJV objective at costs <= limit).
- Identity (IDF1): all injective gt<->pred trajectory mappings enumerated;
  max IDTP wins (Ristani et al. 2016's global min-cost bipartite problem).
- HOTA: the two-pass TrackEval algorithm with explicit loops and enumerated
  per-frame matchings maximizing alignment*similarity.
- COCO AP: the greedy score-ordered protocol with direct per-recall-point
  interpolated precision (no envelope/searchsorted machinery).

Independence contract: this module imports nothing from busca_tpu; shared
vocabulary is the published metric definitions only.  Tie-breaking between
equal-cost matchings is unspecified in the specs; the fuzz generators use
continuous random geometry so cost ties are measure-zero (see
test_metrics_fuzz.py).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------- geometry --
def iou_tlwh(a, b):
    """Pairwise IoU of tlwh boxes, no +1 convention (MOTChallenge)."""
    a = np.asarray(a, np.float64).reshape(-1, 4)
    b = np.asarray(b, np.float64).reshape(-1, 4)
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            ax1, ay1, aw, ah = a[i]
            bx1, by1, bw, bh = b[j]
            ix = min(ax1 + aw, bx1 + bw) - max(ax1, bx1)
            iy = min(ay1 + ah, by1 + bh) - max(ay1, by1)
            inter = max(ix, 0.0) * max(iy, 0.0)
            union = aw * ah + bw * bh - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def iou_tlbr(a, b):
    a = np.asarray(a, np.float64).reshape(-1, 4).copy()
    b = np.asarray(b, np.float64).reshape(-1, 4).copy()
    a[:, 2:] -= a[:, :2]
    b[:, 2:] -= b[:, :2]
    return iou_tlwh(a, b)


def all_matchings(n: int, m: int):
    """Every injective partial matching between range(n) and range(m),
    as a list of (i, j) pairs (includes the empty matching)."""
    cols = list(range(m))
    for k in range(min(n, m) + 1):
        for rows in itertools.combinations(range(n), k):
            for perm in itertools.permutations(cols, k):
                yield list(zip(rows, perm))


# ------------------------------------------------------------------- CLEAR --
def oracle_clear(gt: Dict[int, tuple], pred: Dict[int, tuple],
                 iou_threshold: float = 0.5) -> dict:
    """CLEAR-MOT by exhaustive matching (Bernardin & Stiefelhagen 2008 with
    py-motmetrics' carry-over preference), plus MT/ML and the Identity
    metrics by exhaustive trajectory mapping."""
    frames = sorted(set(gt) | set(pred))
    corr: Dict[int, int] = {}
    last_match: Dict[int, int] = {}
    fp = fn = idsw = matches = 0
    num_gt = 0
    dist_sum = 0.0
    gt_frames: Dict[int, int] = {}
    gt_tracked: Dict[int, int] = {}
    pred_frames: Dict[int, int] = {}
    overlap: Dict[Tuple[int, int], int] = {}

    for f in frames:
        g_boxes, g_ids = gt.get(f, (np.zeros((0, 4)), np.zeros(0, int)))
        p_boxes, p_ids, *_ = pred.get(
            f, (np.zeros((0, 4)), np.zeros(0, int), np.zeros(0)))
        g_ids = [int(i) for i in g_ids]
        p_ids = [int(i) for i in p_ids]
        num_gt += len(g_ids)
        for gid in g_ids:
            gt_frames[gid] = gt_frames.get(gid, 0) + 1
        for pid in p_ids:
            pred_frames[pid] = pred_frames.get(pid, 0) + 1
        iou = iou_tlwh(g_boxes, p_boxes)
        for gi, gid in enumerate(g_ids):
            for pi, pid in enumerate(p_ids):
                if iou[gi, pi] >= iou_threshold:
                    overlap[(gid, pid)] = overlap.get((gid, pid), 0) + 1

        # 1) carry-over: keep still-valid previous correspondences
        new_corr: Dict[int, int] = {}
        used_g, used_p = set(), set()
        for gid, pid in corr.items():
            if gid in g_ids and pid in p_ids:
                gi, pi = g_ids.index(gid), p_ids.index(pid)
                if iou[gi, pi] >= iou_threshold:
                    new_corr[gid] = pid
                    used_g.add(gi)
                    used_p.add(pi)
                    matches += 1
                    dist_sum += 1.0 - iou[gi, pi]

        # 2) exhaustive min-cost max-cardinality matching on the rest
        free_g = [i for i in range(len(g_ids)) if i not in used_g]
        free_p = [i for i in range(len(p_ids)) if i not in used_p]
        best = []
        best_key = (-1, 0.0)
        for m in all_matchings(len(free_g), len(free_p)):
            pairs = [(free_g[i], free_p[j]) for i, j in m]
            if any(iou[gi, pi] < iou_threshold for gi, pi in pairs):
                continue
            cost = sum(1.0 - iou[gi, pi] for gi, pi in pairs)
            key = (len(pairs), -cost)
            if key > best_key:
                best_key, best = key, pairs
        for gi, pi in best:
            gid, pid = g_ids[gi], p_ids[pi]
            new_corr[gid] = pid
            used_g.add(gi)
            used_p.add(pi)
            matches += 1
            dist_sum += 1.0 - iou[gi, pi]
            if gid in last_match and last_match[gid] != pid:
                idsw += 1

        fn += len(g_ids) - len(used_g)
        fp += len(p_ids) - len(used_p)
        for gid, pid in new_corr.items():
            last_match[gid] = pid
            gt_tracked[gid] = gt_tracked.get(gid, 0) + 1
        corr = new_corr

    # Identity metrics: exhaustive over injective trajectory mappings
    g_traj = sorted(gt_frames)
    p_traj = sorted(pred_frames)
    total_g = sum(gt_frames.values())
    total_p = sum(pred_frames.values())
    idtp = 0
    for m in all_matchings(len(g_traj), len(p_traj)):
        got = sum(overlap.get((g_traj[i], p_traj[j]), 0) for i, j in m)
        idtp = max(idtp, got)
    idf1 = 2.0 * idtp / (total_g + total_p) if (total_g + total_p) else 0.0

    mt = ml = 0
    for gid, n in gt_frames.items():
        r = gt_tracked.get(gid, 0) / n
        if r >= 0.8:
            mt += 1
        elif r <= 0.2:
            ml += 1

    return {
        "mota": 1.0 - (fp + fn + idsw) / num_gt if num_gt else 0.0,
        "motp": dist_sum / matches if matches else 0.0,
        "idf1": idf1,
        "idp": idtp / total_p if total_p else 0.0,
        "idr": idtp / total_g if total_g else 0.0,
        "num_switches": idsw,
        "num_false_positives": fp,
        "num_misses": fn,
        "num_matches": matches,
        "num_gt": num_gt,
        "mostly_tracked": mt,
        "mostly_lost": ml,
        "num_pred": total_p,
    }


# -------------------------------------------------------------------- HOTA --
def oracle_hota(gt: Dict[int, tuple], pred: Dict[int, tuple],
                alphas=None) -> Dict[str, float]:
    """HOTA (Luiten et al., IJCV 2021) with enumerated per-frame matchings."""
    if alphas is None:
        alphas = np.arange(0.05, 0.99, 0.05)
    frames = sorted(set(gt) | set(pred))
    gids = sorted({int(i) for f in gt.values() for i in f[1]})
    pids = sorted({int(i) for f in pred.values() for i in f[1]})
    ng, npr = len(gids), len(pids)
    if ng == 0 or npr == 0:
        v = 0.0 if (ng or npr) else 1.0
        return {k: v for k in ("hota", "deta", "assa", "detre", "detpr",
                               "assre", "asspr", "loca")}
    gix = {g: i for i, g in enumerate(gids)}
    pix = {p: i for i, p in enumerate(pids)}

    # pass 1: soft potential matches -> global alignment score
    potential = np.zeros((ng, npr))
    gcount = np.zeros(ng)
    pcount = np.zeros(npr)
    cached = []
    for f in frames:
        g_boxes, g_ids = gt.get(f, (np.zeros((0, 4)), np.zeros(0, int)))
        p_boxes, p_ids, *_ = pred.get(
            f, (np.zeros((0, 4)), np.zeros(0, int), np.zeros(0)))
        gi = [gix[int(i)] for i in g_ids]
        pi = [pix[int(i)] for i in p_ids]
        sim = iou_tlwh(g_boxes, p_boxes)
        cached.append((gi, pi, sim))
        for i in gi:
            gcount[i] += 1
        for j in pi:
            pcount[j] += 1
        for a in range(len(gi)):
            for b in range(len(pi)):
                denom = sim[a, :].sum() + sim[:, b].sum() - sim[a, b]
                if denom > 1e-8:
                    potential[gi[a], pi[b]] += sim[a, b] / denom

    align = np.zeros((ng, npr))
    for i in range(ng):
        for j in range(npr):
            d = gcount[i] + pcount[j] - potential[i, j]
            align[i, j] = potential[i, j] / max(d, 1e-8)

    out = {k: [] for k in ("hota", "deta", "assa", "detre", "detpr",
                           "assre", "asspr", "loca")}
    for alpha in alphas:
        tp = fn = fp = 0
        tp_sim = 0.0
        mc = np.zeros((ng, npr))
        for gi, pi, sim in cached:
            if not gi or not pi:
                fn += len(gi)
                fp += len(pi)
                continue
            # matching maximizing sum(alignment * similarity)
            best, best_score = [], -1.0
            for m in all_matchings(len(gi), len(pi)):
                s = sum(align[gi[a], pi[b]] * sim[a, b] for a, b in m)
                # prefer maximal matchings on equal score (zero-score pairs
                # never count as TPs, so this only stabilizes comparisons)
                if s > best_score + 1e-15:
                    best, best_score = m, s
            matched = 0
            for a, b in best:
                if sim[a, b] >= alpha - 1e-8:
                    mc[gi[a], pi[b]] += 1
                    matched += 1
                    tp_sim += sim[a, b]
            tp += matched
            fn += len(gi) - matched
            fp += len(pi) - matched
        deta = tp / max(tp + fn + fp, 1)
        assa = assre = asspr = 0.0
        for i in range(ng):
            for j in range(npr):
                if mc[i, j] == 0:
                    continue
                jac = mc[i, j] / max(gcount[i] + pcount[j] - mc[i, j], 1e-8)
                assa += mc[i, j] * jac
                assre += mc[i, j] * mc[i, j] / max(gcount[i], 1)
                asspr += mc[i, j] * mc[i, j] / max(pcount[j], 1)
        assa /= max(tp, 1)
        out["deta"].append(deta)
        out["assa"].append(assa)
        out["hota"].append(np.sqrt(deta * assa))
        out["detre"].append(tp / max(tp + fn, 1))
        out["detpr"].append(tp / max(tp + fp, 1))
        out["assre"].append(assre / max(tp, 1))
        out["asspr"].append(asspr / max(tp, 1))
        out["loca"].append(max(tp_sim, 1e-10) / max(tp, 1e-10))
    return {k: float(np.mean(v)) for k, v in out.items()}


# ----------------------------------------------------------------- COCO AP --
def oracle_average_precision(detections: Dict[int, tuple],
                             ground_truth: Dict[int, np.ndarray],
                             iou_threshold: float = 0.5) -> float:
    """COCO-style single-threshold AP, straight from the definition:
    score-ordered greedy matching (best-IoU unmatched gt), then for each of
    the 101 recall points take the max precision at recall >= r."""
    rows = []
    for img in detections:
        boxes, scores = detections[img]
        for b, s in zip(np.asarray(boxes, float), np.asarray(scores, float)):
            rows.append((float(s), img, b))
    rows.sort(key=lambda r: -r[0])
    total_gt = sum(len(np.asarray(g)) for g in ground_truth.values())
    if total_gt == 0:
        return 0.0 if rows else 1.0
    taken: Dict[int, set] = {}
    flags = []
    for s, img, box in rows:
        gtb = np.asarray(ground_truth.get(img, np.zeros((0, 4))), float)
        used = taken.setdefault(img, set())
        best_j, best_iou = -1, iou_threshold
        for j in range(len(gtb)):
            if j in used:
                continue
            v = iou_tlbr(box[None], gtb[j][None])[0, 0]
            if v >= best_iou:
                best_iou, best_j = v, j
        if best_j >= 0:
            used.add(best_j)
            flags.append(True)
        else:
            flags.append(False)

    recalls, precisions = [], []
    tp = 0
    for k, hit in enumerate(flags, 1):
        tp += bool(hit)
        recalls.append(tp / total_gt)
        precisions.append(tp / k)
    ap = 0.0
    # exact >= comparison, matching pycocotools' protocol
    # (cocoeval.py accumulate: searchsorted(rc, recThrs, 'left') with NO
    # epsilon).  np.linspace(0,1,101)[70] is 0.7000000000000001, so a run
    # whose best recall is exactly 7/10 contributes ZERO precision at the
    # 0.70 recall point — a real pycocotools quirk this oracle must share
    # (found by the r5 extended fuzz, seed 3001468: an earlier 1e-12 slack
    # here made the oracle deviate from the canonical protocol while the
    # production evaluator matched it).
    for r in np.linspace(0, 1, 101):
        best = 0.0
        for rec, pre in zip(recalls, precisions):
            if rec >= r:
                best = max(best, pre)
        ap += best
    return ap / 101.0


def oracle_coco_full(detections: Dict[int, tuple],
                     ground_truth: Dict[int, np.ndarray]) -> Dict[str, float]:
    """The 12-number COCO summarize() table from the pycocotools protocol
    (cocoeval.py evaluateImg/accumulate/summarize), written with plain
    loops: per image+threshold greedy matching in score order against
    ignore-last-sorted gt, dt-ignore for unmatched out-of-range dts, global
    score re-sort, per-threshold PR with ignores dropped, 101-point
    interpolation with max-precision-at-recall>=r."""
    thrs = np.round(np.arange(0.5, 1.0, 0.05), 2)
    areas = {"all": (0.0, 1e10), "small": (0.0, 32.0 ** 2),
             "medium": (32.0 ** 2, 96.0 ** 2), "large": (96.0 ** 2, 1e10)}
    imgs = sorted(set(detections) | set(ground_truth))

    def eval_img(img, a0, a1, max_det):
        db, ds = detections.get(img, (np.zeros((0, 4)), np.zeros(0)))
        db = np.asarray(db, float).reshape(-1, 4)
        ds = np.asarray(ds, float).reshape(-1)
        order = np.argsort(-ds, kind="stable")[:max_det]
        db, ds = db[order], ds[order]
        gb = np.asarray(ground_truth.get(img, np.zeros((0, 4))),
                        float).reshape(-1, 4)
        garea = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
        gig = (garea < a0) | (garea > a1)
        gorder = np.argsort(gig, kind="stable")
        gb, gig = gb[gorder], gig[gorder]
        darea = (db[:, 2] - db[:, 0]) * (db[:, 3] - db[:, 1])
        dout = (darea < a0) | (darea > a1)
        recs = []
        for thr in thrs:
            gtaken = set()
            for di in range(len(db)):
                best, best_iou = -1, min(thr, 1.0 - 1e-10)
                for gi in range(len(gb)):
                    if gi in gtaken:
                        continue
                    if best >= 0 and not gig[best] and gig[gi]:
                        break  # a real match stands; don't trade for ignored
                    v = iou_tlbr(db[di][None], gb[gi][None])[0, 0]
                    if v < best_iou:
                        continue
                    best_iou, best = v, gi
                if best >= 0:
                    gtaken.add(best)
                    recs.append((thr, float(ds[di]), True, bool(gig[best])))
                else:
                    recs.append((thr, float(ds[di]), False, bool(dout[di])))
        n_considered = int((~gig).sum())
        return recs, n_considered

    def pr_curve(area, max_det):
        recs, npig = [], 0
        for img in imgs:
            r, n = eval_img(img, *areas[area], max_det)
            recs.extend(r)
            npig += n
        if npig == 0:
            return None
        aps, ars = [], []
        for thr in thrs:
            rows = sorted(
                [(s, m) for t, s, m, ig in recs
                 if t == thr and not ig],
                key=lambda r: -r[0],
            )
            if not rows:
                aps.append(0.0)
                ars.append(0.0)
                continue
            tp = 0
            recalls, precisions = [], []
            for k, (_s, m) in enumerate(rows, 1):
                tp += bool(m)
                recalls.append(tp / npig)
                precisions.append(tp / k)
            ars.append(recalls[-1])
            ap = 0.0
            # exact >=, the pycocotools searchsorted semantics (see
            # oracle_average_precision — incl. the 0.7000000000000001
            # linspace quirk)
            for r in np.linspace(0, 1, 101):
                best = 0.0
                for rec, pre in zip(recalls, precisions):
                    if rec >= r:
                        best = max(best, pre)
                ap += best
            aps.append(ap / 101.0)
        return np.array(aps), np.array(ars)

    def ap_of(area, max_det, ti=None):
        c = pr_curve(area, max_det)
        if c is None:
            return -1.0
        return float(c[0].mean() if ti is None else c[0][ti])

    def ar_of(area, max_det):
        c = pr_curve(area, max_det)
        return -1.0 if c is None else float(c[1].mean())

    return {
        "ap": ap_of("all", 100), "ap50": ap_of("all", 100, 0),
        "ap75": ap_of("all", 100, 5), "ap_small": ap_of("small", 100),
        "ap_medium": ap_of("medium", 100), "ap_large": ap_of("large", 100),
        "ar1": ar_of("all", 1), "ar10": ar_of("all", 10),
        "ar100": ar_of("all", 100), "ar_small": ar_of("small", 100),
        "ar_medium": ar_of("medium", 100), "ar_large": ar_of("large", 100),
    }
